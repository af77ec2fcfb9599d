"""ctypes binding for the native threaded PNG writer (native/png_writer.cpp).

Builds on first use (g++ -O3 -shared, links zlib); falls back to PIL when the
toolchain is missing — callers use ``write_pngs`` which routes automatically.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "png_writer.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libpng_writer.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO, "-lz"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            stale = not os.path.exists(_SO) or (
                os.path.exists(_SRC) and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            )
        except OSError:
            stale = not os.path.exists(_SO)
        if stale and not _build() and not os.path.exists(_SO):
            # no toolchain AND no library at all; a stale-but-present .so is
            # still worth loading (checkout mtimes are arbitrary — discarding
            # a working library would silently fall back to per-image PIL)
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.png_write_batch.restype = ctypes.c_int
        lib.png_write_batch.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def write_pngs_native(
    images: np.ndarray, paths: Sequence[str], level: int = 1, threads: int = 0
) -> None:
    """images (B, H, W, 3) uint8 → one PNG per path, encoded in parallel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native png writer unavailable")
    images = np.ascontiguousarray(images, np.uint8)
    B, H, W, C = images.shape
    assert C == 3 and len(paths) == B
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    failures = lib.png_write_batch(images, B, H, W, arr, level, threads)
    if failures:
        raise RuntimeError(f"png_write_batch: {failures}/{B} images failed")


def write_pngs(images: np.ndarray, paths: Sequence[str], level: int = 1) -> None:
    """Threaded native PNG dump with a PIL fallback."""
    if available():
        write_pngs_native(images, paths, level=level)
        return
    from PIL import Image

    for im, p in zip(images, paths):
        Image.fromarray(im).save(p)
