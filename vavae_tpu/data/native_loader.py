"""ctypes binding for the native shard reader (native/shard_reader.cpp).

Builds the shared library on first use (g++ -O3 -shared) and caches it next
to the source. Falls back cleanly when the toolchain or build is missing —
callers check ``available()`` and use the pure-Python path otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "shard_reader.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libshard_reader.so")
_ABI_VERSION = 2  # must match shard_reader_abi_version() in the C++ source
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
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
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build() and not os.path.exists(_SO):
                # no toolchain and no library; a stale-but-present .so still
                # loads below (checkout mtimes are arbitrary — don't discard
                # a working library just because g++ is missing)
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        # Refuse an .so whose validation contract predates this binding
        # (e.g. a prebuilt library from an older checkout on a g++-less box
        # would silently lack the open-time shape/label/bounds rejections).
        try:
            lib.shard_reader_abi_version.restype = ctypes.c_int
            abi = int(lib.shard_reader_abi_version())
        except AttributeError:
            abi = 0
        if abi < _ABI_VERSION:
            return None
        lib.shard_reader_create.restype = ctypes.c_void_p
        lib.shard_reader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        lib.shard_reader_len.restype = ctypes.c_int64
        lib.shard_reader_len.argtypes = [ctypes.c_void_p]
        lib.shard_reader_shape.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.shard_reader_batch.restype = ctypes.c_int
        lib.shard_reader_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.shard_reader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeShardReader:
    """Batch assembler over safetensors latent shards (zero-copy mmap reads,
    threaded gather + CHW→HWC + normalization in C++)."""

    def __init__(self, paths: list[str]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native shard reader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = lib.shard_reader_create(arr, len(paths))
        if not self._h:
            raise RuntimeError(f"failed to open shards: {paths[:2]}...")
        dims = (ctypes.c_int64 * 3)()
        lib.shard_reader_shape(self._h, dims)
        self.C, self.H, self.W = int(dims[0]), int(dims[1]), int(dims[2])
        self._n = int(lib.shard_reader_len(self._h))

    def __len__(self) -> int:
        return self._n

    def batch(
        self,
        indices: np.ndarray,
        flip: np.ndarray,
        mean: np.ndarray,
        std: np.ndarray,
        multiplier: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """indices (B,) int64, flip (B,) uint8 → ((B,H,W,C) f32, (B,) i32)."""
        B = len(indices)
        out = np.empty((B, self.H, self.W, self.C), np.float32)
        labels = np.empty((B,), np.int32)
        rc = self._lib.shard_reader_batch(
            self._h,
            np.ascontiguousarray(indices, np.int64),
            np.ascontiguousarray(flip, np.uint8),
            B,
            np.ascontiguousarray(mean.reshape(-1), np.float32),
            np.ascontiguousarray(std.reshape(-1), np.float32),
            ctypes.c_float(multiplier),
            out,
            labels,
        )
        if rc != 0:
            raise RuntimeError(f"shard_reader_batch failed: {rc}")
        return out, labels

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.shard_reader_destroy(self._h)
            self._h = None
