"""Image-grid logging (the Lightning ImageLogger equivalent,
vavae/main.py:317-431): periodic input/reconstruction/sample grids to disk."""
from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np


def make_grid(images: np.ndarray, cols: Optional[int] = None) -> np.ndarray:
    """(N, H, W, C) float[-1,1]/[0,1] or uint8 → one (RH, CW, C) uint8 grid."""
    x = np.asarray(images)
    if x.dtype != np.uint8:
        lo, hi = float(x.min()), float(x.max())
        if lo < -0.01:  # [-1,1] convention
            x = (x + 1.0) / 2.0
        x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
    n, h, w, c = x.shape
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = x[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, cols: Optional[int] = None) -> str:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    Image.fromarray(make_grid(images, cols)).save(path)
    return path


def log_reconstructions(
    log_dir: str, step: int, inputs: np.ndarray, recons: np.ndarray,
    samples: Optional[np.ndarray] = None, max_images: int = 8,
) -> None:
    """ImageLogger layout: inputs / reconstructions (/ samples) per step."""
    save_image_grid(inputs[:max_images], os.path.join(log_dir, f"inputs_{step:07d}.png"))
    save_image_grid(recons[:max_images], os.path.join(log_dir, f"recon_{step:07d}.png"))
    if samples is not None:
        save_image_grid(samples[:max_images], os.path.join(log_dir, f"samples_{step:07d}.png"))
