"""Positional embeddings: frozen 2-D sin-cos table and EVA-style 2-D RoPE.

Parity targets:
  - get_2d_sincos_pos_embed: LightningDiT/models/lightningdit.py:444-491
    (meshgrid with w first, per-axis halves concatenated [h | w], each half
    sin-first).
  - VisionRotaryEmbeddingFast: LightningDiT/models/pos_embed.py:96-135
    (freqs over half the head dim per spatial axis, each frequency repeated
    twice, h-axis frequencies then w-axis frequencies).

These are host-side precomputations (numpy) producing constants that get
baked into the jitted program.
"""
from __future__ import annotations

import numpy as np


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size², embed_dim) float32 table, row-major over (row, col)."""
    coords = np.arange(grid_size, dtype=np.float32)
    # meshgrid(w, h): grid[0][i, j] = j (col), grid[1][i, j] = i (row).
    grid_w, grid_h = np.meshgrid(coords, coords)
    emb_h = _sincos_1d(embed_dim // 2, grid_w)  # matches reference grid[0]
    emb_w = _sincos_1d(embed_dim // 2, grid_h)  # matches reference grid[1]
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def rope_2d_freqs(
    head_dim: int, grid_size: int, theta: float = 10000.0
) -> tuple[np.ndarray, np.ndarray]:
    """Axial 2-D rotary tables: (cos, sin), each (grid_size², head_dim).

    Per spatial axis, ``head_dim // 2`` rotary features built from
    ``head_dim // 4`` base frequencies, each repeated twice (pairs rotate
    together); position (i, j) gets [h-features(i) | w-features(j)].
    """
    dim = head_dim // 2  # rotary dim per spatial axis
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    t = np.arange(grid_size, dtype=np.float32)
    f = np.einsum("n,f->nf", t, freqs)  # (S, dim//2)
    f = np.repeat(f, 2, axis=-1)  # (S, dim)
    # broadcast h-axis then w-axis features over the grid
    fh = np.broadcast_to(f[:, None, :], (grid_size, grid_size, dim))
    fw = np.broadcast_to(f[None, :, :], (grid_size, grid_size, dim))
    full = np.concatenate([fh, fw], axis=-1).reshape(grid_size * grid_size, 2 * dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)
