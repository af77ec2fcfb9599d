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
    """Axial 2-D rotary tables: (cos, sin), each (grid_size², head_dim),
    in SPLIT-HALF layout.

    The reference (pos_embed.py:96-135) rotates interleaved pairs
    (2i, 2i+1). On TPU that interleave is a per-pair lane shuffle on the
    minor (lane) dimension — measured at ~17% of the whole DiT-XL forward.
    We instead rotate pairs (i, i + D/2): a single contiguous half-swap.
    The two layouts are related by a fixed permutation π of the head dim
    (π(2i)=i, π(2i+1)=D/2+i); since q·kᵀ is invariant to any permutation
    applied to BOTH q and k, permuting the q,k projection columns by π at
    weight-conversion time (utils/torch_convert.py rope_permutation) makes
    attention outputs bit-identical to the reference.

    Per spatial axis, ``head_dim // 2`` rotary features built from
    ``head_dim // 4`` base frequencies; position (i, j) gets
    [h-features(i) | w-features(j)], then the global π reordering.
    """
    dim = head_dim // 2  # rotary dim per spatial axis
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    t = np.arange(grid_size, dtype=np.float32)
    f = np.einsum("n,f->nf", t, freqs)  # (S, dim//2)
    f = np.repeat(f, 2, axis=-1)  # (S, dim) — interleaved pair angles
    # broadcast h-axis then w-axis features over the grid
    fh = np.broadcast_to(f[:, None, :], (grid_size, grid_size, dim))
    fw = np.broadcast_to(f[None, :, :], (grid_size, grid_size, dim))
    full = np.concatenate([fh, fw], axis=-1).reshape(grid_size * grid_size, 2 * dim)
    # split-half layout: angle of pair j lands at positions j and D/2+j
    half = full[:, ::2]  # one angle per pair
    split = np.concatenate([half, half], axis=-1)
    return np.cos(split).astype(np.float32), np.sin(split).astype(np.float32)


def rope_permutation(head_dim: int) -> np.ndarray:
    """π mapping interleaved RoPE layout to split-half layout: the value at
    interleaved index 2i (resp. 2i+1) moves to split index i (resp. D/2+i).
    Returned as an index array ``perm`` with split[k] = interleaved[perm[k]]."""
    idx = np.arange(head_dim)
    return np.concatenate([idx[0::2], idx[1::2]])
