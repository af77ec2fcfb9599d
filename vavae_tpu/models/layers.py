"""Core DiT layers: RMSNorm, adaLN modulate, SwiGLU/Mlp FFNs, timestep/label
embedders, multi-head attention with optional QK-norm and 2-D RoPE.

Behavioral parity targets (reference heimaoqqq/VA-VAE):
  - modulate:            LightningDiT/models/lightningdit.py:26-30
  - Attention:           LightningDiT/models/lightningdit.py:32-91
  - TimestepEmbedder:    LightningDiT/models/lightningdit.py:94-137
  - LabelEmbedder:       LightningDiT/models/lightningdit.py:140-169
  - RMSNorm:             LightningDiT/models/rmsnorm.py:34-77
  - SwiGLUFFN:           LightningDiT/models/swiglu_ffn.py:15-36

TPU-first notes: everything here is shape-static and fuses under jit; the
attention inner op is delegated to ops/attention.py so the XLA path can be
swapped for a Pallas flash-attention kernel without touching the model.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vavae_tpu.ops.attention import dot_product_attention


def _natural_attention_enabled() -> bool:
    """Fused-qkv natural-layout attention (default on; VAVAE_ATTN_NATURAL=0
    restores the slice + padded-layout path for A/B comparison)."""
    import os

    return os.environ.get("VAVAE_ATTN_NATURAL", "1") != "0"

Dtype = jnp.dtype


def modulate(x: jax.Array, shift: Optional[jax.Array], scale: jax.Array) -> jax.Array:
    """adaLN modulation: x * (1 + scale) [+ shift], broadcasting over tokens."""
    out = x * (1.0 + scale[:, None, :])
    if shift is not None:
        out = out + shift[:, None, :]
    return out


class RMSNorm(nn.Module):
    """Llama-style RMSNorm: normalize in fp32, rescale by a learned weight."""

    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed.astype(x.dtype) * weight.astype(x.dtype)).astype(self.dtype)


class LayerNormNoAffine(nn.Module):
    """LayerNorm(elementwise_affine=False, eps=1e-6) as used in DiT blocks."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)


class Mlp(nn.Module):
    """Plain 2-layer MLP with tanh-approx GELU (timm Mlp equivalent)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class SwiGLUFFN(nn.Module):
    """SwiGLU FFN with a fused gate/up projection (w12) and down proj (w3)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x12 = nn.Dense(2 * self.hidden_dim, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="w3")(nn.silu(x1) * x2)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal features, cos-first ordering (reference lightningdit.py:111-131)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_embed_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        h = timestep_embedding(t, self.freq_embed_size).astype(self.dtype)
        init = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=init, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=init, name="fc2")(h)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout to an extra null class."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        labels: jax.Array,
        train: bool = False,
        force_drop_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        use_cfg = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg),
            self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
            name="table",
        )
        if force_drop_ids is not None:
            labels = jnp.where(force_drop_ids == 1, self.num_classes, labels)
        elif train and use_cfg:
            rng = self.make_rng("label_dropout")
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


def rotate_half(x: jax.Array) -> jax.Array:
    """Rotation partner in SPLIT-HALF RoPE layout: (x1 | x2) -> (-x2 | x1).

    One contiguous half-swap on the lane dim instead of the reference's
    per-pair interleave (a lane shuffle XLA can't fuse away; see
    posembed.rope_2d_freqs for the layout equivalence)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, freqs_cos: jax.Array, freqs_sin: jax.Array) -> jax.Array:
    """x: (..., N, head_dim); freqs: (N, head_dim)."""
    return x * freqs_cos + rotate_half(x) * freqs_sin


class Attention(nn.Module):
    """Multi-head attention with qkv bias, optional QK-norm and 2-D RoPE."""

    dim: int
    num_heads: int
    qk_norm: bool = False
    use_rmsnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rope: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)

        if not self.qk_norm and _natural_attention_enabled():
            # hot path: attention straight off the fused qkv tensor — no
            # per-tensor slice/pad/transpose fusions (see ops/pallas)
            from vavae_tpu.ops.pallas.flash_attention import fused_qkv_attention

            out = fused_qkv_attention(qkv, rope=rope)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
                out.reshape(B, N, C)
            )

        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

        if self.qk_norm:
            norm_cls = RMSNorm if self.use_rmsnorm else None
            if norm_cls is not None:
                q = RMSNorm(head_dim, dtype=self.dtype, name="q_norm")(q)
                k = RMSNorm(head_dim, dtype=self.dtype, name="k_norm")(k)
            else:
                q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
                k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)

        # RoPE is delegated to the attention op: on the Pallas path the
        # rotation runs inside the kernel (saves the XLA elementwise passes)
        out = dot_product_attention(q, k, v, rope=rope)  # (B, N, H, D)
        out = out.reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
