"""Attention compute op with a swappable backend.

The reference uses torch SDPA (LightningDiT/models/lightningdit.py:77), a
fused CUDA kernel. On TPU the sequence lengths in this framework are short
(256-1024 patch tokens), where XLA's fused dot-general attention is already
near roofline; a Pallas flash-attention kernel (ops/pallas/flash_attention.py)
takes over for long sequences / when explicitly enabled.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Sequences at least this long route to the Pallas flash kernel on TPU.
_FLASH_MIN_SEQ = int(os.environ.get("VAVAE_FLASH_MIN_SEQ", "1024"))


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain softmax attention via einsum; XLA fuses this well at short N.

    q, k, v: (B, N, H, D) -> (B, N, H, D). Softmax in fp32 for stability.
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.named_call, name="attention")
def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatch to Pallas flash attention for long sequences on TPU."""
    n = q.shape[1]
    if n >= _FLASH_MIN_SEQ and jax.default_backend() == "tpu":
        try:
            from vavae_tpu.ops.pallas.flash_attention import flash_attention

            return flash_attention(q, k, v)
        except Exception:  # pragma: no cover - fall back if kernel unavailable
            pass
    return _xla_attention(q, k, v)
