"""Pallas TPU flash attention (non-causal, full bidirectional).

Replaces the reference's torch SDPA CUDA kernel (lightningdit.py:77) for
long sequences. Online-softmax tiling: grid over (batch·heads, q-blocks),
k/v streamed block-by-block through VMEM with running max/sum in fp32.

Head dims that aren't lane-aligned (e.g. XL's 1152/16 = 72) are zero-padded
to 128 outside the kernel; padding contributes nothing to q·kᵀ or to the
output columns we slice back out.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    # q_ref: (1, block_q, d); k_ref/v_ref: (1, kv_len, d); o_ref: (1, block_q, d)
    _, block_q, d = q_ref.shape
    q = q_ref[0].astype(jnp.float32) * scale

    num_kv = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """q, k, v: (B, N, H, D) → (B, N, H, D). Softmax scale = D^-0.5 on the
    TRUE head dim (before padding)."""
    B, N, H, D = q.shape
    scale = D**-0.5

    # layout: fold batch and heads into the grid's leading axis
    def to_bh(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        x = _pad_to(x, 2, 128)     # lane-align head dim
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    kv_len = ((N + block_k - 1) // block_k) * block_k
    if kv_len != N:
        # pad kv with -inf-free zeros and mask via an additive trick: zero
        # keys give logits 0 which still participate — instead pad keys with
        # a large negative bias by padding q·k through value masking. For the
        # shapes this framework uses (N multiple of 256) this path is cold;
        # fall back to XLA attention for un-aligned N.
        from vavae_tpu.ops.attention import _xla_attention

        return _xla_attention(q, k, v)
    bq = min(block_q, N)

    Dp = qb.shape[-1]
    grid = (B * H, N // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=min(block_k, N), kv_len=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, Dp), q.dtype),
    )(qb, kb, vb)

    out = out[:, :, :D].reshape(B, H, N, D)
    return jnp.swapaxes(out, 1, 2)
