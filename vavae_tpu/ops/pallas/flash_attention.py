"""Pallas TPU attention kernels (non-causal, full bidirectional).

Replaces the reference's torch SDPA CUDA kernel (lightningdit.py:77).

Two regimes:
  - **Short sequences** (DiT latents: 256-1024 patch tokens) —
    ``_attn_kernel_small``: one grid step handles G whole (N, D) heads with a
    plain (not online) softmax entirely in VMEM. XLA's unfused attention at
    these shapes materializes the (B, H, N, N) fp32 logits tensor in HBM
    (134 MB for XL/1 at batch 32) and runs ~1.9 ms per layer; this kernel
    keeps everything on-chip. Batching G heads per program amortizes the
    per-program overhead that dominates tiny grids, and the matmuls feed the
    MXU bf16 operands (casting to fp32 first would run the MXU at 1/8 rate).
    Optionally applies split-half RoPE to q,k inside the kernel (saves the
    XLA-side elementwise passes — measured ~5 ms/fwd on XL/1).
  - **Long sequences** — ``_flash_kernel``: classic online-softmax flash
    attention, k/v streamed block-by-block with running max/sum in fp32.

Head dims that aren't lane-aligned (XL's 1152/16 = 72) are zero-padded to
128; for the RoPE path each split half is padded independently to Dp/2 so
the rotation stays a lane-aligned half-swap. Zero columns contribute
nothing to q·kᵀ or to the output columns we slice back out.

Training: ``flash_attention`` carries a custom VJP whose backward pass is
the straightforward XLA attention backward (exact, recompute-based) — the
forward kernel stays usable under ``jax.grad``/``nn.remat``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
# max tokens per head for the single-softmax VMEM-resident kernel
SMALL_SEQ_MAX = 1024


def _rot_half(x):
    """Split-half rotation partner on the (lane-aligned) padded layout."""
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _attn_kernel_small(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """G heads per program, full (N, N) softmax in VMEM.

    q/k/v/o refs: (G, N, Dp) in the input dtype (bf16 on the hot path)."""
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    dn = (((2,), (2,)), ((0,), (0,)))  # contract D, batch G
    s = jax.lax.dot_general(q, k, dn, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    dn2 = (((2,), (1,)), ((0,), (0,)))  # contract N_k, batch G
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dn2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _attn_kernel_small_rope(
    q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale: float
):
    """Same as _attn_kernel_small but applies RoPE to q,k on-chip.

    cos/sin refs: (N, Dp) in padded-half layout (pad lanes carry sin=0 so
    rotated padding stays zero)."""
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    cos = cos_ref[...][None].astype(q.dtype)
    sin = sin_ref[...][None].astype(q.dtype)
    q = q * cos + _rot_half(q) * sin
    k = k * cos + _rot_half(k) * sin
    dn = (((2,), (2,)), ((0,), (0,)))
    s = jax.lax.dot_general(q, k, dn, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    dn2 = (((2,), (1,)), ((0,), (0,)))
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dn2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _attn_bwd_kernel_small(
    q_ref, k_ref, v_ref, g_ref, cos_ref, sin_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, use_rope: bool,
):
    """Backward for the small-sequence kernel, fully VMEM-resident.

    Recomputes p = softmax(q·kᵀ·scale) (flash style — nothing saved from the
    forward beyond q,k,v), then
        dv = pᵀ g ;  dp = g vᵀ ;  ds = p ∘ (dp − Σ_k dp∘p) · scale
        dq̃ = ds k̃ ;  dk̃ = dsᵀ q̃
    and pulls dq̃, dk̃ back through the RoPE rotation (Rᵀ cotangent).
    """
    q, k, v, g = q_ref[...], k_ref[...], v_ref[...], g_ref[...]
    if use_rope:
        cos = cos_ref[...][None].astype(q.dtype)
        sin = sin_ref[...][None].astype(q.dtype)
        q = q * cos + _rot_half(q) * sin
        k = k * cos + _rot_half(k) * sin

    dn_dd = (((2,), (2,)), ((0,), (0,)))   # contract D with D, batch G
    dn_nn = (((1,), (1,)), ((0,), (0,)))   # contract N_q with N_q, batch G
    dn_nk = (((2,), (1,)), ((0,), (0,)))   # contract N_k, batch G

    s = jax.lax.dot_general(
        q, k, dn_dd, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (G, Nq, Nk) f32

    pb = p.astype(v.dtype)
    # dv[G,Nk,D] = Σ_q p[G,q,k] g[G,q,D]
    dv = jax.lax.dot_general(
        pb, g, dn_nn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # dp[G,Nq,Nk] = Σ_D g[G,q,D] v[G,k,D]
    dp = jax.lax.dot_general(
        g, v, dn_dd, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dsb = ds.astype(q.dtype)
    # dq[G,Nq,D] = Σ_k ds[G,q,k] k[G,k,D]
    dq = jax.lax.dot_general(
        dsb, k, dn_nk, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # dk[G,Nk,D] = Σ_q ds[G,q,k] q[G,q,D]
    dk = jax.lax.dot_general(
        dsb, q, dn_nn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if use_rope:
        cosf = cos_ref[...][None]
        sinf = sin_ref[...][None]

        def rot_t(y):  # transpose of the split-half rotation
            half = y.shape[-1] // 2
            return jnp.concatenate([y[..., half:], -y[..., :half]], axis=-1)

        dq = dq * cosf + rot_t(dq * sinf)
        dk = dk * cosf + rot_t(dk * sinf)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    # q_ref: (1, block_q, d); k_ref/v_ref: (1, kv_len, d); o_ref: (1, block_q, d)
    _, block_q, d = q_ref.shape
    q = q_ref[0]  # keep bf16: MXU runs bf16×bf16→f32 at full rate

    num_kv = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale  # (block_q, block_k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


# -- natural-layout kernel (zero pad/slice ops) ------------------------------
#
# The padded (BH, N, 128) layout above costs ~9 ms/XL-forward in XLA copies:
# per layer, 3 slice+transpose+pad fusions in (~28 MB read, 50 MB written)
# and a slice+transpose out. The kernels below instead read the FUSED qkv
# tensor after a single XLA transpose to (B, 3, H, N, D): each program DMAs
# one contiguous (3, Gh, N, D) block (q,k,v for Gh heads), no padding (a
# block whose trailing dim equals the full array dim is legal at any size —
# Mosaic masks the lane pad internally), and RoPE runs in-kernel as a
# lane roll: rot_half(x) == roll(x, D/2) * sign, with sign folded into the
# sin table. Measured (v5e, XL/1): fwd B=32 57.6 ms vs 62.7 padded; train
# step B=16 134 vs 142 ms; CFG sampling 1.43 vs 1.34 samples/s/chip. The
# backward writes dq,dk,dv into ONE (B,3,H,N,D) output block, so training
# avoids the stack copy too. (Tried and rejected instead: in-kernel
# swapaxes from natural (B,N,H,D) blocks — Mosaic VMEM transposes cost
# more than the XLA copies they replace.)


def _nat_fwd_kernel(qkv_ref, cos_ref, sin_ref, o_ref, *, scale: float, use_rope: bool):
    """qkv_ref: (1, 3, Gh, N, D); o_ref: (1, Gh, N, D)."""
    q, k, v = qkv_ref[0, 0], qkv_ref[0, 1], qkv_ref[0, 2]  # (Gh, N, D)
    if use_rope:
        d = q.shape[-1]
        cos = cos_ref[...][None].astype(q.dtype)
        sinf = sin_ref[...][None].astype(q.dtype)
        q = q * cos + jnp.roll(q, d // 2, axis=-1) * sinf
        k = k * cos + jnp.roll(k, d // 2, axis=-1) * sinf
    dn = (((2,), (2,)), ((0,), (0,)))
    s = jax.lax.dot_general(
        q, k, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    dn2 = (((2,), (1,)), ((0,), (0,)))
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dn2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _nat_bwd_kernel(
    qkv_ref, g_ref, cos_ref, sin_ref, dqkv_ref, *, scale: float, use_rope: bool
):
    """qkv_ref: (1, 3, Gh, N, D); g_ref: (1, Gh, N, D); dqkv_ref like qkv_ref.

    Flash-style recompute backward; RoPE cotangent uses the transpose
    rotation Rᵀ(g) = g∘cos + roll(g∘sin', D/2) (roll by D/2 is self-inverse).
    """
    q, k, v = qkv_ref[0, 0], qkv_ref[0, 1], qkv_ref[0, 2]
    g = g_ref[0]
    d = q.shape[-1]
    if use_rope:
        cos = cos_ref[...][None].astype(q.dtype)
        sinf = sin_ref[...][None].astype(q.dtype)
        q = q * cos + jnp.roll(q, d // 2, axis=-1) * sinf
        k = k * cos + jnp.roll(k, d // 2, axis=-1) * sinf

    dn_dd = (((2,), (2,)), ((0,), (0,)))   # contract D with D, batch Gh
    dn_nn = (((1,), (1,)), ((0,), (0,)))   # contract N_q with N_q, batch Gh
    dn_nk = (((2,), (1,)), ((0,), (0,)))   # contract N_k, batch Gh

    s = jax.lax.dot_general(
        q, k, dn_dd, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (Gh, Nq, Nk) f32

    pb = p.astype(v.dtype)
    dv = jax.lax.dot_general(
        pb, g, dn_nn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    dp = jax.lax.dot_general(
        g, v, dn_dd, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, dn_nk, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    dk = jax.lax.dot_general(
        dsb, q, dn_nn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if use_rope:
        cosf = cos_ref[...][None]
        sinf32 = sin_ref[...][None]
        dq = dq * cosf + jnp.roll(dq * sinf32, d // 2, axis=-1)
        dk = dk * cosf + jnp.roll(dk * sinf32, d // 2, axis=-1)
    dqkv_ref[0, 0] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[0, 1] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[0, 2] = dv.astype(dqkv_ref.dtype)


def _fold_sin(rope, n: int, d: int):
    """(cos, sin) split-half tables → (cos, sign-folded sin) as (N, D) f32."""
    cos, sin = rope
    cos = jnp.asarray(cos, jnp.float32)
    sin = jnp.asarray(sin, jnp.float32)
    sign = jnp.concatenate(
        [-jnp.ones(d // 2, jnp.float32), jnp.ones(d - d // 2, jnp.float32)]
    )
    return cos, sin * sign[None, :]


def _nat_group(h: int, n: int, d: int, bwd: bool, itemsize: int = 2) -> int:
    """Heads per program: largest divisor of H fitting the VMEM budget.

    ``itemsize`` is the q/k/v/out element size (bf16=2, fp32=4); the n×n
    score/probs blocks are always fp32. Sizing with the actual dtype keeps
    long-sequence fp32 runs inside VMEM instead of failing to compile."""
    budget = 8 * 1024 * 1024
    if bwd:
        per_head = 3 * n * n * 4 + 8 * n * d * itemsize
    else:
        per_head = 2 * n * n * 4 + 4 * n * d * itemsize
    g = max(1, min(16, budget // max(per_head, 1)))
    while g > 1 and h % g:
        g -= 1
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _natural_attention(qkv3: jax.Array, tables, use_rope: bool) -> jax.Array:
    """qkv3: (B, 3, H, N, D) → (B, H, N, D). tables: (cos, folded sin)."""
    return _nat_forward(qkv3, tables, use_rope)


def _nat_forward(qkv3, tables, use_rope):
    B, _, H, N, D = qkv3.shape
    scale = D ** -0.5
    Gh = _nat_group(H, N, D, bwd=False, itemsize=qkv3.dtype.itemsize)
    cos, sinf = tables
    qkv_spec = pl.BlockSpec(
        (1, 3, Gh, N, D), lambda b, h: (b, 0, h, 0, 0), memory_space=pltpu.VMEM
    )
    tspec = pl.BlockSpec((N, D), lambda b, h: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_nat_fwd_kernel, scale=scale, use_rope=use_rope),
        grid=(B, H // Gh),
        in_specs=[qkv_spec, tspec, tspec],
        out_specs=pl.BlockSpec(
            (1, Gh, N, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), qkv3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qkv3, cos, sinf)


def _nat_fwd_rule(qkv3, tables, use_rope):
    return _nat_forward(qkv3, tables, use_rope), (qkv3, tables)


def _nat_bwd_rule(use_rope, res, g):
    qkv3, tables = res
    B, _, H, N, D = qkv3.shape
    scale = D ** -0.5
    Gh = _nat_group(H, N, D, bwd=True, itemsize=qkv3.dtype.itemsize)
    cos, sinf = tables
    qkv_spec = pl.BlockSpec(
        (1, 3, Gh, N, D), lambda b, h: (b, 0, h, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, Gh, N, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    tspec = pl.BlockSpec((N, D), lambda b, h: (0, 0), memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_nat_bwd_kernel, scale=scale, use_rope=use_rope),
        grid=(B, H // Gh),
        in_specs=[qkv_spec, g_spec, tspec, tspec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, H, N, D), qkv3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qkv3, g, cos, sinf)
    dtables = jax.tree_util.tree_map(jnp.zeros_like, tables)
    return dqkv, dtables


_natural_attention.defvjp(_nat_fwd_rule, _nat_bwd_rule)


def fused_qkv_attention(qkv5: jax.Array, rope=None) -> jax.Array:
    """Attention straight off the fused qkv projection, natural layout.

    qkv5: (B, N, 3, H, D) — the free reshape of the qkv Dense output —
    → (B, N, H, D). On TPU this runs the zero-pad/zero-slice kernel (one
    input + one output transpose are the only XLA copies); elsewhere it
    falls back to the generic path.
    """
    from vavae_tpu.ops.attention import _FLASH_MIN_SEQ

    B, N, _, H, D = qkv5.shape
    # same routing threshold as dot_product_attention: DiT-scale sequences
    # only (tiny-N callers — CPU-mesh dryruns, smoke tests — stay on XLA)
    if (
        jax.default_backend() == "tpu"
        and _FLASH_MIN_SEQ <= N <= SMALL_SEQ_MAX
        and N % 8 == 0
        and D % 2 == 0
        and D <= 256
    ):
        use_rope = rope is not None
        if use_rope:
            tables = _fold_sin(rope, N, D)
        else:
            z = jnp.zeros((N, D), jnp.float32)
            tables = (z, z)
        qkv3 = qkv5.transpose(0, 2, 3, 1, 4)  # (B, 3, H, N, D): ONE copy
        out = _natural_attention(qkv3, tables, use_rope)
        return out.transpose(0, 2, 1, 3)  # (B, N, H, D): one copy back
    from vavae_tpu.ops.attention import dot_product_attention

    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    return dot_product_attention(q, k, v, rope=rope)


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_halves(x: jax.Array, dp: int) -> jax.Array:
    """(…, D) split-half vector → (…, dp) with EACH half padded to dp/2, so
    the RoPE half-swap stays lane-aligned after padding."""
    d = x.shape[-1]
    h = d // 2
    x = x.reshape(*x.shape[:-1], 2, h)
    x = _pad_to(x, x.ndim - 1, dp // 2)
    return x.reshape(*x.shape[:-2], dp)


def _heads_per_program(bh: int, n: int, dp: int, itemsize: int = 2) -> int:
    """Largest divisor of B·H (≤16) keeping the working set under VMEM.

    Measured on v5e (XL/1 shapes, BH=512, N=256, Dp=128): G=8 runs 0.93 ms
    vs 1.15 ms for XLA attention and 1.6 ms for G=4 — per-program overhead
    dominates small G, VMEM pressure caps large G. ``itemsize`` is the q/k/v
    element size (bf16=2, fp32=4) — sizing with 2 unconditionally would
    underestimate fp32 tiles 2× and overflow VMEM near N=SMALL_SEQ_MAX."""
    budget = 8 * 1024 * 1024  # bytes; leave room for double buffering
    per_head = 4 * n * dp * itemsize + 2 * n * n * 4  # q,k,v,o + s,p f32
    g = max(1, min(16, budget // max(per_head, 1)))
    while g > 1 and bh % g:
        g -= 1
    return g


def _forward(q, k, v, rope, block_q: int, block_k: int):
    B, N, H, D = q.shape
    scale = D**-0.5

    # layout: fold batch and heads into the grid's leading axis
    def to_bh(x, halves: bool):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return _pad_halves(x, 128) if halves else _pad_to(x, 2, 128)

    use_rope = rope is not None
    qb, kb = to_bh(q, use_rope), to_bh(k, use_rope)
    vb = to_bh(v, False)
    Dp = qb.shape[-1]
    BH = B * H

    if N <= SMALL_SEQ_MAX and N % 8 == 0:
        G = _heads_per_program(BH, N, Dp, itemsize=qb.dtype.itemsize)
        grid = (BH // G,)
        qspec = pl.BlockSpec((G, N, Dp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        if use_rope:
            cos, sin = rope  # (N, D) split-half tables
            cos_p = _pad_halves(jnp.asarray(cos), 128)
            sin_p = _pad_halves(jnp.asarray(sin), 128)  # pads are 0 → rotated pad stays 0
            tspec = pl.BlockSpec((N, Dp), lambda b: (0, 0), memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(_attn_kernel_small_rope, scale=scale),
                grid=grid,
                in_specs=[qspec, qspec, qspec, tspec, tspec],
                out_specs=qspec,
                out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                ),
            )(qb, kb, vb, cos_p, sin_p)
        else:
            out = pl.pallas_call(
                functools.partial(_attn_kernel_small, scale=scale),
                grid=grid,
                in_specs=[qspec, qspec, qspec],
                out_specs=qspec,
                out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                ),
            )(qb, kb, vb)
    else:
        if use_rope:
            # long-seq path applies RoPE outside (cold path in this framework)
            from vavae_tpu.models.layers import apply_rope

            cos, sin = rope
            return _forward(
                apply_rope(q, cos[None, :, None, :], sin[None, :, None, :]),
                apply_rope(k, cos[None, :, None, :], sin[None, :, None, :]),
                v, None, block_q, block_k,
            )
        kv_len = ((N + block_k - 1) // block_k) * block_k
        if kv_len != N:
            # un-aligned N is cold in this framework; exact XLA fallback
            from vavae_tpu.ops.attention import _xla_attention

            return _xla_attention(q, k, v)
        bq = min(block_q, N)
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel, scale=scale, block_k=min(block_k, N), kv_len=N
            ),
            grid=(BH, N // bq),
            in_specs=[
                pl.BlockSpec((1, bq, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(qb, kb, vb)

    out = out[:, :, :D].reshape(B, H, N, D)
    return jnp.swapaxes(out, 1, 2)


def _unpad_halves(x: jax.Array, d: int) -> jax.Array:
    """Inverse of _pad_halves: (…, dp) → (…, d)."""
    dp = x.shape[-1]
    h = d // 2
    x = x.reshape(*x.shape[:-1], 2, dp // 2)[..., :h]
    return x.reshape(*x.shape[:-2], d)


def _bwd_pallas(q, k, v, rope, g):
    """VMEM-resident backward (small-seq shapes): dq, dk, dv in one kernel."""
    B, N, H, D = q.shape
    scale = D**-0.5
    use_rope = rope is not None

    def to_bh(x, halves: bool):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        return _pad_halves(x, 128) if halves else _pad_to(x, 2, 128)

    qb, kb = to_bh(q, use_rope), to_bh(k, use_rope)
    vb, gb = to_bh(v, False), to_bh(g, False)
    Dp = qb.shape[-1]
    BH = B * H

    # bigger per-head VMEM footprint than forward: p/dp/ds f32 + 7 q/k/v-dtype
    # tiles (itemsize-scaled — fp32 doubles the estimate vs bf16)
    budget = 8 * 1024 * 1024
    per_head = 3 * N * N * 4 + 7 * N * Dp * qb.dtype.itemsize
    G = max(1, min(16, budget // max(per_head, 1)))
    while G > 1 and BH % G:
        G -= 1

    if use_rope:
        cos, sin = rope
        cos_p = _pad_halves(jnp.asarray(cos, jnp.float32), 128)
        sin_p = _pad_halves(jnp.asarray(sin, jnp.float32), 128)
    else:
        cos_p = jnp.ones((N, Dp), jnp.float32)
        sin_p = jnp.zeros((N, Dp), jnp.float32)

    spec = pl.BlockSpec((G, N, Dp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((N, Dp), lambda b: (0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_small, scale=scale, use_rope=use_rope),
        grid=(BH // G,),
        in_specs=[spec, spec, spec, spec, tspec, tspec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((BH, N, Dp), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(qb, kb, vb, gb, cos_p, sin_p)

    def from_bh(x, halves: bool):
        x = _unpad_halves(x, D) if halves else x[..., :D]
        return jnp.swapaxes(x.reshape(B, H, N, D), 1, 2)

    return from_bh(dq, use_rope), from_bh(dk, use_rope), from_bh(dv, False)


def _xla_rope_attention(q, k, v, rope):
    """Exact reference computation used for the backward pass."""
    from vavae_tpu.models.layers import apply_rope
    from vavae_tpu.ops.attention import _xla_attention

    if rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos[None, :, None, :].astype(q.dtype),
                       sin[None, :, None, :].astype(q.dtype))
        k = apply_rope(k, cos[None, :, None, :].astype(k.dtype),
                       sin[None, :, None, :].astype(k.dtype))
    return _xla_attention(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rope=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """q, k, v: (B, N, H, D) → (B, N, H, D). Softmax scale = D^-0.5 on the
    TRUE head dim (before padding). ``rope``: optional (cos, sin) split-half
    tables of shape (N, D), applied to q,k inside the kernel.
    Differentiable (exact XLA backward)."""
    return _forward(q, k, v, rope, block_q, block_k)


def _fwd(q, k, v, rope, block_q, block_k):
    return _forward(q, k, v, rope, block_q, block_k), (q, k, v, rope)


def _bwd(block_q, block_k, res, g):
    q, k, v, rope = res
    N = q.shape[1]
    if N <= SMALL_SEQ_MAX and N % 8 == 0:
        dq, dk, dv = _bwd_pallas(q, k, v, rope, g)
    else:
        _, vjp = jax.vjp(lambda q, k, v: _xla_rope_attention(q, k, v, rope), q, k, v)
        dq, dk, dv = vjp(g)
    drope = (
        None
        if rope is None
        else jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), rope)
    )
    return dq, dk, dv, drope


flash_attention.defvjp(_fwd, _bwd)
