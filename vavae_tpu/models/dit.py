"""LightningDiT — the diffusion transformer, TPU-native.

Parity target: LightningDiT/models/lightningdit.py:275-538 (patchify →
adaLN-modulated pre-norm blocks → final layer → unpatchify; CFG forward with
the duplicate-half trick). Differences by design:

  - NHWC layout throughout (TPU conv/matmul native layout); the reference is
    NCHW.
  - Patchify is reshape+Dense instead of Conv (identical math for
    non-overlapping patches; flattening order (p, p, C) matches the torch
    conv kernel layout for weight-conversion parity).
  - The block stack runs under ``nn.scan`` (one compiled block body scanned
    over stacked per-depth params) with optional ``nn.remat`` — the XLA
    equivalent of per-block activation checkpointing
    (reference lightningdit.py:409).
  - CFG on all channels is the default; the reference's 3-channel quirk
    (lightningdit.py:430-432) is available via ``cfg_channels=3`` for exact
    reproduction.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vavae_tpu.models.layers import (
    Attention,
    LabelEmbedder,
    LayerNormNoAffine,
    Mlp,
    RMSNorm,
    SwiGLUFFN,
    TimestepEmbedder,
    modulate,
)
from vavae_tpu.models.posembed import get_2d_sincos_pos_embed, rope_2d_freqs

Dtype = jnp.dtype

_zeros = nn.initializers.zeros
_xavier = nn.initializers.xavier_uniform()


class PatchEmbed(nn.Module):
    """Non-overlapping patchify + linear projection (NHWC in, tokens out)."""

    patch_size: int
    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = x.reshape(B, h, p, w, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, h * w, p * p * C)
        # xavier over the flattened kernel, zero bias (lightningdit.py:354-357)
        return nn.Dense(
            self.hidden_size,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="proj",
        )(x)


class DiTBlock(nn.Module):
    """Pre-norm attention + FFN with 6-way (or 4-way wo_shift) adaLN gating."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_qknorm: bool = False
    use_swiglu: bool = False
    use_rmsnorm: bool = False
    wo_shift: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        c: jax.Array,
        rope: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        norm = (
            (lambda name: RMSNorm(self.hidden_size, dtype=self.dtype, name=name))
            if self.use_rmsnorm
            else (lambda name: LayerNormNoAffine(dtype=self.dtype, name=name))
        )
        n_mod = 4 if self.wo_shift else 6
        mod = nn.Dense(
            n_mod * self.hidden_size,
            kernel_init=_zeros,
            bias_init=_zeros,
            dtype=self.dtype,
            name="adaLN",
        )(nn.silu(c))
        if self.wo_shift:
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)
            shift_msa = shift_mlp = None
        else:
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
                mod, 6, axis=-1
            )

        attn = Attention(
            self.hidden_size,
            self.num_heads,
            qk_norm=self.use_qknorm,
            use_rmsnorm=self.use_rmsnorm,
            dtype=self.dtype,
            name="attn",
        )
        x = x + gate_msa[:, None, :] * attn(
            modulate(norm("norm1")(x), shift_msa, scale_msa), rope=rope
        )

        mlp_hidden = int(self.hidden_size * self.mlp_ratio)
        if self.use_swiglu:
            ffn = SwiGLUFFN(
                int(2 / 3 * mlp_hidden), self.hidden_size, dtype=self.dtype, name="mlp"
            )
        else:
            ffn = Mlp(mlp_hidden, self.hidden_size, dtype=self.dtype, name="mlp")
        x = x + gate_mlp[:, None, :] * ffn(
            modulate(norm("norm2")(x), shift_mlp, scale_mlp)
        )
        return x


class FinalLayer(nn.Module):
    hidden_size: int
    patch_size: int
    out_channels: int
    use_rmsnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = nn.Dense(
            2 * self.hidden_size,
            kernel_init=_zeros,
            bias_init=_zeros,
            dtype=self.dtype,
            name="adaLN",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        if self.use_rmsnorm:
            h = RMSNorm(self.hidden_size, dtype=self.dtype, name="norm_final")(x)
        else:
            h = LayerNormNoAffine(dtype=self.dtype, name="norm_final")(x)
        h = modulate(h, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=_zeros,
            bias_init=_zeros,
            dtype=self.dtype,
            name="linear",
        )(h)


class _BlockScanBody(nn.Module):
    """Scan body: one DiT block applied to the carried token stream.

    Running the depth dimension as a ``lax.scan`` over stacked params gives a
    single compiled block body (fast compiles at depth 28+) and composes with
    ``nn.remat`` for activation checkpointing — the XLA-native equivalent of
    the reference's per-block torch.utils.checkpoint (lightningdit.py:409).
    """

    block_kw: Any
    remat: bool = False
    remat_policy: str = "nothing"

    @nn.compact
    def __call__(self, x, c, rope):
        if self.remat and self.remat_policy not in _REMAT_POLICIES:
            raise ValueError(
                f"checkpoint_policy={self.remat_policy!r}: expected one of "
                f"{sorted(_REMAT_POLICIES)}"
            )
        cls = (
            nn.remat(DiTBlock, policy=_REMAT_POLICIES[self.remat_policy])
            if self.remat
            else DiTBlock
        )
        x = cls(**self.block_kw, name="block")(x, c, rope)
        return x, None


# remat policy per block under nn.scan: "nothing" recomputes the whole block
# in the backward (min memory, +1 fwd of FLOPs); "dots" saves matmul outputs
# and recomputes only the elementwise ops between them (most of the speed of
# no-remat at a fraction of its memory)
_REMAT_POLICIES = {
    "nothing": jax.checkpoint_policies.nothing_saveable,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


class LightningDiT(nn.Module):
    """Diffusion transformer over NHWC latents.

    __call__(x, t, y): x (B, H, W, C) latents, t (B,) in [0, 1], y (B,) int
    labels → predicted velocity field (B, H, W, C).
    """

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 32
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    use_qknorm: bool = False
    use_swiglu: bool = False
    use_rope: bool = False
    use_rmsnorm: bool = False
    wo_shift: bool = False
    use_checkpoint: bool = False  # remat each block under nn.scan
    checkpoint_policy: str = "nothing"  # see _REMAT_POLICIES
    scan_blocks: bool = True
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def _rope(self) -> Optional[tuple[jax.Array, jax.Array]]:
        if not self.use_rope:
            return None
        head_dim = self.hidden_size // self.num_heads
        grid = self.input_size // self.patch_size
        cos, sin = rope_2d_freqs(head_dim, grid)
        return jnp.asarray(cos), jnp.asarray(sin)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        y: jax.Array,
        train: bool = False,
        force_drop_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, H, W, C = x.shape
        grid = self.input_size // self.patch_size
        num_patches = grid * grid

        x = PatchEmbed(self.patch_size, self.hidden_size, dtype=self.dtype, name="x_embedder")(x)
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.hidden_size, grid))
        x = x + pos[None].astype(x.dtype)

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype, name="t_embedder")(t)
        y_emb = LabelEmbedder(
            self.num_classes,
            self.hidden_size,
            self.class_dropout_prob,
            dtype=self.dtype,
            name="y_embedder",
        )(y, train=train, force_drop_ids=force_drop_ids)
        c = t_emb + y_emb

        rope = self._rope()
        block_kw = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            use_qknorm=self.use_qknorm,
            use_swiglu=self.use_swiglu,
            use_rmsnorm=self.use_rmsnorm,
            wo_shift=self.wo_shift,
            dtype=self.dtype,
        )

        if self.scan_blocks:
            stack = nn.scan(
                _BlockScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.depth,
            )(
                block_kw=block_kw,
                remat=self.use_checkpoint,
                remat_policy=self.checkpoint_policy,
                name="blocks",
            )
            x, _ = stack(x, c, rope)
        else:
            for i in range(self.depth):
                x = DiTBlock(**block_kw, name=f"block_{i}")(x, c, rope)

        x = FinalLayer(
            self.hidden_size,
            self.patch_size,
            self.out_channels,
            use_rmsnorm=self.use_rmsnorm,
            dtype=self.dtype,
            name="final_layer",
        )(x, c)

        x = self._unpatchify(x)
        if self.learn_sigma:
            x = x[..., : self.in_channels]
        return x

    def _unpatchify(self, x: jax.Array) -> jax.Array:
        """Tokens (B, N, p²·c) → NHWC (B, H, W, c); matches the reference's
        nhwpqc->nchpwq layout (lightningdit.py:376-389) transposed to NHWC."""
        B, N, _ = x.shape
        p = self.patch_size
        c = self.out_channels
        h = w = int(N**0.5)
        x = x.reshape(B, h, w, p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h, p, w, q, c)
        return x.reshape(B, h * p, w * p, c)

    def forward_with_cfg(
        self,
        params: Any,
        x: jax.Array,
        t: jax.Array,
        y: jax.Array,
        cfg_scale: float,
        cfg_interval: bool = False,
        cfg_interval_start: float = 0.0,
        cfg_channels: Optional[int] = None,
    ) -> jax.Array:
        """Batched CFG forward (reference lightningdit.py:420-442).

        ``x`` holds [cond | uncond] halves with identical latents; ``y`` holds
        [labels | null]. ``cfg_channels`` limits guidance to the first k
        channels (reference default 3 — kept only as a compat option; None
        applies guidance to all channels, the sane default).
        """
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply({"params": params}, combined, t, y)
        k = cfg_channels if cfg_channels is not None else out.shape[-1]
        eps, rest = out[..., :k], out[..., k:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        if cfg_interval:
            # below the interval start, fall back to the conditional output
            guided = jnp.where(t[0] < cfg_interval_start, cond_eps, guided)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


# -- registry (reference lightningdit.py:498-538) ---------------------------

_VARIANTS = {
    "S": dict(depth=12, hidden_size=384, num_heads=6),
    "B": dict(depth=12, hidden_size=768, num_heads=12),
    "L": dict(depth=24, hidden_size=1024, num_heads=16),
    "XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "1p0B": dict(depth=24, hidden_size=1536, num_heads=24),
    "1p6B": dict(depth=28, hidden_size=1792, num_heads=28),
}


def _make_ctor(size: str, patch: int) -> Callable[..., LightningDiT]:
    def ctor(**kw: Any) -> LightningDiT:
        return LightningDiT(patch_size=patch, **_VARIANTS[size], **kw)

    return ctor


LightningDiT_models = {
    f"LightningDiT-{size}/{patch}": _make_ctor(size, patch)
    for size in _VARIANTS
    for patch in (1, 2)
    if not (size == "L" and patch == 1)  # reference registry has no L/1
}


def create_dit(model_cfg: Any, latent_size: int, num_classes: int) -> LightningDiT:
    """Build a DiT from a reference-format config dict (train.py:78-90 keys)."""
    g = model_cfg.get
    return LightningDiT_models[model_cfg["model_type"]](
        input_size=latent_size,
        num_classes=num_classes,
        use_qknorm=g("use_qknorm", False),
        use_swiglu=g("use_swiglu", False),
        use_rope=g("use_rope", False),
        use_rmsnorm=g("use_rmsnorm", False),
        wo_shift=g("wo_shift", False),
        in_channels=g("in_chans", 4),
        use_checkpoint=g("use_checkpoint", False),
        checkpoint_policy=g("checkpoint_policy", "nothing"),
        class_dropout_prob=g("class_dropout_prob", 0.1),
        dtype=jnp.bfloat16 if g("bf16", False) else jnp.float32,
    )
