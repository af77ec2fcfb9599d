"""Convolutional VAE tokenizer (LDM AutoencoderKL), TPU-native NHWC.

Parity target: LightningDiT/tokenizer/autoencoder.py:10-499 — GroupNorm(32,
eps 1e-6) + swish ResNet blocks, single-head spatial attention at the listed
feature resolutions, asymmetric-padded stride-2 downsample, nearest ×2
upsample, DiagonalGaussianDistribution with logvar clamped to [-30, 20],
quant/post-quant 1×1 convs. The f16d32 config is ch=128,
ch_mult=(1,1,2,2,4), 2 res-blocks, attn at resolution 16, z_channels=32
(tokenizer/configs/vavae_f16d32.yaml).

TPU-first: NHWC layout, convs via flax nn.Conv (lax.conv_general_dilated →
MXU), attention via a batched einsum (spatial attn only runs at 16×16 where
N=256). Compute dtype configurable (bf16 for inference paths).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype, name="norm")(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over the (H·W) grid."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (C ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with the LDM asymmetric (right/bottom) zero pad."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(C, (3, 3), strides=2, padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest ×2 upsample + 3×3 conv."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 16
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        num_levels = len(self.ch_mult)
        for i_level in range(num_levels):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_out, dtype=self.dtype, name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)

        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)

        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)

        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_out, dtype=self.dtype, name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiagonalGaussian:
    """Posterior N(mean, exp(logvar)) with channel-last moments.

    Parity: tokenizer/autoencoder.py:401-449 (logvar clamp [-30, 20];
    kl/nll summed over spatial+channel dims).
    """

    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, moments: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + var - 1.0 - self.logvar, axis=(1, 2, 3)
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        logtwopi = jnp.log(2.0 * jnp.pi)
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / var, axis=(1, 2, 3)
        )


class AutoencoderKL(nn.Module):
    """f16 conv VAE: encode → DiagonalGaussian over z; decode z → image.

    ``model_type='marvae'`` drops the decoder attention blocks
    (tokenizer/autoencoder.py:457-459).
    """

    embed_dim: int = 32
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    resolution: int = 256
    use_variational: bool = True
    model_type: str = "vavae"
    # Full ddconfig surface (ldm/models/autoencoder.py builds Encoder/Decoder
    # straight from **ddconfig): None means the legacy f16d32 behavior
    # (2 res-blocks, attn at 16 — decoder attn gated by model_type,
    # z_channels == embed_dim) so existing checkpoints restore unchanged.
    num_res_blocks: int = 2
    attn_resolutions: Optional[Sequence[int]] = None
    z_channels: Optional[int] = None
    out_ch: int = 3
    double_z: bool = True
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        z_ch = self.embed_dim if self.z_channels is None else self.z_channels
        enc_attn = (16,) if self.attn_resolutions is None else tuple(self.attn_resolutions)
        if self.attn_resolutions is None:
            dec_attn = (16,) if self.model_type == "vavae" else ()
        else:
            dec_attn = () if self.model_type == "marvae" else tuple(self.attn_resolutions)
        self.encoder = Encoder(
            ch=self.ch,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=enc_attn,
            z_channels=z_ch,
            double_z=self.double_z,
            resolution=self.resolution,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch,
            out_ch=self.out_ch,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            z_channels=z_ch,
            attn_resolutions=dec_attn,
            resolution=self.resolution,
            dtype=self.dtype,
        )
        mult = 2 if self.use_variational else 1
        self.quant_conv = nn.Conv(mult * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(z_ch, (1, 1), dtype=self.dtype)

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        # moments leave in fp32 regardless of conv compute dtype: the
        # distribution math (exp(logvar), sampling, KL) and stored latents
        # are fp32 even on the bf16-compute inference path
        moments = self.quant_conv(self.encoder(x)).astype(jnp.float32)
        if not self.use_variational:
            moments = jnp.concatenate([moments, jnp.ones_like(moments)], axis=-1)
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: jax.Array | None = None, sample: bool = True):
        posterior = self.encode(x)
        z = posterior.sample(rng) if (sample and rng is not None) else posterior.mode()
        dec = self.decode(z)
        return dec, posterior, z


def vae_from_ddconfig(
    embed_dim: int,
    ddconfig,
    *,
    dtype: Dtype = jnp.float32,
    model_type: str = "vavae",
) -> AutoencoderKL:
    """Build an AutoencoderKL honoring the FULL ddconfig, the way the
    reference instantiates Encoder/Decoder straight from ``**ddconfig``
    (ldm/models/autoencoder.py:285-292). Dropping keys here silently trains
    or validates a different architecture than the yaml describes — e.g.
    ``num_res_blocks: 1`` used to build the default 2."""
    get = ddconfig.get if hasattr(ddconfig, "get") else lambda k, d=None: getattr(ddconfig, k, d)
    attn = get("attn_resolutions")
    return AutoencoderKL(
        embed_dim=embed_dim,
        ch=get("ch", 128),
        ch_mult=tuple(get("ch_mult", (1, 1, 2, 2, 4))),
        resolution=get("resolution", 256),
        num_res_blocks=get("num_res_blocks", 2),
        attn_resolutions=None if attn is None else tuple(attn),
        z_channels=get("z_channels"),
        out_ch=get("out_ch", 3),
        double_z=bool(get("double_z", True)),
        model_type=model_type,
        dtype=dtype,
    )
