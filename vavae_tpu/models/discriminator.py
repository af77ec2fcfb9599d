"""PatchGAN discriminator (taming NLayerDiscriminator) in flax, NHWC.

Parity target: the taming-transformers NLayerDiscriminator used by the
reference VAE loss (vavae/ldm/modules/losses/contperceptual.py:26-31):
Conv(4×4, s2) + LeakyReLU(0.2), n_layers of Conv+BatchNorm+LeakyReLU with
channel doubling (cap 8×), stride 1 on the last, final 1-channel conv.
Init: convs ~ N(0, 0.02); BN scale ~ N(1, 0.02), bias 0 (taming weights_init).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_conv_init = nn.initializers.normal(stddev=0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.ndf, (4, 4), strides=2, padding=1, kernel_init=_conv_init,
            dtype=self.dtype, name="conv0",
        )(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2**n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(
                self.ndf * mult, (4, 4), strides=stride, padding=1,
                use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                name=f"conv{n}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                scale_init=_bn_scale_init,
                dtype=self.dtype,
                name=f"bn{n}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(
            1, (4, 4), strides=1, padding=1, kernel_init=_conv_init,
            dtype=self.dtype, name="conv_out",
        )(x)


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )
