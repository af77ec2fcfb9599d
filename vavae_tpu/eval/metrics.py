"""Image quality metrics: PSNR, SSIM (jit-compiled, batched).

Parity targets: evaluate_tokenizer.py:110 (torchmetrics SSIM with default
gaussian kernel 11, sigma 1.5, data_range 1.0) and :195-210 (PSNR over
uint8 pairs). Both are pure-JAX; no torchmetrics dependency.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    """Per-image PSNR over (B, H, W, C) arrays (dB)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Mean SSIM per image over (B, H, W, C) in [0, data_range].

    Gaussian window 11×11 σ=1.5, K1=0.01, K2=0.03 (standard SSIM; matches
    torchmetrics' defaults used by the reference evaluate_tokenizer.py:110).
    """
    kernel = jnp.asarray(_gaussian_kernel())[:, :, None, None]  # (11,11,1,1)
    C = a.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, C))  # depthwise

    def filt(x):
        # precision pinned HERE, not left to the global default: on TPU the
        # default conv precision is bf16 multiplies, and the variance terms
        # below (filt(a*a) − mu²) cancel catastrophically — the round-5 e2e
        # run measured mean SSIM 1.19 (mathematically ≤ 1) through this
        # exact path before the pin. The test suite never caught it because
        # conftest pins jax_default_matmul_precision=highest globally.
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = filt(a * a) - mu_aa
    sigma_bb = filt(b * b) - mu_bb
    sigma_ab = filt(a * b) - mu_ab

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
