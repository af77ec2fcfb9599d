"""Flow-matching coupling paths: Linear (rectified flow), GVP, VP.

Parity target: LightningDiT/transport/path.py:18-192. Pure functions of
(t, x) — no classes holding state — so everything traces cleanly under jit.
``t`` enters as (B,) and is broadcast to x's rank (x is NHWC here; the
reference is NCHW but all path math is elementwise so layout is irrelevant).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def expand_t(t: jax.Array, x: jax.Array) -> jax.Array:
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class LinearPath:
    """alpha_t = t, sigma_t = 1 - t (the rectified-flow interpolant)."""

    def alpha(self, t):
        return t, jnp.ones_like(t)

    def sigma(self, t):
        return 1.0 - t, -jnp.ones_like(t)

    def d_alpha_over_alpha(self, t):
        return 1.0 / t

    def drift(self, x, t):
        """Score-parametrized SDE (drift_mean, diffusion); reference path.py:35-42."""
        t = expand_t(t, x)
        ratio = self.d_alpha_over_alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        return -ratio * x, ratio * sigma_t**2 - sigma_t * d_sigma_t


@dataclasses.dataclass(frozen=True)
class GVPPath(LinearPath):
    """alpha_t = sin(πt/2), sigma_t = cos(πt/2)."""

    def alpha(self, t):
        return jnp.sin(t * math.pi / 2), math.pi / 2 * jnp.cos(t * math.pi / 2)

    def sigma(self, t):
        return jnp.cos(t * math.pi / 2), -math.pi / 2 * jnp.sin(t * math.pi / 2)

    def d_alpha_over_alpha(self, t):
        return math.pi / (2 * jnp.tan(t * math.pi / 2))


@dataclasses.dataclass(frozen=True)
class VPPath(LinearPath):
    """Variance-preserving path (reference path.py:139-171)."""

    sigma_min: float = 0.1
    sigma_max: float = 20.0

    def _log_mean_coeff(self, t):
        return (
            -0.25 * (1.0 - t) ** 2 * (self.sigma_max - self.sigma_min)
            - 0.5 * (1.0 - t) * self.sigma_min
        )

    def _d_log_mean_coeff(self, t):
        return 0.5 * (1.0 - t) * (self.sigma_max - self.sigma_min) + 0.5 * self.sigma_min

    def alpha(self, t):
        a = jnp.exp(self._log_mean_coeff(t))
        return a, a * self._d_log_mean_coeff(t)

    def sigma(self, t):
        p = 2.0 * self._log_mean_coeff(t)
        s = jnp.sqrt(1.0 - jnp.exp(p))
        ds = jnp.exp(p) * (2.0 * self._d_log_mean_coeff(t)) / (-2.0 * s)
        return s, ds

    def d_alpha_over_alpha(self, t):
        return self._d_log_mean_coeff(t)

    def drift(self, x, t):
        t = expand_t(t, x)
        beta_t = self.sigma_min + (1.0 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2.0


# -- shared conversions (reference path.py:70-136) ---------------------------


def plan(path, t: jax.Array, x0: jax.Array, x1: jax.Array):
    """xt on the path and its target vector field ut."""
    te = expand_t(t, x1)
    alpha_t, d_alpha_t = path.alpha(te)
    sigma_t, d_sigma_t = path.sigma(te)
    xt = alpha_t * x1 + sigma_t * x0
    ut = d_alpha_t * x1 + d_sigma_t * x0
    return t, xt, ut


def score_from_velocity(path, velocity, x, t):
    te = expand_t(t, x)
    alpha_t, d_alpha_t = path.alpha(te)
    sigma_t, d_sigma_t = path.sigma(te)
    reverse_ratio = alpha_t / d_alpha_t
    var = sigma_t**2 - reverse_ratio * d_sigma_t * sigma_t
    return (reverse_ratio * velocity - x) / var


def noise_from_velocity(path, velocity, x, t):
    te = expand_t(t, x)
    alpha_t, d_alpha_t = path.alpha(te)
    sigma_t, d_sigma_t = path.sigma(te)
    reverse_ratio = alpha_t / d_alpha_t
    var = reverse_ratio * d_sigma_t - sigma_t
    return (reverse_ratio * velocity - x) / var


def velocity_from_score(path, score, x, t):
    drift_mean, var = path.drift(x, t)
    return var * score - drift_mean


def diffusion_coeff(path, x, t, form: str = "constant", norm: float = 1.0):
    """SDE diffusion term choices (reference path.py:45-68)."""
    te = expand_t(t, x)
    if form == "constant":
        return jnp.full_like(te, norm)
    if form == "SBDM":
        return norm * path.drift(x, t)[1]
    if form == "sigma":
        return norm * path.sigma(te)[0]
    if form == "linear":
        return norm * (1.0 - te)
    if form == "decreasing":
        return 0.25 * (norm * jnp.cos(jnp.pi * te) + 1.0) ** 2
    if form == "increasing-decreasing":
        return norm * jnp.sin(jnp.pi * te) ** 2
    raise NotImplementedError(f"diffusion form {form}")
