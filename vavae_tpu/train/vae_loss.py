"""VA-VAE loss pieces: L1+LPIPS NLL, KL, hinge GAN, VF alignment.

Parity target: vavae/ldm/modules/losses/contperceptual.py:8-183 —
  - rec = |x − x̂| + w_p·LPIPS;  nll = Σ(rec/exp(logvar) + logvar)/B
    (logvar is a constant 0 here: the reference registers it as a parameter
    but never adds it to any optimizer, so it stays at its init)
  - KL with weight 1e-6
  - generator hinge term −E[D(x̂)] with the adaptive d-weight
    ‖∇_last nll‖ / (‖∇_last g‖ + 1e-4), clipped to [0, 1e4]
  - VF loss = distmat margin term  relu(|cos-sim-mat(z) − cos-sim-mat(aux)| − m₁).mean()
            + cos margin term      relu(1 − m₂ − cos(aux, z)).mean()
    with the adaptive vf-weight on the ENCODER last layer, clipped to [0, 1e8]
  - discriminator hinge on detached real/fake with the disc_start warmup gate.

All tensors NHWC; channel-cosines are over the last axis.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    disc_start: int = 5001
    kl_weight: float = 1e-6
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    logvar_init: float = 0.0
    vf_weight: float = 0.1
    adaptive_vf: bool = True
    cos_margin: float = 0.5
    distmat_margin: float = 0.25
    distmat_weight: float = 1.0
    cos_weight: float = 1.0
    disc_loss: str = "hinge"


def nll_loss(x: jax.Array, rec: jax.Array, p_loss: Optional[jax.Array], cfg: VAELossConfig):
    """Returns (nll, rec_loss_mean). p_loss: per-image LPIPS or None."""
    rec_l1 = jnp.abs(x - rec) * cfg.pixelloss_weight
    if p_loss is not None and cfg.perceptual_weight > 0:
        rec_full = rec_l1 + cfg.perceptual_weight * p_loss.reshape(-1, 1, 1, 1)
    else:
        rec_full = rec_l1
    # logvar == logvar_init (never optimized in the reference)
    logvar = cfg.logvar_init
    nll = rec_full / jnp.exp(logvar) + logvar
    nll = jnp.sum(nll) / x.shape[0]
    return nll, jnp.mean(rec_l1)


def vf_loss(z: jax.Array, aux: jax.Array, cfg: VAELossConfig):
    """Marginal distance-matrix + marginal cosine VF alignment losses.

    z, aux: (B, h, w, C) with matching C (z already projected). Returns
    (vf_total, distmat_term, cos_term).
    """
    B, H, W, C = z.shape
    zf = z.reshape(B, H * W, C)
    af = aux.reshape(B, H * W, C)
    zn = zf / jnp.maximum(jnp.linalg.norm(zf, axis=-1, keepdims=True), 1e-12)
    an = af / jnp.maximum(jnp.linalg.norm(af, axis=-1, keepdims=True), 1e-12)
    z_sim = jnp.einsum("bic,bjc->bij", zn, zn)
    a_sim = jnp.einsum("bic,bjc->bij", an, an)
    distmat = jnp.mean(jax.nn.relu(jnp.abs(z_sim - a_sim) - cfg.distmat_margin))

    cos = jnp.sum(zn * an, axis=-1)  # cosine over channels at each site
    cos_term = jnp.mean(jax.nn.relu(1.0 - cfg.cos_margin - cos))
    total = distmat * cfg.distmat_weight + cos_term * cfg.cos_weight
    return total, distmat, cos_term


def adopt_weight(weight: float, global_step: jax.Array, threshold: int) -> jax.Array:
    """Discriminator warmup gate (taming adopt_weight)."""
    return jnp.where(global_step < threshold, 0.0, weight)


def adaptive_weight(nll_grad_norm, other_grad_norm, base: float, clip_max: float):
    w = nll_grad_norm / (other_grad_norm + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, clip_max) * base)
