"""Training regularization utilities (latent/image space).

Parity target: utils_regularization.py — latent-space label smoothing,
mixup, cutmix, dropout scheduling, label noise, contrastive regularizer —
and utils_scheduler.py warmup schedules. All pure functions over jax arrays.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def smooth_labels(labels: jax.Array, num_classes: int, smoothing: float = 0.1) -> jax.Array:
    """One-hot with label smoothing: (1−ε)·onehot + ε/K."""
    onehot = jax.nn.one_hot(labels, num_classes)
    return onehot * (1.0 - smoothing) + smoothing / num_classes


def label_smoothing_loss(logits: jax.Array, labels: jax.Array, smoothing: float = 0.1) -> jax.Array:
    targets = smooth_labels(labels, logits.shape[-1], smoothing)
    return -jnp.mean(jnp.sum(targets * jax.nn.log_softmax(logits), axis=-1))


def focal_loss(logits: jax.Array, labels: jax.Array, gamma: float = 2.0,
               alpha: float = 0.25) -> jax.Array:
    """Focal loss (train_calibrated_classifier.py:40)."""
    logp = jax.nn.log_softmax(logits)
    p_t = jnp.take_along_axis(jnp.exp(logp), labels[:, None], axis=-1)[:, 0]
    logp_t = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(alpha * (1.0 - p_t) ** gamma * logp_t)


def mixup(rng: jax.Array, x: jax.Array, labels: jax.Array, num_classes: int,
          alpha: float = 0.2) -> Tuple[jax.Array, jax.Array]:
    """Beta(α, α) convex mix of the batch with a shuffled copy."""
    lam_rng, perm_rng = jax.random.split(rng)
    lam = jax.random.beta(lam_rng, alpha, alpha)
    perm = jax.random.permutation(perm_rng, x.shape[0])
    x_mix = lam * x + (1.0 - lam) * x[perm]
    y = jax.nn.one_hot(labels, num_classes)
    y_mix = lam * y + (1.0 - lam) * y[perm]
    return x_mix, y_mix


def cutmix(rng: jax.Array, x: jax.Array, labels: jax.Array, num_classes: int,
           alpha: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """CutMix with a Beta-sampled box; label weights by actual box area."""
    lam_rng, perm_rng, pos_rng = jax.random.split(rng, 3)
    B, H, W, _ = x.shape
    lam = jax.random.beta(lam_rng, alpha, alpha)
    perm = jax.random.permutation(perm_rng, B)
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = (cut * H).astype(jnp.int32), (cut * W).astype(jnp.int32)
    cy = jax.random.randint(pos_rng, (), 0, H)
    cx = jax.random.randint(jax.random.fold_in(pos_rng, 1), (), 0, W)
    y0, y1 = jnp.clip(cy - ch // 2, 0, H), jnp.clip(cy + ch // 2, 0, H)
    x0, x1 = jnp.clip(cx - cw // 2, 0, W), jnp.clip(cx + cw // 2, 0, W)
    rows = jnp.arange(H)[None, :, None, None]
    cols = jnp.arange(W)[None, None, :, None]
    box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1)).astype(x.dtype)
    x_mix = x * (1.0 - box) + x[perm] * box
    area = ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (H * W)
    y = jax.nn.one_hot(labels, num_classes)
    y_mix = (1.0 - area) * y + area * y[perm]
    return x_mix, y_mix


def add_label_noise(rng: jax.Array, labels: jax.Array, num_classes: int,
                    noise_prob: float = 0.05) -> jax.Array:
    flip_rng, new_rng = jax.random.split(rng)
    flip = jax.random.uniform(flip_rng, labels.shape) < noise_prob
    random_labels = jax.random.randint(new_rng, labels.shape, 0, num_classes)
    return jnp.where(flip, random_labels, labels)


def dropout_schedule(step: int, total_steps: int, start: float = 0.3,
                     end: float = 0.1) -> float:
    """Linearly decaying dropout rate (utils_regularization DropoutScheduler)."""
    frac = min(max(step / max(total_steps, 1), 0.0), 1.0)
    return start + (end - start) * frac


def supcon_loss(features: jax.Array, labels: jax.Array,
                temperature: float = 0.07) -> jax.Array:
    """Supervised contrastive loss over L2-normalized features
    (improved_classifier_training.py:62-277)."""
    sim = features @ features.T / temperature
    # mask self-similarity
    B = features.shape[0]
    eye = jnp.eye(B, dtype=bool)
    sim = jnp.where(eye, -1e9, sim)
    logp = jax.nn.log_softmax(sim, axis=-1)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    pos_count = jnp.maximum(pos.sum(axis=-1), 1)
    return -jnp.mean(jnp.sum(jnp.where(pos, logp, 0.0), axis=-1) / pos_count)


def expected_calibration_error(probs: jax.Array, labels: jax.Array,
                               n_bins: int = 15) -> jax.Array:
    """ECE (train_calibrated_classifier.py:262)."""
    conf = jnp.max(probs, axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    bins = jnp.clip((conf * n_bins).astype(jnp.int32), 0, n_bins - 1)
    ece = 0.0
    for b in range(n_bins):
        mask = (bins == b).astype(jnp.float32)
        count = jnp.maximum(mask.sum(), 1.0)
        avg_conf = jnp.sum(conf * mask) / count
        avg_acc = jnp.sum(correct * mask) / count
        ece = ece + (mask.sum() / conf.shape[0]) * jnp.abs(avg_conf - avg_acc)
    return ece


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr: float = 0.0):
    """Warmup→cosine LR (utils_scheduler.py / ldm/lr_scheduler.py)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=min_lr,
    )
