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


def interuser_contrastive_loss(features: jax.Array, labels: jax.Array,
                               temperature: float = 0.07) -> jax.Array:
    """InfoNCE over the batch: −log(Σ_pos e^s / (Σ_pos e^s + Σ_neg e^s)),
    averaged over anchors that have a positive.

    Parity: improved_classifier_training.py:158-216 InterUserContrastiveLoss
    (its SupConLoss :218-277 computes the identical formula — both normalize
    features, mask the diagonal, and take the summed-positives ratio)."""
    B = features.shape[0]
    f = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    sim = f @ f.T / temperature
    eye = jnp.eye(B, dtype=bool)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    neg = (labels[:, None] != labels[None, :])
    # stability shift (reference subtracts the row max, detached)
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
    e = jnp.exp(sim)
    pos_sum = jnp.maximum(jnp.sum(jnp.where(pos, e, 0.0), axis=1), 1e-8)
    neg_sum = jnp.sum(jnp.where(neg, e, 0.0), axis=1)
    loss = -jnp.log(pos_sum / (pos_sum + neg_sum + 1e-8))
    has_pos = pos.any(axis=1)
    denom = jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.sum(jnp.where(has_pos, loss, 0.0)) / denom


def init_memory_bank(rng: jax.Array, num_classes: int, dim: int = 64,
                     memory_size: int = 200) -> dict:
    """Per-class feature ring buffer (improved_classifier_training.py:66-74):
    L2-normalized random init + per-class write pointer."""
    bank = jax.random.normal(rng, (num_classes, memory_size, dim))
    bank = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
    return {"bank": bank, "ptr": jnp.zeros((num_classes,), jnp.int32)}


def update_memory_bank(memory: dict, features: jax.Array, labels: jax.Array) -> dict:
    """Vectorized ring-buffer write (reference update_memory_bank
    :76-85 loops over the batch; same result, one scatter here): sample i
    of class c lands at slot (ptr[c] + rank-of-i-within-c) % memory_size."""
    bank, ptr = jnp.asarray(memory["bank"]), jnp.asarray(memory["ptr"])
    memory_size = bank.shape[1]
    f = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    f = jax.lax.stop_gradient(f)
    B = labels.shape[0]
    same = labels[:, None] == labels[None, :]               # (B, B)
    earlier = jnp.tril(jnp.ones((B, B), bool), k=-1)
    occ = jnp.sum(same & earlier, axis=1)                   # rank within class
    slots = (ptr[labels] + occ) % memory_size
    # when a class appears more than memory_size times in one batch, the
    # ring wraps and slots collide; the reference's sequential loop is
    # last-write-wins — keep only each class's LAST memory_size samples so
    # the scatter has unique (class, slot) indices (duplicate-index .set
    # order is unspecified)
    counts = jnp.sum(jax.nn.one_hot(labels, bank.shape[0], dtype=jnp.int32), axis=0)
    keep = occ >= (counts[labels] - memory_size)
    bank = bank.at[
        jnp.where(keep, labels, bank.shape[0]),  # OOB index drops the write
        slots,
    ].set(f, mode="drop")
    return {"bank": bank, "ptr": (ptr + counts) % memory_size}


def global_negative_contrastive(
    features: jax.Array,
    labels: jax.Array,
    memory: dict,
    temperature: float = 0.07,
    margin: float = 0.5,
    bank_pos: int = 50,
    bank_neg: int = 20,
) -> jax.Array:
    """Global-negative contrastive loss with a class memory bank.

    Parity: improved_classifier_training.py:89-157 — per anchor:
    positives = same-class batch others + the first ``bank_pos`` bank
    entries of its class, pos_loss = −mean(sim/T); negatives = the first
    ``bank_neg`` bank entries of EVERY other class, with hard-negative
    mining (mean over sims/T > margin when any, else mean over all).
    Vectorized over the batch (the reference loops in python per sample;
    its batch-positives mask also drops the first same-class sample
    instead of self — a bug we do not replicate)."""
    bank = memory["bank"]
    num_classes = bank.shape[0]
    B = features.shape[0]
    f = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)

    # -- positives ---------------------------------------------------------
    batch_sim = f @ f.T / temperature                        # (B, B)
    eye = jnp.eye(B, dtype=bool)
    pos_mask = (labels[:, None] == labels[None, :]) & ~eye
    own_bank = bank[labels, :bank_pos]                       # (B, P, D)
    bank_sim = jnp.einsum("bd,bpd->bp", f, own_bank) / temperature
    pos_sum = jnp.sum(jnp.where(pos_mask, batch_sim, 0.0), axis=1) + jnp.sum(bank_sim, axis=1)
    pos_cnt = jnp.sum(pos_mask, axis=1) + bank_sim.shape[1]
    pos_loss = -pos_sum / pos_cnt

    # -- global negatives with hard mining --------------------------------
    neg_bank = bank[:, :bank_neg]                            # (C, N, D)
    neg_sim = jnp.einsum("bd,cnd->bcn", f, neg_bank) / temperature
    valid = jnp.broadcast_to(
        (jnp.arange(num_classes)[None, :] != labels[:, None])[..., None],
        neg_sim.shape,
    )
    hard = (neg_sim > margin) & valid
    hard_cnt = jnp.sum(hard, axis=(1, 2))
    hard_mean = jnp.sum(jnp.where(hard, neg_sim, 0.0), axis=(1, 2)) / jnp.maximum(hard_cnt, 1)
    all_cnt = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)
    all_mean = jnp.sum(jnp.where(valid, neg_sim, 0.0), axis=(1, 2)) / all_cnt
    neg_loss = jnp.where(hard_cnt > 0, hard_mean, all_mean)

    return jnp.mean(pos_loss + neg_loss)


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
