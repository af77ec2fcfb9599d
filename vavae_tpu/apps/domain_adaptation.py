"""Few-shot domain adaptation: LCCS BN-stat fusion + PNC prototype fusion.

Parity targets (domain_adaptation_experiment/):
  - lccs_adapter.py:24-95 ``FixedLCCSAdapter`` — save/restore BatchNorm
    running stats; replace them with a convex fusion of source stats and
    support-set (target-domain) batch stats:
        μ ← (1−α)·μ_src + α·μ_tgt ,  σ² ← (1−α)·σ²_src + α·σ²_tgt
  - improved_pnc.py:33-148 ``ImprovedPNC`` — norm-weighted class prototypes
    from support features; temperature-softmax prototype logits fused with
    classifier probabilities, with confidence-adaptive fusion weight.
  - lccs_pnc_combined.py — both applied together.
  - eval_config.py:8-40 — the hyperparameter grid driver.

Our classifier keeps BN stats in flax's ``batch_stats`` collection, so LCCS
is a pure pytree transformation — no module surgery needed.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# -- LCCS: linear combination of channel statistics ---------------------------


def compute_target_bn_stats(
    model,
    params: Any,
    source_stats: Any,
    support_images: np.ndarray,
    batch_size: int = 32,
) -> Any:
    """Run the support set through the model in train-mode (mutable
    batch_stats) to collect target-domain BN statistics."""
    stats = source_stats
    for s in range(0, len(support_images), batch_size):
        batch = jnp.asarray(support_images[s : s + batch_size])
        _, updates = model.apply(
            {"params": params, "batch_stats": stats},
            batch,
            train=True,
            mutable=["batch_stats"],
        )
        stats = updates["batch_stats"]
    return stats


def lccs_fuse_stats(source_stats: Any, target_stats: Any, alpha: float) -> Any:
    """(1−α)·source + α·target, leafwise over {mean, var} trees."""
    return jax.tree_util.tree_map(
        lambda s, t: (1.0 - alpha) * s + alpha * t, source_stats, target_stats
    )


@dataclasses.dataclass
class LCCSAdapter:
    """Save/fuse/restore BN statistics (FixedLCCSAdapter equivalent)."""

    model: Any
    params: Any
    source_stats: Any

    def adapt(self, support_images: np.ndarray, alpha: float = 0.3) -> Any:
        target = compute_target_bn_stats(
            self.model, self.params, self.source_stats, support_images
        )
        return lccs_fuse_stats(self.source_stats, target, alpha)

    def restore(self) -> Any:
        return self.source_stats


# -- PNC: prototype-based classification fusion --------------------------------


def build_prototypes(
    features: np.ndarray, labels: np.ndarray, num_classes: int,
    norm_weighted: bool = True,
) -> np.ndarray:
    """Norm-weighted class prototypes (improved_pnc.py:33-68): features with
    larger norms (more confident embeddings) contribute more."""
    protos = np.zeros((num_classes, features.shape[-1]), np.float32)
    for c in range(num_classes):
        f = features[labels == c]
        if len(f) == 0:
            continue
        if norm_weighted:
            w = np.linalg.norm(f, axis=-1)
            w = w / max(w.sum(), 1e-12)
            protos[c] = (f * w[:, None]).sum(axis=0)
        else:
            protos[c] = f.mean(axis=0)
    return protos


def pnc_probs(
    features: np.ndarray,
    classifier_probs: np.ndarray,
    prototypes: np.ndarray,
    temperature: float = 0.1,
    fusion_weight: float = 0.5,
    confidence_adaptive: bool = True,
) -> np.ndarray:
    """Fuse prototype-similarity softmax with classifier probabilities
    (improved_pnc.py:70-148). With confidence_adaptive, low-confidence
    classifier predictions lean more on the prototypes."""
    f = features / np.maximum(np.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    p = prototypes / np.maximum(np.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-12)
    sim = f @ p.T  # cosine similarities
    ex = np.exp(sim / temperature - (sim / temperature).max(axis=-1, keepdims=True))
    proto_probs = ex / ex.sum(axis=-1, keepdims=True)

    if confidence_adaptive:
        conf = classifier_probs.max(axis=-1, keepdims=True)
        w = fusion_weight * (1.0 - conf)  # low confidence → trust prototypes
    else:
        w = fusion_weight
    return (1.0 - w) * classifier_probs + w * proto_probs


# -- combined evaluation --------------------------------------------------------


@dataclasses.dataclass
class DAResult:
    accuracy: float
    per_class_acc: Dict[int, float]
    config: Dict


def evaluate_adaptation(
    model,
    params: Any,
    batch_stats: Any,
    feature_fn: Callable,
    test_images: np.ndarray,
    test_labels: np.ndarray,
    prototypes: Optional[np.ndarray] = None,
    pnc_cfg: Optional[dict] = None,
    batch_size: int = 64,
) -> DAResult:
    """CrossDomainEvaluator equivalent: accuracy (+per-class) on the target
    test set with the given adapted stats and optional PNC fusion."""
    preds = []
    for s in range(0, len(test_images), batch_size):
        x = jnp.asarray(test_images[s : s + batch_size])
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        probs = np.asarray(jax.nn.softmax(logits))
        if prototypes is not None:
            feats = np.asarray(feature_fn(x))
            probs = pnc_probs(feats, probs, prototypes, **(pnc_cfg or {}))
        preds.append(probs.argmax(axis=-1))
    preds = np.concatenate(preds)
    acc = float((preds == test_labels).mean())
    per_class = {
        int(c): float((preds[test_labels == c] == c).mean())
        for c in np.unique(test_labels)
    }
    return DAResult(acc, per_class, {})


def hyperparameter_search(
    eval_fn: Callable[[Dict], float],
    grid: Dict[str, Iterable],
) -> Tuple[Dict, float, List[Tuple[Dict, float]]]:
    """Exhaustive grid search (run_full_hyperparameter_search.py driver).

    eval_fn(config) -> accuracy. Returns (best_config, best_acc, all)."""
    keys = list(grid)
    results: List[Tuple[Dict, float]] = []
    best, best_acc = None, -1.0
    for combo in itertools.product(*(grid[k] for k in keys)):
        cfg = dict(zip(keys, combo))
        acc = eval_fn(cfg)
        results.append((cfg, acc))
        if acc > best_acc:
            best, best_acc = cfg, acc
    return best, best_acc, results


DEFAULT_SEARCH_SPACE = {
    # eval_config.py:8-40 search dimensions
    "lccs_alpha": [0.1, 0.2, 0.3, 0.5],
    "pnc_temperature": [0.05, 0.1, 0.2],
    "pnc_fusion_weight": [0.3, 0.5, 0.7],
    "confidence_adaptive": [True, False],
}
