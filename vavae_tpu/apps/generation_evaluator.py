"""Generation-quality evaluation for the micro-Doppler pipeline.

Parity targets:
  - evaluate_generation_quality.py:89-160 — confidence-histogram filtering
    statistics per user.
  - comprehensive_generation_evaluator.py — identity preservation (:80-107),
    intra-class diversity (LPIPS + feature, :108-148), kNN feature coverage
    (:149-200), weighted overall score (:255).
  - analyze_filtering_metrics.py / analyze_real_data_metrics.py — metric
    distributions + recommended thresholds.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np


def confidence_histogram(probs: np.ndarray, labels: np.ndarray, bins: int = 20) -> Dict:
    """Per-user confidence statistics (evaluate_generation_quality.py:89-160)."""
    conf = probs.max(axis=-1)
    pred = probs.argmax(axis=-1)
    correct = pred == labels
    hist, edges = np.histogram(conf, bins=bins, range=(0.0, 1.0))
    return {
        "mean_confidence": float(conf.mean()),
        "accuracy": float(correct.mean()),
        "hist": hist.tolist(),
        "edges": edges.tolist(),
        "above_95": float((conf > 0.95).mean()),
    }


def identity_preservation(
    gen_probs: np.ndarray, target_user: int
) -> Dict:
    """How often generated samples classify as their target user (:80-107)."""
    pred = gen_probs.argmax(axis=-1)
    conf = gen_probs.max(axis=-1)
    match = pred == target_user
    return {
        "identity_acc": float(match.mean()),
        "mean_target_prob": float(gen_probs[:, target_user].mean()),
        "mean_conf_when_match": float(conf[match].mean()) if match.any() else 0.0,
    }


def intra_class_diversity(
    features: np.ndarray, lpips_pairs: Optional[np.ndarray] = None
) -> Dict:
    """Feature-space diversity = 1 − mean pairwise cosine sim; optional LPIPS
    pairwise mean (:108-148)."""
    f = features / np.maximum(np.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    sim = f @ f.T
    n = len(f)
    feat_div = float(1.0 - (sim.sum() - np.trace(sim)) / max(n * (n - 1), 1))
    out = {"feature_diversity": feat_div}
    if lpips_pairs is not None:
        out["lpips_diversity"] = float(np.mean(lpips_pairs))
    return out


def knn_coverage(
    gen_features: np.ndarray, real_features: np.ndarray, k: int = 5
) -> Dict:
    """Coverage/precision-style kNN metrics (:149-200): fraction of real
    samples whose kNN ball contains a generated sample, and mean distance
    from generated to nearest real."""
    def _norm(f):
        return f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)

    g, r = _norm(gen_features), _norm(real_features)
    d_rr = 1.0 - r @ r.T
    np.fill_diagonal(d_rr, np.inf)
    knn_radius = np.sort(d_rr, axis=-1)[:, k - 1]  # per-real kNN radius
    d_rg = 1.0 - r @ g.T
    covered = (d_rg.min(axis=-1) <= knn_radius).mean()
    fidelity = float((1.0 - g @ r.T).min(axis=-1).mean())
    return {"coverage": float(covered), "mean_nearest_real_dist": fidelity}


@dataclasses.dataclass
class ComprehensiveGenerationEvaluator:
    """Weighted overall score (comprehensive_generation_evaluator.py:255)."""

    identity_weight: float = 0.4
    diversity_weight: float = 0.3
    coverage_weight: float = 0.3

    def evaluate_user(
        self,
        gen_probs: np.ndarray,
        gen_features: np.ndarray,
        real_features: np.ndarray,
        target_user: int,
    ) -> Dict:
        ident = identity_preservation(gen_probs, target_user)
        div = intra_class_diversity(gen_features)
        cov = knn_coverage(gen_features, real_features)
        overall = (
            self.identity_weight * ident["identity_acc"]
            + self.diversity_weight * min(div["feature_diversity"] * 2.0, 1.0)
            + self.coverage_weight * cov["coverage"]
        )
        return {**ident, **div, **cov, "overall_score": float(overall)}


def recommend_thresholds(
    real_metrics: Dict[str, np.ndarray], percentile: float = 5.0
) -> Dict[str, float]:
    """Data-driven filter thresholds from real-data metric distributions
    (analyze_real_data_metrics.py:315-362): use the low percentile of each
    real-data metric as the acceptance floor for generated samples."""
    return {
        name: float(np.percentile(values, percentile))
        for name, values in real_metrics.items()
    }
