"""Statistics-based user selection for generation experiments.

Parity target: select_users_by_classifier.py:70-270 — rank users by how
reliably the classifier identifies their real samples (accuracy, mean
confidence, margin), then pick the best/worst/median cohorts for the
generation + domain-adaptation experiments.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def user_classifier_stats(
    probs: np.ndarray, labels: np.ndarray
) -> Dict[int, Dict[str, float]]:
    """Per-user accuracy / mean confidence / mean margin from real-data probs."""
    stats: Dict[int, Dict[str, float]] = {}
    pred = probs.argmax(axis=-1)
    conf = probs.max(axis=-1)
    top2 = np.sort(probs, axis=-1)[:, -2]
    for u in np.unique(labels):
        m = labels == u
        stats[int(u)] = {
            "accuracy": float((pred[m] == u).mean()),
            "mean_confidence": float(conf[m].mean()),
            "mean_margin": float((conf[m] - top2[m]).mean()),
            "mean_target_prob": float(probs[m, u].mean()),
            "n": int(m.sum()),
        }
    return stats


def rank_users(
    stats: Dict[int, Dict[str, float]],
    key: str = "mean_target_prob",
) -> List[int]:
    return sorted(stats, key=lambda u: stats[u][key], reverse=True)


def select_users(
    stats: Dict[int, Dict[str, float]],
    n: int = 10,
    strategy: str = "best",
    min_accuracy: float = 0.0,
) -> List[int]:
    """strategy: best | worst | median | spread (even coverage of the range)."""
    ranked = [u for u in rank_users(stats) if stats[u]["accuracy"] >= min_accuracy]
    if strategy == "best":
        return ranked[:n]
    if strategy == "worst":
        return ranked[-n:]
    if strategy == "median":
        mid = len(ranked) // 2
        lo = max(mid - n // 2, 0)
        return ranked[lo : lo + n]
    if strategy == "spread":
        idx = np.linspace(0, len(ranked) - 1, num=min(n, len(ranked))).astype(int)
        return [ranked[i] for i in idx]
    raise ValueError(strategy)
