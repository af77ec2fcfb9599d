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


def main() -> None:
    """CLI mirroring select_users_by_classifier.py: classifier stats on real
    validation data → ranked/selected user ids."""
    import argparse
    import json

    import jax
    import vavae_tpu.utils.jax_cache  # noqa: F401
    from vavae_tpu.apps.train_classifier import ClassifierTrainer
    from vavae_tpu.data.image_folder import SplitFileDataset
    from vavae_tpu.train.checkpoint import restore_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--classifier_ckpt", required=True)
    ap.add_argument("--split_file", required=True)
    ap.add_argument("--split", default="val", choices=["train", "val"])
    ap.add_argument("--num_classes", type=int, default=31)
    ap.add_argument("--mode", default="baseline",
                    choices=["baseline", "improved", "calibrated", "domain_adaptive"])
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--strategy", default="best",
                    choices=["best", "worst", "median", "spread"])
    ap.add_argument("--min_accuracy", type=float, default=0.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    trainer = ClassifierTrainer(num_classes=args.num_classes, mode=args.mode)
    state = trainer.init_state(jax.random.PRNGKey(0), args.image_size)
    state = restore_checkpoint(args.classifier_ckpt, state)
    predict = trainer.predict_fn(state)

    ds = SplitFileDataset(args.split_file, args.split, image_size=args.image_size)
    probs, labels = [], []
    for s in range(0, len(ds), 64):
        batch = [ds[i] for i in range(s, min(s + 64, len(ds)))]
        x = np.stack([b[0] for b in batch])
        probs.append(np.asarray(predict(x)))
        labels.extend(int(b[1]) for b in batch)
    stats = user_classifier_stats(np.concatenate(probs), np.asarray(labels))
    selected = select_users(stats, n=args.n, strategy=args.strategy,
                            min_accuracy=args.min_accuracy)
    print(f"selected ({args.strategy}, n={args.n}): {selected}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"selected": selected, "stats": stats}, f, indent=2)
        print(f"written to {args.out}")


if __name__ == "__main__":
    main()
