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
    pairwise mean (:108-148). A single sample has NO pairs — diversity is
    undefined (NaN), matching the reference's empty-upper-triangle mean; the
    old 1.0 rewarded degenerate one-image users with the MAXIMAL score."""
    n = len(features)
    if n < 2:
        return {"feature_diversity": float("nan")}
    f = features / np.maximum(np.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    sim = f @ f.T
    feat_div = float(1.0 - (sim.sum() - np.trace(sim)) / (n * (n - 1)))
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
    if len(r) < 2:
        # a single real sample has no finite neighbour: the kNN radius is
        # undefined and any coverage number would be fiction
        return {
            "coverage": float("nan"),
            "mean_nearest_real_dist": float((1.0 - g @ r.T).min(axis=-1).mean()),
        }
    d_rr = 1.0 - r @ r.T
    np.fill_diagonal(d_rr, np.inf)
    # with fewer than k+1 real samples, use the farthest finite neighbour
    k = min(k, len(r) - 1)
    knn_radius = np.sort(d_rr, axis=-1)[:, k - 1]  # per-real kNN radius
    d_rg = 1.0 - r @ g.T
    covered = (d_rg.min(axis=-1) <= knn_radius).mean()
    fidelity = float((1.0 - g @ r.T).min(axis=-1).mean())
    return {"coverage": float(covered), "mean_nearest_real_dist": fidelity}


@dataclasses.dataclass
class ComprehensiveGenerationEvaluator:
    """Weighted overall score (comprehensive_generation_evaluator.py:255-285):
    weights 0.5/0.3/0.2, identity_score = top1_accuracy × mean target
    confidence (:105). Deviation by design: the reference's diversity score
    is the mean pairwise LPIPS ×10 (:146,262); this evaluator uses the
    feature-cosine diversity ×2 capped at 1 instead (no O(n²) LPIPS
    forwards), documented here rather than silently. Undefined components
    (single-sample diversity, single-real-sample coverage) make the overall
    score NaN with an explanatory note instead of propagating silently."""

    identity_weight: float = 0.5
    diversity_weight: float = 0.3
    coverage_weight: float = 0.2

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
        identity_score = ident["identity_acc"] * ident["mean_target_prob"]
        components = {
            "identity": self.identity_weight * identity_score,
            "diversity": self.diversity_weight
            * min(div["feature_diversity"] * 2.0, 1.0),
            "coverage": self.coverage_weight * cov["coverage"],
        }
        undefined = [k for k, v in components.items() if not np.isfinite(v)]
        out = {**ident, **div, **cov, "identity_score": float(identity_score)}
        if undefined:
            out["overall_score"] = float("nan")
            out["note"] = (
                f"overall undefined — component(s) {undefined} have too few "
                "samples (diversity needs ≥2 generated, coverage ≥2 real)"
            )
        else:
            out["overall_score"] = float(sum(components.values()))
        return out


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


def main() -> None:
    """CLI mirroring comprehensive_generation_evaluator.py: per-user identity
    / diversity / coverage composite scores for a generated-sample tree."""
    import argparse
    import json

    import jax
    import vavae_tpu.utils.jax_cache  # noqa: F401
    from vavae_tpu.apps.analyze_metrics import _load_image_dir
    from vavae_tpu.apps.train_classifier import ClassifierTrainer
    from vavae_tpu.data.image_folder import SplitFileDataset
    from vavae_tpu.train.checkpoint import restore_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--classifier_ckpt", required=True)
    ap.add_argument("--generated_dir", required=True)
    ap.add_argument("--split_file", required=True, help="real data for coverage")
    ap.add_argument("--split", default="val", choices=["train", "val"])
    ap.add_argument("--num_classes", type=int, default=31)
    ap.add_argument("--mode", default="baseline",
                    choices=["baseline", "improved", "calibrated", "domain_adaptive"])
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    trainer = ClassifierTrainer(num_classes=args.num_classes, mode=args.mode)
    state = trainer.init_state(jax.random.PRNGKey(0), args.image_size)
    state = restore_checkpoint(args.classifier_ckpt, state)
    predict = trainer.predict_fn(state)
    features = trainer.feature_fn(state)

    def batched(fn, x, bs=64):
        return np.concatenate(
            [np.asarray(fn(x[s : s + bs])) for s in range(0, len(x), bs)]
        )

    ds = SplitFileDataset(args.split_file, args.split, image_size=args.image_size)
    pairs = [ds[i] for i in range(len(ds))]
    real_x = np.stack([p[0] for p in pairs])
    real_labels = np.asarray([p[1] for p in pairs], np.int64)
    real_feats = batched(features, real_x)

    gen_imgs, gen_labels = _load_image_dir(args.generated_dir, args.image_size)
    gen_x = gen_imgs.astype(np.float32) / 127.5 - 1.0
    gen_probs = batched(predict, gen_x)
    gen_feats = batched(features, gen_x)

    ev = ComprehensiveGenerationEvaluator()
    report = {}
    for uid in np.unique(gen_labels):
        m = gen_labels == uid
        rm = real_labels == uid
        if not rm.any():
            # coverage against OTHER users' features would be a silently
            # wrong metric — report identity/diversity only
            r = {
                **identity_preservation(gen_probs[m], int(uid)),
                **intra_class_diversity(gen_feats[m]),
                "coverage": float("nan"),
                "overall_score": float("nan"),
                "note": f"no real samples for user {uid} in split "
                        f"'{args.split}' — coverage/overall undefined",
            }
            report[int(uid)] = r
            print(f"user {uid}: {r['note']}")
            continue
        report[int(uid)] = ev.evaluate_user(
            gen_probs[m], gen_feats[m], real_feats[rm], int(uid)
        )
        r = report[int(uid)]
        print(
            f"user {uid}: identity {r['identity_acc']:.3f} diversity "
            f"{r['feature_diversity']:.3f} coverage {r['coverage']:.3f} "
            f"overall {r['overall_score']:.3f}"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"written to {args.out}")


if __name__ == "__main__":
    main()
