"""Classifier-guided conditional generation with rejection filtering.

Parity targets:
  - generate_and_filter_samples.py:274-426 — per-user while-loop: sample a
    CFG batch (scale 12), decode, classify, keep while pred == user and
    confidence > 0.95, until 800 kept; rank-striped user assignment.
  - generation_filtering.py:318-436 — advanced multi-metric gates: feature
    diversity (1 − mean pairwise cos-sim), pixel sanity, classification
    margin, prototype similarity.

TPU-native: the sampler+decoder trajectory is one jitted program; only the
accept/collect logic (data-dependent termination) runs host-side
(SURVEY.md §7 hard part f).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401


@dataclasses.dataclass
class FilterConfig:
    confidence_threshold: float = 0.95
    target_per_user: int = 800
    batch_size: int = 100
    # None = use the config file's sample.cfg_scale; a value overrides it
    # before the sampler builds (the reference app hardcodes 12,
    # generate_and_filter_samples.py:276)
    cfg_scale: Optional[float] = None
    max_batches: int = 200  # bound the unbounded reference loop
    # advanced gates (generation_filtering.py defaults); None disables
    min_margin: Optional[float] = None           # top1 − top2 prob margin
    min_diversity: Optional[float] = None        # batch feature diversity
    max_prototype_sim: Optional[float] = None    # reject near-duplicates of real data
    pixel_range: tuple = (5.0, 250.0)            # mean-pixel sanity band


def feature_diversity(features: np.ndarray) -> float:
    """1 − mean pairwise cosine similarity (generation_filtering.py:318-336)."""
    f = features / np.maximum(np.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    sim = f @ f.T
    n = len(f)
    if n < 2:
        return 1.0
    off_diag = (sim.sum() - np.trace(sim)) / (n * (n - 1))
    return float(1.0 - off_diag)


def pixel_sanity(images_uint8: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Reject all-black/white/degenerate images (generation_filtering.py:339-366)."""
    means = images_uint8.reshape(len(images_uint8), -1).mean(axis=-1)
    stds = images_uint8.reshape(len(images_uint8), -1).std(axis=-1)
    return (means > lo) & (means < hi) & (stds > 1.0)


def generate_and_filter_for_user(
    user_id: int,
    generate_fn: Callable[[jax.Array, jax.Array], jax.Array],
    decode_fn: Callable[[jax.Array], np.ndarray],
    classifier_fn: Callable[[np.ndarray], np.ndarray],
    cfg: FilterConfig,
    rng: jax.Array,
    feature_fn: Optional[Callable] = None,
    prototypes: Optional[np.ndarray] = None,
    save_dir: Optional[str] = None,
    return_images: bool = False,
) -> Dict:
    """Rejection-sample until cfg.target_per_user accepted for this user.

    generate_fn(rng, labels) -> latents; decode_fn(latents) -> uint8 NHWC;
    classifier_fn(images in [-1,1]) -> softmax probs.
    """
    kept: List[np.ndarray] = []
    stats = {"generated": 0, "accepted": 0, "batches": 0}
    labels = jnp.full((cfg.batch_size,), user_id, jnp.int32)

    while len(kept) < cfg.target_per_user and stats["batches"] < cfg.max_batches:
        rng, srng = jax.random.split(rng)
        latents = generate_fn(srng, labels)
        images = decode_fn(latents)  # uint8 NHWC
        x = images.astype(np.float32) / 127.5 - 1.0
        probs = np.asarray(classifier_fn(x))
        stats["generated"] += len(images)
        stats["batches"] += 1

        pred = probs.argmax(axis=-1)
        conf = probs.max(axis=-1)
        accept = (pred == user_id) & (conf > cfg.confidence_threshold)

        if cfg.min_margin is not None:
            top2 = np.sort(probs, axis=-1)[:, -2]
            accept &= (conf - top2) >= cfg.min_margin
        if cfg.pixel_range is not None:
            accept &= pixel_sanity(images, *cfg.pixel_range)
        # features computed ONCE on the full (static-shape) batch: indexing
        # x[accept] instead would jit-compile a fresh program per distinct
        # accept count, and the prototype + diversity gates share the result
        need_feats = feature_fn is not None and (
            (cfg.max_prototype_sim is not None and prototypes is not None)
            or cfg.min_diversity is not None
        )
        feats = np.asarray(feature_fn(x)) if need_feats else None
        if cfg.max_prototype_sim is not None and prototypes is not None and feature_fn:
            fn = feats / np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
            pn = prototypes / np.maximum(
                np.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-12
            )
            max_sim = (fn @ pn.T).max(axis=-1)
            accept &= max_sim <= cfg.max_prototype_sim

        batch_kept = [images[i] for i in np.where(accept)[0]]
        if cfg.min_diversity is not None and feature_fn and batch_kept:
            if feature_diversity(feats[accept]) < cfg.min_diversity:
                batch_kept = batch_kept[: max(1, len(batch_kept) // 2)]
        kept.extend(batch_kept)
        stats["accepted"] = len(kept)

    kept = kept[: cfg.target_per_user]
    stats["accepted"] = len(kept)
    if save_dir and kept:
        from vavae_tpu.utils.png_native import write_pngs

        user_dir = os.path.join(save_dir, f"user_{user_id:02d}")
        os.makedirs(user_dir, exist_ok=True)
        write_pngs(
            np.stack(kept),
            [os.path.join(user_dir, f"{i:05d}.png") for i in range(len(kept))],
        )
    stats["acceptance_rate"] = stats["accepted"] / max(stats["generated"], 1)
    if return_images:
        stats["images"] = np.stack(kept) if kept else np.zeros(
            (0,) + (images.shape[1:] if stats["batches"] else (0,)), np.uint8
        )
    return stats


def run(
    config_path: str,
    user_ids: Optional[List[int]] = None,
    filter_cfg: Optional[FilterConfig] = None,
    save_dir: str = "output/filtered_samples",
    classifier_ckpt: Optional[str] = None,
    overrides: tuple = (),
) -> Dict[int, Dict]:
    """Full pipeline: DiT + VAE + classifier, users striped across processes
    (generate_conditional_samples_distributed.py:226-389 semantics)."""
    from vavae_tpu.apps.train_classifier import ClassifierTrainer
    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import (
        build_sample_fn,
        load_dit_params,
        load_latent_stats,
    )
    from vavae_tpu.tokenizer import VA_VAE
    from vavae_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from vavae_tpu.utils.config import load_config

    cfg = load_config(config_path, overrides=overrides)
    filter_cfg = filter_cfg or FilterConfig()
    if filter_cfg.cfg_scale is not None:
        cfg.sample.cfg_scale = float(filter_cfg.cfg_scale)
    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)
    params = load_dit_params(cfg, model, cfg.ckpt_path)
    # de-normalization stats when the checkpoint trained on normalized
    # latents — without them every decoded image is garbage and the filter
    # accepts nothing (same fail-fast as pipelines/sample.py do_sample)
    generate_fn = build_sample_fn(cfg, model, params,
                                  latent_stats=load_latent_stats(cfg))

    vae = VA_VAE(
        cfg.get("vae", {}).get("config"),
        ckpt_path=cfg.get("vae", {}).get("ckpt_path"),
        img_size=cfg.data.image_size,
    )

    if not classifier_ckpt:
        raise ValueError(
            "classifier_ckpt is required: filtering against a random-init "
            "classifier accepts ~nothing and burns the full "
            "max_batches×batch_size sampling budget per user (train one "
            "with apps.train_classifier and pass --classifier_ckpt)"
        )
    trainer = ClassifierTrainer(num_classes=cfg.data.num_classes)
    state = trainer.init_state(jax.random.PRNGKey(0), cfg.data.image_size)
    state = restore_checkpoint(classifier_ckpt, state)
    classifier_fn = trainer.predict_fn(state)
    feature_fn = trainer.feature_fn(state)

    if user_ids is None:
        from vavae_tpu.utils.config import num_real_users

        user_ids = list(range(num_real_users(cfg)))
    user_ids = user_ids[jax.process_index() :: jax.process_count()]

    results = {}
    rng = jax.random.PRNGKey(cfg.train.get("global_seed", 0))
    for uid in user_ids:
        stats = generate_and_filter_for_user(
            uid, generate_fn, vae.decode_to_images, classifier_fn,
            filter_cfg, jax.random.fold_in(rng, uid),
            feature_fn=feature_fn, save_dir=save_dir,
        )
        print(f"user {uid}: {stats}")
        results[uid] = stats
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--classifier_ckpt", default=None)
    ap.add_argument("--save_dir", default="output/filtered_samples")
    ap.add_argument("--users", default=None, help="comma-separated user ids")
    ap.add_argument("--target", type=int, default=800)
    ap.add_argument("--confidence", type=float, default=0.95)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--cfg_scale", type=float, default=None,
                    help="override sample.cfg_scale (reference app uses 12)")
    ap.add_argument("overrides", nargs="*", help="dotlist config overrides")
    args = ap.parse_args()
    users = [int(u) for u in args.users.split(",")] if args.users else None
    run(
        args.config,
        user_ids=users,
        filter_cfg=FilterConfig(
            confidence_threshold=args.confidence, target_per_user=args.target,
            batch_size=args.batch_size, cfg_scale=args.cfg_scale,
        ),
        save_dir=args.save_dir,
        classifier_ckpt=args.classifier_ckpt,
        overrides=tuple(args.overrides),
    )


if __name__ == "__main__":
    main()
