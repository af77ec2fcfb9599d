"""Iterative self-training: generate → filter → augment → finetune, repeat.

Parity target: iterative_finetune_dit.py:39,490 ``IterativeTraining`` — per
iteration: sample with the current DiT, keep classifier-confident samples,
encode them into latents, mix them into the real latent set, finetune the DiT
(optionally with a contrastive auxiliary on the conditioning embedding), then
loop. The sampler+decoder+encoder are jitted programs; only the accept logic
and dataset mixing run host-side.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.apps.generate_and_filter import FilterConfig, generate_and_filter_for_user


@dataclasses.dataclass
class IterativeTraining:
    trainer: "DiTTrainer"          # vavae_tpu.train.dit_trainer.DiTTrainer
    generate_fn_builder: Callable  # (state) -> generate_fn(rng, labels)
    decode_fn: Callable            # latents -> uint8 NHWC images
    encode_fn: Callable            # images [-1,1] NHWC -> normalized latents
    classifier_fn: Callable        # images [-1,1] -> softmax probs
    num_users: int
    iterations: int = 3
    steps_per_iteration: int = 1000
    samples_per_user: int = 100
    confidence: float = 0.9
    batch_size: int = 16
    max_batches_per_user: int = 20

    def _generate_synthetic(self, state, rng) -> tuple[np.ndarray, np.ndarray, int]:
        """Returns (synthetic latents, labels, total accepted)."""
        generate_fn = self.generate_fn_builder(state)
        fcfg = FilterConfig(
            confidence_threshold=self.confidence,
            target_per_user=self.samples_per_user,
            # generation batch follows the configured batch size (capped by
            # the per-user target — no point compiling a larger program)
            batch_size=min(self.samples_per_user, self.batch_size),
            max_batches=self.max_batches_per_user,
        )
        latents: List[np.ndarray] = []
        labels: List[int] = []
        accepted = 0
        for uid in range(self.num_users):
            stats = generate_and_filter_for_user(
                uid, generate_fn, self.decode_fn, self.classifier_fn,
                fcfg, jax.random.fold_in(rng, uid), return_images=True,
            )
            imgs = stats.pop("images")
            accepted += stats["accepted"]
            if len(imgs):
                x = imgs.astype(np.float32) / 127.5 - 1.0
                z = np.asarray(self.encode_fn(x))
                latents.append(z)
                labels.extend([uid] * len(z))
        if latents:
            return np.concatenate(latents), np.asarray(labels, np.int32), accepted
        return np.zeros((0,)), np.zeros((0,), np.int32), 0

    def run(self, state, real_batches_fn, seed: int = 0) -> tuple:
        """real_batches_fn(extra_latents, extra_labels, iteration) -> batch
        iterator over the real latent set augmented with the accepted
        synthetic latents (iterative_finetune_dit.py:490
        finetune_iteration). ``iteration`` keys the data shuffle so each
        round sees a DIFFERENT slice/order of the real set — a fixed seed
        would replay the identical leading subset every round when
        steps_per_iteration is less than one epoch."""
        history: List[Dict] = []
        rng = jax.random.PRNGKey(seed)
        for it in range(self.iterations):
            it_rng = jax.random.fold_in(rng, it)
            # 1) generate + filter + re-encode synthetic samples
            synth_z, synth_y, accepted = self._generate_synthetic(state, it_rng)
            history.append({"iteration": it, "accepted": accepted})

            # 2) finetune on the augmented latent set
            batches = real_batches_fn(
                synth_z if len(synth_z) else None,
                synth_y if len(synth_y) else None,
                it,
            )
            metrics = None
            for step, batch in enumerate(batches):
                if step >= self.steps_per_iteration:
                    break
                state, metrics = self.trainer.train_step(
                    state, it_rng, self.trainer.shard_batch(batch)
                )
            if metrics is not None:
                history[-1]["final_loss"] = float(jax.device_get(metrics["loss"]))
        return state, history


def main() -> None:
    """CLI mirroring iterative_finetune_dit.py: generate → filter via the
    classifier → re-encode accepted samples → finetune the DiT on the
    augmented latent set, repeated for --iterations rounds."""
    import argparse

    import vavae_tpu.utils.jax_cache  # noqa: F401
    from vavae_tpu.apps.train_classifier import ClassifierTrainer
    from vavae_tpu.data.latent_dataset import ImgLatentDataset
    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.parallel.mesh import make_mesh, multihost_init
    from vavae_tpu.pipelines.sample import build_sample_fn, load_dit_params
    from vavae_tpu.pipelines.train_dit import build_transport
    from vavae_tpu.tokenizer import VA_VAE
    from vavae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.utils.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="DiT config (ckpt_path set)")
    ap.add_argument("--classifier_ckpt", required=True)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--steps_per_iteration", type=int, default=1000)
    ap.add_argument("--samples_per_user", type=int, default=100)
    ap.add_argument("--confidence", type=float, default=0.9)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--out_dir", default="output/iterative")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    multihost_init()
    cfg = load_config(args.config, overrides=args.overrides)
    mesh = make_mesh()
    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    from vavae_tpu.utils.config import num_real_users

    num_users = num_real_users(cfg)
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)
    transport = build_transport(cfg)
    trainer = DiTTrainer(
        model, transport, mesh,
        lr=cfg.get("optimizer", {}).get("lr", 5e-5),
        ema_decay=cfg.train.get("ema_decay", 0.999),
    )
    params = load_dit_params(cfg, model, cfg.ckpt_path)
    C = model.in_channels
    state = trainer.init_state(
        jax.random.PRNGKey(0), (args.batch_size, latent_size, latent_size, C)
    )
    state = state.replace(
        params=params, ema_params=jax.tree_util.tree_map(jnp.copy, params)
    )
    state = trainer.replicate(state)

    dataset = ImgLatentDataset(
        cfg.data.data_path,
        latent_norm=cfg.data.get("latent_norm", False),
        # SAME default as pipelines/train_dit.py:126 (and the reference
        # train.py:124): a 1.0 default here fed finetuning latents 5.49×
        # the scale the checkpoint was trained on
        latent_multiplier=cfg.data.get("latent_multiplier", 0.18215),
    )
    mean, std = dataset.latent_stats  # (1, C, 1, 1)
    mean_nhwc = np.transpose(mean[0], (1, 2, 0))[None]
    std_nhwc = np.transpose(std[0], (1, 2, 0))[None]
    mult = dataset.latent_multiplier

    vae = VA_VAE(
        cfg.get("vae", {}).get("config"),
        ckpt_path=cfg.get("vae", {}).get("ckpt_path"),
        img_size=cfg.data.image_size,
    )

    clf = ClassifierTrainer(num_classes=cfg.data.num_classes)
    clf_state = clf.init_state(jax.random.PRNGKey(0), cfg.data.image_size)
    clf_state = restore_checkpoint(args.classifier_ckpt, clf_state)

    # build the jitted sampler ONCE; per-iteration weight swaps go through
    # the param-explicit jit_fn handle (no retrace/recompile, no host
    # round-trip of the EMA tree)
    base_sample = build_sample_fn(cfg, model, params, latent_stats=(mean, std))

    def generate_fn_builder(st):
        return lambda rng, labels: base_sample.jit_fn(st.ema_params, rng, labels)

    def encode_fn(images):
        z = np.asarray(vae.encode_images(np.asarray(images)))
        if cfg.data.get("latent_norm", False):
            z = (z - mean_nhwc) / std_nhwc
        return z * mult

    def real_batches_fn(extra_z, extra_y, iteration):
        def gen():
            extras = None
            if extra_z is not None and len(extra_z):
                order = np.random.default_rng(iteration).permutation(len(extra_z))
                extras = (extra_z[order], extra_y[order])
            ei = 0
            for lats, labels in dataset.batches(
                args.batch_size,
                seed=iteration,  # fresh shuffle per round (see run())
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            ):
                yield lats, labels
                # interleave one synthetic batch per real batch while any remain
                if extras is not None and ei < len(extras[0]):
                    ez = extras[0][ei : ei + args.batch_size]
                    ey = extras[1][ei : ei + args.batch_size]
                    ei += len(ez)
                    if len(ez) == args.batch_size:
                        yield ez.astype(np.float32), ey.astype(np.int32)

        return gen()

    it = IterativeTraining(
        trainer=trainer,
        generate_fn_builder=generate_fn_builder,
        decode_fn=vae.decode_to_images,
        encode_fn=encode_fn,
        classifier_fn=clf.predict_fn(clf_state),
        num_users=num_users,
        iterations=args.iterations,
        steps_per_iteration=args.steps_per_iteration,
        samples_per_user=args.samples_per_user,
        confidence=args.confidence,
        batch_size=args.batch_size,
    )
    state, history = it.run(state, real_batches_fn)
    for h in history:
        print(h)
    path = save_checkpoint(args.out_dir, int(jax.device_get(state.step)), jax.device_get(state))
    print(f"saved finetuned state to {path}")


if __name__ == "__main__":
    main()
