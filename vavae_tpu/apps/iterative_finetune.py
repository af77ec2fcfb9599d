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
            batch_size=min(self.samples_per_user, 50),
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
        """real_batches_fn(extra_latents, extra_labels) -> batch iterator over
        the real latent set augmented with the accepted synthetic latents
        (iterative_finetune_dit.py:490 finetune_iteration)."""
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
