"""LoRA finetuning: optimize only the adapter tree, base weights frozen.

Parity target: step11_lora_finetune_dit_xl.py — rank-r adapters on
qkv/proj/w12/w3, trained with the standard transport loss, LoRA-only
checkpoints. The reference splits DiT and VAE across 2 GPUs to fit; here the
base params are a frozen (non-donated, replicated) jit argument and only the
tiny LoRA tree carries optimizer state, so XL finetunes on one chip.

The merge W + (α/r)·A·B happens INSIDE the jitted loss (train/lora.py
merge_lora) — a few small matmuls XLA fuses; grads flow to A/B only.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from vavae_tpu.models.dit import LightningDiT
from vavae_tpu.parallel.mesh import (
    data_sharding,
    donate_state_argnums,
    replicated,
    shard_batch as _mesh_shard_batch,
)
from vavae_tpu.train.ema import update_ema
from vavae_tpu.train.lora import init_lora, merge_lora
from vavae_tpu.transport.transport import Transport


class LoRAState(struct.PyTreeNode):
    step: jax.Array
    lora: Any
    ema_lora: Any
    opt_state: Any


@dataclasses.dataclass
class LoRATrainer:
    model: LightningDiT
    transport: Transport
    mesh: Mesh
    rank: int = 8
    alpha: float = 16.0
    targets: tuple = ("qkv", "proj", "w12", "w3")
    lr: float = 1e-4
    weight_decay: float = 0.0
    ema_decay: float = 0.999
    max_grad_norm: Optional[float] = None

    def __post_init__(self):
        chain = []
        if self.max_grad_norm:
            chain.append(optax.clip_by_global_norm(self.max_grad_norm))
        chain.append(optax.adamw(self.lr, weight_decay=self.weight_decay))
        tx = optax.chain(*chain)
        # alpha is a HYPERPARAMETER stored per-layer in the lora tree (so the
        # merge stays a pure pytree op) — the optimizer must never move it
        self.tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            lambda lora: jax.tree_util.tree_map_with_path(
                lambda kp, _: "freeze"
                if str(getattr(kp[-1], "key", "")) == "alpha"
                else "train",
                lora,
            ),
        )
        self._jit_train = None

    def init_state(self, rng: jax.Array, base_params: Any) -> LoRAState:
        lora = init_lora(rng, base_params, self.rank, self.alpha, self.targets)
        return LoRAState(
            step=jnp.zeros((), jnp.int32),
            lora=lora,
            ema_lora=jax.tree_util.tree_map(jnp.copy, lora),
            opt_state=self.tx.init(lora),
        )

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, replicated(self.mesh))

    def shard_batch(self, batch):
        # the mesh helper handles multi-process placement (device_put alone
        # cannot target non-addressable devices under jax.distributed)
        return _mesh_shard_batch(self.mesh, batch)

    def merged_params(self, base_params: Any, state: LoRAState, ema: bool = True) -> Any:
        """Export: effective weights with the (EMA) adapters folded in."""
        lora = state.ema_lora if ema else state.lora
        return merge_lora(base_params, jax.device_get(lora), self.rank)

    def _loss(self, lora, base_params, rng, x, y):
        params = merge_lora(base_params, lora, self.rank)
        drop_rng, t_rng = jax.random.split(rng)

        def model_fn(xt, t, **kw):
            return self.model.apply(
                {"params": params}, xt, t, y, train=True,
                rngs={"label_dropout": drop_rng},
            )

        terms = self.transport.training_losses(t_rng, model_fn, x)
        loss = terms["loss"].mean()
        if "cos_loss" in terms:
            loss = loss + terms["cos_loss"].mean()
        return loss, {"loss": terms["loss"].mean(), "total_loss": loss}

    def _train_step(self, state: LoRAState, base_params, rng, x, y):
        step_rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.lora, base_params, step_rng, x, y
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.lora)
        new_lora = optax.apply_updates(state.lora, updates)
        new_ema = update_ema(state.ema_lora, new_lora, self.ema_decay)
        return (
            LoRAState(state.step + 1, new_lora, new_ema, new_opt),
            metrics,
        )

    def train_step(self, state: LoRAState, base_params, rng, batch):
        if self._jit_train is None:
            rep = replicated(self.mesh)
            self._jit_train = jax.jit(
                self._train_step,
                in_shardings=(rep, rep, rep, data_sharding(self.mesh, 4),
                              data_sharding(self.mesh, 1)),
                out_shardings=(rep, rep),
                # donate ONLY the LoRA state; base params stay resident
                donate_argnums=donate_state_argnums(),
            )
        x, y = batch
        return self._jit_train(state, base_params, rng, x, y)
