"""DiT training: jitted data-parallel train/eval steps over a device mesh.

Parity target: the hot loop of LightningDiT/train.py:192-268 (velocity MSE +
cosine loss, AdamW(β2 cfg, wd 0), optional grad-norm clip, per-step EMA) and
its small-data variant train_dit_s_official.py (configurable EMA decay,
validation loss, early stopping — handled by the loop driver in
train/loop.py).

TPU-native design: one ``jit`` with explicit NamedShardings — batch sharded
over the ("data","fsdp") axes, params/opt-state replicated (pure DP) —
XLA inserts the gradient all-reduce over ICI (no DDP/NCCL analogue needed).
RNG: the label-dropout and t/x0 draws fold in the step so every step is
deterministic given the initial seed.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vavae_tpu.models.dit import LightningDiT
from vavae_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    TENSOR_AXIS,
    data_sharding,
    donate_state_argnums,
    replicated,
)
from vavae_tpu.train.ema import update_ema
from vavae_tpu.transport.transport import Transport


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any


@dataclasses.dataclass
class DiTTrainer:
    model: LightningDiT
    transport: Transport
    mesh: Mesh
    lr: float = 2e-4
    beta2: float = 0.95
    weight_decay: float = 0.0
    max_grad_norm: Optional[float] = None
    ema_decay: float = 0.9999
    # Update the EMA every k OPTIMIZER steps with decay**k instead of every
    # step (config key `train.ema_every`). 1 = exact reference semantics
    # (LightningDiT/train.py:213, per-step). k>1 keeps the same geometric
    # time constant (decay^k applied 1/k as often) while cutting the fp32
    # EMA read+write sweep k-fold: on non-update steps the donated EMA
    # leaves pass through the jitted step UNCHANGED, which XLA aliases
    # buffer-for-buffer — zero HBM traffic, vs ~6.75 GB/step for XL/1.
    # With grad_accum > 1, the EMA ticks once per APPLY step: decaying it on
    # accumulation micro-steps (where MultiSteps emits zero updates and
    # params don't move) would blend toward unchanged params accum× per
    # optimizer step, silently shortening the configured time constant by
    # the accumulation factor.
    ema_every: int = 1
    # dtype of Adam's first moment. None = fp32 (exact reference parity, the
    # default). "bfloat16" halves its HBM footprint AND traffic — the
    # optimizer+EMA state sweep, not compute, bounds small-per-chip-batch
    # steps; set via the `optimizer.adam_mu_dtype` config key.
    adam_mu_dtype: Optional[str] = None
    # cosine LR schedule (reference config_dit_base.yaml:70-74); None = constant
    lr_schedule: Optional[str] = None
    warmup_steps: int = 0
    total_steps: int = 0
    min_lr: float = 0.0
    # gradient accumulation (reference step12:355 / Lightning accumulate_grad_batches)
    grad_accum: int = 1

    def __post_init__(self):
        if self.lr_schedule == "cosine":
            lr = optax.warmup_cosine_decay_schedule(
                0.0, self.lr, max(self.warmup_steps, 1),
                max(self.total_steps, self.warmup_steps + 1), self.min_lr,
            )
        else:
            lr = self.lr
        chain = []
        if self.max_grad_norm:
            chain.append(optax.clip_by_global_norm(self.max_grad_norm))
        chain.append(
            optax.adamw(
                lr, b1=0.9, b2=self.beta2, weight_decay=self.weight_decay,
                mu_dtype=self.adam_mu_dtype,
            )
        )
        tx = optax.chain(*chain)
        if self.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.grad_accum)
        self.tx = tx
        if self.ema_every < 1:
            raise ValueError(f"ema_every must be >= 1, got {self.ema_every}")
        self._jit_train = {}  # keyed by do_ema (two programs when ema_every > 1)
        self._jit_eval = None
        # python mirror of state.step for the ema cadence, plus the state
        # object it was advanced against — any state we didn't produce
        # (restore, retry after a failed dispatch, a second init_state)
        # re-anchors from the device counter instead of silently desyncing
        self._host_step = None
        self._last_state = None

    # -- state ----------------------------------------------------------------

    def init_state(self, rng: jax.Array, batch_shape: tuple) -> TrainState:
        x = jnp.zeros(batch_shape, jnp.float32)
        t = jnp.zeros((batch_shape[0],), jnp.float32)
        y = jnp.zeros((batch_shape[0],), jnp.int32)
        params = self.model.init({"params": rng}, x, t, y)["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # REAL copies: params and ema must not share buffers — the state
            # is donated every step, and donating one buffer through two tree
            # leaves is undefined (fails with InvalidArgument on TPU runtimes)
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
        )

    # tensor-parallel placement rules: Megatron-style column-parallel for the
    # fan-out projections (qkv, w12/fc1), row-parallel for the fan-in ones
    # (proj, w3/fc2). Dims counted from the END (scanned block params carry a
    # leading depth axis). XLA/GSPMD propagates the activation shardings and
    # inserts the one all-reduce per block pair — no collective code here.
    _TP_RULES = (
        (("attn", "qkv", "kernel"), -1),
        (("attn", "qkv", "bias"), -1),
        (("attn", "proj", "kernel"), -2),
        (("mlp", "w12", "kernel"), -1),
        (("mlp", "w12", "bias"), -1),
        (("mlp", "w3", "kernel"), -2),
        (("mlp", "fc1", "kernel"), -1),
        (("mlp", "fc1", "bias"), -1),
        (("mlp", "fc2", "kernel"), -2),
    )

    def _leaf_sharding(self, path: str, x) -> NamedSharding:
        """Placement for one state leaf: tensor-parallel dim first (by rule),
        then FSDP (ZeRO-3 style) on the largest remaining fsdp-divisible dim.
        (SURVEY.md §2.6 — sharding annotations instead of NCCL code)."""
        fsdp = self.mesh.shape[FSDP_AXIS]
        tensor = self.mesh.shape[TENSOR_AXIS]
        shape = getattr(x, "shape", ())
        nd = len(shape)
        if nd == 0:
            return replicated(self.mesh)
        spec = [None] * nd
        if tensor > 1:
            for keys, dim in self._TP_RULES:
                if all(k in path for k in keys) and nd + dim >= 0:
                    d = nd + dim
                    if shape[d] % tensor == 0 and shape[d] >= tensor:
                        spec[d] = TENSOR_AXIS
                    break
        if fsdp > 1:
            for d in sorted(range(nd), key=lambda d: shape[d], reverse=True):
                if spec[d] is None and shape[d] % fsdp == 0 and shape[d] >= fsdp:
                    spec[d] = FSDP_AXIS
                    break
        return NamedSharding(self.mesh, P(*spec))

    def state_shardings(self, state: TrainState):
        def to_path(kp) -> str:
            return "/".join(
                str(getattr(k, "key", getattr(k, "name", k))) for k in kp
            )

        return jax.tree_util.tree_map_with_path(
            lambda kp, x: self._leaf_sharding(to_path(kp), x), state
        )

    def replicate(self, state: TrainState) -> TrainState:
        """Place state on the mesh: replicated over data, FSDP-sharded over
        the fsdp axis (a pure replicate when fsdp == 1)."""
        return jax.device_put(state, self.state_shardings(state))

    def shard_batch(self, batch):
        # multi-process aware: assembles a global array from per-process
        # shards when running under jax.distributed (parallel/mesh.py)
        from vavae_tpu.parallel.mesh import shard_batch as _shard_batch

        return _shard_batch(self.mesh, batch)

    # -- steps ------------------------------------------------------------------

    def _loss_fn(self, params, rng, x, y):
        drop_rng, t_rng = jax.random.split(rng)

        def model_fn(xt, t, **kw):
            return self.model.apply(
                {"params": params},
                xt,
                t,
                y,
                train=True,
                rngs={"label_dropout": drop_rng},
            )

        terms = self.transport.training_losses(t_rng, model_fn, x)
        mse = terms["loss"].mean()
        loss = mse
        if "cos_loss" in terms:
            loss = loss + terms["cos_loss"].mean()
        return loss, {"loss": mse, "total_loss": loss}

    def _train_step(self, state: TrainState, rng: jax.Array, x, y, *, do_ema: bool = True):
        step_rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, step_rng, x, y
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if do_ema:
            new_ema = update_ema(
                state.ema_params, new_params, self.ema_decay ** self.ema_every
            )
        else:
            # pass the donated EMA leaves through untouched — XLA aliases
            # input to output, so the skip costs nothing
            new_ema = state.ema_params
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                ema_params=new_ema,
                opt_state=new_opt,
            ),
            metrics,
        )

    def _eval_step(self, state: TrainState, rng: jax.Array, x, y, sp_lo, sp_hi):
        def model_fn(xt, t, **kw):
            return self.model.apply({"params": params_ref}, xt, t, y)

        params_ref = state.params
        terms = self.transport.training_losses(
            rng, model_fn, x, sp_timesteps=(sp_lo, sp_hi)
        )
        return {"val_loss": terms["loss"].mean()}

    # -- jitted entry points ------------------------------------------------------

    def train_step(self, state: TrainState, rng: jax.Array, batch):
        if self._host_step is None or state is not self._last_state:
            # one host sync to anchor the ema cadence to the persisted step
            # counter — at (re)start, after checkpoint restore, and after a
            # failed/retried dispatch (any state object this trainer didn't
            # return). The steady-state loop passes our own output back, so
            # this costs nothing per step.
            self._host_step = int(state.step)
        # cadence counts OPTIMIZER steps: micro-step period = ema_every×accum,
        # phase-aligned with MultiSteps' apply step (both count from step 0)
        period = self.ema_every * self.grad_accum
        do_ema = period == 1 or (self._host_step + 1) % period == 0
        if do_ema not in self._jit_train:
            batch_shard = data_sharding(self.mesh, 1)
            rep = replicated(self.mesh)
            state_sh = self.state_shardings(state)
            self._jit_train[do_ema] = jax.jit(
                partial(self._train_step, do_ema=do_ema),
                in_shardings=(state_sh, rep, data_sharding(self.mesh, 4), batch_shard),
                out_shardings=(state_sh, rep),
                donate_argnums=donate_state_argnums(),
            )
        x, y = batch
        new_state, metrics = self._jit_train[do_ema](state, rng, x, y)
        # advance the mirror only after a successful dispatch
        self._host_step += 1
        self._last_state = new_state
        return new_state, metrics

    def eval_step(self, state: TrainState, rng: jax.Array, batch, sp=(0.0, 1.0)):
        if self._jit_eval is None:
            rep = replicated(self.mesh)
            self._jit_eval = jax.jit(
                self._eval_step,
                in_shardings=(self.state_shardings(state), rep, data_sharding(self.mesh, 4), data_sharding(self.mesh, 1), None, None),
                out_shardings=rep,
                static_argnums=(),
            )
        x, y = batch
        return self._jit_eval(state, rng, x, y, sp[0], sp[1])
