"""LR schedules (optax-compatible callables step -> lr factor or lr).

Parity targets:
  - vavae/ldm/lr_scheduler.py:4-91 — LambdaWarmUpCosineScheduler (warmup to
    lr_max, cosine to lr_min) and the cycle-based Scheduler2 variant.
  - microdoppler_finetune/utils_scheduler.py — warmup wrappers.
  - config_dit_base.yaml scheduler block (type: cosine, T_max, eta_min).

These return plain callables usable as optax learning-rate schedules.

Usage map: the DiT trainer's jitted path takes the equivalent
optax.warmup_cosine_decay_schedule, driven by the config `scheduler:` block
(pipelines/train_dit.py). This module provides the host-side/epoch-level
variants — per-stage LR selection for the VA-VAE recipes and the reference's
cycle-based Scheduler2 semantics that optax has no equivalent for.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np


def warmup_cosine(
    lr_max: float,
    warmup_steps: int,
    total_steps: int,
    lr_start: float = 0.0,
    lr_min: float = 0.0,
) -> Callable:
    """Linear warmup lr_start→lr_max then cosine decay to lr_min
    (LambdaWarmUpCosineScheduler semantics)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warmup_steps, 1)
        t = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_cosine_cycles(
    lr_maxes: Sequence[float],
    lr_mins: Sequence[float],
    warmups: Sequence[int],
    cycle_lengths: Sequence[int],
    lr_starts: Sequence[float] | None = None,
) -> Callable:
    """Cycle-based warmup-cosine (LambdaWarmUpCosineScheduler2,
    lr_scheduler.py:36-80): each cycle has its own warmup / max / min / start.
    Host-side helper (python control flow), suitable for epoch-level LR.

    ``lr_starts`` is the reference's separate ``f_start`` list — the warmup
    ramps lr_start→lr_max, NOT lr_min→lr_max (with the common LDM config
    f_start=[1e-6], f_min=[1.0], f_max=[1.0] those differ: ramping from
    lr_min would yield a constant 1.0 and silently disable warmup). Defaults
    to zeros like warmup_cosine's lr_start."""
    if lr_starts is None:
        lr_starts = [0.0] * len(lr_maxes)
    # reference cycle lookup: n <= cum_cycles[k+1] keeps a boundary step in
    # the EARLIER cycle (find_in_interval, lr_scheduler.py:52-57)
    cums = np.cumsum([0] + list(cycle_lengths))

    def schedule(step: int) -> float:
        step = int(step)
        cycle = 0
        for i, cl in enumerate(cums[1:]):
            if step <= cl:
                cycle = i
                break
        else:
            cycle = len(cycle_lengths) - 1
        s = step - int(cums[cycle])
        if s < warmups[cycle]:
            return lr_starts[cycle] + (lr_maxes[cycle] - lr_starts[cycle]) * s / max(
                warmups[cycle], 1
            )
        t = (s - warmups[cycle]) / max(cycle_lengths[cycle] - warmups[cycle], 1)
        t = min(t, 1.0)
        return lr_mins[cycle] + 0.5 * (lr_maxes[cycle] - lr_mins[cycle]) * (
            1.0 + math.cos(math.pi * t)
        )

    return schedule


def cosine_epochs(lr: float, t_max: int, eta_min: float = 0.0) -> Callable:
    """torch CosineAnnealingLR equivalent (config_dit_base.yaml:70-74)."""

    def schedule(epoch: int) -> float:
        return eta_min + 0.5 * (lr - eta_min) * (
            1.0 + math.cos(math.pi * min(epoch, t_max) / max(t_max, 1))
        )

    return schedule
