"""CFG-forward-equivalent cost accounting for sampler configurations.

One shared implementation for every consumer that publishes a cost column —
the quality benches (scripts/bench_common.py re-exports these), the
autotune CLI (apps/autotune_sampler.py), and any future gauge — so the
accounting cannot silently diverge from the sampler's split rule or from
itself across tables.

Unit: ONE full-batch CFG model forward = 1.0. The cond-only phase before
``cfg_interval_start`` runs at half batch and counts 0.5 per call (the
reference pays the same shape of cost: its sampler batches cond+uncond,
inference.py:200-228 + transport/utils.py cfg wrapper).
"""
from __future__ import annotations

import math


def split_idx(transport, num_steps: int, shift: float, start: float,
              reverse: bool = False) -> int:
    """Cond-only step count before MODEL-t crosses ``cfg_interval_start`` on
    the shifted grid — mirrors sample_ode_cfg's split rule
    (transport/sampler.py). ``reverse`` mirrors the sampler exactly: the
    grid descends and model time is 1 − grid-t (a shifted REVERSE grid is
    NOT the mirror of the forward one, so the flag matters for the
    published cost column)."""
    import numpy as np

    from vavae_tpu.transport import ode as ode_mod

    t0_i, t1_i = transport.check_interval(eval=True, sde=False, reverse=reverse)
    g = np.asarray(ode_mod.time_grid(t0_i, t1_i, num_steps, shift))
    model_t = (1.0 - g) if reverse else g
    return int(np.searchsorted(model_t[:-1], start))


def fixed_grid_cost(transport, num_steps: int, shift: float, start: float,
                    method: str = "euler", cache_interval: int = 1,
                    reverse: bool = False) -> float:
    """Cost for the fixed-grid methods: the cond-only phase runs at half
    batch (0.5 per call), heun makes 2 evals per step, and the velocity
    cache thins only the CFG phase."""
    s = split_idx(transport, num_steps, shift, start, reverse)
    per = 2.0 if method == "heun" else 1.0
    n_cfg = (num_steps - s if cache_interval <= 1
             else math.ceil((num_steps - s) / cache_interval))
    return per * (0.5 * s + n_cfg)


def adaptive_cache_cost(transport, num_steps: int, shift: float, start: float,
                        cfg_evals, reverse: bool = False) -> float:
    """Cost for the ADAPTIVE velocity cache: the cond-only phase is exact
    euler at half batch; the CFG phase's data-dependent eval count comes
    from the sampler's own stats (``return_stats=True`` →
    ``{"cfg_evals": n, ...}``)."""
    s = split_idx(transport, num_steps, shift, start, reverse)
    return 0.5 * s + float(int(cfg_evals))


def dopri5_cost(stats) -> float:
    """Cost from one dopri5 run's controller stats: 2 evals seed the
    integrator, 6 per attempted (accepted or rejected) RK45 step; the cond
    phase runs at half batch (0.5 weight)."""
    return float(sum(
        wgt * (2 + 6 * (int(st["naccept"]) + int(st["nreject"])))
        for ph, wgt in (("cond", 0.5), ("cfg", 1.0))
        for st in [stats[ph]] if st is not None))
