"""The shared CFG-forward-equivalent cost accounting (scripts/bench_common)
that every acceleration table in BASELINE.md keys its error-vs-cost Pareto
ranking on. Pinned here so the benches' published `cost` columns cannot
silently drift from the sampler's split rule or from each other (they were
previously copy-pasted per script).
"""
from __future__ import annotations

import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_common as bc  # noqa: E402


@pytest.fixture(scope="module")
def transport():
    from vavae_tpu.transport import create_transport

    return create_transport("Linear", "velocity")


def test_fixed_grid_cost_accounting(transport):
    # the production grid: 250 steps, shift 0.3, CFG interval start 0.11
    s = bc.split_idx(transport, 250, 0.3, 0.11)
    assert 0 < s < 250  # a real two-phase split
    euler = bc.fixed_grid_cost(transport, 250, 0.3, 0.11)
    # cond-only steps at half batch count 0.5, CFG steps count 1
    assert euler == 0.5 * s + (250 - s)
    # heun makes 2 model evals per step in BOTH phases
    assert bc.fixed_grid_cost(transport, 250, 0.3, 0.11, "heun") == 2 * euler
    # the velocity cache thins only the CFG phase (ceil of the window count)
    cached = bc.fixed_grid_cost(transport, 250, 0.3, 0.11, cache_interval=3)
    assert cached == 0.5 * s + math.ceil((250 - s) / 3)
    assert cached < euler


def test_fixed_grid_cost_degenerate_split(transport):
    # interval start 0 → no cond-only phase: every step is a full CFG eval
    assert bc.split_idx(transport, 100, 0.0, 0.0) == 0
    assert bc.fixed_grid_cost(transport, 100, 0.0, 0.0) == 100.0


def test_split_idx_matches_sampler_grid(transport):
    # the helper must mirror sample_ode_cfg's split rule: searchsorted of
    # cfg_interval_start over the shifted grid's step starts
    import numpy as np

    from vavae_tpu.transport import ode as ode_mod

    t0_i, t1_i = transport.check_interval(eval=True, sde=False)
    g = np.asarray(ode_mod.time_grid(t0_i, t1_i, 64, 0.3))
    assert bc.split_idx(transport, 64, 0.3, 0.11) == int(
        np.searchsorted(g[:-1], 0.11))


def test_dopri5_cost_stats():
    # 2 evals seed the integrator + 6 per attempted RK45 step; cond phase
    # (half batch) weighs 0.5; a missing phase contributes nothing
    only_cfg = {"cond": None, "cfg": {"naccept": 10, "nreject": 2}}
    assert bc.dopri5_cost(only_cfg) == 2 + 6 * 12
    both = {"cond": {"naccept": 4, "nreject": 0},
            "cfg": {"naccept": 10, "nreject": 2}}
    assert bc.dopri5_cost(both) == 0.5 * (2 + 6 * 4) + (2 + 6 * 12)


def test_reverse_split_matches_sampler_mirror(transport):
    """With reverse=True the grid descends and MODEL time is 1 − grid-t; a
    shifted reverse grid is NOT the mirror of the forward one, so the cost
    helper must mirror the sampler's own rule, not reuse the forward split
    (round-3 advisor finding)."""
    import numpy as np

    from vavae_tpu.transport import ode as ode_mod

    t0_r, t1_r = transport.check_interval(eval=True, sde=False, reverse=True)
    g = np.asarray(ode_mod.time_grid(t0_r, t1_r, 64, 0.3))
    model_t = 1.0 - g
    expect = int(np.searchsorted(model_t[:-1], 0.11))
    assert bc.split_idx(transport, 64, 0.3, 0.11, reverse=True) == expect
    # and it genuinely differs from the forward split on a shifted grid
    assert expect != bc.split_idx(transport, 64, 0.3, 0.11)
    # fixed_grid_cost threads the flag
    s = expect
    assert bc.fixed_grid_cost(transport, 64, 0.3, 0.11, reverse=True) == (
        0.5 * s + (64 - s))


def test_adaptive_cache_cost(transport):
    """Adaptive cache: exact half-batch cond phase + the measured CFG eval
    count from the sampler's own stats."""
    s = bc.split_idx(transport, 250, 0.3, 0.11)
    assert bc.adaptive_cache_cost(transport, 250, 0.3, 0.11, 57) == 0.5 * s + 57
    # a jax/np scalar works too
    import numpy as np

    assert bc.adaptive_cache_cost(
        transport, 250, 0.3, 0.11, np.int32(57)) == 0.5 * s + 57
