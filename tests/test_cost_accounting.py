"""Unit tests for the shared CFG-forward-equivalent cost accounting
(vavae_tpu/transport/cost.py) — the module the quality benches AND the
autotune CLI both publish cost columns through.

Hand-computed expectations: with cfg_interval_start = 0 the cond-only
phase is empty, so a fixed euler grid of N steps costs exactly N; heun
doubles it; a cache interval of k thins the CFG phase to ceil(N/k).
With a positive interval start the split index s makes the first s calls
half-batch (0.5 each).
"""
import math

from vavae_tpu.transport import create_transport
from vavae_tpu.transport.cost import (
    adaptive_cache_cost, fixed_grid_cost, split_idx,
)


def _tp():
    return create_transport("Linear", "velocity")


def test_no_interval_costs_are_exact():
    tp = _tp()
    assert split_idx(tp, 100, 0.0, 0.0) == 0
    assert fixed_grid_cost(tp, 100, 0.0, 0.0) == 100.0
    assert fixed_grid_cost(tp, 100, 0.0, 0.0, method="heun") == 200.0
    assert fixed_grid_cost(tp, 100, 0.0, 0.0, cache_interval=3) == math.ceil(
        100 / 3)
    assert adaptive_cache_cost(tp, 100, 0.0, 0.0, cfg_evals=37) == 37.0


def test_interval_split_weights_cond_phase_half():
    tp = _tp()
    s = split_idx(tp, 250, 0.3, 0.11)
    assert 0 < s < 250
    # euler: s half-batch calls + (250 - s) full CFG calls
    assert fixed_grid_cost(tp, 250, 0.3, 0.11) == 0.5 * s + (250 - s)
    # the cache thins ONLY the CFG phase
    assert fixed_grid_cost(tp, 250, 0.3, 0.11, cache_interval=6) == (
        0.5 * s + math.ceil((250 - s) / 6))
    # adaptive: cond phase exact euler + the sampler-reported CFG evals
    assert adaptive_cache_cost(tp, 250, 0.3, 0.11, cfg_evals=60) == (
        0.5 * s + 60)


def test_split_idx_monotone_in_start_and_shift_aware():
    tp = _tp()
    s_low = split_idx(tp, 250, 0.3, 0.05)
    s_high = split_idx(tp, 250, 0.3, 0.30)
    assert s_low <= s_high
    # the timestep shift compresses early model-time: the same start lands
    # at a different grid index than the unshifted grid
    assert split_idx(tp, 250, 0.0, 0.11) != split_idx(tp, 250, 0.3, 0.11)
    # reverse mirrors model time (1 - t): a descending grid crosses the
    # interval from the other side, so the index differs from forward
    s_fwd = split_idx(tp, 250, 0.3, 0.11, reverse=False)
    s_rev = split_idx(tp, 250, 0.3, 0.11, reverse=True)
    assert s_fwd != s_rev
