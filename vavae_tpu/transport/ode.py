"""ODE integrators compiled as single XLA programs.

Parity target: LightningDiT/transport/integrators.py:77-126 (fixed-grid
euler/heun over a FLUX-style time-shifted grid, plus torchdiffeq dopri5).

TPU-first design: the fixed-step samplers are a ``lax.scan`` over the time
grid — the whole 250-step sampling trajectory is ONE compiled program (the
reference does a Python loop of 250 CUDA launches through torchdiffeq).
The adaptive dopri5 is a bounded ``lax.while_loop`` with PI step-size
control, matching torchdiffeq's defaults closely enough for trajectory
parity at the reference tolerances.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def timestep_shift_grid(t: np.ndarray, shift: float) -> np.ndarray:
    """FLUX time warp t' = s·t / (1 + (s-1)·t) (integrators.py:96-101)."""
    if shift <= 0:
        return t
    return shift * t / (1.0 + (shift - 1.0) * t)


def time_grid(t0: float, t1: float, num_steps: int, timestep_shift: float = 0.0) -> np.ndarray:
    t = np.linspace(t0, t1, num_steps, dtype=np.float64)
    return timestep_shift_grid(t, timestep_shift).astype(np.float32)


def odeint_euler(drift: Callable, x: jax.Array, t: jax.Array) -> jax.Array:
    """Euler over the given grid; returns the final state.

    drift(x, t_batched) -> dx/dt with t broadcast to (B,).
    """
    B = x.shape[0]

    def step(carry, tt):
        x = carry
        t_cur, t_next = tt
        dt = t_next - t_cur
        v = drift(x, jnp.full((B,), t_cur, x.dtype))
        return x + dt.astype(x.dtype) * v, None

    pairs = jnp.stack([t[:-1], t[1:]], axis=-1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def odeint_euler_split(
    drift_a: Callable,
    drift_b: Callable,
    lift: Callable,
    x: jax.Array,
    t: jax.Array,
    split_idx: int,
) -> jax.Array:
    """Euler with a phase change at ``t[split_idx]``: integrate with
    ``drift_a`` before the boundary, apply ``lift`` to the state, then
    integrate with ``drift_b``.

    Built for CFG-interval sampling (inference.py cfg_interval_start): below
    the interval the reference computes BOTH CFG halves and throws the
    uncond one away (lightningdit.py:436-439). Running that phase with a
    cond-only model at half batch is numerically identical and saves
    ~0.5 × (split fraction) of total sampling FLOPs.
    """
    B = x.shape[0]

    def mk_step(drift):
        def step(carry, tt):
            x = carry
            t_cur, t_next = tt
            dt = t_next - t_cur
            v = drift(x, jnp.full((x.shape[0],), t_cur, x.dtype))
            return x + dt.astype(x.dtype) * v, None

        return step

    pairs = jnp.stack([t[:-1], t[1:]], axis=-1)
    split_idx = max(0, min(int(split_idx), pairs.shape[0]))
    if split_idx > 0:
        x, _ = jax.lax.scan(mk_step(drift_a), x, pairs[:split_idx])
    x = lift(x)
    if split_idx < pairs.shape[0]:
        x, _ = jax.lax.scan(mk_step(drift_b), x, pairs[split_idx:])
    return x


def odeint_euler_cached(
    drift: Callable,
    x: jax.Array,
    t: jax.Array,
    cache_interval: int = 1,
    order: int = 1,
) -> jax.Array:
    """Euler with velocity caching: the model is evaluated only every
    ``cache_interval``-th step (training-free acceleration in the spirit of
    the feature/trajectory caching literature for rectified-flow DiTs —
    PAPERS.md). The rectified-flow velocity field changes slowly along most
    of the trajectory, so small intervals (2-4) trade little quality for a
    proportional FLOP cut. ``cache_interval=1`` is exactly ``odeint_euler``.

    Between evaluations, ``order`` picks the forecast:
      - 0: zero-order hold — reuse the last evaluated velocity verbatim.
      - 1: linear forecast v(t) ≈ v_k + (t - t_k)·(v_k - v_{k-1})/(t_k -
        t_{k-1}) from the LAST TWO evaluations (the forecast-then-hold idea
        of the caching papers). Identical model-eval count and memory-
        bandwidth cost, strictly smaller truncation error on smooth
        trajectories; exact for any velocity field linear in t.
      - 2: quadratic Newton forecast from the LAST THREE evaluations
        (divided differences d1 = f[t_{k-1}, t_k], d2 = f[t_{k-2}, t_{k-1},
        t_k]; v(t) ≈ v_k + (t-t_k)·d1 + (t-t_k)(t-t_{k-1})·d2). One extra
        latent-sized carry buffer, same eval count; exact for any velocity
        field quadratic in t. Each lower order gates in until enough
        evaluations exist (hold → linear → quadratic).
    The grid may be non-uniform (timestep shift) — the forecast uses actual
    t gaps, not step counts."""
    # validate BEFORE the caching-off early return so a bad order in a config
    # fails when written, not when cache_interval is later flipped on
    if order not in (0, 1, 2):
        raise ValueError(f"velocity-cache order must be 0, 1 or 2, got {order}")
    if cache_interval <= 1:
        return odeint_euler(drift, x, t)
    B = x.shape[0]
    pairs = jnp.stack([t[:-1], t[1:]], axis=-1)
    idx = jnp.arange(pairs.shape[0])
    zero = jnp.zeros_like(x)
    o1 = 1.0 if order >= 1 else 0.0
    o2 = 1.0 if order >= 2 else 0.0

    def step(carry, inp):
        x, v_last, d1, d2, t_last, t_prev = carry
        tt, i = inp
        t_cur, t_next = tt[0], tt[1]

        def evaluate():
            # cast: a bf16 model output must match the fp32 carried cache
            v = drift(x, jnp.full((B,), t_cur, x.dtype)).astype(x.dtype)
            dt1 = t_cur - t_last
            safe1 = jnp.where(i == 0, jnp.ones_like(dt1), dt1)
            g1 = jnp.where(i == 0, 0.0, 1.0).astype(x.dtype)
            new_d1 = g1 * (v - v_last) / safe1.astype(x.dtype)
            # d2 needs THREE evaluations: the carried d1 is only valid from
            # the second (i == cache_interval), so d2 gates in at the third
            dt2 = t_cur - t_prev
            safe2 = jnp.where(i <= cache_interval, jnp.ones_like(dt2), dt2)
            g2 = jnp.where(i <= cache_interval, 0.0, 1.0).astype(x.dtype)
            new_d2 = g2 * (new_d1 - d1) / safe2.astype(x.dtype)
            return v, v, new_d1, new_d2, t_cur, t_last

        def forecast():
            dt = (t_cur - t_last).astype(x.dtype)
            dtp = (t_cur - t_prev).astype(x.dtype)
            v = v_last + o1 * dt * d1 + o2 * dt * dtp * d2
            return v, v_last, d1, d2, t_last, t_prev

        v, v_last, d1, d2, t_last, t_prev = jax.lax.cond(
            i % cache_interval == 0, evaluate, forecast
        )
        return (
            (x + (t_next - t_cur).astype(x.dtype) * v, v_last, d1, d2, t_last, t_prev),
            None,
        )

    (x, *_), _ = jax.lax.scan(
        step, (x, zero, zero, zero, t[0], t[0]), (pairs, idx)
    )
    return x


def odeint_euler_cached_adaptive(
    drift: Callable,
    x: jax.Array,
    t: jax.Array,
    tol: float = 0.02,
    max_interval: int = 8,
    order: int = 1,
    with_stats: bool = False,
    with_floor: bool = False,
):
    """Velocity-cached euler whose cache interval is CONTROLLED, not fixed.

    Round-3's 33-point acceleration matrix proved two things (BASELINE.md):
    the velocity cache is the robust accelerated family (it inherits euler's
    stability and never extrapolates past one window), and its FIXED k is a
    blunt instrument — a k that is cheap on a mild field blows up the error
    on a stiff one (vcache-k3 2.10% on the 2400:6.7 point) while a safe k
    buys little on the mild fields. This variant closes that gap with a
    step-size-controller-style loop on information the sampler already has
    for free:

      at every model evaluation, compare the velocity the model just
      returned against what the cache's ``order``-degree forecast predicted
      for that time — the REALIZED forecast error over the elapsed gap.
      With e = rms(v − v_forecast)/rms(v) (batch-global, fp32) and the
      forecast error growing ~ gap^(order+1) on a smooth field, the next
      gap is   k ← clip(round(k · 0.9 · (tol/e)^(1/(order+1))), 1,
      max_interval)   — exactly the classic local-error controller, applied
      to the cache interval instead of the step size.

    Cost stays static-shaped: the program is the same ``lax.scan`` over the
    fixed (possibly timestep-shifted) grid as ``odeint_euler_cached``, each
    step choosing evaluate-vs-forecast with a scalar ``lax.cond``; worst
    case is one evaluation per step (= exact euler), best case one per
    ``max_interval`` steps. The actually-used evaluation count is data-
    dependent — ``with_stats=True`` returns ``(x, n_evals)`` so benchmarks
    can report the TRUE cost instead of a nominal one.

    The first ``order + 1`` evaluations are forced to consecutive steps
    (the forecast needs that much history before its error means anything).

    **Noise floor.** On TRAINED fields the one-step velocity difference is
    dominated by high-frequency model noise, not by the smooth drift the
    forecast can actually track: measured on the matrix testbed the gap-1
    order-1 residual is ~4.1% while the order-0 (hold) residual is ~2.4% —
    a √3 ratio, the exact signature of iid per-eval noise (ε₂−2ε₁+ε₀ vs
    ε₂−ε₁). That noise floor is irreducible (the evaluation being compared
    against contains it) and nearly harmless to the trajectory (it averages
    out across windows — the fixed cache's measured errors prove it), but
    it would blind an absolute-error controller: any tol below the floor
    pins k at 1 forever. So the controller estimates the floor online — the
    MIN of the first three post-warmup gap-1 residuals — and steers on the
    EXCESS over it, e_x = sqrt(max(e² − floor², 0)): on noise-free fields
    the floor is ~0 and the behavior is the plain error controller; on a
    stiff field the smooth component rises far above the floor and the
    gap still shrinks to 1 (cost ceiling: exact euler).
    Reference being accelerated: the production euler-250 program,
    LightningDiT/transport/integrators.py:77-126 +
    configs/lightningdit_xl_vavae_f16d32.yaml:71-82.
    """
    if order not in (0, 1, 2):
        raise ValueError(f"velocity-cache order must be 0, 1 or 2, got {order}")
    if max_interval < 1:
        raise ValueError(f"max_interval must be >= 1, got {max_interval}")
    B = x.shape[0]
    pairs = jnp.stack([t[:-1], t[1:]], axis=-1)
    zero = jnp.zeros_like(x)
    o1 = 1.0 if order >= 1 else 0.0
    o2 = 1.0 if order >= 2 else 0.0
    tol = float(tol)
    warm = order + 1  # evals of history before the forecast error is real
    n_floor = 3       # post-warmup gap-1 residuals that calibrate the floor

    def step(carry, tt):
        x, v_e, d1, d2, t_e, t_pe, wait, k_f, floor, n_evals = carry
        t_cur, t_next = tt[0], tt[1]

        def forecast_at(tq):
            dt = (tq - t_e).astype(x.dtype)
            dtp = (tq - t_pe).astype(x.dtype)
            return v_e + o1 * dt * d1 + o2 * dt * dtp * d2

        def evaluate():
            v = drift(x, jnp.full((B,), t_cur, x.dtype)).astype(x.dtype)
            # controller signal: realized forecast error over the elapsed gap
            dv = (v - forecast_at(t_cur)).astype(jnp.float32)
            e = jnp.sqrt(jnp.mean(jnp.square(dv)))
            vn = jnp.sqrt(jnp.mean(jnp.square(v.astype(jnp.float32))))
            e_rel = e / jnp.maximum(vn, 1e-20)
            # calibrate the noise floor on the first n_floor post-warmup
            # gap-1 residuals (min: a genuinely-stiff sample must not
            # inflate the floor), then steer on the EXCESS over it
            calibrating = (n_evals >= warm) & (n_evals < warm + n_floor)
            new_floor = jnp.where(calibrating, jnp.minimum(floor, e_rel), floor)
            excess = jnp.sqrt(jnp.maximum(
                jnp.square(e_rel) - jnp.square(new_floor), 0.0))
            factor = jnp.clip(
                0.9 * (tol / jnp.maximum(excess, 1e-12)) ** (1.0 / (order + 1)),
                0.25, 2.0)
            # the interval is carried as a FLOAT and rounded only when
            # scheduling: an integer carry has a growth deadband at k=1
            # (round(1·factor) needs factor ≥ 1.5 to ever leave 1, so
            # moderate errors froze the controller at exact-euler cost —
            # caught by the first matrix run)
            new_kf = jnp.clip(k_f * factor, 1.0, float(max_interval))
            new_kf = jnp.where(n_evals < warm + n_floor, 1.0, new_kf)
            new_k = jnp.round(new_kf).astype(jnp.int32)
            # divided differences, gated in as evaluation history accumulates
            dt1 = t_cur - t_e
            safe1 = jnp.where(n_evals == 0, jnp.ones_like(dt1), dt1)
            g1 = jnp.where(n_evals >= 1, 1.0, 0.0).astype(x.dtype)
            new_d1 = g1 * (v - v_e) / safe1.astype(x.dtype)
            dt2 = t_cur - t_pe
            safe2 = jnp.where(n_evals <= 1, jnp.ones_like(dt2), dt2)
            g2 = jnp.where(n_evals >= 2, 1.0, 0.0).astype(x.dtype)
            new_d2 = g2 * (new_d1 - d1) / safe2.astype(x.dtype)
            # wait counts the FORECAST steps before the next eval: new_k - 1
            # of them gives an eval-to-eval gap of exactly new_k steps
            return (v, v, new_d1, new_d2, t_cur, t_e, new_k - 1, new_kf,
                    new_floor, n_evals + 1)

        def use_cache():
            return (forecast_at(t_cur), v_e, d1, d2, t_e, t_pe, wait - 1,
                    k_f, floor, n_evals)

        v, v_e, d1, d2, t_e, t_pe, wait, k_f, floor, n_evals = jax.lax.cond(
            wait <= 0, evaluate, use_cache
        )
        x = x + (t_next - t_cur).astype(x.dtype) * v
        return (x, v_e, d1, d2, t_e, t_pe, wait, k_f, floor, n_evals), None

    init = (
        x, zero, zero, zero, t[0], t[0],
        jnp.asarray(0, jnp.int32),      # wait: evaluate at the first step
        jnp.asarray(1.0, jnp.float32),  # current interval (float carry)
        jnp.asarray(jnp.inf, jnp.float32),  # noise floor (min-calibrated)
        jnp.asarray(0, jnp.int32),      # evaluations used
    )
    (x, *rest), _ = jax.lax.scan(step, init, pairs)
    n_evals = rest[-1]
    if with_stats:
        if with_floor:
            # the min-calibrated relative noise floor (inf if the run never
            # completed calibration, i.e. < warm + n_floor evaluations) —
            # the practical lower end of the tol knob's useful range
            # (BASELINE.md: below it, tol saturates); surfaced for the
            # autotune CLI's floor-relative tol recommendation
            return x, n_evals, rest[-2]
        return x, n_evals
    return x


def odeint_heun(drift: Callable, x: jax.Array, t: jax.Array) -> jax.Array:
    B = x.shape[0]

    def step(carry, tt):
        x = carry
        t_cur, t_next = tt
        dt = (t_next - t_cur).astype(x.dtype)
        k1 = drift(x, jnp.full((B,), t_cur, x.dtype))
        k2 = drift(x + dt * k1, jnp.full((B,), t_next, x.dtype))
        return x + dt * 0.5 * (k1 + k2), None

    pairs = jnp.stack([t[:-1], t[1:]], axis=-1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def odeint_ab(
    drift: Callable, x: jax.Array, t: jax.Array, order: int = 3
) -> jax.Array:
    """Variable-step Adams–Bashforth multistep integrator (orders 1/2/3).

    Same model-eval count as euler — ONE drift evaluation per grid step —
    but the velocity's Newton interpolation polynomial through the last
    ``order`` evaluations is integrated EXACTLY over each step, giving
    O(h^order) global accuracy on the possibly non-uniform (timestep-
    shifted) grid:

        x_{n+1} = x_n + h·v_n + (h²/2)·d1 + (h³/3 + (h²/2)·g)·d2

    with h = t_{n+1}−t_n, g = t_n−t_{n-1}, d1 = [v_{n-1},v_n],
    d2 = [v_{n-2},v_{n-1},v_n] divided differences (the ∫(t−t_n) and
    ∫(t−t_n)(t−t_{n-1}) moments of the step in closed form).

    Startup: order 3 takes its FIRST step with Heun (one extra drift eval
    per trajectory, keeping the startup local error at O(h³) so the global
    order is genuinely 3 — a single euler start would cap it at 2); order 2
    starts with plain euler (consistent with its O(h²) global order).
    History restarts are the caller's job where the drift changes
    discontinuously (e.g. the CFG-interval boundary).

    This is a beyond-reference EXACT-solver speedup: it solves the same
    probability-flow ODE as the reference's 250-step euler
    (integrators.py:77-92) to equal-or-better accuracy at ~3× fewer model
    evaluations (measured in BASELINE.md), with none of the velocity
    cache's forecast approximation.
    """
    if order not in (1, 2, 3):
        raise ValueError(f"Adams-Bashforth order must be 1, 2 or 3, got {order}")
    if order == 1 or t.shape[0] < 3:
        return odeint_euler(drift, x, t)
    B = x.shape[0]
    use_d2 = 1.0 if order >= 3 else 0.0

    if order >= 3:
        # Heun first step, seeding the history with v(t0)
        dt0 = (t[1] - t[0]).astype(x.dtype)
        v0 = drift(x, jnp.full((B,), t[0], x.dtype)).astype(x.dtype)
        k2 = drift(x + dt0 * v0, jnp.full((B,), t[1], x.dtype)).astype(x.dtype)
        x = x + dt0 * 0.5 * (v0 + k2)
        start = 1
    else:
        v0 = jnp.zeros_like(x)
        start = 0

    pairs = jnp.stack([t[start:-1], t[start + 1:]], axis=-1)
    idx = jnp.arange(start, start + pairs.shape[0])

    def step(carry, inp):
        x, v_prev, d1_prev, t_prev1, t_prev2 = carry
        tt, i = inp
        t_cur, t_next = tt
        v = drift(x, jnp.full((B,), t_cur, x.dtype)).astype(x.dtype)
        # divided differences, gated in as history accumulates
        dt1 = t_cur - t_prev1
        g1 = jnp.where(i >= 1, 1.0, 0.0).astype(x.dtype)
        safe1 = jnp.where(i == 0, jnp.ones_like(dt1), dt1)
        d1 = g1 * (v - v_prev) / safe1.astype(x.dtype)
        dt2 = t_cur - t_prev2
        g2 = (use_d2 * jnp.where(i >= 2, 1.0, 0.0)).astype(x.dtype)
        safe2 = jnp.where(i <= 1, jnp.ones_like(dt2), dt2)
        d2 = g2 * (d1 - d1_prev) / safe2.astype(x.dtype)
        # exact step moments: ∫h = h, ∫(t-t_n) = h²/2, ∫(t-t_n)(t-t_{n-1})
        # = h³/3 + g·h²/2 with g = t_n - t_{n-1}
        h = (t_next - t_cur).astype(x.dtype)
        g = dt1.astype(x.dtype)
        incr = h * v + (h * h * 0.5) * d1 + (h * h * h / 3.0 + g * h * h * 0.5) * d2
        return (x + incr, v, d1, t_cur, t_prev1), None

    carry = (x, v0, jnp.zeros_like(x), t[0], t[0])
    (x, *_), _ = jax.lax.scan(step, carry, (pairs, idx))
    return x


# -- adaptive Dormand-Prince 5(4) --------------------------------------------

# Butcher tableau (same coefficients as torchdiffeq dopri5)
_DOPRI_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DOPRI_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DOPRI_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
# torchdiffeq dopri5 midpoint weights (DPS_C_MID) for the quartic dense output
_DOPRI_MID = np.array([
    6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
    -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
    -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
])


def odeint_dopri5(
    drift: Callable,
    x: Any,
    t0: float,
    t1: float,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 1000,
    with_stats: bool = False,
) -> Any:
    """Adaptive RK45 inside a bounded while_loop, matching torchdiffeq's
    dopri5 semantics (transport/integrators.py:118-125 rides torchdiffeq):

      - full Hairer initial-step heuristic (`_select_initial_step`: d0/d1
        probe step, d2 curvature estimate, h1 = (0.01/max(d1,d2))^(1/5))
      - `_optimal_step_size` controller: factor = clip(0.9·ratio^(-1/5),
        dfactor, 10) with dfactor = 1 on ACCEPTED steps (an accepted step
        is never shrunk) and 0.2 on rejections; ratio == 0 → ×10
      - steps are NOT clamped to t1: the solver overshoots and evaluates
        the quartic dense-output interpolant (DPS_C_MID fit) at t1, so
        accepted/rejected step counts match torchdiffeq exactly
      - FSAL: k7 of an accepted step is the next step's k1

    ``x`` may be a pytree (e.g. the (x, logp) augmented likelihood state —
    torchdiffeq wraps tuples the same way); the error norm is the RMS over
    the concatenated elements. All controller math in fp32; the model is
    called at each leaf's own dtype. ``with_stats`` additionally returns
    {"naccept", "nreject", "exhausted"} — ``exhausted`` is True when
    ``max_steps`` ran out before crossing t1 (the result is then the
    partially-integrated state, not garbage, but callers should know).
    """
    if t1 < t0:
        # decreasing interval (sample_ode(reverse=True) hands (1, 0)): the
        # loop below assumes forward time, so integrate the time-mirrored
        # field u = t0 + t1 − t over the increasing span [t1, t0] — exactly
        # equivalent (dx/du = −f(x, t0 + t1 − u)), same step-size control
        return odeint_dopri5(
            lambda xv, tv: jax.tree_util.tree_map(
                lambda l: -l, drift(xv, t0 + t1 - tv)
            ),
            x, t1, t0, rtol=rtol, atol=atol, max_steps=max_steps,
            with_stats=with_stats,
        )
    dtype = jnp.float32
    leaves, treedef = jax.tree_util.tree_flatten(x)
    in_dtypes = [l.dtype for l in leaves]
    n_total = sum(l.size for l in leaves)
    B = leaves[0].shape[0]
    xf = [jnp.asarray(l, dtype) for l in leaves]

    def f(xv, tv):
        xs = jax.tree_util.tree_unflatten(
            treedef, [l.astype(d) for l, d in zip(xv, in_dtypes)]
        )
        out = drift(xs, jnp.full((B,), tv, dtype))
        return [jnp.asarray(l, dtype) for l in jax.tree_util.tree_leaves(out)]

    def _map(fn, *trees):
        return [fn(*ls) for ls in zip(*trees)]

    def _rms(tree):
        ssq = sum(jnp.sum(jnp.square(l)) for l in tree)
        return jnp.sqrt(ssq / n_total)

    def error_ratio(x_new, x_old, err):
        scaled = _map(
            lambda e, a, b: e / (atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))),
            err, x_old, x_new,
        )
        return _rms(scaled)

    span = abs(t1 - t0)

    def initial_dt(x0, f0):
        # torchdiffeq _select_initial_step (Hairer-Norsett-Wanner II.4)
        scale = _map(lambda l: atol + jnp.abs(l) * rtol, x0)
        d0 = _rms(_map(lambda a, s: a / s, x0, scale))
        d1 = _rms(_map(lambda a, s: a / s, f0, scale))
        h0 = jnp.where(jnp.minimum(d0, d1) < 1e-5, 1e-6, 0.01 * d0 / d1)
        y1 = _map(lambda a, b: a + h0 * b, x0, f0)
        f1 = f(y1, jnp.asarray(t0, dtype) + h0)
        d2 = _rms(_map(lambda a, b, s: (a - b) / s, f1, f0, scale)) / h0
        h1 = jnp.where(
            jnp.maximum(d1, d2) <= 1e-15,
            jnp.maximum(1e-6, h0 * 1e-3),
            (0.01 / jnp.maximum(d1, d2)) ** 0.2,
        )
        return jnp.minimum(jnp.minimum(100.0 * h0, h1), dtype(span))

    f0 = f(xf, t0)
    state = (
        xf,
        jnp.asarray(t0, dtype),
        initial_dt(xf, f0).astype(dtype),
        f0,  # FSAL cache
        xf,  # dense-output value at t1 (valid once crossed)
        jnp.asarray(0, jnp.int32),   # accepted
        jnp.asarray(0, jnp.int32),   # rejected
    )

    def cond(state):
        _, t, _, _, _, na, nr = state
        return (t < t1) & (na + nr < max_steps)

    def body(state):
        xv, t, dt, f0, out, na, nr = state

        ks = [f0]
        for i in range(1, 7):
            xi = xv
            for j, aij in enumerate(_DOPRI_A[i]):
                xi = _map(lambda a, k: a + dt * dtype(aij) * k, xi, ks[j])
            ks.append(f(xi, t + dtype(_DOPRI_C[i]) * dt))

        x5 = xv
        err = _map(jnp.zeros_like, xv)
        for i in range(7):
            if _DOPRI_B5[i] != 0.0:
                x5 = _map(lambda a, k: a + dt * dtype(_DOPRI_B5[i]) * k, x5, ks[i])
            db = _DOPRI_B5[i] - _DOPRI_B4[i]
            if db != 0.0:
                err = _map(lambda e, k: e + dt * dtype(db) * k, err, ks[i])

        ratio = error_ratio(x5, xv, err)
        accept = ratio <= 1.0
        # torchdiffeq _optimal_step_size: never shrink an accepted step
        dfactor = jnp.where(accept, 1.0, 0.2)
        factor = jnp.where(
            ratio == 0.0,
            10.0,
            jnp.minimum(10.0, jnp.maximum(0.9 * ratio ** (-0.2), dfactor)),
        )
        new_dt = dt * factor

        # dense output at t1 when this accepted step crosses it
        # (torchdiffeq _interp_fit quartic through y0, y1, y_mid, f0, f1)
        crossed = accept & (t + dt >= t1)
        y_mid = xv
        for i in range(7):
            if _DOPRI_MID[i] != 0.0:
                y_mid = _map(
                    lambda a, k: a + dt * dtype(_DOPRI_MID[i]) * k, y_mid, ks[i]
                )
        s = jnp.clip((t1 - t) / jnp.maximum(dt, 1e-20), 0.0, 1.0)

        def interp(y0l, y1l, yml, f0l, f1l):
            a = 2.0 * dt * (f1l - f0l) - 8.0 * (y1l + y0l) + 16.0 * yml
            b = dt * (5.0 * f0l - 3.0 * f1l) + 18.0 * y0l + 14.0 * y1l - 32.0 * yml
            c = dt * (f1l - 4.0 * f0l) - 11.0 * y0l - 5.0 * y1l + 16.0 * yml
            d = dt * f0l
            return ((((a * s + b) * s + c) * s + d) * s) + y0l

        out_step = _map(interp, xv, x5, y_mid, f0, ks[6])
        out = _map(lambda o, n: jnp.where(crossed, n, o), out, out_step)

        x_next = _map(lambda a, b: jnp.where(accept, a, b), x5, xv)
        t_next = jnp.where(accept, t + dt, t)
        f_next = _map(lambda a, b: jnp.where(accept, a, b), ks[6], f0)
        return (
            x_next, t_next, new_dt.astype(dtype), f_next, out,
            na + accept.astype(jnp.int32), nr + (1 - accept.astype(jnp.int32)),
        )

    y_end, t_end, _, _, out, na, nr = jax.lax.while_loop(cond, body, state)
    # max_steps exhaustion before crossing t1: the dense-output carry was
    # never written — fall back to the partially-integrated state rather
    # than silently returning the initial condition
    done = t_end >= t1
    out = _map(lambda o, y: jnp.where(done, o, y), out, y_end)
    result = jax.tree_util.tree_unflatten(
        treedef, [l.astype(d) for l, d in zip(out, in_dtypes)]
    )
    if with_stats:
        # exhausted: max_steps hit before crossing t1 — the result is the
        # partially-integrated state, which callers must be able to SEE
        # (round-3 advisor: silent partial integration on stiff fields)
        return result, {"naccept": na, "nreject": nr,
                        "exhausted": jnp.logical_not(done)}
    return result
