import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vavae_tpu.transport import Sampler, create_transport
from vavae_tpu.transport import paths as jpaths
from vavae_tpu.transport.ode import time_grid


def test_factory_eps_defaults():
    assert create_transport("Linear", "velocity").train_eps == 0.0
    assert create_transport("VP", "velocity").train_eps == 1e-5
    assert create_transport("Linear", "noise").train_eps == 1e-3


def test_linear_path_plan():
    p = jpaths.LinearPath()
    t = jnp.array([0.25, 0.75])
    x0 = jnp.ones((2, 2, 2, 2))
    x1 = jnp.zeros((2, 2, 2, 2)) + 3.0
    _, xt, ut = jpaths.plan(p, t, x0, x1)
    # xt = t*x1 + (1-t)*x0 ; ut = x1 - x0
    assert np.allclose(np.asarray(xt[0]), 0.25 * 3 + 0.75)
    assert np.allclose(np.asarray(ut), 2.0)


@pytest.mark.parametrize("path_name", ["Linear", "GVP", "VP"])
def test_path_parity_vs_reference(path_name):
    """Compare path math against the reference's torch implementation
    (LightningDiT/transport/path.py imports cleanly: torch+numpy only)."""
    import importlib.util

    try:
        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_path", "/root/reference/LightningDiT/transport/path.py"
        )
        ref_path = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_path)
    except Exception:
        pytest.skip("reference path.py unavailable")

    ref = {"Linear": ref_path.ICPlan, "GVP": ref_path.GVPCPlan, "VP": ref_path.VPCPlan}[
        path_name
    ]()
    ours = {
        "Linear": jpaths.LinearPath(),
        "GVP": jpaths.GVPPath(),
        "VP": jpaths.VPPath(),
    }[path_name]

    rng = np.random.default_rng(0)
    t = rng.uniform(0.05, 0.95, size=(4,)).astype(np.float32)
    x0 = rng.normal(size=(4, 2, 3, 3)).astype(np.float32)
    x1 = rng.normal(size=(4, 2, 3, 3)).astype(np.float32)

    tt = torch.from_numpy(t)
    _, xt_ref, ut_ref = ref.plan(tt, torch.from_numpy(x0), torch.from_numpy(x1))
    _, xt_j, ut_j = jpaths.plan(ours, jnp.asarray(t), jnp.asarray(x0), jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(xt_j), xt_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ut_j), ut_ref.numpy(), rtol=1e-5, atol=1e-5)

    # velocity → score conversion parity
    v = rng.normal(size=x0.shape).astype(np.float32)
    s_ref = ref.get_score_from_velocity(
        torch.from_numpy(v), torch.from_numpy(x0), tt
    ).numpy()
    s_j = jpaths.score_from_velocity(ours, jnp.asarray(v), jnp.asarray(x0), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(s_j), s_ref, rtol=1e-4, atol=1e-4)


def test_timestep_shift_grid():
    t = time_grid(0.0, 1.0, 5, timestep_shift=0.3)
    # t' = s t / (1 + (s-1) t); endpoints preserved
    assert t[0] == 0.0 and abs(t[-1] - 1.0) < 1e-6
    expect = 0.3 * 0.5 / (1 + (0.3 - 1) * 0.5)
    assert abs(t[2] - expect) < 1e-6


def test_lognorm_t_distribution(rng):
    tr = create_transport("Linear", "velocity", use_lognorm=True)
    t = tr.sample_t(rng, 20000)
    t = np.asarray(t)
    assert (t > 0).all() and (t < 1).all()
    # logit-normal(0,1): median 0.5, symmetric
    assert abs(np.median(t) - 0.5) < 0.02
    # heavier mass in the middle than uniform
    assert ((t > 0.25) & (t < 0.75)).mean() > 0.6


def test_partial_range_t(rng):
    tr = create_transport(
        "Linear", "velocity", use_lognorm=True, partial_train=(0.2, 0.6), partial_ratio=1.0
    )
    t = np.asarray(tr.sample_t(rng, 5000))
    assert (t >= 0.2).all() and (t <= 0.6).all()


def test_training_losses_zero_for_perfect_model(rng):
    tr = create_transport("Linear", "velocity", use_cosine_loss=True)
    x1 = jax.random.normal(rng, (8, 4, 4, 2))

    # the exact velocity field is ut = x1 - x0; recover x0 from xt:
    # xt = t x1 + (1-t) x0 → x0 = (xt - t x1)/(1-t). Build the perfect model
    # by closing over x1 and inverting (works since t<1 a.s.)
    def perfect(xt, t):
        te = t.reshape(-1, 1, 1, 1)
        x0 = (xt - te * x1) / (1 - te)
        return x1 - x0

    terms = tr.training_losses(rng, perfect, x1)
    assert float(terms["loss"].mean()) < 1e-8
    assert float(terms["cos_loss"].mean()) < 1e-5


def test_euler_sampler_exact_for_constant_velocity(rng):
    """With a constant velocity field v, euler integration is exact:
    x(1) = x(0) + v regardless of grid shift."""
    tr = create_transport("Linear", "velocity")
    s = Sampler(tr)
    v = jax.random.normal(rng, (2, 4, 4, 2))
    f = s.sample_ode(sampling_method="euler", num_steps=17, timestep_shift=0.3)
    x0 = jax.random.normal(jax.random.PRNGKey(1), v.shape)
    out = f(x0, lambda x, t: v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0 + v), rtol=1e-5, atol=1e-5)


def test_dopri5_matches_euler_on_smooth_field(rng):
    tr = create_transport("Linear", "velocity")
    s = Sampler(tr)
    x1 = jax.random.normal(rng, (2, 4, 4, 2))
    vel = lambda x, t: x1 - x  # smooth contraction field
    x0 = jax.random.normal(jax.random.PRNGKey(1), x1.shape)
    out_euler = s.sample_ode(sampling_method="euler", num_steps=500)(x0, vel)
    out_dopri = s.sample_ode(sampling_method="dopri5")(x0, vel)
    np.testing.assert_allclose(
        np.asarray(out_dopri), np.asarray(out_euler), rtol=1e-3, atol=2e-3
    )


def test_sde_sampler_runs(rng):
    tr = create_transport("Linear", "velocity", sample_eps=1e-3, train_eps=1e-3)
    assert tr.sample_eps == 1e-3  # explicit eps is honored (reference zeroes it)
    s = Sampler(tr)
    x1 = jax.random.normal(rng, (2, 4, 4, 2))
    # "sigma" diffusion is bounded (the reference-default SBDM form has a 1/t
    # singularity at t→0 that NaNs the reference sampler too)
    f = s.sample_sde(num_steps=50, diffusion_form="sigma", diffusion_norm=0.5)
    out = f(jax.random.PRNGKey(2), jax.random.normal(jax.random.PRNGKey(1), x1.shape),
            lambda x, t: x1 - x)
    assert out.shape == x1.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_interval_split_matches_duplicated_batch(rng):
    """sample_ode_cfg (cond-only phase at half batch) must equal the
    duplicated-batch sampler with the reference's cfg_interval gate."""
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    num_steps, start, shift = 12, 0.3, 0.3
    B, shape = 3, (3, 2, 2, 4)

    # a label-dependent synthetic velocity field so cond != uncond
    w = jax.random.normal(rng, shape[1:])

    def field(x, t, y):
        scale = (y.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sin(3.0 * t)[:, None, None, None] * scale * (w[None] - 0.3 * x)

    labels = jnp.array([0, 1, 2], jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), 7, jnp.int32)])
    cfg_scale = 4.0

    def apply_guidance(cond, uncond):
        return uncond + cfg_scale * (cond - uncond)

    def model_cfg_fn_gated(x, t):
        # reference semantics: both halves computed, guidance gated by t<start
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        cond, uncond = both[:B], both[B:]
        guided = apply_guidance(cond, uncond)
        guided = jnp.where(t[0] < start, cond, guided)
        return jnp.concatenate([guided, guided])

    def model_cond_fn(x, t):
        return field(x, t, labels)

    def model_cfg_fn(x, t):
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        guided = apply_guidance(both[:B], both[B:])
        return jnp.concatenate([guided, guided])

    z = jax.random.normal(jax.random.fold_in(rng, 1), shape)

    ref_fn = sampler.sample_ode(
        sampling_method="euler", num_steps=num_steps, timestep_shift=shift
    )
    ref = ref_fn(jnp.concatenate([z, z]), model_cfg_fn_gated)[:B]

    split_fn = sampler.sample_ode_cfg(
        num_steps=num_steps, timestep_shift=shift, cfg_interval_start=start
    )
    got = split_fn(z, model_cond_fn, model_cfg_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_velocity_cached_euler(rng):
    """cache_interval=1 is exactly euler; k>1 matches a manual
    piecewise-frozen-velocity integration of a time-varying field."""
    from vavae_tpu.transport.ode import odeint_euler, odeint_euler_cached, time_grid

    B, shape = 2, (2, 2, 2, 4)
    x0 = jax.random.normal(rng, shape)
    grid = jnp.asarray(time_grid(0.0, 1.0, 9, timestep_shift=0.3))

    def drift(x, t):
        return jnp.sin(4.0 * t)[:, None, None, None] * (1.0 + 0.1 * x)

    exact = odeint_euler(drift, x0, grid)
    same = odeint_euler_cached(drift, x0, grid, cache_interval=1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(exact), rtol=1e-6)

    k = 2
    cached = odeint_euler_cached(drift, x0, grid, cache_interval=k, order=0)
    # manual piecewise-frozen reference
    x = np.asarray(x0)
    g = np.asarray(grid)
    v = None
    for i in range(len(g) - 1):
        if i % k == 0:
            t = np.full((B,), g[i], np.float32)
            v = np.sin(4.0 * t)[:, None, None, None] * (1.0 + 0.1 * x)
        x = x + (g[i + 1] - g[i]) * v
    np.testing.assert_allclose(np.asarray(cached), x, rtol=1e-5, atol=1e-6)
    # and it genuinely differs from the exact trajectory
    assert np.abs(np.asarray(cached) - np.asarray(exact)).max() > 1e-4


def test_velocity_cached_order1_linear_field_is_exact(rng):
    """The order-1 forecast reproduces euler EXACTLY for any velocity field
    linear in t (state-independent): after the second evaluation the linear
    forecast IS the field."""
    from vavae_tpu.transport.ode import odeint_euler, odeint_euler_cached, time_grid

    shape = (2, 3, 3, 4)
    x0 = jax.random.normal(rng, shape)
    a = jax.random.normal(jax.random.fold_in(rng, 1), shape[1:])
    b = jax.random.normal(jax.random.fold_in(rng, 2), shape[1:])

    def drift(x, t):
        return a[None] + t[:, None, None, None] * b[None]

    # non-uniform grid (timestep shift) — the forecast must use t gaps
    grid = jnp.asarray(time_grid(0.0, 1.0, 13, timestep_shift=0.3))
    exact = odeint_euler(drift, x0, grid)
    for k in (2, 3, 4):
        cached = odeint_euler_cached(drift, x0, grid, cache_interval=k, order=1)
        # only the FIRST cached block (before two evals exist) deviates;
        # a linear field makes every later forecast exact
        manual = np.asarray(x0)
        g = np.asarray(grid)
        v_last = slope = t_last = None
        for i in range(len(g) - 1):
            if i % k == 0:
                v = np.asarray(a)[None] + g[i] * np.asarray(b)[None]
                slope = 0.0 if i == 0 else (v - v_last) / (g[i] - t_last)
                v_last, t_last = v, g[i]
            else:
                v = v_last + slope * (g[i] - t_last)
            manual = manual + (g[i + 1] - g[i]) * v
        np.testing.assert_allclose(np.asarray(cached), manual, rtol=1e-5, atol=1e-6)
        # after the warm-up block (slope needs two evals) the forecast IS the
        # field: error vs same-grid exact euler collapses vs the hold's
        e0 = np.abs(np.asarray(
            odeint_euler_cached(drift, x0, grid, cache_interval=k, order=0)
        ) - np.asarray(exact)).max()
        e1 = np.abs(np.asarray(cached) - np.asarray(exact)).max()
        assert e1 < 0.1 * e0, (k, e0, e1)


def test_velocity_cached_order2_quadratic_field_is_exact(rng):
    """The order-2 Newton forecast reproduces euler EXACTLY for any velocity
    field quadratic in t (state-independent) once three evaluations exist;
    order-1 does NOT on the same field. Also: order-2 degrades gracefully to
    the order-1 result on a linear field (d2 == 0)."""
    from vavae_tpu.transport.ode import odeint_euler, odeint_euler_cached, time_grid

    shape = (2, 3, 3, 4)
    x0 = jax.random.normal(rng, shape)
    a = jax.random.normal(jax.random.fold_in(rng, 1), shape[1:])
    b = jax.random.normal(jax.random.fold_in(rng, 2), shape[1:])
    c = jax.random.normal(jax.random.fold_in(rng, 3), shape[1:])

    def quad(x, t):
        tt = t[:, None, None, None]
        return a[None] + tt * b[None] + tt * tt * c[None]

    grid = jnp.asarray(time_grid(0.0, 1.0, 25, timestep_shift=0.3))
    exact = odeint_euler(quad, x0, grid)
    g = np.asarray(grid)
    for k in (2, 3, 4):
        cached2 = odeint_euler_cached(quad, x0, grid, cache_interval=k, order=2)
        # manual oracle: hold -> linear -> quadratic Newton gating
        manual = np.asarray(x0)
        v_last = d1 = d2 = t_last = t_prev = None
        for i in range(len(g) - 1):
            if i % k == 0:
                v = np.asarray(quad(None, jnp.asarray([g[i]])))[0]
                nd1 = 0.0 if i == 0 else (v - v_last) / (g[i] - t_last)
                nd2 = 0.0 if i <= k else (nd1 - d1) / (g[i] - t_prev)
                v_last, d1, d2 = v, nd1, nd2
                t_prev, t_last = t_last, g[i]
            else:
                v = v_last + (g[i] - t_last) * d1 + (
                    (g[i] - t_last) * (g[i] - t_prev) * d2 if i > 2 * k else 0.0
                ) * (1.0 if d2 is not None else 0.0)
            manual = manual + (g[i + 1] - g[i]) * v
        np.testing.assert_allclose(np.asarray(cached2), manual, rtol=1e-5, atol=1e-6)
        # once three evals exist the quadratic forecast IS the field: error
        # collapses vs order-1 on the same grid
        e1 = np.abs(np.asarray(
            odeint_euler_cached(quad, x0, grid, cache_interval=k, order=1)
        ) - np.asarray(exact)).max()
        e2 = np.abs(np.asarray(cached2) - np.asarray(exact)).max()
        assert e2 < 0.2 * e1, (k, e1, e2)

    # linear field: order-2 == order-1 exactly (d2 vanishes)
    def lin(x, t):
        return a[None] + t[:, None, None, None] * b[None]

    for k in (2, 3):
        o1 = odeint_euler_cached(lin, x0, grid, cache_interval=k, order=1)
        o2 = odeint_euler_cached(lin, x0, grid, cache_interval=k, order=2)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="order"):
        odeint_euler_cached(lin, x0, grid, cache_interval=2, order=3)


def test_ab_dominates_velocity_cache_at_equal_eval_budget(rng):
    """SOLVER-MATH regression guard, pinned on an analytic non-polynomial
    drift: euler-64 with cache interval k makes 64/k evals and
    rectangle-steps a forecast polynomial; AB3 on a 64/k-step grid
    integrates its history polynomial exactly, so on a smooth field it wins
    by ~10x (assert a conservative 2x so a broken divided difference or a
    wrong step moment still fails loudly).

    This is NOT a production-ordering claim: on trained model fields the
    AB3-vs-vcache ordering at matched eval budget is FIELD-DEPENDENT — the
    round-2 on-chip well-trained testbed reversed it (vcache-k3 0.260% @
    ~84 evals vs ab3-83 0.300%; BASELINE.md 'AB3 vs velocity cache').
    Even AB3-N <= euler-N at equal N is only an asymptotic-regime fact:
    it held on 29/30 matrix points, but one stiff on-chip point (cfg 6.7,
    sharply-trained field, euler error non-monotone in N) reversed it —
    history extrapolation amplifies stiffness (BASELINE testbed matrix)."""
    from vavae_tpu.transport.ode import (
        odeint_ab,
        odeint_euler,
        odeint_euler_cached,
        time_grid,
    )

    x0 = jax.random.normal(rng, (2, 3, 3, 4))

    def drift(x, t):
        return jnp.sin(3.0 * t)[:, None, None, None] * (1.0 + 0.2 * x)

    truth = odeint_euler(
        drift, x0, jnp.asarray(time_grid(0.0, 1.0, 4097, timestep_shift=0.3))
    )
    tnorm = float(jnp.linalg.norm(truth))
    g64 = jnp.asarray(time_grid(0.0, 1.0, 65, timestep_shift=0.3))
    for k in (2, 4):
        vc = odeint_euler_cached(drift, x0, g64, cache_interval=k, order=1)
        gab = jnp.asarray(time_grid(0.0, 1.0, 64 // k + 1, timestep_shift=0.3))
        ab3 = odeint_ab(drift, x0, gab, order=3)
        e_vc = float(jnp.linalg.norm(vc - truth)) / tnorm
        e_ab = float(jnp.linalg.norm(ab3 - truth)) / tnorm
        assert e_ab < 0.5 * e_vc, (k, e_vc, e_ab)


def test_sample_ode_cfg_cache_orders(rng):
    """The cached CFG sampler runs for every forecast order and the higher-
    order forecasts beat order-0 (hold) on a smooth label-dependent field."""
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    B, shape = 2, (2, 2, 2, 4)
    w = jax.random.normal(rng, shape[1:])

    def field(x, t, y):
        scale = (y.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sin(3.0 * t)[:, None, None, None] * scale * (w[None] - 0.3 * x)

    labels = jnp.array([0, 1], jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), 7, jnp.int32)])

    def model_cond_fn(x, t):
        return field(x, t, labels)

    def model_cfg_fn(x, t):
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        guided = both[B:] + 4.0 * (both[:B] - both[B:])
        return jnp.concatenate([guided, guided])

    z = jax.random.normal(jax.random.fold_in(rng, 1), shape)
    kw = dict(num_steps=24, timestep_shift=0.3, cfg_interval_start=0.11)
    exact = np.asarray(
        sampler.sample_ode_cfg(**kw)(z, model_cond_fn, model_cfg_fn)
    )
    errs = {}
    for order in (0, 1, 2):
        got = np.asarray(
            sampler.sample_ode_cfg(**kw, cache_interval=3, cache_order=order)(
                z, model_cond_fn, model_cfg_fn
            )
        )
        assert got.shape == exact.shape and np.isfinite(got).all()
        errs[order] = np.abs(got - exact).max()
    assert errs[1] < errs[0] and errs[2] < errs[0], errs


def test_odeint_ab_matches_manual_oracle(rng):
    """Variable-step AB2/AB3 match a step-by-step numpy oracle of the same
    scheme (Heun start for order 3, euler for order 2) on a non-uniform
    shifted grid; order=1 is exactly euler."""
    from vavae_tpu.transport.ode import odeint_ab, odeint_euler, time_grid

    shape = (2, 3, 3, 4)
    x0 = jax.random.normal(rng, shape)
    w = jax.random.normal(jax.random.fold_in(rng, 1), shape[1:])

    def field(x, t):
        return jnp.sin(3.0 * t)[:, None, None, None] * (w[None] - 0.25 * x)

    grid = jnp.asarray(time_grid(0.0, 1.0, 17, timestep_shift=0.3))
    g = np.asarray(grid, np.float64)

    same = odeint_ab(field, x0, grid, order=1)
    np.testing.assert_allclose(
        np.asarray(same), np.asarray(odeint_euler(field, x0, grid)), rtol=1e-6
    )

    def f_np(x, t):
        return np.sin(3.0 * t) * (np.asarray(w)[None] - 0.25 * x)

    for order in (2, 3):
        got = np.asarray(odeint_ab(field, x0, grid, order=order))
        x = np.asarray(x0, np.float64)
        hist = []  # (t, v) newest last
        start = 0
        if order == 3:  # Heun first step
            v0 = f_np(x, g[0])
            k2 = f_np(x + (g[1] - g[0]) * v0, g[1])
            x = x + (g[1] - g[0]) * 0.5 * (v0 + k2)
            hist = [(g[0], v0)]
            start = 1
        for i in range(start, len(g) - 1):
            v = f_np(x, g[i])
            d1 = d2 = 0.0
            if len(hist) >= 1:
                tp1, vp = hist[-1]
                d1 = (v - vp) / (g[i] - tp1)
                if order >= 3 and len(hist) >= 2:
                    tp2, vpp = hist[-2]
                    d1p = (vp - vpp) / (tp1 - tp2)
                    d2 = (d1 - d1p) / (g[i] - tp2)
            h = g[i + 1] - g[i]
            gg = g[i] - hist[-1][0] if hist else 0.0
            x = x + h * v + (h * h / 2) * d1 + (h**3 / 3 + gg * h * h / 2) * d2
            hist.append((g[i], v))
        np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="order"):
        odeint_ab(field, x0, grid, order=4)


def test_odeint_ab_convergence_orders(rng):
    """Global convergence order on a smooth state-independent field with an
    analytic solution: halving h cuts the error by ~2^order (euler ~2,
    AB2 ~4, AB3 ~8) — proves the Heun startup preserves order 3."""
    from vavae_tpu.transport.ode import odeint_ab, time_grid

    shape = (1, 2, 2, 2)
    x0 = jax.random.normal(rng, shape)
    w = jax.random.normal(jax.random.fold_in(rng, 5), shape[1:])

    def field(x, t):
        return jnp.sin(3.0 * t)[:, None, None, None] * w[None]

    # exact: x(1) = x0 + w * (1 - cos(3)) / 3
    exact = np.asarray(x0, np.float64) + np.asarray(w)[None] * (
        (1.0 - np.cos(3.0)) / 3.0
    )

    def err(order, n):
        grid = jnp.asarray(time_grid(0.0, 1.0, n + 1))
        out = np.asarray(odeint_ab(field, x0, grid, order=order), np.float64)
        return np.abs(out - exact).max()

    for order, lo, hi in ((1, 1.6, 2.4), (2, 3.0, 5.0), (3, 6.0, 10.5)):
        r = err(order, 32) / err(order, 64)
        assert lo < r < hi, (order, r, err(order, 32), err(order, 64))


def test_sample_ode_cfg_multistep_beats_euler(rng):
    """sample_ode_cfg(multistep_order=3) at 1/3 the steps is MORE accurate
    than euler at full steps vs a fine-grid ground truth; ab methods are
    also reachable through sample_ode; cache+multistep combo rejects."""
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    B, shape = 2, (2, 2, 2, 4)
    w = jax.random.normal(rng, shape[1:])

    def field(x, t, y):
        scale = (y.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sin(3.0 * t)[:, None, None, None] * scale * (w[None] - 0.3 * x)

    labels = jnp.array([0, 1], jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), 7, jnp.int32)])

    def model_cond_fn(x, t):
        return field(x, t, labels)

    def model_cfg_fn(x, t):
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        guided = both[B:] + 4.0 * (both[:B] - both[B:])
        return jnp.concatenate([guided, guided])

    z = jax.random.normal(jax.random.fold_in(rng, 1), shape)
    base = dict(timestep_shift=0.3, cfg_interval_start=0.11)
    truth = np.asarray(sampler.sample_ode_cfg(num_steps=2000, **base)(
        z, model_cond_fn, model_cfg_fn))
    e_euler = np.abs(np.asarray(sampler.sample_ode_cfg(num_steps=96, **base)(
        z, model_cond_fn, model_cfg_fn)) - truth).max()
    e_ab3 = np.abs(np.asarray(
        sampler.sample_ode_cfg(num_steps=32, multistep_order=3, **base)(
            z, model_cond_fn, model_cfg_fn)) - truth).max()
    assert e_ab3 < e_euler, (e_ab3, e_euler)

    fn = sampler.sample_ode(sampling_method="ab3", num_steps=16,
                            timestep_shift=0.3)
    out = fn(z, lambda x, t: field(x, t, labels))
    assert out.shape == z.shape and np.isfinite(np.asarray(out)).all()

    with pytest.raises(ValueError, match="mutually exclusive"):
        sampler.sample_ode_cfg(num_steps=8, cache_interval=2, multistep_order=2)


def test_sampler_validates_acceleration_knobs_at_build_time():
    """Config typos fail when written, even while the knob is inert:
    cache_order outside 0-2 and multistep_order outside 1-3 raise at
    sample_ode_cfg build regardless of cache_interval."""
    import pytest

    from vavae_tpu.transport import Sampler, create_transport

    s = Sampler(create_transport("Linear", "velocity"))
    with pytest.raises(ValueError, match="cache_order"):
        s.sample_ode_cfg(num_steps=4, cache_interval=1, cache_order=3)
    with pytest.raises(ValueError, match="multistep_order"):
        s.sample_ode_cfg(num_steps=4, multistep_order=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        s.sample_ode_cfg(num_steps=4, cache_interval=2, multistep_order=2)
    s.sample_ode_cfg(num_steps=4, cache_interval=2, cache_order=2)  # ok


def test_dopri5_reverse_interval_integrates_backwards():
    """odeint_dopri5 with t1 < t0 (sample_ode(reverse=True) hands (1, 0))
    must actually integrate backwards — it previously returned the input
    unchanged because the while_loop condition was immediately false."""
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.transport.ode import odeint_dopri5

    a = -0.8
    f = lambda x, t: a * x
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)), jnp.float32)
    fwd = odeint_dopri5(f, x0, 0.0, 1.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(x0) * np.exp(a),
                               rtol=1e-4)
    bwd = odeint_dopri5(f, x0, 1.0, 0.0, rtol=1e-6, atol=1e-8)
    assert not np.allclose(np.asarray(bwd), np.asarray(x0))  # it moved
    np.testing.assert_allclose(np.asarray(bwd), np.asarray(x0) * np.exp(-a),
                               rtol=1e-4)
    # and a backward-of-forward roundtrip is the identity
    rt = odeint_dopri5(f, fwd, 1.0, 0.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x0), rtol=1e-4)


def test_cfg_interval_split_reverse_mirrors_model_time(rng):
    """sample_ode_cfg(reverse=True) must evaluate the model at MIRRORED time
    (1 - grid-t, ascending — same contract as sample_ode) and place the CFG
    gate on model time (lightningdit.py:436-439). The old code used the raw
    descending grid for both: the model saw descending t and searchsorted ran
    on a descending array (garbage split index)."""
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    num_steps, start, shift = 12, 0.3, 0.3
    B, shape = 3, (3, 2, 2, 4)

    w = jax.random.normal(rng, shape[1:])

    def field(x, t, y):
        scale = (y.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sin(3.0 * t)[:, None, None, None] * scale * (w[None] - 0.3 * x)

    labels = jnp.array([0, 1, 2], jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), 7, jnp.int32)])
    cfg_scale = 4.0

    def model_cfg_fn_gated(x, t):
        # t here is MODEL time (sample_ode's reverse drift already mirrors);
        # the reference gate lives inside the model forward, on model t
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        cond, uncond = both[:B], both[B:]
        guided = uncond + cfg_scale * (cond - uncond)
        guided = jnp.where(t[0] < start, cond, guided)
        return jnp.concatenate([guided, guided])

    def model_cond_fn(x, t):
        return field(x, t, labels)

    def model_cfg_fn(x, t):
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        guided = both[B:] + cfg_scale * (both[:B] - both[B:])
        return jnp.concatenate([guided, guided])

    z = jax.random.normal(jax.random.fold_in(rng, 1), shape)

    ref_fn = sampler.sample_ode(
        sampling_method="euler", num_steps=num_steps, timestep_shift=shift,
        reverse=True,
    )
    ref = ref_fn(jnp.concatenate([z, z]), model_cfg_fn_gated)[:B]

    split_fn = sampler.sample_ode_cfg(
        num_steps=num_steps, timestep_shift=shift, cfg_interval_start=start,
        reverse=True,
    )
    got = split_fn(z, model_cond_fn, model_cfg_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # sanity: the reverse trajectory differs from the forward one
    fwd = sampler.sample_ode_cfg(
        num_steps=num_steps, timestep_shift=shift, cfg_interval_start=start
    )(z, model_cond_fn, model_cfg_fn)
    assert np.abs(np.asarray(got) - np.asarray(fwd)).max() > 1e-3


def test_shift_lg_partial_train_rejected(rng):
    """The reference asserts shifted-lognormal t sampling is incompatible
    with partial training (transport.py sample()); sample_t must fail fast
    instead of silently drawing full-range t."""
    tr = create_transport(
        "Linear", "velocity", use_lognorm=True, shift_lg=True,
        partial_train=(0.2, 0.6), partial_ratio=1.0,
    )
    with pytest.raises(ValueError, match="partial_train"):
        tr.sample_t(rng, 8)


def _cfg_testbed(rng, B=2):
    """Shared synthetic CFG testbed: a label-dependent velocity field plus
    the (cond, cfg) model-fn pair sample_ode_cfg expects."""
    shape = (B, 2, 2, 4)
    w = jax.random.normal(rng, shape[1:])

    def field(x, t, y):
        scale = (y.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sin(3.0 * t)[:, None, None, None] * scale * (w[None] - 0.3 * x)

    labels = jnp.arange(B, dtype=jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), 7, jnp.int32)])

    def model_cond_fn(x, t):
        return field(x, t, labels)

    def model_cfg_fn(x, t):
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        guided = both[B:] + 4.0 * (both[:B] - both[B:])
        return jnp.concatenate([guided, guided])

    z = jax.random.normal(jax.random.fold_in(rng, 1), shape)
    return z, model_cond_fn, model_cfg_fn, field, labels


def test_sample_ode_cfg_heun(rng):
    """heun through sample_ode_cfg: with cfg_interval_start=0 it equals
    sample_ode('heun') on the duplicated batch (pure facade plumbing); with
    a split it converges to the SAME piecewise-field truth as split euler,
    at O(h^2) — heun-N beats euler-N and even euler-2N at equal eval cost."""
    z, cond_fn, cfg_fn, _, _ = _cfg_testbed(rng)
    B = z.shape[0]
    sampler = Sampler(create_transport("Linear", "velocity"))

    # (1) no interval: facade == sample_ode heun on [x|x]
    got = sampler.sample_ode_cfg(
        num_steps=16, timestep_shift=0.3, cfg_interval_start=0.0,
        sampling_method="heun",
    )(z, cond_fn, cfg_fn)
    ref = sampler.sample_ode(sampling_method="heun", num_steps=16,
                             timestep_shift=0.3)(
        jnp.concatenate([z, z]), cfg_fn)[:B]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)

    # (2) split phases: same truth as the euler split program, order 2
    base = dict(timestep_shift=0.3, cfg_interval_start=0.3)
    truth = np.asarray(sampler.sample_ode_cfg(num_steps=4000, **base)(
        z, cond_fn, cfg_fn))

    def err(method, n):
        out = sampler.sample_ode_cfg(
            num_steps=n, sampling_method=method, **base)(z, cond_fn, cfg_fn)
        return np.abs(np.asarray(out) - truth).max()

    assert err("heun", 24) < err("euler", 24)
    assert err("heun", 24) < err("euler", 48)  # better at EQUAL eval budget
    # grid halving cuts the error ~4x (global order 2); the split boundary
    # would break this if the phase grids were wrong
    r = err("heun", 24) / err("heun", 48)
    assert 2.8 < r < 5.5, r


def test_sample_ode_cfg_dopri5(rng):
    """Adaptive dopri5 through sample_ode_cfg: matches the fine-grid euler
    split program at tight tolerances (the phase boundary sits exactly at
    model-t = cfg_interval_start), reports controller stats for eval
    accounting, and the knob validation rejects euler-only compositions."""
    z, cond_fn, cfg_fn, _, _ = _cfg_testbed(rng)
    sampler = Sampler(create_transport("Linear", "velocity"))

    base = dict(cfg_interval_start=0.3)
    truth = np.asarray(sampler.sample_ode_cfg(
        num_steps=4000, timestep_shift=0.0, **base)(z, cond_fn, cfg_fn))
    out, stats = sampler.sample_ode_cfg(
        sampling_method="dopri5", rtol=1e-5, atol=1e-8, return_stats=True,
        **base)(z, cond_fn, cfg_fn)
    scale = np.abs(truth).max()
    assert np.abs(np.asarray(out) - truth).max() < 2e-3 * scale
    # both phases ran and accepted steps; eval cost = 2 + 6*(na+nr) per phase
    assert int(stats["cond"]["naccept"]) >= 1
    assert int(stats["cfg"]["naccept"]) >= 1

    # start=0 degenerates to a single CFG phase (no cond stats)
    out0, stats0 = sampler.sample_ode_cfg(
        sampling_method="dopri5", rtol=1e-4, cfg_interval_start=0.0,
        return_stats=True)(z, cond_fn, cfg_fn)
    assert stats0["cond"] is None and int(stats0["cfg"]["naccept"]) >= 1
    assert np.isfinite(np.asarray(out0)).all()

    # reverse mode mirrors the boundary (model time 1-grid-t)
    rtruth = np.asarray(sampler.sample_ode_cfg(
        num_steps=4000, reverse=True, **base)(z, cond_fn, cfg_fn))
    rout = sampler.sample_ode_cfg(
        sampling_method="dopri5", rtol=1e-5, atol=1e-8, reverse=True,
        **base)(z, cond_fn, cfg_fn)
    assert np.abs(np.asarray(rout) - rtruth).max() < 2e-3 * np.abs(rtruth).max()

    with pytest.raises(ValueError, match="not composable"):
        sampler.sample_ode_cfg(sampling_method="heun", cache_interval=2)
    with pytest.raises(ValueError, match="not composable"):
        sampler.sample_ode_cfg(sampling_method="dopri5", multistep_order=3)
    with pytest.raises(ValueError, match="return_stats"):
        sampler.sample_ode_cfg(return_stats=True)
    with pytest.raises(NotImplementedError, match="rk9"):
        sampler.sample_ode_cfg(sampling_method="rk9")


def test_velocity_cached_adaptive_tight_tol_is_exact_euler(rng):
    """tol so tight the controller can never stretch -> every step evaluates
    and the trajectory is exactly euler's (n_evals == num grid steps)."""
    from vavae_tpu.transport.ode import (
        odeint_euler,
        odeint_euler_cached_adaptive,
        time_grid,
    )

    x0 = jax.random.normal(rng, (2, 3, 3, 4))
    grid = jnp.asarray(time_grid(0.0, 1.0, 25, timestep_shift=0.3))

    def drift(x, t):
        return jnp.sin(5.0 * t)[:, None, None, None] * (1.0 + 0.2 * x)

    exact = odeint_euler(drift, x0, grid)
    got, n_evals = odeint_euler_cached_adaptive(
        drift, x0, grid, tol=1e-12, max_interval=8, order=1, with_stats=True
    )
    assert int(n_evals) == grid.shape[0] - 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=1e-6)

    with pytest.raises(ValueError, match="order"):
        odeint_euler_cached_adaptive(drift, x0, grid, order=5)
    with pytest.raises(ValueError, match="max_interval"):
        odeint_euler_cached_adaptive(drift, x0, grid, max_interval=0)


def test_velocity_cached_adaptive_stretches_on_linear_field(rng):
    """On a field linear in t the order-1 forecast is EXACT, so the
    controller stretches the gap to max_interval and the eval count
    collapses toward N/max_interval — while the answer stays euler's."""
    from vavae_tpu.transport.ode import (
        odeint_euler,
        odeint_euler_cached_adaptive,
        time_grid,
    )

    shape = (2, 3, 3, 4)
    x0 = jax.random.normal(rng, shape)
    a = jax.random.normal(jax.random.fold_in(rng, 1), shape[1:])
    b = jax.random.normal(jax.random.fold_in(rng, 2), shape[1:])

    def drift(x, t):
        return a[None] + t[:, None, None, None] * b[None]

    grid = jnp.asarray(time_grid(0.0, 1.0, 65, timestep_shift=0.3))
    exact = odeint_euler(drift, x0, grid)
    got, n_evals = odeint_euler_cached_adaptive(
        drift, x0, grid, tol=0.02, max_interval=8, order=1, with_stats=True
    )
    # 64 steps at gaps growing 1,2,4,8,8,... -> well under a third of euler's
    assert int(n_evals) <= 64 // 3, int(n_evals)
    # exact forecast => the cached trajectory IS euler's, up to fp32
    # divided-difference rounding accumulated over 64 steps
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=1e-3, atol=5e-4
    )


def test_velocity_cached_adaptive_beats_fixed_k_on_mixed_field(rng):
    """A field that is trivial early and oscillatory late (the shape of a
    stiff CFG trajectory): the controller spends its evals where the field
    turns, beating the fixed-interval cache at the SAME measured eval
    budget."""
    from vavae_tpu.transport.ode import (
        odeint_euler,
        odeint_euler_cached,
        odeint_euler_cached_adaptive,
        time_grid,
    )

    x0 = jax.random.normal(rng, (2, 3, 3, 4))
    N = 96
    grid = jnp.asarray(time_grid(0.0, 1.0, N + 1))
    b = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 4))

    def drift(x, t):
        # exactly LINEAR early (order-1 forecast is exact there — adaptive
        # loses nothing by stretching), strongly oscillatory late
        rough = jnp.where(t > 0.6, jnp.sin(40.0 * t), 0.0)
        return (1.0 + rough)[:, None, None, None] * (b[None] + 0.5) + \
            t[:, None, None, None] * b[None] * 0.3

    exact = odeint_euler(drift, x0, grid)
    en = float(jnp.linalg.norm(exact))
    got, n_evals = odeint_euler_cached_adaptive(
        drift, x0, grid, tol=0.03, max_interval=8, order=1, with_stats=True
    )
    n = int(n_evals)
    assert n < N, n  # it actually accelerated
    e_adaptive = float(jnp.linalg.norm(got - exact)) / en
    # fixed cache at the same eval budget (floor => the fixed variant gets
    # a LARGER gap, i.e. the same-or-cheaper budget) spreads its forecast
    # error through the rough region where the controller drops to k=1
    k = max(2, int(np.floor(N / n)))
    fixed = odeint_euler_cached(drift, x0, grid, cache_interval=k, order=1)
    e_fixed = float(jnp.linalg.norm(fixed - exact)) / en
    assert e_adaptive < e_fixed, (n, k, e_adaptive, e_fixed)


def test_sample_ode_cfg_cache_adaptive(rng):
    """Production split-CFG program with the adaptive cache: validation,
    stats plumbing, tight-tol equivalence to the exact split program."""
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    B, shape = 2, (2, 2, 2, 4)
    w = jax.random.normal(rng, shape[1:])

    def field(x, t, y):
        scale = (y.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sin(3.0 * t)[:, None, None, None] * scale * (w[None] - 0.3 * x)

    labels = jnp.array([0, 1], jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), 7, jnp.int32)])

    def model_cond_fn(x, t):
        return field(x, t, labels)

    def model_cfg_fn(x, t):
        half = x[:B]
        both = field(jnp.concatenate([half, half]), jnp.tile(t[:B], 2), y_cfg)
        guided = both[B:] + 4.0 * (both[:B] - both[B:])
        return jnp.concatenate([guided, guided])

    z = jax.random.normal(jax.random.fold_in(rng, 1), shape)
    kw = dict(num_steps=32, timestep_shift=0.3, cfg_interval_start=0.11)
    exact = np.asarray(
        sampler.sample_ode_cfg(**kw)(z, model_cond_fn, model_cfg_fn)
    )

    # tight tol -> every CFG step evaluates -> identical to the exact program
    tight, stats = sampler.sample_ode_cfg(
        **kw, cache_adaptive=True, cache_tol=1e-12, return_stats=True
    )(z, model_cond_fn, model_cfg_fn)
    np.testing.assert_allclose(np.asarray(tight), exact, rtol=1e-5, atol=1e-6)
    n_cfg_steps = int(stats["cfg_evals"])

    # loose tol accelerates (fewer CFG evals) and stays finite/close
    loose, lstats = sampler.sample_ode_cfg(
        **kw, cache_adaptive=True, cache_tol=0.05, return_stats=True
    )(z, model_cond_fn, model_cfg_fn)
    assert int(lstats["cfg_evals"]) < n_cfg_steps
    got = np.asarray(loose)
    assert got.shape == exact.shape and np.isfinite(got).all()
    assert np.abs(got - exact).max() < 0.2 * np.abs(exact).max()
    # and the knob is monotone: tighter tol => more evals, closer output
    mid, mstats = sampler.sample_ode_cfg(
        **kw, cache_adaptive=True, cache_tol=0.005, return_stats=True
    )(z, model_cond_fn, model_cfg_fn)
    assert int(lstats["cfg_evals"]) <= int(mstats["cfg_evals"]) <= n_cfg_steps
    assert (np.abs(np.asarray(mid) - exact).max()
            <= np.abs(got - exact).max() + 1e-6)

    with pytest.raises(ValueError, match="not composable"):
        sampler.sample_ode_cfg(sampling_method="heun", cache_adaptive=True)
    with pytest.raises(ValueError, match="mutually"):
        sampler.sample_ode_cfg(cache_adaptive=True, multistep_order=3)
    with pytest.raises(ValueError, match="fixed cache_interval"):
        sampler.sample_ode_cfg(cache_adaptive=True, cache_interval=3)
    with pytest.raises(ValueError, match="cache_tol"):
        sampler.sample_ode_cfg(cache_adaptive=True, cache_tol=0.0)
    with pytest.raises(ValueError, match="cache_max_interval"):
        sampler.sample_ode_cfg(cache_adaptive=True, cache_max_interval=0)


def test_dopri5_max_steps_exhaustion_is_surfaced(rng):
    """A starved step budget must be visible: stats['exhausted'] flips and
    the result is the partially-integrated state, not the initial one."""
    from vavae_tpu.transport.ode import odeint_dopri5

    x0 = jax.random.normal(rng, (2, 3, 3, 4))

    def drift(x, t):
        return jnp.sin(20.0 * t)[:, None, None, None] * (1.0 + x)

    full, st_full = odeint_dopri5(drift, x0, 0.0, 1.0, rtol=1e-6, atol=1e-9,
                                  with_stats=True)
    assert not bool(st_full["exhausted"])
    part, st_part = odeint_dopri5(drift, x0, 0.0, 1.0, rtol=1e-6, atol=1e-9,
                                  max_steps=2, with_stats=True)
    assert bool(st_part["exhausted"])
    assert int(st_part["naccept"]) + int(st_part["nreject"]) <= 2
    # partially integrated: moved off x0, not equal to the full solution
    assert np.abs(np.asarray(part) - np.asarray(x0)).max() > 1e-6
    assert np.abs(np.asarray(part) - np.asarray(full)).max() > 1e-3

    # the sampler exposes the budget: a tiny max_steps changes the output
    tr = create_transport("Linear", "velocity")
    s = Sampler(tr)
    z = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 3, 4))
    f_ok = s.sample_ode(sampling_method="dopri5", rtol=1e-5)
    f_starved = s.sample_ode(sampling_method="dopri5", rtol=1e-5, max_steps=1)
    a = np.asarray(f_ok(z, drift))
    b = np.asarray(f_starved(z, drift))
    assert np.abs(a - b).max() > 1e-4
