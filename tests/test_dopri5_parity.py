"""dopri5 parity vs the torchdiffeq algorithm (VERDICT r1 weak #7).

torchdiffeq is not installed here, so the oracle is a faithful sequential
numpy port of its dopri5 (tableau, `_select_initial_step`,
`_optimal_step_size` with dfactor=1 on accepted steps, FSAL, overshoot +
quartic dense output — torchdiffeq rk_common.py semantics, which
transport/integrators.py:118-125 rides). The oracle itself is cross-checked
against scipy's independent RK45 at tight tolerance, and our while_loop
implementation must match the oracle's accepted/rejected step counts
EXACTLY and its final state closely.
"""
import numpy as np
import pytest

from vavae_tpu.transport.ode import (
    _DOPRI_A,
    _DOPRI_B4,
    _DOPRI_B5,
    _DOPRI_C,
    _DOPRI_MID,
    odeint_dopri5,
)

F32 = np.float32


def torchdiffeq_dopri5_numpy(f, y0, t0, t1, rtol, atol, max_steps=1000):
    """Sequential float32 port of torchdiffeq's dopri5 (rk_common.py)."""
    y = y0.astype(F32)
    n = y.size
    t = F32(t0)

    def rms(v):
        return np.sqrt(np.sum(np.square(v)) / n, dtype=F32)

    def err_ratio(y_new, y_old, err):
        tol = atol + rtol * np.maximum(np.abs(y_old), np.abs(y_new))
        return rms((err / tol).astype(F32))

    f0 = f(y, t).astype(F32)
    # _select_initial_step
    scale = (atol + np.abs(y) * rtol).astype(F32)
    d0, d1 = rms(y / scale), rms(f0 / scale)
    h0 = F32(1e-6) if min(d0, d1) < 1e-5 else F32(0.01) * d0 / d1
    y1p = y + h0 * f0
    f1p = f(y1p, t + h0).astype(F32)
    d2 = rms((f1p - f0) / scale) / h0
    if max(d1, d2) <= 1e-15:
        h1 = max(F32(1e-6), h0 * F32(1e-3))
    else:
        h1 = F32((0.01 / max(d1, d2)) ** 0.2)
    dt = F32(min(100.0 * h0, h1, abs(t1 - t0)))

    naccept = nreject = 0
    out = None
    while t < t1 and naccept + nreject < max_steps:
        ks = [f0]
        for i in range(1, 7):
            yi = y.copy()
            for j, aij in enumerate(_DOPRI_A[i]):
                yi = yi + dt * F32(aij) * ks[j]
            ks.append(f(yi, t + F32(_DOPRI_C[i]) * dt).astype(F32))
        y5 = y.copy()
        err = np.zeros_like(y)
        for i in range(7):
            if _DOPRI_B5[i] != 0.0:
                y5 = y5 + dt * F32(_DOPRI_B5[i]) * ks[i]
            db = _DOPRI_B5[i] - _DOPRI_B4[i]
            if db != 0.0:
                err = err + dt * F32(db) * ks[i]
        ratio = err_ratio(y5, y, err)
        accept = ratio <= 1.0
        # controller math in fp32, like torchdiffeq on fp32 tensors
        dfactor = F32(1.0) if accept else F32(0.2)
        if ratio == 0.0:
            factor = F32(10.0)
        else:
            factor = min(F32(10.0), max(F32(0.9) * ratio ** F32(-0.2), dfactor))
        if accept:
            if t + dt >= t1:  # dense output at t1
                y_mid = y.copy()
                for i in range(7):
                    if _DOPRI_MID[i] != 0.0:
                        y_mid = y_mid + dt * F32(_DOPRI_MID[i]) * ks[i]
                s = F32(np.clip((t1 - t) / max(dt, 1e-20), 0.0, 1.0))
                f1 = ks[6]
                a = 2 * dt * (f1 - f0) - 8 * (y5 + y) + 16 * y_mid
                b = dt * (5 * f0 - 3 * f1) + 18 * y + 14 * y5 - 32 * y_mid
                c = dt * (f1 - 4 * f0) - 11 * y - 5 * y5 + 16 * y_mid
                d = dt * f0
                out = ((((a * s + b) * s + c) * s + d) * s) + y
            y, t, f0 = y5, F32(t + dt), ks[6]
            naccept += 1
        else:
            nreject += 1
        dt = F32(dt * factor)
    return out, naccept, nreject


def _field(y, t, xp=np):
    """Smooth nonlinear field with real curvature (forces several steps)."""
    return xp.sin(3.0 * t) * xp.cos(y) - 0.5 * y + 0.3 * xp.sin(5.0 * y)


@pytest.mark.parametrize("rtol,atol", [(1e-3, 1e-6), (1e-5, 1e-7)])
def test_dopri5_matches_torchdiffeq_algorithm(rtol, atol):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    y0 = rng.normal(size=(2, 3, 4)).astype(np.float32)

    def f_np(y, t):
        return _field(y, np.float32(t)).astype(np.float32)

    want, na_ref, nr_ref = torchdiffeq_dopri5_numpy(f_np, y0, 0.0, 1.0, rtol, atol)
    assert na_ref >= 3  # the problem actually exercises the controller

    def f_jax(y, t_b):
        return _field(y, t_b[0], xp=jnp)

    got, stats = odeint_dopri5(
        f_jax, jnp.asarray(y0), 0.0, 1.0, rtol=rtol, atol=atol, with_stats=True
    )
    assert int(stats["naccept"]) == na_ref, (int(stats["naccept"]), na_ref)
    assert int(stats["nreject"]) == nr_ref, (int(stats["nreject"]), nr_ref)
    # fp32: XLA may fuse a·b+c into FMAs, numpy won't — ulp-level drift
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=5e-6)


def test_numpy_oracle_against_scipy():
    """The oracle itself must integrate correctly: compare against scipy's
    independent RK45 at tight tolerance."""
    from scipy.integrate import solve_ivp

    rng = np.random.default_rng(1)
    y0 = rng.normal(size=(6,)).astype(np.float32)

    def f_np(y, t):
        return _field(y, np.float32(t)).astype(np.float32)

    got, na, nr = torchdiffeq_dopri5_numpy(f_np, y0, 0.0, 1.0, 1e-5, 1e-8)
    sol = solve_ivp(
        lambda t, y: _field(y.astype(np.float64), t), (0.0, 1.0),
        y0.astype(np.float64), method="RK45", rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(got, sol.y[:, -1], rtol=1e-4, atol=1e-5)


def test_dopri5_rejects_then_converges():
    """A stiff-ish segment must trigger rejections; result still accurate."""
    import jax.numpy as jnp

    def f_jax(y, t_b):
        return -20.0 * y + jnp.sin(40.0 * t_b[0])

    y0 = np.ones((1, 4), np.float32)
    got, stats = odeint_dopri5(
        f_jax, jnp.asarray(y0), 0.0, 1.0, rtol=1e-6, atol=1e-8, with_stats=True
    )

    def f_np(y, t):
        return (-20.0 * y + np.sin(40.0 * np.float32(t))).astype(np.float32)

    want, na, nr = torchdiffeq_dopri5_numpy(f_np, y0, 0.0, 1.0, 1e-6, 1e-8)
    assert nr >= 1  # the controller actually rejected steps
    # ~85 accepted / ~21 rejected steps: an acceptance near the ratio≈1
    # boundary can flip from fp32 FMA ordering differences (XLA vs numpy),
    # and one early flip re-times every later step — counts stay within a
    # few; the smooth cases above (production tolerances) match exactly
    assert abs(int(stats["naccept"]) - na) <= 3, (int(stats["naccept"]), na)
    assert abs(int(stats["nreject"]) - nr) <= 3, (int(stats["nreject"]), nr)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dopri5_pytree_state_likelihood_path():
    """The augmented (x, logp) tuple integrates through dopri5 and agrees
    with a fine fixed euler grid (the likelihood sampler's two modes)."""
    import jax
    import jax.numpy as jnp

    from vavae_tpu.transport import Sampler, create_transport

    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)

    # analytic velocity model: v(x,t) independent of params, smooth
    def model_fn(x, t):
        return -0.8 * x + 0.1 * jnp.sin(t)[:, None, None, None]

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 4, 2))
    ll_ad, x_ad = sampler.sample_ode_likelihood(sampling_method="dopri5",
                                               rtol=1e-5, atol=1e-7)(rng, x, model_fn)
    ll_eu, x_eu = sampler.sample_ode_likelihood(sampling_method="euler",
                                               num_steps=400)(rng, x, model_fn)
    np.testing.assert_allclose(np.asarray(x_ad), np.asarray(x_eu), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ll_ad), np.asarray(ll_eu), rtol=2e-3,
                               atol=5e-3)


def test_dopri5_max_steps_exhaustion_returns_partial_state():
    """Exhausting max_steps before reaching t1 must return the partially-
    integrated state, not the initial condition (the dense-output carry is
    only written on the crossing step)."""
    import jax.numpy as jnp

    y0 = np.ones((1, 4), np.float32)

    def f_jax(y, t_b):
        return -y

    full, _ = odeint_dopri5(f_jax, jnp.asarray(y0), 0.0, 1.0,
                            rtol=1e-6, atol=1e-9, with_stats=True)
    partial, stats = odeint_dopri5(f_jax, jnp.asarray(y0), 0.0, 1.0,
                                   rtol=1e-6, atol=1e-9, max_steps=2,
                                   with_stats=True)
    assert int(stats["naccept"]) + int(stats["nreject"]) == 2
    p = np.asarray(partial)
    assert np.all(p < y0)               # integration actually progressed
    assert np.all(p > np.asarray(full))  # but not all the way to t1
