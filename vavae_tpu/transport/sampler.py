"""Sampler facade: builds jittable sampling functions from a Transport.

Parity target: LightningDiT/transport/transport.py:270-501 (Sampler). Each
``sample_*`` returns a pure function ``(x_init, model_fn, **kw) -> x_final``
suitable for jit; the entire trajectory compiles to one XLA program.

The reference returns the full list of intermediate states and takes [-1]
(inference.py:216); we return the final state only (the hot path) with an
opt-in ``return_trajectory`` for debugging/likelihood work.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.transport import ode as ode_mod
from vavae_tpu.transport import paths, sde as sde_mod
from vavae_tpu.transport.transport import Transport


class Sampler:
    def __init__(self, transport: Transport):
        self.transport = transport
        self.drift = transport.drift_fn()
        self.score = transport.score_fn()

    # -- ODE -----------------------------------------------------------------

    def sample_ode(
        self,
        *,
        sampling_method: str = "dopri5",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
        max_steps: int = 1000,
        reverse: bool = False,
        timestep_shift: float = 0.0,
    ) -> Callable:
        transport = self.transport
        base_drift = self.drift

        if reverse:
            drift = lambda x, t, model_fn, **kw: base_drift(
                x, jnp.ones_like(t) * (1.0 - t), model_fn, **kw
            )
        else:
            drift = base_drift

        t0, t1 = transport.check_interval(eval=True, sde=False, reverse=reverse)

        def _sample(x: jax.Array, model_fn: Callable, **model_kwargs: Any) -> jax.Array:
            d = lambda xv, tv: drift(xv, tv, model_fn, **model_kwargs)
            if sampling_method in ("euler", "Euler"):
                grid = jnp.asarray(ode_mod.time_grid(t0, t1, num_steps, timestep_shift))
                return ode_mod.odeint_euler(d, x, grid)
            if sampling_method in ("heun", "Heun"):
                grid = jnp.asarray(ode_mod.time_grid(t0, t1, num_steps, timestep_shift))
                return ode_mod.odeint_heun(d, x, grid)
            if sampling_method in ("ab2", "ab3"):
                grid = jnp.asarray(ode_mod.time_grid(t0, t1, num_steps, timestep_shift))
                return ode_mod.odeint_ab(d, x, grid, order=int(sampling_method[2]))
            if sampling_method == "dopri5":
                return ode_mod.odeint_dopri5(
                    d, x, t0, t1, rtol=rtol, atol=atol, max_steps=max_steps)
            raise NotImplementedError(f"ODE method {sampling_method}")

        return _sample

    def sample_ode_cfg(
        self,
        *,
        num_steps: int = 250,
        timestep_shift: float = 0.0,
        cfg_interval_start: float = 0.0,
        reverse: bool = False,
        cache_interval: int = 1,
        cache_order: int = 1,
        cache_adaptive: bool = False,
        cache_tol: float = 0.02,
        cache_max_interval: int = 8,
        multistep_order: int = 1,
        sampling_method: str = "euler",
        rtol: float = 1e-3,
        atol: float = 1e-6,
        max_steps: int = 1000,
        return_stats: bool = False,
    ) -> Callable:
        """Euler CFG sampler with the interval split run as two scan phases.

        Below ``cfg_interval_start`` the reference's cfg_interval gate
        discards the guidance anyway (lightningdit.py:436-439) while still
        paying for both CFG halves; we integrate that phase with the
        conditional model at half batch — numerically identical for euler,
        ~15% fewer FLOPs at the production settings (start 0.11, shift 0.3).

        Returns fn(x (B,...), model_cond_fn, model_cfg_fn) -> (B,...) where
        model_cond_fn takes batch B and model_cfg_fn takes [cond|uncond] 2B.

        ``cache_interval > 1`` additionally reuses the cached velocity
        between model evaluations in the CFG phase (odeint_euler_cached) —
        training-free acceleration at a small quality cost; 1 = exact.
        ``cache_order`` picks the between-evaluation forecast (0 = hold the
        last velocity, 1 = linear forecast from the last two evaluations —
        same cost, measurably lower error; 2 = quadratic Newton forecast
        from the last three — see odeint_euler_cached).

        ``cache_adaptive=True`` replaces the fixed interval with the
        error-controlled one (odeint_euler_cached_adaptive): the realized
        forecast error at each evaluation drives the next gap toward
        ``cache_tol``, bounded by ``cache_max_interval``. The eval count
        becomes data-dependent; ``return_stats=True`` returns
        ``(x, {"cfg_evals": n})`` with the CFG-phase model-eval count so
        callers can account TRUE cost. Mutually exclusive with a fixed
        ``cache_interval > 1`` and with ``multistep_order > 1``.

        ``multistep_order > 1`` integrates each phase with variable-step
        Adams–Bashforth of that order instead of euler (odeint_ab): the same
        one-model-eval-per-step cost with O(h^order) accuracy, so the step
        count can drop ~3× at equal-or-better ODE error than euler at
        ``num_steps`` (measured in BASELINE.md). History restarts at the
        CFG-interval boundary, where the integrated field genuinely changes.
        Mutually exclusive with ``cache_interval > 1``.

        ``sampling_method`` picks the per-phase integrator:
          - "euler" (default): the reference-identical fixed-grid program —
            all acceleration knobs above apply to it.
          - "heun": fixed-grid RK2 on the same (possibly shifted) grid —
            TWO model evals per step, O(h²) global accuracy, and unlike the
            AB family it carries NO history (each step is self-contained),
            so it cannot amplify a stiff field's roughness across steps.
            heun-N costs the same model evals as euler-2N. The step that
            crosses the CFG-interval boundary is integrated entirely in its
            phase (the gate is per-STEP, not per-eval — for euler the two
            are identical; the reference gate is lightningdit.py:436-439).
          - "dopri5": adaptive RK45 per phase (odeint_dopri5, torchdiffeq-
            matching controller) with ``rtol``/``atol`` — the step size is
            chosen by the measured local error, so stiff regions get small
            steps automatically. ``num_steps``/``timestep_shift`` are
            ignored (adaptivity replaces the grid); the phase boundary sits
            exactly at model-t = cfg_interval_start. Model-eval cost per
            phase is 2 + 6·(naccept+nreject) CFG forwards;
            ``return_stats=True`` makes the sampler return
            ``(x, {"cond": stats|None, "cfg": stats})`` for eval accounting.
        Both are mutually exclusive with the euler-only ``cache_interval``/
        ``multistep_order`` knobs.
        """
        if sampling_method not in ("euler", "Euler", "heun", "Heun", "dopri5"):
            raise NotImplementedError(f"CFG ODE method {sampling_method}")
        if sampling_method not in ("euler", "Euler") and (
            cache_interval > 1 or multistep_order > 1 or cache_adaptive
        ):
            raise ValueError(
                "cache_interval/cache_adaptive/multistep_order are euler-grid "
                f"accelerations — not composable with sampling_method="
                f"{sampling_method!r}"
            )
        if return_stats and sampling_method != "dopri5" and not cache_adaptive:
            raise ValueError(
                "return_stats is only meaningful for dopri5 or cache_adaptive"
            )
        if multistep_order > 1 and (cache_interval > 1 or cache_adaptive):
            raise ValueError(
                "multistep_order and the velocity cache are mutually "
                "exclusive accelerations — pick one"
            )
        if cache_adaptive and cache_interval > 1:
            raise ValueError(
                "cache_adaptive replaces the fixed cache_interval — set "
                "velocity_cache_interval back to 1 (or drop it)"
            )
        if cache_adaptive and not (cache_tol > 0.0):
            raise ValueError(f"cache_adaptive needs cache_tol > 0, got {cache_tol}")
        if cache_adaptive and cache_max_interval < 1:
            raise ValueError(
                f"cache_max_interval must be >= 1, got {cache_max_interval}"
            )
        # validate at BUILD time even when the knob is currently inert, so a
        # config typo (e.g. velocity_cache_order: 3, confusing it with
        # multistep_order) fails when written, not when caching is later
        # flipped on
        if cache_order not in (0, 1, 2):
            raise ValueError(f"cache_order must be 0, 1 or 2, got {cache_order}")
        if multistep_order not in (1, 2, 3):
            raise ValueError(
                f"multistep_order must be 1 (euler), 2 or 3, got {multistep_order}"
            )
        transport = self.transport
        base_drift = self.drift
        if reverse:
            # same time mirror as sample_ode: the grid descends 1→0 and the
            # model is evaluated at 1 - grid-time (ascending 0→1)
            drift = lambda x, t, model_fn, **kw: base_drift(
                x, jnp.ones_like(t) * (1.0 - t), model_fn, **kw
            )
        else:
            drift = base_drift
        t0, t1 = transport.check_interval(eval=True, sde=False, reverse=reverse)
        grid_np = ode_mod.time_grid(t0, t1, num_steps, timestep_shift)
        # The CFG gate is on MODEL time (lightningdit.py:436-439): guidance
        # applies once model-t >= cfg_interval_start. Under the reverse mirror
        # model time is 1 - grid-time, still ascending, so the cond-only
        # phase comes first either way; searchsorted needs the ascending view.
        model_t = (1.0 - grid_np) if reverse else grid_np
        # first step index whose model-t_cur >= start ends the cond-only phase
        split_idx = int(np.searchsorted(model_t[:-1], cfg_interval_start))
        grid = jnp.asarray(grid_np)

        def _sample(
            x: jax.Array,
            model_cond_fn: Callable,
            model_cfg_fn: Callable,
        ) -> jax.Array:
            B = x.shape[0]
            d_cond = lambda xv, tv: drift(xv, tv, model_cond_fn)
            d_cfg = lambda xv, tv: drift(xv, tv, model_cfg_fn)
            if sampling_method in ("heun", "Heun"):
                if split_idx > 0:
                    x = ode_mod.odeint_heun(d_cond, x, grid[: split_idx + 1])
                x2 = jnp.concatenate([x, x], axis=0)
                out = ode_mod.odeint_heun(d_cfg, x2, grid[split_idx:])
                return out[:B]
            if sampling_method == "dopri5":
                # phase boundary at model-t == cfg_interval_start exactly;
                # under the reverse mirror that is grid-t = 1 - start. Clamp
                # into the integration span so start=0 or start>=1 degrades
                # to a single-phase program.
                tb = (1.0 - cfg_interval_start) if reverse else cfg_interval_start
                lo, hi = sorted((t0, t1))
                tb = float(min(max(tb, lo), hi))
                stats: dict = {"cond": None, "cfg": None}
                if tb != t0:
                    x, stats["cond"] = ode_mod.odeint_dopri5(
                        d_cond, x, t0, tb, rtol=rtol, atol=atol,
                        max_steps=max_steps, with_stats=True
                    )
                x2 = jnp.concatenate([x, x], axis=0)
                out, stats["cfg"] = ode_mod.odeint_dopri5(
                    d_cfg, x2, tb, t1, rtol=rtol, atol=atol,
                    max_steps=max_steps, with_stats=True
                )
                out = out[:B]
                return (out, stats) if return_stats else out
            if multistep_order > 1:
                # AB phases with a history restart at the boundary
                if split_idx > 0:
                    x = ode_mod.odeint_ab(
                        d_cond, x, grid[: split_idx + 1], order=multistep_order
                    )
                x2 = jnp.concatenate([x, x], axis=0)
                out = ode_mod.odeint_ab(
                    d_cfg, x2, grid[split_idx:], order=multistep_order
                )
                return out[:B]
            if cache_adaptive:
                # error-controlled cache: exact cond-only phase, adaptive CFG
                if split_idx > 0:
                    x = ode_mod.odeint_euler(d_cond, x, grid[: split_idx + 1])
                x2 = jnp.concatenate([x, x], axis=0)
                out, n_evals, floor = ode_mod.odeint_euler_cached_adaptive(
                    d_cfg, x2, grid[split_idx:], tol=cache_tol,
                    max_interval=cache_max_interval, order=cache_order,
                    with_stats=True, with_floor=True,
                )
                out = out[:B]
                # noise_floor: the controller's min-calibrated relative
                # model-noise floor — the useful lower end of cache_tol
                # (below it the knob saturates, BASELINE.md)
                return ((out, {"cfg_evals": n_evals, "noise_floor": floor})
                        if return_stats else out)
            if cache_interval <= 1:
                lift = lambda xv: jnp.concatenate([xv, xv], axis=0)
                out = ode_mod.odeint_euler_split(
                    d_cond, d_cfg, lift, x, grid, split_idx
                )
                return out[:B]
            # cached variant: exact cond-only phase, cached CFG phase
            if split_idx > 0:
                x = ode_mod.odeint_euler(d_cond, x, grid[: split_idx + 1])
            x2 = jnp.concatenate([x, x], axis=0)
            out = ode_mod.odeint_euler_cached(
                d_cfg, x2, grid[split_idx:], cache_interval, order=cache_order
            )
            return out[:B]

        return _sample

    # -- SDE -----------------------------------------------------------------

    def sample_sde(
        self,
        *,
        sampling_method: str = "Euler",
        diffusion_form: str = "SBDM",
        diffusion_norm: float = 1.0,
        last_step: Optional[str] = "Mean",
        last_step_size: float = 0.04,
        num_steps: int = 250,
    ) -> Callable:
        transport = self.transport
        path = transport.path
        if last_step is None:
            last_step_size = 0.0

        def diffusion_fn(x, t):
            return paths.diffusion_coeff(path, x, t, form=diffusion_form, norm=diffusion_norm)

        def sde_drift(x, t, model_fn, **kw):
            return self.drift(x, t, model_fn, **kw) + diffusion_fn(x, t) * self.score(
                x, t, model_fn, **kw
            )

        t0, t1 = transport.check_interval(
            eval=True,
            sde=True,
            diffusion_form=diffusion_form,
            last_step_size=last_step_size,
        )

        def last_step_fn(x, t, model_fn, **kw):
            if last_step is None:
                return x
            if last_step == "Mean":
                return x + sde_drift(x, t, model_fn, **kw) * last_step_size
            if last_step == "Tweedie":
                alpha = path.alpha(t[0])[0]
                sigma = path.sigma(t[0])[0]
                return x / alpha + (sigma**2) / alpha * self.score(x, t, model_fn, **kw)
            if last_step == "Euler":
                return x + self.drift(x, t, model_fn, **kw) * last_step_size
            raise NotImplementedError(last_step)

        def _sample(
            rng: jax.Array,
            x: jax.Array,
            model_fn: Callable,
            noise: Optional[jax.Array] = None,
            **model_kwargs: Any,
        ) -> jax.Array:
            d = lambda xv, tv: sde_drift(xv, tv, model_fn, **model_kwargs)
            grid = jnp.linspace(t0, t1, num_steps, dtype=jnp.float32)
            if sampling_method == "Euler":
                x, _ = sde_mod.sdeint_euler(d, diffusion_fn, rng, x, grid, noise=noise)
            elif sampling_method == "Heun":
                x, _ = sde_mod.sdeint_heun(d, diffusion_fn, rng, x, grid, noise=noise)
            else:
                raise NotImplementedError(f"SDE method {sampling_method}")
            ts = jnp.full((x.shape[0],), t1, x.dtype)
            return last_step_fn(x, ts, model_fn, **model_kwargs)

        return _sample

    # -- likelihood ------------------------------------------------------------

    def sample_ode_likelihood(
        self,
        *,
        sampling_method: str = "dopri5",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
    ) -> Callable:
        """Hutchinson-trace log-likelihood (reference transport.py:445-501).

        Uses jvp for the divergence estimate (the reference uses
        autograd.grad) over the augmented (x, logp) state. The default
        integrator is the adaptive dopri5 riding the pytree-capable
        ``odeint_dopri5`` — the reference hands the (x, ll) tuple to
        torchdiffeq's adaptive odeint the same way; ``sampling_method=
        "euler"`` selects the fixed-grid scan instead.
        """
        transport = self.transport
        base_drift = self.drift
        t0, t1 = transport.check_interval(eval=True)

        def _sample(rng: jax.Array, x: jax.Array, model_fn: Callable, **kw: Any):
            B = x.shape[0]
            eps = (
                jax.random.randint(rng, x.shape, 0, 2).astype(x.dtype) * 2.0 - 1.0
            )

            def aug_drift(state, t_b):
                xv, _ = state
                t_rev = jnp.ones_like(t_b) * (1.0 - t_b)
                fn = lambda xx: base_drift(xx, t_rev, model_fn, **kw)
                drift_val, jvp_val = jax.jvp(fn, (xv,), (eps,))
                logp_grad = jnp.sum(
                    (jvp_val * eps).reshape(B, -1), axis=-1
                )
                return (-drift_val, logp_grad)

            logp0 = jnp.zeros((B,), x.dtype)
            if sampling_method == "dopri5":
                xv, delta_logp = ode_mod.odeint_dopri5(
                    aug_drift, (x, logp0), t0, t1, rtol=rtol, atol=atol
                )
            else:
                grid = jnp.linspace(t0, t1, num_steps, dtype=jnp.float32)

                def step(carry, tt):
                    xv, logp = carry
                    t_cur, t_next = tt
                    dt = (t_next - t_cur).astype(x.dtype)
                    dx, dlogp = aug_drift((xv, logp), jnp.full((B,), t_cur, x.dtype))
                    return (xv + dt * dx, logp + dt * dlogp), None

                pairs = jnp.stack([grid[:-1], grid[1:]], axis=-1)
                (xv, delta_logp), _ = jax.lax.scan(step, (x, logp0), pairs)
            prior_logp = transport.prior_logp(xv)
            return prior_logp - delta_logp, xv

        return _sample
