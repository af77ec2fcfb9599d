"""SDE integrators (Euler-Maruyama, Heun) as lax.scan programs.

Parity target: LightningDiT/transport/integrators.py:8-75. The reference
iterates ``num_steps - 1`` python steps over linspace(t0, t1, num_steps) and
appends a last-step correction (transport.py:336-396); here the whole thing
is one scanned program with jax PRNG noise.

``noise`` (optional, shape ``(num_steps - 1, *x.shape)``) replaces the
per-step PRNG draws — used by the trajectory parity tests to feed the
reference integrator and this one identical Wiener increments.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _noise_scan_inputs(rng, noise, x, t):
    """(xs, get_w): scan inputs and the per-step Wiener-draw accessor."""
    steps = t.shape[0] - 1
    if noise is None:
        keys = jax.random.split(rng, steps)
        return (t[:-1], keys), lambda w_in: jax.random.normal(
            w_in, x.shape, x.dtype
        )
    assert noise.shape[0] == steps, (noise.shape, steps)
    return (t[:-1], noise), lambda w_in: w_in.astype(x.dtype)


def sdeint_euler(
    drift: Callable,
    diffusion: Callable,
    rng: Optional[jax.Array],
    x: jax.Array,
    t: jax.Array,
    noise: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Euler-Maruyama over grid t; returns (x, mean_x) at the final grid point.

    drift(x, t_b), diffusion(x, t_b); t_b is the (B,)-broadcast time.
    """
    B = x.shape[0]
    dt = t[1] - t[0]
    xs, get_w = _noise_scan_inputs(rng, noise, x, t)

    def step(carry, inp):
        x, _ = carry
        t_cur, w_in = inp
        t_b = jnp.full((B,), t_cur, x.dtype)
        dw = get_w(w_in) * jnp.sqrt(dt).astype(x.dtype)
        d = drift(x, t_b)
        g = diffusion(x, t_b)
        mean_x = x + d * dt.astype(x.dtype)
        x_new = mean_x + jnp.sqrt(2.0 * g).astype(x.dtype) * dw
        return (x_new, mean_x), None

    (x, mean_x), _ = jax.lax.scan(step, (x, x), xs)
    return x, mean_x


def sdeint_heun(
    drift: Callable,
    diffusion: Callable,
    rng: Optional[jax.Array],
    x: jax.Array,
    t: jax.Array,
    noise: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    B = x.shape[0]
    dt = t[1] - t[0]
    xs, get_w = _noise_scan_inputs(rng, noise, x, t)

    def step(carry, inp):
        x, _ = carry
        t_cur, w_in = inp
        t_b = jnp.full((B,), t_cur, x.dtype)
        dw = get_w(w_in) * jnp.sqrt(dt).astype(x.dtype)
        g = diffusion(x, t_b)
        xhat = x + jnp.sqrt(2.0 * g).astype(x.dtype) * dw
        k1 = drift(xhat, t_b)
        xp = xhat + dt.astype(x.dtype) * k1
        k2 = drift(xp, t_b + dt.astype(x.dtype))
        x_new = xhat + 0.5 * dt.astype(x.dtype) * (k1 + k2)
        return (x_new, xhat), None

    (x, mean_x), _ = jax.lax.scan(step, (x, x), xs)
    return x, mean_x
