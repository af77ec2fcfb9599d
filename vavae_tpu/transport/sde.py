"""SDE integrators (Euler-Maruyama, Heun) as lax.scan programs.

Parity target: LightningDiT/transport/integrators.py:8-75. The reference
iterates ``num_steps - 1`` python steps over linspace(t0, t1, num_steps) and
appends a last-step correction (transport.py:336-396); here the whole thing
is one scanned program with jax PRNG noise.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def sdeint_euler(
    drift: Callable,
    diffusion: Callable,
    rng: jax.Array,
    x: jax.Array,
    t: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Euler-Maruyama over grid t; returns (x, mean_x) at the final grid point.

    drift(x, t_b), diffusion(x, t_b); t_b is the (B,)-broadcast time.
    """
    B = x.shape[0]
    dt = t[1] - t[0]

    def step(carry, inp):
        x, _ = carry
        t_cur, key = inp
        t_b = jnp.full((B,), t_cur, x.dtype)
        w = jax.random.normal(key, x.shape, x.dtype)
        dw = w * jnp.sqrt(dt).astype(x.dtype)
        d = drift(x, t_b)
        g = diffusion(x, t_b)
        mean_x = x + d * dt.astype(x.dtype)
        x_new = mean_x + jnp.sqrt(2.0 * g).astype(x.dtype) * dw
        return (x_new, mean_x), None

    keys = jax.random.split(rng, t.shape[0] - 1)
    (x, mean_x), _ = jax.lax.scan(step, (x, x), (t[:-1], keys))
    return x, mean_x


def sdeint_heun(
    drift: Callable,
    diffusion: Callable,
    rng: jax.Array,
    x: jax.Array,
    t: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    B = x.shape[0]
    dt = t[1] - t[0]

    def step(carry, inp):
        x, _ = carry
        t_cur, key = inp
        t_b = jnp.full((B,), t_cur, x.dtype)
        w = jax.random.normal(key, x.shape, x.dtype)
        dw = w * jnp.sqrt(dt).astype(x.dtype)
        g = diffusion(x, t_b)
        xhat = x + jnp.sqrt(2.0 * g).astype(x.dtype) * dw
        k1 = drift(xhat, t_b)
        xp = xhat + dt.astype(x.dtype) * k1
        k2 = drift(xp, t_b + dt.astype(x.dtype))
        x_new = xhat + 0.5 * dt.astype(x.dtype) * (k1 + k2)
        return (x_new, xhat), None

    keys = jax.random.split(rng, t.shape[0] - 1)
    (x, mean_x), _ = jax.lax.scan(step, (x, x), (t[:-1], keys))
    return x, mean_x
