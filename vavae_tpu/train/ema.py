"""EMA of a parameter pytree (reference LightningDiT/train.py:303-314)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def update_ema(ema_params, params, decay: float = 0.9999):
    """ema = decay * ema + (1 - decay) * params, leafwise (computed in f32).

    The EMA tree must be stored in float32 when decay is close to 1: at
    decay 0.9999 the per-step increment is ~1e-4 relative, below bfloat16's
    ~4e-3 resolution, so a bf16-stored EMA silently never moves. bf16
    PARAMS are fine — they're upcast for the blend.
    """
    eps = 2.0 ** -8  # bf16 relative resolution
    if 1.0 - decay < eps:
        for leaf in jax.tree_util.tree_leaves(ema_params):
            if getattr(leaf, "dtype", None) == jnp.bfloat16:
                raise ValueError(
                    f"bf16-stored EMA with decay {decay}: the (1-decay) "
                    "increment underflows bf16 and the EMA would never "
                    "update. Keep ema_params in float32 (params may be bf16)."
                )
    return jax.tree_util.tree_map(
        lambda e, p: (
            e.astype(jnp.float32) * decay + p.astype(jnp.float32) * (1.0 - decay)
        ).astype(e.dtype),
        ema_params,
        params,
    )
