"""EMA of a parameter pytree (reference LightningDiT/train.py:303-314)."""
from __future__ import annotations

import jax


def update_ema(ema_params, params, decay: float = 0.9999):
    """ema = decay * ema + (1 - decay) * params, leafwise."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
