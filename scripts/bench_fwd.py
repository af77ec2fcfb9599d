"""Microbench: one DiT-XL/1 bf16 forward (CFG batch) under attention variants.

Usage: python scripts/bench_fwd.py [batch]
Env: VAVAE_FLASH_MIN_SEQ=9999 forces the XLA attention path.
"""
from __future__ import annotations

import sys
import time

import vavae_tpu.utils.jax_cache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.models.dit import LightningDiT_models


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    model = LightningDiT_models["LightningDiT-XL/1"](
        input_size=16,
        in_channels=32,
        num_classes=1000,
        use_swiglu=True,
        use_rope=True,
        use_rmsnorm=True,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    zshape = (batch, 16, 16, 32)
    params = model.init(
        {"params": rng},
        jnp.zeros(zshape, jnp.bfloat16),
        jnp.zeros((batch,)),
        jnp.zeros((batch,), jnp.int32),
    )["params"]
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(p, x, t, y):
        return model.apply({"params": p}, x, t, y)

    x = jax.random.normal(rng, zshape, jnp.bfloat16)
    t = jnp.full((batch,), 0.5, jnp.float32)
    y = jnp.arange(batch, dtype=jnp.int32) % 1000

    np.asarray(fwd(params, x, t, y))  # compile
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, x, t, y)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"batch={batch} fwd={dt:.2f} ms")


if __name__ == "__main__":
    main()
