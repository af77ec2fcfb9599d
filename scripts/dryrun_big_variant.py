"""FSDP-sharded dry run of a FULL-SIZE big registry variant (verdict item 5).

The 1p6B variant cannot fit a single v5e chip's 16 GB HBM: bf16 params
3.3 GB + f32 EMA 6.6 + Adam mu/nu 6.6+6.6 = 23.1 GB state alone (19.8 with
bf16 mu) — the HBM math, recorded in BASELINE.md. The reference carries the
same registry entries without ever training them (lightningdit.py:498-529);
we beat that by proving ours RUNS: this script steps the REAL full-size
model (no shrunk dims) over an 8-device fsdp mesh — on the CPU platform
with virtual devices by default (the driver-style dryrun; 125 GB host RAM
holds the ~26 GB f32 state), or on a real multi-chip slice if one is ever
attached.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/dryrun_big_variant.py [LightningDiT-1p6B/1] [batch=8]

Prints one JSON line with the loss, step time (meaningless on CPU — the
point is the full-size state shards, steps, and stays finite), and the
per-device parameter-shard bytes proving fsdp actually divided the state.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    model_name = sys.argv[1] if len(sys.argv) > 1 else "LightningDiT-1p6B/1"
    # batch must divide over the dp x fsdp axes (8 devices)
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")
    os.environ.setdefault("VAVAE_PLATFORM", "cpu")

    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax

    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import LightningDiT_models
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 devices, have {n_dev}"
    mesh = make_mesh(data=1, fsdp=8, tensor=1, devices=jax.devices()[:8])
    model = LightningDiT_models[model_name](
        input_size=16, in_channels=32, num_classes=1000, use_swiglu=True,
        use_rope=True, use_rmsnorm=True, use_checkpoint=True,
        checkpoint_policy="dots", dtype=jnp.bfloat16,
    )
    trainer = DiTTrainer(
        model, create_transport("Linear", "velocity"), mesh,
        adam_mu_dtype="bfloat16",
    )
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = trainer.replicate(trainer.init_state(rng, (batch, 16, 16, 32)))
    init_s = time.perf_counter() - t0

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    # proof the state is genuinely fsdp-sharded: the largest param's
    # addressable shard on device 0 is 1/8 of its global size
    big = max(jax.tree_util.tree_leaves(state.params),
              key=lambda p: int(np.prod(p.shape)))
    shard = big.addressable_shards[0].data
    assert int(np.prod(shard.shape)) * 8 == int(np.prod(big.shape)), (
        big.shape, shard.shape)

    x = jax.random.normal(rng, (batch, 16, 16, 32), jnp.float32)
    y = jnp.arange(batch, dtype=jnp.int32) % 1000
    batch_sharded = trainer.shard_batch((np.asarray(x), np.asarray(y)))
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, rng, batch_sharded)
    loss0 = float(jax.device_get(metrics["loss"]))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, rng, batch_sharded)
    loss1 = float(jax.device_get(metrics["loss"]))
    second_s = time.perf_counter() - t0
    assert np.isfinite(loss0) and np.isfinite(loss1), (loss0, loss1)
    assert int(jax.device_get(state.step)) == 2

    print(json.dumps({
        "model": model_name, "batch": batch, "platform": jax.default_backend(),
        "n_devices": 8, "mesh": "fsdp=8",
        "params_b": round(n_params / 1e9, 3),
        "largest_param_shape": list(big.shape),
        "largest_param_shard_shape": list(shard.shape),
        "loss_step1": round(loss0, 4), "loss_step2": round(loss1, 4),
        "init_s": round(init_s, 1),
        "first_step_s": round(first_s, 1), "second_step_s": round(second_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
