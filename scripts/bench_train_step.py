"""Microbench: one DiT-XL/1 training step (fwd+bwd+Adam+EMA), single chip.

Usage: python scripts/bench_train_step.py [batch] [--bf16] [--mu_bf16] [--ema_every K]
                                          [--policy nothing|dots]
  --bf16       bf16 params (EMA stays f32)
  --mu_bf16    Adam first moment in bf16 (optimizer.adam_mu_dtype)
  --ema_every  amortized EMA cadence (train.ema_every); the reported ms is
               the average over the cadence, i.e. the amortized cost
  --policy     remat policy (model.checkpoint_policy): "nothing" recomputes
               the full block (+1 fwd of HLO FLOPs, but only ~4.7 ms wall on
               fwdbwd / ~2.1 ms full-step — the recompute overlaps backward
               memory traffic; BASELINE.md train attribution), "dots" saves
               matmul outputs and recomputes only the elementwise ops
Env: VAVAE_ATTN_NATURAL=0 restores the padded-layout attention for A/B.
"""
from __future__ import annotations

import argparse
import time

import vavae_tpu.utils.jax_cache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.models.dit import LightningDiT_models
from vavae_tpu.parallel.mesh import make_mesh
from vavae_tpu.train.dit_trainer import DiTTrainer
from vavae_tpu.transport import create_transport


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("batch", nargs="?", type=int, default=16)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--mu_bf16", action="store_true")
    ap.add_argument("--ema_every", type=int, default=1)
    # round-4 attribution (BASELINE.md): under the default "nothing" policy
    # the backward's HLO FLOPs are 3.99x the forward's (ideal 3x) — the
    # remat recomputes one FULL forward, ~25 ms of the 140 ms step. "dots"
    # saves matmul outputs and recomputes only the elementwise ops.
    ap.add_argument("--policy", choices=("nothing", "dots"), default="nothing")
    # round-5 verdict item 5: the registry's big variants (1p0B/1p6B) must
    # be shown actually training, with the same accounting as XL/1
    ap.add_argument("--model", default="LightningDiT-XL/1",
                    help="registry name, e.g. LightningDiT-1p0B/1")
    args = ap.parse_args()
    batch = args.batch
    model = LightningDiT_models[args.model](
        input_size=16,
        in_channels=32,
        num_classes=1000,
        use_swiglu=True,
        use_rope=True,
        use_rmsnorm=True,
        use_checkpoint=True,
        checkpoint_policy=args.policy,
        dtype=jnp.bfloat16,
    )
    mesh = make_mesh()
    trainer = DiTTrainer(
        model=model, transport=create_transport("Linear", "velocity"), mesh=mesh,
        ema_every=args.ema_every,
        adam_mu_dtype="bfloat16" if args.mu_bf16 else None,
    )
    rng = jax.random.PRNGKey(0)
    if args.bf16:
        from vavae_tpu.train.dit_trainer import TrainState

        zeros = (
            jnp.zeros((batch, 16, 16, 32), jnp.float32),
            jnp.zeros((batch,), jnp.float32),
            jnp.zeros((batch,), jnp.int32),
        )
        params = jax.jit(
            lambda: jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16),
                model.init({"params": rng}, *zeros)["params"],
            )
        )()
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # EMA stays f32 even with bf16 params: the 1e-4 EMA increment
            # underflows bf16 resolution (train/ema.py)
            ema_params=jax.tree_util.tree_map(
                lambda p: p.astype(jnp.float32), params
            ),
            opt_state=trainer.tx.init(params),
        )
    else:
        state = trainer.init_state(rng, (batch, 16, 16, 32))
    x = jax.random.normal(rng, (batch, 16, 16, 32), jnp.float32)
    y = jnp.arange(batch, dtype=jnp.int32) % 1000

    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, rng, (x, y))  # compile
    np.asarray(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s", flush=True)
    # settle past BOTH compiled programs: with ema_every=k the do_ema=True
    # program first compiles on step k, and the first donated-state steps
    # after each compile run ~6x slow (CLAUDE.md) — so run at least one full
    # cadence beyond the second compile before timing
    settle = max(3, 2 * args.ema_every)
    for i in range(settle):
        state, metrics = trainer.train_step(state, rng, (x, y))
        np.asarray(metrics["loss"])
    # time WHOLE cadences (n a multiple of ema_every) so the reported ms is
    # the true amortized cost regardless of phase
    n = args.ema_every * max(2, -(-10 // args.ema_every))
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = trainer.train_step(state, rng, (x, y))
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / n * 1e3
    # true-FLOPs accounting (BASELINE round-5 attribution): dot+attn FLOPs
    # from the model dims; fwdbwd = 3x fwd under the dots policy
    h, d_, heads = model.hidden_size, model.depth, model.num_heads
    # token count follows the patch size (a /2 registry name halves the
    # grid): N=256 for /1 models at input_size 16, 64 for /2
    N = (16 // model.patch_size) ** 2
    # SwiGLU per-projection width, exactly as DiTBlock builds it
    # (models/dit.py:122-125): int(2/3 * int(h * mlp_ratio))
    mlp_h = int(2 / 3 * int(h * model.mlp_ratio))
    # per-block fwd dot FLOPs at this batch: qkv + proj + w12 (2*mlp_h wide)
    # + w3 + adaLN (contracts over B rows, NOT tokens) + attention einsums
    blk = (2 * batch * N * h * 3 * h + 2 * batch * N * h * h
           + 2 * batch * N * h * 2 * mlp_h + 2 * batch * N * mlp_h * h
           + 2 * batch * h * 6 * h + 4 * batch * heads * N * N * (h // heads))
    fwd_tf = d_ * blk / 1e12
    step_tfs = 3 * fwd_tf / (dt / 1e3)
    try:
        import jax as _jax
        mem = _jax.local_devices()[0].memory_stats() or {}
        peak_gb = mem.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        peak_gb = 0.0
    print(f"model={args.model} batch={batch} train_step={dt:.2f} ms "
          f"({batch / dt * 1e3:.1f} img/s/chip, ~{step_tfs:.0f} TF/s true "
          f"dot-FLOPs, peak HBM {peak_gb:.1f} GB)")


if __name__ == "__main__":
    main()
