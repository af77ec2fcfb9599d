"""DiT-XL/1 train-step ATTRIBUTION: account for every ms of the 140 ms step.

Round-3 verdict item 5: the VAE train step has a measured roofline (89 TF/s
effective = conv-bound, BASELINE.md) but the DiT step's 140.1 ms at B=16
bf16 had ~50 ms unattributed beyond the naive fwd+bwd estimate. This bench
measures each component of the step in its OWN process (CLAUDE.md rule:
never time in a process that already built big jits — executable churn
inflated earlier standalone measurements up to 7x):

  model_fwd   one bf16 XL/1 forward at the train batch (no loss machinery)
  loss_fwd    the full training-loss forward (path plan + t-sampling +
              model fwd + MSE+cos reduction) — what the bwd pass rematerializes
  fwdbwd      jit(value_and_grad(loss)) — forward + backward, NO optimizer
  opt         AdamW update alone on the XL param tree (optax chain as the
              trainer builds it), donated like the real step
  ema         f32 EMA blend alone, donated
  full        the real trainer.train_step (fwd+bwd+Adam+EMA, donated state)
  flops       XLA cost-analysis FLOPs of model_fwd / loss_fwd / fwdbwd.
              CAVEAT (measured round 5): compiled cost_analysis counts
              while-loop BODIES ONCE — on this scanned model the absolute
              numbers are ~28x low (0.40 "TF" vs the true 11.45 TF,
              profile_bwd_ops.py HLO inventory). The RATIOS between parts
              remain meaningful (equal trip counts cancel): fwdbwd ÷
              loss_fwd ≈ 3.99 under policy `nothing` vs 3.0003 under
              `dots` is the per-iteration recompute signature. For true
              FLOPs use scripts/profile_bwd_ops.py --part hlo.

Usage:
  python scripts/bench_train_attrib.py --all [batch]     # orchestrate: one
                                                         # subprocess per part
  python scripts/bench_train_attrib.py --part fwdbwd [batch]

Each part prints one JSON line {"part", "ms", ...}; --all aggregates them
into the attribution table and the residual (full − Σ parts), which is the
honest "unexplained" number. Reference being chased:
LightningDiT/docs/log.txt (5.3 steps/s @ global batch 1024 on 8×H800 ⇒
~679 img/s-per-chip-normalized; we measure ~114 img/s at 197 TF/s peak).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import vavae_tpu.utils.jax_cache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARTS = ("model_fwd", "loss_fwd", "fwdbwd", "opt", "ema", "full", "flops")


def build(batch: int, policy: str = "nothing"):
    from vavae_tpu.models.dit import LightningDiT_models
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer, TrainState
    from vavae_tpu.transport import create_transport

    model = LightningDiT_models["LightningDiT-XL/1"](
        input_size=16, in_channels=32, num_classes=1000, use_swiglu=True,
        use_rope=True, use_rmsnorm=True, use_checkpoint=True,
        checkpoint_policy=policy, dtype=jnp.bfloat16,
    )
    trainer = DiTTrainer(
        model=model, transport=create_transport("Linear", "velocity"),
        mesh=make_mesh(),
    )
    rng = jax.random.PRNGKey(0)
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
        ema_params=jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params
        ),
        opt_state=trainer.tx.init(params),
    )
    x = jax.random.normal(rng, (batch, 16, 16, 32), jnp.float32)
    y = jnp.arange(batch, dtype=jnp.int32) % 1000
    return model, trainer, state, rng, x, y


def timeit(fn, *args, iters=10, settle=4):
    out = None
    for _ in range(settle):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def run_part(part: str, batch: int, policy: str = "nothing") -> dict:
    model, trainer, state, rng, x, y = build(batch, policy)
    rec: dict = {"part": part, "batch": batch, "policy": policy}

    if part == "model_fwd":
        t = jax.random.uniform(rng, (batch,))
        fwd = jax.jit(lambda p, xx, tt, yy: model.apply({"params": p}, xx, tt, yy))
        rec["ms"] = timeit(fwd, state.params, x, t, y)
        rec["flops"], rec["bytes"] = cost(fwd, state.params, x, t, y)
    elif part == "loss_fwd":
        lf = jax.jit(lambda p, r, xx, yy: trainer._loss_fn(p, r, xx, yy))
        rec["ms"] = timeit(lf, state.params, rng, x, y)
        rec["flops"], rec["bytes"] = cost(lf, state.params, rng, x, y)
    elif part == "fwdbwd":
        vg = jax.jit(
            lambda p, r, xx, yy: jax.value_and_grad(
                trainer._loss_fn, has_aux=True)(p, r, xx, yy)
        )
        rec["ms"] = timeit(vg, state.params, rng, x, y)
        rec["flops"], rec["bytes"] = cost(vg, state.params, rng, x, y)
    elif part == "opt":
        import optax

        grads = jax.jit(
            lambda p: jax.tree_util.tree_map(lambda l: jnp.ones_like(l) * 1e-4, p)
        )(state.params)

        @jax.jit
        def opt_step(g, o, p):
            updates, new_o = trainer.tx.update(g, o, p)
            return optax.apply_updates(p, updates), new_o

        # donation-free (the real step donates; this slightly OVERSTATES the
        # optimizer by the extra output allocs — conservative direction)
        rec["ms"] = timeit(opt_step, grads, state.opt_state, state.params)
        rec["flops"], rec["bytes"] = cost(opt_step, grads, state.opt_state,
                                          state.params)
    elif part == "ema":
        from vavae_tpu.train.ema import update_ema

        ema_step = jax.jit(lambda e, p: update_ema(e, p, 0.9999))
        rec["ms"] = timeit(ema_step, state.ema_params, state.params)
        rec["flops"], rec["bytes"] = cost(ema_step, state.ema_params,
                                          state.params)
    elif part == "full":
        def step(s):
            s, m = trainer.train_step(s, rng, (x, y))
            return s

        # donated state: thread it through, fetch a metric leaf to sync
        for _ in range(4):
            state = step(state)
        np.asarray(state.step)
        t0 = time.perf_counter()
        for _ in range(10):
            state = step(state)
        np.asarray(state.step)
        rec["ms"] = (time.perf_counter() - t0) / 10 * 1e3
    elif part == "flops":
        t = jax.random.uniform(rng, (batch,))
        fwd = jax.jit(lambda p, xx, tt, yy: model.apply({"params": p}, xx, tt, yy))
        lf = jax.jit(lambda p, r, xx, yy: trainer._loss_fn(p, r, xx, yy))
        vg = jax.jit(
            lambda p, r, xx, yy: jax.value_and_grad(
                trainer._loss_fn, has_aux=True)(p, r, xx, yy)
        )
        f_f, b_f = cost(fwd, state.params, x, t, y)
        f_l, b_l = cost(lf, state.params, rng, x, y)
        f_vg, b_vg = cost(vg, state.params, rng, x, y)
        rec.update(model_fwd_flops=f_f, loss_fwd_flops=f_l, fwdbwd_flops=f_vg,
                   model_fwd_bytes=b_f, loss_fwd_bytes=b_l, fwdbwd_bytes=b_vg,
                   # matmul-chain bwd ≈ 2x fwd; beyond 3x fwd ≈ remat recompute
                   remat_overhead_flops=f_vg - 3.0 * f_l)
    else:
        raise SystemExit(f"unknown part {part}")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=PARTS)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--policy", choices=("nothing", "dots"), default="nothing")
    ap.add_argument("batch", nargs="?", type=int, default=16)
    args = ap.parse_args()

    if args.part:
        rec = run_part(args.part, args.batch, args.policy)
        print(json.dumps(rec), flush=True)
        return

    if not args.all:
        raise SystemExit("pass --part PART or --all")

    recs = {}
    for part in PARTS:
        cmd = [sys.executable, os.path.abspath(__file__), "--part", part,
               "--policy", args.policy, str(args.batch)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"{part}: FAILED\n{out.stderr[-1500:]}", flush=True)
            continue
        recs[part] = json.loads(line[-1])
        print(f"{part:10s}: " + ", ".join(
            f"{k}={v:.2f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in recs[part].items() if k not in ("part", "batch")),
            flush=True)

    if "full" in recs and all(p in recs for p in ("fwdbwd", "opt", "ema")):
        full = recs["full"]["ms"]
        parts_sum = sum(recs[p]["ms"] for p in ("fwdbwd", "opt", "ema"))
        print(json.dumps({
            "metric": "train_step_attrib_b%d" % args.batch,
            "full_ms": round(full, 2),
            "fwdbwd_ms": round(recs["fwdbwd"]["ms"], 2),
            "opt_ms": round(recs["opt"]["ms"], 2),
            "ema_ms": round(recs["ema"]["ms"], 2),
            "residual_ms": round(full - parts_sum, 2),
            "model_fwd_ms": round(recs.get("model_fwd", {}).get("ms", 0), 2),
            "loss_fwd_ms": round(recs.get("loss_fwd", {}).get("ms", 0), 2),
            "remat_overhead_tflop": round(
                recs.get("flops", {}).get("remat_overhead_flops", 0) / 1e12, 3),
            "fwdbwd_tflop": round(
                recs.get("flops", {}).get("fwdbwd_flops", 0) / 1e12, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
