"""Quantify the Adams–Bashforth multistep sampler (transport/ode.py
odeint_ab) against the reference's production 250-step euler.

Unlike the velocity cache (a forecast APPROXIMATION), AB is an exact-solver
upgrade: same one-model-eval-per-step cost, O(h^order) accuracy. The
question is purely "how few steps match euler-250's ODE error". Protocol
(shared harness: scripts/bench_common.py):

  ground truth: euler at 4000 steps on the SAME trained DiT-S drift
  (tests/test_learning_tpu.py setup — no released weights in this image),
  same z/labels, production config (shift 0.3, cfg-interval 0.11, cfg 2).

  quality per (method, N): latent rel-L2 vs ground truth, nearest-class-
  mean accuracy/confidence delta vs the ground truth.

  throughput: XL/1 batch 8 at each step count, measured by spawning
  bench.py in a FRESH process per point (CLAUDE.md rule: never time in a
  process that already built big jits).

Usage: python scripts/bench_multistep.py [--train_steps N] [--out F]
Writes one JSON document (incrementally, surviving backend drops) and
prints a summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_steps", type=int, default=1200)
    ap.add_argument("--cfg_scale", type=float, default=2.0)
    ap.add_argument("--out", default="output/multistep_bench.json")
    ap.add_argument("--sweep", choices=["auto", "full", "smoke"], default="auto",
                    help="full = the production step-count sweep + 4000-step "
                         "ground truth (default on TPU); smoke = tiny CPU check")
    args = ap.parse_args()

    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench_common as bc
    from vavae_tpu.transport import Sampler

    on_tpu = jax.default_backend() == "tpu"
    full = args.sweep == "full" or (args.sweep == "auto" and on_tpu)
    if not on_tpu and args.sweep != "full":
        args.train_steps = min(args.train_steps, 10)

    class_means, rng_np = bc.make_class_means()
    model, transport, ema, _ = bc.train_synthetic_dit(
        args.train_steps, on_tpu, class_means, rng_np
    )
    sampler = Sampler(transport)
    labels = bc.eval_labels(full)
    Bs = len(labels)
    y_cfg = jnp.concatenate([labels, jnp.full((Bs,), bc.N_CLASSES, jnp.int32)])
    z = jax.random.normal(jax.random.PRNGKey(7), (Bs,) + bc.LATENT_SHAPE,
                          jnp.float32)

    def sample(num_steps, multistep_order=1, cache_interval=1):
        fn = sampler.sample_ode_cfg(
            num_steps=num_steps, timestep_shift=0.3, cfg_interval_start=0.11,
            multistep_order=multistep_order, cache_interval=cache_interval,
        )

        @jax.jit
        def generate(p, zz):
            cond = lambda x, t: model.apply({"params": p}, x, t, labels)
            cfgf = lambda x, t: model.forward_with_cfg(p, x, t, y_cfg, args.cfg_scale)
            return fn(zz, cond, cfgf)

        return np.asarray(generate(ema, z), np.float32)

    def dump(results):
        # incremental dump so a tunnel drop mid-sweep doesn't lose the run
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    gt_steps = 4000 if full else 64
    truth = sample(gt_steps)
    tnorm = float(np.mean(np.linalg.norm(truth.reshape(Bs, -1), axis=-1)))
    acc_t, conf_t = bc.classify(truth, class_means, labels)
    results = {"train_steps": args.train_steps, "cfg_scale": args.cfg_scale,
               "ground_truth_steps": gt_steps,
               "ground_truth": {"acc": acc_t, "confidence": conf_t},
               "runs": {}}

    # (name, grid_steps, order, cache_interval). The vcache points put the
    # euler+velocity-cache sampler on the SAME ground truth as AB so the
    # equal-eval-budget comparison is rigorous (the velocity-cache table in
    # BASELINE.md measures deviation from the exact euler-250 OUTPUT, not
    # from the true solution): euler-250@k has ceil(250/k) model evals —
    # compare vcache k=3 (84 evals) to ab3_83, k=4 (63) to ab3_62, k=6 (42)
    # to ab3_50/32. AB integrates the same velocity history polynomial
    # EXACTLY where the cache rectangle-steps a forecast of it, so AB at
    # equal evals should dominate — this sweep measures by how much.
    sweep = ([("euler", 250, 1, 1), ("euler", 125, 1, 1), ("euler", 100, 1, 1),
              ("euler", 62, 1, 1), ("euler", 50, 1, 1),
              ("ab2", 125, 2, 1), ("ab2", 100, 2, 1), ("ab2", 62, 2, 1),
              ("ab2", 50, 2, 1),
              ("ab3", 125, 3, 1), ("ab3", 100, 3, 1), ("ab3", 83, 3, 1),
              ("ab3", 62, 3, 1), ("ab3", 50, 3, 1), ("ab3", 32, 3, 1),
              ("vcache2", 250, 1, 2), ("vcache3", 250, 1, 3),
              ("vcache4", 250, 1, 4), ("vcache6", 250, 1, 6)]
             if full else
             [("euler", 16, 1, 1), ("ab2", 8, 2, 1), ("ab3", 8, 3, 1),
              ("vcache2", 16, 1, 2)])
    for name, n, order, k in sweep:
        out = sample(n, order, k)
        rel = float(np.mean(np.linalg.norm(
            (out - truth).reshape(Bs, -1), axis=-1
        ))) / tnorm
        acc, conf = bc.classify(out, class_means, labels)
        results["runs"][f"{name}_{n}"] = {
            "rel_l2_vs_truth": rel, "acc": acc, "acc_delta": acc - acc_t,
            "confidence": conf, "confidence_delta": conf - conf_t,
        }
        print(f"{name:6s} N={n:4d}: rel_l2 {rel:.5f}, acc {acc:.3f} "
              f"(Δ{acc - acc_t:+.3f}), conf {conf:.3f} (Δ{conf - conf_t:+.3f})",
              flush=True)
        dump(results)

    # ---- throughput: XL/1 production config, fresh process per point ------
    if on_tpu:
        for name, n, order, k in (("euler", 250, 1, 1), ("ab3", 125, 3, 1),
                                  ("ab3", 100, 3, 1), ("ab3", 83, 3, 1),
                                  ("ab3", 62, 3, 1), ("ab3", 50, 3, 1),
                                  ("ab3", 32, 3, 1), ("vcache3", 250, 1, 3),
                                  ("vcache6", 250, 1, 6)):
            thr = bc.xl_throughput(8, cache_interval=k, multistep_order=order,
                                   num_steps=n)
            results.setdefault("throughput_xl1_b8", {})[f"{name}_{n}"] = thr
            print(f"XL/1 throughput {name} N={n}: {thr:.3f} samples/s/chip",
                  flush=True)
            dump(results)

    dump(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
