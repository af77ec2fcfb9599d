"""Quantify the Adams–Bashforth multistep sampler (transport/ode.py
odeint_ab) against the reference's production 250-step euler.

Unlike the velocity cache (a forecast APPROXIMATION), AB is an exact-solver
upgrade: same one-model-eval-per-step cost, O(h^order) accuracy. The
question is purely "how few steps match euler-250's ODE error". Protocol:

  ground truth: euler at 4000 steps on the SAME trained DiT-S drift
  (tests/test_learning_tpu.py setup — no released weights in this image),
  same z/labels, production config (shift 0.3, cfg-interval 0.11, cfg 2).

  quality per (method, N): latent rel-L2 vs ground truth, nearest-class-
  mean accuracy/confidence delta vs the euler-250 baseline sample.

  throughput: XL/1 batch 8 at each step count (ab3; the AB update adds a
  few elementwise FMAs per step — measured, not assumed).

Usage: python scripts/bench_multistep.py [--train_steps N] [--out F]
Writes one JSON document and prints a summary table.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_steps", type=int, default=1200)
    ap.add_argument("--cfg_scale", type=float, default=2.0)
    ap.add_argument("--out", default="output/multistep_bench.json")
    args = ap.parse_args()

    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import LightningDiT, LightningDiT_models
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import Sampler, create_transport

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.train_steps = min(args.train_steps, 10)

    # ---- train DiT-S on per-class latent patterns (velocity-cache setup) ---
    n_classes, B = 4, 64 if on_tpu else 8
    depth, hidden, heads = (12, 384, 6) if on_tpu else (2, 64, 4)
    rng_np = np.random.default_rng(0)
    class_means = 2.0 * rng_np.normal(size=(n_classes, 16, 16, 32)).astype(np.float32)

    def batch():
        y = rng_np.integers(0, n_classes, size=(B,)).astype(np.int32)
        x = class_means[y] + 0.05 * rng_np.normal(size=(B, 16, 16, 32)).astype(np.float32)
        return x, y

    model = LightningDiT(
        input_size=16, patch_size=2, in_channels=32, hidden_size=hidden,
        depth=depth, num_heads=heads, num_classes=n_classes,
        use_swiglu=True, use_rope=True, use_rmsnorm=True, dtype=jnp.bfloat16,
        class_dropout_prob=0.1,
    )
    transport = create_transport("Linear", "velocity", use_cosine_loss=True,
                                 use_lognorm=True)
    trainer = DiTTrainer(model, transport, make_mesh(), lr=3e-4, beta2=0.95,
                         ema_decay=0.99)
    rng = jax.random.PRNGKey(0)
    state = trainer.replicate(trainer.init_state(rng, (B, 16, 16, 32)))
    t0 = time.time()
    for _ in range(args.train_steps):
        state, m = trainer.train_step(state, rng, trainer.shard_batch(batch()))
    print(f"trained DiT-S {args.train_steps} steps in {time.time()-t0:.0f}s, "
          f"loss {float(jax.device_get(m['loss'])):.3f}", flush=True)

    sampler = Sampler(transport)
    n_per = 8 if on_tpu else 2
    labels = jnp.asarray(np.repeat(np.arange(n_classes), n_per), jnp.int32)
    Bs = len(labels)
    y_cfg = jnp.concatenate([labels, jnp.full((Bs,), n_classes, jnp.int32)])
    ema = state.ema_params
    z = jax.random.normal(jax.random.PRNGKey(7), (Bs, 16, 16, 32), jnp.float32)

    def sample(num_steps, multistep_order=1):
        fn = sampler.sample_ode_cfg(
            num_steps=num_steps, timestep_shift=0.3, cfg_interval_start=0.11,
            multistep_order=multistep_order,
        )

        @jax.jit
        def generate(p, zz):
            cond = lambda x, t: model.apply({"params": p}, x, t, labels)
            cfgf = lambda x, t: model.forward_with_cfg(p, x, t, y_cfg, args.cfg_scale)
            return fn(zz, cond, cfgf)

        return np.asarray(generate(ema, z), np.float32)

    def classify(samples):
        flat = samples.reshape(len(samples), -1)
        means = class_means.reshape(n_classes, -1)
        d = np.linalg.norm(flat[:, None] - means[None], axis=-1)
        pred = d.argmin(axis=-1)
        acc = float((pred == np.asarray(labels)).mean())
        t = np.median(d)
        p = np.exp(-d / (0.05 * t))
        p = p / p.sum(axis=-1, keepdims=True)
        return acc, float(p.max(axis=-1).mean())

    import os

    def dump(results):
        # incremental dump so a tunnel drop mid-sweep doesn't lose the run
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    gt_steps = 4000 if on_tpu else 64
    truth = sample(gt_steps)
    tnorm = float(np.mean(np.linalg.norm(truth.reshape(Bs, -1), axis=-1)))
    acc_t, conf_t = classify(truth)
    results = {"train_steps": args.train_steps, "cfg_scale": args.cfg_scale,
               "ground_truth_steps": gt_steps,
               "ground_truth": {"acc": acc_t, "confidence": conf_t},
               "runs": {}}

    sweep = ([("euler", 250, 1), ("euler", 125, 1), ("euler", 100, 1),
              ("euler", 62, 1), ("euler", 50, 1),
              ("ab2", 125, 2), ("ab2", 100, 2), ("ab2", 62, 2), ("ab2", 50, 2),
              ("ab3", 125, 3), ("ab3", 100, 3), ("ab3", 83, 3), ("ab3", 62, 3),
              ("ab3", 50, 3), ("ab3", 32, 3)]
             if on_tpu else
             [("euler", 16, 1), ("ab2", 8, 2), ("ab3", 8, 3)])
    for name, n, order in sweep:
        out = sample(n, order)
        rel = float(np.mean(np.linalg.norm(
            (out - truth).reshape(Bs, -1), axis=-1
        ))) / tnorm
        acc, conf = classify(out)
        results["runs"][f"{name}_{n}"] = {
            "rel_l2_vs_truth": rel, "acc": acc, "acc_delta": acc - acc_t,
            "confidence": conf, "confidence_delta": conf - conf_t,
        }
        print(f"{name:6s} N={n:4d}: rel_l2 {rel:.5f}, acc {acc:.3f} "
              f"(Δ{acc - acc_t:+.3f}), conf {conf:.3f} (Δ{conf - conf_t:+.3f})",
              flush=True)
        dump(results)

    # ---- throughput: XL/1 production config --------------------------------
    del state, trainer, ema
    if on_tpu:
        xl = LightningDiT_models["LightningDiT-XL/1"](
            input_size=16, in_channels=32, num_classes=1000,
            use_swiglu=True, use_rope=True, use_rmsnorm=True, dtype=jnp.bfloat16,
        )
        bsz = 8
        zshape = (bsz, 16, 16, 32)
        xp = xl.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros(zshape, jnp.bfloat16), jnp.zeros((bsz,)),
                     jnp.zeros((bsz,), jnp.int32))["params"]
        xp = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), xp)
        xl_labels = jnp.arange(bsz, dtype=jnp.int32) % 32
        xl_ycfg = jnp.concatenate([xl_labels, jnp.full((bsz,), 1000, jnp.int32)])
        for name, n, order in (("euler", 250, 1), ("ab3", 125, 3),
                               ("ab3", 100, 3), ("ab3", 83, 3), ("ab3", 62, 3),
                               ("ab3", 50, 3)):
            fn = sampler.sample_ode_cfg(
                num_steps=n, timestep_shift=0.3, cfg_interval_start=0.11,
                multistep_order=order,
            )

            @jax.jit
            def gen(p, rng):
                cond = lambda x, t: xl.apply({"params": p}, x, t, xl_labels)
                cfgf = lambda x, t: xl.forward_with_cfg(p, x, t, xl_ycfg, 10.0)
                zz = jax.random.normal(rng, zshape, jnp.bfloat16)
                return fn(zz, cond, cfgf)

            for s in range(4):  # compile + settle (CLAUDE.md rules)
                np.asarray(gen(xp, jax.random.PRNGKey(1 + s)))
            t0 = time.perf_counter()
            iters = 4
            for i in range(iters):
                np.asarray(gen(xp, jax.random.PRNGKey(3 + i)))
            thr = bsz * iters / (time.perf_counter() - t0) / jax.device_count()
            results.setdefault("throughput_xl1_b8", {})[f"{name}_{n}"] = round(thr, 4)
            print(f"XL/1 throughput {name} N={n}: {thr:.3f} samples/s/chip",
                  flush=True)
            dump(results)

    dump(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
