"""Quantify the velocity-cache quality/throughput trade (VERDICT r1 #3).

The opt-in ``sample.velocity_cache_interval`` (transport/ode.py
odeint_euler_cached) reuses the velocity between model evaluations in the
CFG phase — a training-free FLOP cut whose quality cost was previously
unmeasured. This benchmark reports, for k ∈ {1 (exact), 2, 3, 4} × forecast
order ∈ {0 (hold), 1 (linear), 2 (quadratic)}:

  quality (DiT-S trained on per-class synthetic latents on-chip, the
  tests/test_learning_tpu.py setup — no released weights in this image):
    - latent-space L2 / PSNR of cached vs exact samples (same z, labels)
    - decoded-image PSNR/SSIM through a conv VAE decoder (RANDOM-init
      f16d32 decoder: measures how latent deviation amplifies through a
      conv stack; absolute values would shift with released weights)
    - nearest-class-mean classification accuracy + softmax confidence of
      the generated latents (the micro-Doppler filter-gate analogue)

  throughput (XL/1, production sampling config, batch 8):
    - samples/sec/chip at each k

Usage: python scripts/bench_velocity_cache.py [--train_steps N] [--out F]
Writes one JSON document and prints a summary table.
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
    ap.add_argument("--sample_steps", type=int, default=250)
    ap.add_argument("--cfg_scale", type=float, default=2.0)
    ap.add_argument("--out", default="output/velocity_cache_bench.json")
    args = ap.parse_args()

    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench_common as bc
    from bench_common import psnr
    from vavae_tpu.models.vae import AutoencoderKL
    from vavae_tpu.transport import Sampler
    from vavae_tpu.eval.metrics import ssim as ssim_fn

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU smoke: tiny everything so the script stays runnable
        args.train_steps = min(args.train_steps, 10)
        args.sample_steps = min(args.sample_steps, 8)

    # ---- quality phase (shared harness: bench_common) ----------------------
    n_classes = bc.N_CLASSES
    class_means, rng_np = bc.make_class_means()
    model, transport, ema, last = bc.train_synthetic_dit(
        args.train_steps, on_tpu, class_means, rng_np
    )
    sampler = Sampler(transport)
    labels = bc.eval_labels(on_tpu)
    Bs = len(labels)
    y_cfg = jnp.concatenate([labels, jnp.full((Bs,), n_classes, jnp.int32)])
    z = jax.random.normal(jax.random.PRNGKey(7), (Bs,) + bc.LATENT_SHAPE,
                          jnp.float32)

    def sample_with_k(k, order=1):
        fn = sampler.sample_ode_cfg(
            num_steps=args.sample_steps, timestep_shift=0.3,
            cfg_interval_start=0.11, cache_interval=k, cache_order=order,
        )

        @jax.jit
        def generate(p, zz):
            cond = lambda x, t: model.apply({"params": p}, x, t, labels)
            cfgf = lambda x, t: model.forward_with_cfg(p, x, t, y_cfg, args.cfg_scale)
            return fn(zz, cond, cfgf)

        return np.asarray(generate(ema, z), np.float32)

    # random-init f16d32 decoder for the image-space amplification probe
    vae = AutoencoderKL(embed_dim=32, ch=64 if on_tpu else 32,
                        ch_mult=(1, 1, 2, 2, 4) if on_tpu else (1, 2),
                        resolution=256 if on_tpu else 32)
    vae_params = vae.init(
        {"params": jax.random.PRNGKey(3)},
        jnp.zeros((1, 16 * (2 ** (len(vae.ch_mult) - 1)),
                   16 * (2 ** (len(vae.ch_mult) - 1)), 3)),
        sample=False,
    )["params"]
    decode = jax.jit(lambda p, zz: vae.apply(
        {"params": p}, zz, method=AutoencoderKL.decode
    ))

    def classify(samples):
        return bc.classify(samples, class_means, labels)

    exact = sample_with_k(1)
    dec_exact = np.asarray(decode(vae_params, jnp.asarray(exact)), np.float32)
    acc1, conf1 = classify(exact)
    results = {"train_steps": args.train_steps, "sample_steps": args.sample_steps,
               "cfg_scale": args.cfg_scale, "final_train_loss": last,
               "exact": {"acc": acc1, "confidence": conf1}, "cached": {}}
    lat_range = float(exact.max() - exact.min())
    img_range = float(dec_exact.max() - dec_exact.min())

    def dump() -> None:
        # incremental per-point dump: a tunnel drop mid-sweep keeps everything
        # measured so far (same pattern as bench_multistep.py)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2)
        os.replace(tmp, args.out)

    dump()
    for k, order in ((2, 0), (3, 0), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1),
                     (3, 2), (4, 2), (5, 2), (6, 2)):
        cached = sample_with_k(k, order)
        dec_cached = np.asarray(decode(vae_params, jnp.asarray(cached)), np.float32)
        acc_k, conf_k = classify(cached)
        l2 = float(np.mean(np.linalg.norm(
            (cached - exact).reshape(Bs, -1), axis=-1
        )))
        rel_l2 = l2 / float(np.mean(np.linalg.norm(exact.reshape(Bs, -1), axis=-1)))
        ssim_vals = np.asarray(ssim_fn(
            jnp.asarray(dec_exact), jnp.asarray(dec_cached), data_range=img_range
        ))
        results["cached"][f"k{k}o{order}"] = {
            "latent_l2": l2,
            "latent_rel_l2": rel_l2,
            "latent_psnr_db": psnr(cached, exact, lat_range),
            "decoded_psnr_db": psnr(dec_cached, dec_exact, img_range),
            "decoded_ssim": float(np.mean(ssim_vals)),
            "acc": acc_k,
            "acc_delta": acc_k - acc1,
            "confidence": conf_k,
            "confidence_delta": conf_k - conf1,
        }
        r = results["cached"][f"k{k}o{order}"]
        print(f"k={k} order={order}: rel_l2 {rel_l2:.4f}, latent_psnr "
              f"{r['latent_psnr_db']:.1f} dB, "
              f"decoded_psnr {r['decoded_psnr_db']:.1f} dB, "
              f"ssim {r['decoded_ssim']:.4f}, "
              f"acc {acc_k:.3f} (Δ{acc_k - acc1:+.3f}), "
              f"conf {conf_k:.3f} (Δ{conf_k - conf1:+.3f})", flush=True)
        dump()

    # ---- throughput phase: XL/1, fresh bench.py process per point ---------
    # (throughput is forecast-order independent: same model-eval count; the
    # order-1 forecast adds one FMA per element — sweep k only)
    if on_tpu:
        for k in (1, 2, 3, 4, 5, 6):
            thr = bc.xl_throughput(8, cache_interval=k)
            key = "exact" if k == 1 else f"k{k}"
            results.setdefault("throughput_xl1_b8", {})[key] = thr
            print(f"XL/1 throughput k={k}: {thr:.3f} samples/s/chip", flush=True)
            dump()

    dump()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
