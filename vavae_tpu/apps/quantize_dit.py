"""Post-training INT8 quantization CLI for DiT checkpoints.

Parity target: microdoppler_finetune/step9_quantize_dit_xl.py — dynamic
INT8 quantization of the Linear layers (:238-280), the size/latency
benchmark harness (:281-466), and the generation quality check (:468).

TPU-native shape: per-output-channel symmetric int8 kernels
(``ops/quant.py``) instead of fbgemm; the quality check reuses the
param-explicit jitted sampler (``build_sample_fn(...).jit_fn``) so the fp
and dequantized weights run through the SAME compiled program.

Note on expectations: int8 *compute* measured only ~1.27x at the matmul
level on v5e (BASELINE.md) — the value here is the ~4x checkpoint/HBM
footprint, mirroring the reference's CPU-deployment motivation.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.models.dit import create_dit
from vavae_tpu.ops.quant import (
    DEFAULT_TARGETS,
    benchmark_quantization,
    dequantize_params,
    quantize_params,
)
from vavae_tpu.train.checkpoint import save_state_file
from vavae_tpu.utils.config import load_config


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="DiT config yaml")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint (.safetensors/.pt); default cfg.ckpt_path")
    ap.add_argument("--targets", default=",".join(DEFAULT_TARGETS),
                    help="comma-separated kernel-name suffixes to quantize")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--sample_check", type=int, default=0,
                    help="ODE-sample N latents with fp vs dequantized weights "
                         "and report the deviation (step9 quality check)")
    ap.add_argument("--out", default=None,
                    help="write the int8 checkpoint here (.safetensors; "
                         "restore with quantize_params(eval_shape) as the "
                         "target, then dequantize_params for a fp forward)")
    ap.add_argument("--report", default=None, help="JSON report path")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = load_config(args.config, overrides=args.overrides)
    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)

    ckpt = args.ckpt or cfg.get("ckpt_path")
    if ckpt:
        from vavae_tpu.pipelines.sample import load_dit_params

        params = load_dit_params(cfg, model, ckpt)
    else:
        print("no checkpoint given — benchmarking with random-init weights")
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, latent_size, latent_size, model.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32),
        )["params"]

    targets = tuple(t for t in args.targets.split(",") if t)
    B = args.batch_size
    x = jax.random.normal(
        jax.random.PRNGKey(1), (B, latent_size, latent_size, model.in_channels)
    )
    t = jnp.linspace(0.1, 0.9, B)
    y = jnp.arange(B, dtype=jnp.int32) % cfg.data.num_classes

    def apply_fn(p, x, t, y):
        return model.apply({"params": p}, x, t, y)

    report = benchmark_quantization(
        apply_fn, params, (x, t, y), targets=targets, reps=args.reps
    )

    if args.sample_check:
        from vavae_tpu.pipelines.sample import build_sample_fn

        labels = jnp.arange(args.sample_check, dtype=jnp.int32) % cfg.data.num_classes
        wrapper = build_sample_fn(cfg, model, params)
        rng = jax.random.PRNGKey(cfg.train.get("global_seed", 0))
        fp_lat = np.asarray(wrapper.jit_fn(params, rng, labels))
        qparams, _ = quantize_params(params, targets)
        deq = dequantize_params(qparams)
        q_lat = np.asarray(wrapper.jit_fn(deq, rng, labels))
        denom = float(np.sqrt((fp_lat**2).mean())) or 1.0
        report["sample_latent_rel_l2"] = float(
            np.sqrt(((fp_lat - q_lat) ** 2).mean())
        ) / denom
        report["sample_latent_max_abs"] = float(np.abs(fp_lat - q_lat).max())

    if args.out:
        qparams, _ = quantize_params(params, targets)
        save_state_file(args.out, qparams)
        report["int8_checkpoint"] = args.out

    print(json.dumps(report, indent=2))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
