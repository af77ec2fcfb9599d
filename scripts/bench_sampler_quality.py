"""Sampler-quality gauge that can actually RANK acceleration methods.

Round 2's gauge (nearest-class-mean accuracy/confidence delta) was
saturated: 0.000 at every point, even euler-50 at 3.7x the baseline ODE
error — it cannot rank methods. This bench re-keys the acceleration tables
on two gauges that are nonzero and monotone in the ODE error:

1. **latent-FID**: the Fréchet distance (eval/fid.py frechet_distance — the
   reference's own quality culture, tools/calculate_fid.py:629-651) between
   the EXACT euler-250 output set and each accelerated output set, computed
   over ≥1k samples on feature vectors from a fixed seeded random
   projection of the latents (the testbed is pure-latent: no released
   Inception/VAE weights in this zero-egress image; a fixed random
   projection preserves Fréchet geometry in expectation and ranks methods
   identically in practice). When real weights land (VAVAE_INCEPTION_WEIGHTS),
   scripts/golden_numbers.py runs the pixel-space version.

2. **per-sample deviation distribution**: rel-L2 between each accelerated
   sample and its PAIRED exact euler-250 sample (same z, same label) —
   p50/p90/p99/max, the per-sample analogue of the reference's
   LPIPS-deviation habit.

Usage: python scripts/bench_sampler_quality.py [--n 1024] [--train_steps N]
       [--cfg_scale S] [--out F] [--smoke]
   or: python scripts/bench_sampler_quality.py --config YOUR_DIT.yaml
       [--ckpt CKPT] — the "measure on YOUR model" mode: gauges every
       acceleration (euler-N/AB3/vcache/heun/dopri5) against YOUR
       checkpoint's exact euler-250 output at YOUR production sampler
       settings (cfg_scale/timestep_shift/cfg_interval_start from the
       config), with CFG-forward-equivalent cost per method.
Writes one JSON document incrementally (tunnel-drop safe).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROJ_DIM = 192


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None,
                    help="samples per method (default 1024 TPU / 64 CPU)")
    ap.add_argument("--train_steps", type=int, default=None)
    ap.add_argument("--cfg_scale", type=float, default=None,
                    help="CFG scale of the gauged sampler (testbed default "
                         "2.0; with --config defaults to the config's own "
                         "sample.cfg_scale). The on-chip matrix found a "
                         "STIFF regime at cfg 6.7 on a sharply-trained "
                         "field — gauge that too")
    ap.add_argument("--config", default=None,
                    help="gauge a REAL model instead of the synthetic "
                         "testbed: a DiT sampling config yaml (the same "
                         "one pipelines.sample takes — model/transport/"
                         "sample sections; ckpt_path inside or --ckpt). "
                         "This is the 'measure on YOUR model' gate README "
                         "points every acceleration decision at")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint override for --config (.safetensors/"
                         ".msgpack ours, .pt torch — EMA preferred)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench_common as bc
    from vavae_tpu.eval.fid import activation_statistics, frechet_distance
    from vavae_tpu.transport import Sampler

    on_tpu = jax.default_backend() == "tpu"
    n_total = args.n or (1024 if on_tpu else 64)
    train_steps = args.train_steps or (1200 if on_tpu else (10 if args.smoke else 600))

    shift, start = 0.3, 0.11  # testbed defaults = the production settings
    if args.config:
        # REAL-model mode: everything comes from the user's sampling config
        from vavae_tpu.models.dit import create_dit
        from vavae_tpu.pipelines.sample import load_dit_params
        from vavae_tpu.pipelines.train_dit import build_transport
        from vavae_tpu.utils.config import load_config

        ucfg = load_config(args.config)
        sc = ucfg.sample
        latent_size = (ucfg.data.image_size
                       // ucfg.get("vae", {}).get("downsample_ratio", 16))
        model = create_dit(ucfg.model, latent_size, ucfg.data.num_classes)
        ema = load_dit_params(ucfg, model, args.ckpt or ucfg.ckpt_path)
        transport = build_transport(ucfg)
        n_classes = ucfg.data.num_classes
        null_class = sc.get("null_class", n_classes)
        # defaults MUST match pipelines/sample.py's (cfg_scale 1.0, shift
        # 0.0, start 0.0, cfg_channels None, reverse False) — this gauge's
        # whole point is ranking methods on the sampler the config actually
        # runs in production, not on a different ODE grid
        cfg_scale = (args.cfg_scale if args.cfg_scale is not None
                     else sc.get("cfg_scale", 1.0))
        shift = sc.get("timestep_shift", 0.0)
        start = sc.get("cfg_interval_start", 0.0)
        cfg_channels = sc.get("cfg_channels")
        reverse = sc.get("reverse", False)
        latent_shape = (latent_size, latent_size, model.in_channels)
        mode_tag = "model"
    else:
        cfg_scale = args.cfg_scale if args.cfg_scale is not None else 2.0
        class_means, rng_np = bc.make_class_means()
        model, transport, ema, _ = bc.train_synthetic_dit(
            train_steps, on_tpu, class_means, rng_np
        )
        n_classes, null_class = bc.N_CLASSES, bc.N_CLASSES
        latent_shape = bc.LATENT_SHAPE
        cfg_channels, reverse = None, False
        mode_tag = "tpu" if on_tpu else "cpu"
    sampler = Sampler(transport)

    cfg_tag = "" if cfg_scale == 2.0 else f"_cfg{cfg_scale:g}"
    out = args.out or f"docs/bench/sampler_quality_{mode_tag}{cfg_tag}.json"

    B = 32 if on_tpu else 16
    n_batches = max(1, n_total // B)
    labels = jnp.asarray(np.arange(B) % n_classes, jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), null_class, jnp.int32)])

    def make_generate(num_steps, multistep_order=1, cache_interval=1,
                      method="euler", rtol=None):
        if method == "dopri5":
            fn = sampler.sample_ode_cfg(
                sampling_method="dopri5", cfg_interval_start=start,
                rtol=rtol, atol=1e-6, reverse=reverse, return_stats=True,
            )
        elif method == "vcacheA":
            # round-4 adaptive velocity cache: rtol is repurposed as the
            # controller tolerance; eval count is data-dependent (stats)
            fn = sampler.sample_ode_cfg(
                num_steps=num_steps, timestep_shift=shift,
                cfg_interval_start=start, cache_adaptive=True,
                cache_tol=rtol, cache_max_interval=8,
                reverse=reverse, return_stats=True,
            )
        else:
            fn = sampler.sample_ode_cfg(
                num_steps=num_steps, timestep_shift=shift,
                cfg_interval_start=start, sampling_method=method,
                multistep_order=multistep_order, cache_interval=cache_interval,
                reverse=reverse,
            )

        @jax.jit
        def generate(p, zz):
            cond = lambda x, t: model.apply({"params": p}, x, t, labels)
            cfgf = lambda x, t: model.forward_with_cfg(
                p, x, t, y_cfg, cfg_scale, cfg_channels=cfg_channels)
            return fn(zz, cond, cfgf)

        return generate

    def sample_set(num_steps, order=1, k=1, method="euler", rtol=None):
        """Returns (samples, cost): cost is per-batch CFG-forward-equivalent
        model evals (cond-phase half-batch calls count 0.5; shared
        accounting in bench_common, so error-vs-cost tables are comparable
        with bench_multistep_matrix.py). dopri5's step count is
        data-dependent, so its cost is the MEAN over all batches, not one
        batch's sample."""
        gen = make_generate(num_steps, order, k, method, rtol)
        outs, dyn_costs = [], []
        for b in range(n_batches):
            z = jax.random.normal(jax.random.PRNGKey(1000 + b),
                                  (B,) + latent_shape, jnp.float32)
            res = gen(ema, z)
            if method == "dopri5":
                res, stats = res
                dyn_costs.append(bc.dopri5_cost(stats))
            elif method == "vcacheA":
                res, stats = res
                dyn_costs.append(bc.adaptive_cache_cost(
                    transport, num_steps, shift, start,
                    stats["cfg_evals"], reverse))
            outs.append(np.asarray(res, np.float32))
        cost = (float(np.mean(dyn_costs)) if dyn_costs
                else bc.fixed_grid_cost(transport, num_steps, shift, start,
                                        method, k, reverse))
        return np.concatenate(outs), cost  # (n, 16, 16, 32)

    # fixed seeded projection: same features for every method & every run
    D = int(np.prod(latent_shape))
    proj = (np.random.default_rng(42)
            .normal(size=(D, PROJ_DIM)).astype(np.float32) / np.sqrt(D))

    def features(x):
        return x.reshape(len(x), -1) @ proj

    ref_steps = 250 if not args.smoke else 32
    print(f"generating exact euler-{ref_steps} reference set "
          f"({n_batches * B} samples)", flush=True)
    exact, ref_cost = sample_set(ref_steps)
    mu_e, sig_e = activation_statistics(features(exact))
    enorm = np.linalg.norm(exact.reshape(len(exact), -1), axis=-1)

    # image-space gauge through a TRAINED decoder (round-3 verdict item 4):
    # decode exact vs accelerated latents with the f16d32 VAE the battery
    # trains (scripts/train_vae_gauge_ckpt.py, $VAVAE_BENCH_VAE_CKPT) and
    # report decoded PSNR/SSIM plus a decoded-feature Fréchet distance next
    # to the latent-space columns — the reference's quality culture is
    # image-space (evaluate_tokenizer.py:150-165, calculate_fid.py:629-651).
    # Caveat (recorded in the JSON): the testbed latents are synthetic
    # patterns, not real VAE posteriors, so absolute decoded quality is
    # meaningless — only the DELTA between exact and accelerated decodes is.
    vae_ckpt = os.environ.get("VAVAE_BENCH_VAE_CKPT")
    decode_batched = dec_exact = dec_features = None
    if vae_ckpt and latent_shape[-1] == 32:
        from vavae_tpu.eval.metrics import psnr as img_psnr, ssim as img_ssim
        from vavae_tpu.tokenizer import VA_VAE

        vae = VA_VAE(None, ckpt_path=vae_ckpt, img_size=latent_shape[0] * 16)
        # host-resident leaves would re-upload ~280 MB per decode call
        vae.params = jax.device_put(vae.params)
        n_dec = min(len(exact), 256 if on_tpu else 16)

        def decode_batched(lat):
            outs = []
            for i in range(0, n_dec, B):
                outs.append(np.asarray(
                    vae.decode(jnp.asarray(lat[i:i + B])), np.float32))
            return np.concatenate(outs)

        dec_exact = decode_batched(exact)
        # decoded-feature Fréchet: 4×4 average-pool then a fixed seeded
        # projection (no released Inception weights in this image)
        Dd = ((dec_exact.shape[1] // 4) * (dec_exact.shape[2] // 4)
              * dec_exact.shape[3])
        dproj = (np.random.default_rng(43)
                 .normal(size=(Dd, PROJ_DIM)).astype(np.float32)
                 / np.sqrt(Dd))

        def dec_features(img):
            Bn, H, W, C = img.shape
            pooled = img.reshape(Bn, H // 4, 4, W // 4, 4, C).mean((2, 4))
            return pooled.reshape(Bn, -1) @ dproj

        mu_de, sig_de = activation_statistics(dec_features(dec_exact))
        print(f"image-space gauge ON: {n_dec} decodes/method through "
              f"{vae_ckpt}", flush=True)
    elif vae_ckpt:
        print(f"VAVAE_BENCH_VAE_CKPT set but latent shape {latent_shape} "
              "is not f16d32-decodable — image-space gauge skipped", flush=True)

    # (label, num_steps, multistep_order, cache_interval, method, rtol)
    methods = ([("euler_125", 125, 1, 1, "euler", None),
                ("euler_100", 100, 1, 1, "euler", None),
                ("euler_50", 50, 1, 1, "euler", None),
                ("ab3_125", 125, 3, 1, "euler", None),
                ("ab3_100", 100, 3, 1, "euler", None),
                ("ab3_83", 83, 3, 1, "euler", None),
                ("ab3_62", 62, 3, 1, "euler", None),
                ("ab3_50", 50, 3, 1, "euler", None),
                ("vcache3_250", 250, 1, 3, "euler", None),
                ("vcache6_250", 250, 1, 6, "euler", None),
                # beyond the round-2 table's k=6: where does the cache's
                # sublinear error growth stop paying? (~31 and ~21 evals)
                ("vcache8_250", 250, 1, 8, "euler", None),
                ("vcache12_250", 250, 1, 12, "euler", None),
                # round-4 adaptive cache: interval controlled by realized
                # forecast error; rtol column holds the controller tol
                ("vcacheA_tol0.05", 250, 1, 1, "vcacheA", 0.05),
                ("vcacheA_tol0.02", 250, 1, 1, "vcacheA", 0.02),
                ("vcacheA_tol0.01", 250, 1, 1, "vcacheA", 0.01),
                ("heun_100", 100, 1, 1, "heun", None),
                ("heun_83", 83, 1, 1, "heun", None),
                ("heun_62", 62, 1, 1, "heun", None),
                ("dopri5_rtol0.01", 0, 1, 1, "dopri5", 1e-2),
                ("dopri5_rtol0.001", 0, 1, 1, "dopri5", 1e-3)]
               if not args.smoke else
               [("euler_16", 16, 1, 1, "euler", None),
                ("euler_8", 8, 1, 1, "euler", None),
                ("ab3_16", 16, 3, 1, "euler", None),
                ("heun_8", 8, 1, 1, "heun", None),
                ("vcacheA_tol0.05", 16, 1, 1, "vcacheA", 0.05),
                ("dopri5_rtol0.01", 0, 1, 1, "dopri5", 1e-2)])

    doc = {"platform": jax.default_backend(),
           "model": (args.config if args.config
                     else f"synthetic_testbed[{train_steps} steps]"),
           "train_steps": None if args.config else train_steps,
           "cfg_scale": cfg_scale, "timestep_shift": shift,
           "cfg_interval_start": start, "cfg_channels": cfg_channels,
           "reverse": reverse,
           "n_samples": n_batches * B, "reference": f"euler_{ref_steps}",
           "reference_cost": ref_cost,
           "proj_dim": PROJ_DIM,
           "decoded_gauge": (
               None if decode_batched is None else {
                   "vae_ckpt": vae_ckpt, "n_decoded_per_method": int(n_dec),
                   "note": "decoded deltas vs exact through a TRAINED "
                           "f16d32 decoder; testbed latents are synthetic, "
                           "so only exact-vs-accelerated DELTAS are "
                           "meaningful, not absolute quality"}),
           "methods": {}}

    def dump():
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(doc, f, indent=2)

    for label, n, order, k, method, rtol in methods:
        s, cost = sample_set(n, order, k, method, rtol)
        mu, sig = activation_statistics(features(s))
        fid = frechet_distance(mu_e, sig_e, mu, sig)
        dev = np.linalg.norm((s - exact).reshape(len(s), -1), axis=-1) / enorm
        rec = {
            "latent_fid_vs_exact": fid,
            "cost": cost,
            "per_sample_rel_l2": {
                "p50": float(np.percentile(dev, 50)),
                "p90": float(np.percentile(dev, 90)),
                "p99": float(np.percentile(dev, 99)),
                "max": float(dev.max()),
                "mean": float(dev.mean()),
            },
        }
        if decode_batched is not None:
            dec_s = decode_batched(s)
            pair = dec_exact[: len(dec_s)]
            p = np.asarray(img_psnr(jnp.asarray(dec_s), jnp.asarray(pair),
                                    data_range=2.0))
            ss = np.asarray(img_ssim(jnp.asarray(dec_s), jnp.asarray(pair),
                                     data_range=2.0))
            mu_d, sig_d = activation_statistics(dec_features(dec_s))
            rec["decoded"] = {
                "psnr_db": {"p50": float(np.percentile(p, 50)),
                            "p10": float(np.percentile(p, 10)),
                            "mean": float(p.mean())},
                "ssim": {"mean": float(ss.mean()),
                         "p10": float(np.percentile(ss, 10))},
                "feature_fid_vs_exact": float(
                    frechet_distance(mu_de, sig_de, mu_d, sig_d)),
            }
        doc["methods"][label] = rec
        # label spelled latent_fid (not latent-FID): the battery's step()
        # checks logs for a result line with this exact token
        dtag = ("" if "decoded" not in rec else
                f"  decPSNR p50 {rec['decoded']['psnr_db']['p50']:.1f}dB")
        print(f"{label:16s}: latent_fid {fid:10.6f}  cost {cost:7.1f}  "
              f"relL2 p50 {rec['per_sample_rel_l2']['p50']:.5f} "
              f"p99 {rec['per_sample_rel_l2']['p99']:.5f}{dtag}", flush=True)
        dump()

    dump()
    print(json.dumps({k: round(v["latent_fid_vs_exact"], 6)
                      for k, v in doc["methods"].items()}))


if __name__ == "__main__":
    main()
