"""Autotune the sampler for YOUR model: measure, then recommend a config.

Rounds 2-4 established the doctrine that no accelerated sampling schedule
is production-safe unmeasured (the acceleration matrix found every fixed
schedule failing somewhere, BASELINE.md), and built the measurement
machinery — but using it meant reading a 500-line BASELINE.md and hand-
running two bench scripts. This CLI turns that doctrine into a capability
(round-5 verdict item 3):

    python -m vavae_tpu.apps.autotune_sampler --config your_dit.yaml \
        [--ckpt ckpt.safetensors] [--budget 0.01] [--n 256]

It runs the matched-cost gauge subset (euler-N / AB3-N / heun-N / fixed
velocity-cache k / adaptive cache tol) against YOUR checkpoint's exact
euler-250 output at YOUR production sampler settings, then recommends the
cheapest method whose per-sample deviation stays inside ``--budget``
(rel-L2 p99 vs the exact reference; latent-FID is reported alongside) —
or exact euler-250 itself when nothing qualifies, which the matrix showed
is a real possibility.

The adaptive-cache tolerance candidates are chosen RELATIVE TO THE
MEASURED NOISE FLOOR of your model's velocity field (a probe run surfaces
the controller's min-calibrated floor): BASELINE.md measured that any tol
below the floor saturates (bit-identical trajectories on 21/30 points), so
tols are placed at 2x/4x/8x the floor instead of at fixed magic numbers.

Output: an evidence table, a ready-to-paste ``sample:`` config block
(``--emit_yaml`` writes it as a YAML overlay), and a JSON document of
every measurement (``--out``).

Reference being improved on: one hardcoded sampler default for every
model, LightningDiT/inference.py:106-114.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _method_config(rec: dict) -> dict:
    """The ``sample:`` keys that reproduce a gauged method (the same keys
    pipelines/sample.py:130-190 reads)."""
    kind, spec = rec["kind"], rec
    out = {
        "sampling_method": "euler",
        "num_sampling_steps": spec["num_steps"],
        "multistep_order": 1,
        "velocity_cache_interval": 1,
        "velocity_cache_adaptive": False,
    }
    if kind == "ab":
        out["multistep_order"] = spec["order"]
    elif kind == "heun":
        out["sampling_method"] = "heun"
    elif kind == "vcache":
        out["velocity_cache_interval"] = spec["k"]
    elif kind == "vcacheA":
        out.update(velocity_cache_adaptive=True,
                   velocity_cache_tol=spec["tol"],
                   velocity_cache_max_interval=spec["max_interval"])
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="measure sampler accelerations on YOUR model and "
                    "recommend a sample: config block")
    ap.add_argument("--config", required=True,
                    help="your DiT sampling config yaml (same file "
                         "pipelines.sample takes)")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint override (.safetensors/.msgpack ours, "
                         ".pt torch; EMA preferred)")
    ap.add_argument("--budget", type=float, default=0.01,
                    help="max acceptable per-sample rel-L2 p99 vs exact "
                         "euler-250 (default 0.01 = 1%%)")
    ap.add_argument("--n", type=int, default=None,
                    help="samples per method (default 256 TPU / 32 CPU)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--ref_steps", type=int, default=None,
                    help="exact-reference step count (default 250; the "
                         "production euler grid)")
    ap.add_argument("--out", default=None, help="JSON evidence path")
    ap.add_argument("--emit_yaml", default=None,
                    help="write the recommended sample: block as a YAML "
                         "overlay file")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny ladder + few samples (CI / CPU-chain drive)")
    args = ap.parse_args(argv)

    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.eval.fid import activation_statistics, frechet_distance
    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import load_dit_params
    from vavae_tpu.pipelines.train_dit import build_transport
    from vavae_tpu.transport import Sampler
    from vavae_tpu.transport.cost import (
        adaptive_cache_cost, fixed_grid_cost,
    )
    from vavae_tpu.utils.config import load_config

    on_tpu = jax.default_backend() == "tpu"
    ucfg = load_config(args.config)
    sc = ucfg.sample
    latent_size = (ucfg.data.image_size
                   // ucfg.get("vae", {}).get("downsample_ratio", 16))
    model = create_dit(ucfg.model, latent_size, ucfg.data.num_classes)
    ckpt = args.ckpt or ucfg.get("ckpt_path")
    if not ckpt:
        raise SystemExit(
            "autotune needs a trained checkpoint: pass --ckpt or set "
            "ckpt_path in the config (gauging a random-init model would "
            "recommend a sampler for noise)")
    ema = load_dit_params(ucfg, model, ckpt)
    transport = build_transport(ucfg)
    sampler = Sampler(transport)
    n_classes = ucfg.data.num_classes
    null_class = sc.get("null_class", n_classes)
    # defaults MUST match pipelines/sample.py's — the recommendation is for
    # the sampler the config actually runs
    cfg_scale = sc.get("cfg_scale", 1.0)
    shift = sc.get("timestep_shift", 0.0)
    start = sc.get("cfg_interval_start", 0.0)
    cfg_channels = sc.get("cfg_channels")
    reverse = sc.get("reverse", False)
    latent_shape = (latent_size, latent_size, model.in_channels)

    B = args.batch or (32 if on_tpu else 8)
    n_total = args.n or ((256 if on_tpu else 32) if not args.smoke else 2 * B)
    n_batches = max(1, n_total // B)
    ref_steps = args.ref_steps or (250 if not args.smoke else 16)

    labels = jnp.asarray(np.arange(B) % n_classes, jnp.int32)
    y_cfg = jnp.concatenate([labels, jnp.full((B,), null_class, jnp.int32)])

    def make_generate(num_steps, order=1, k=1, method="euler", tol=None,
                      max_interval=8):
        if method == "vcacheA":
            fn = sampler.sample_ode_cfg(
                num_steps=num_steps, timestep_shift=shift,
                cfg_interval_start=start, cache_adaptive=True,
                cache_tol=tol, cache_max_interval=max_interval,
                reverse=reverse, return_stats=True,
            )
        else:
            fn = sampler.sample_ode_cfg(
                num_steps=num_steps, timestep_shift=shift,
                cfg_interval_start=start, sampling_method=method,
                multistep_order=order, cache_interval=k, reverse=reverse,
            )

        @jax.jit
        def generate(p, zz):
            cond = lambda x, t: model.apply({"params": p}, x, t, labels)
            cfgf = lambda x, t: model.forward_with_cfg(
                p, x, t, y_cfg, cfg_scale, cfg_channels=cfg_channels)
            return fn(zz, cond, cfgf)

        return generate

    def sample_set(rec):
        # "ab" rides the euler program with multistep_order (sampler.py)
        method = {"heun": "heun", "vcacheA": "vcacheA"}.get(
            rec["kind"], "euler")
        gen = make_generate(rec["num_steps"], rec.get("order", 1),
                            rec.get("k", 1), method,
                            rec.get("tol"), rec.get("max_interval", 8))
        outs, dyn = [], []
        for b in range(n_batches):
            z = jax.random.normal(jax.random.PRNGKey(1000 + b),
                                  (B,) + latent_shape, jnp.float32)
            res = gen(ema, z)
            if rec["kind"] == "vcacheA":
                res, stats = res
                dyn.append(adaptive_cache_cost(
                    transport, rec["num_steps"], shift, start,
                    stats["cfg_evals"], reverse))
            outs.append(np.asarray(res, np.float32))
        cost = (float(np.mean(dyn)) if dyn else fixed_grid_cost(
            transport, rec["num_steps"], shift, start,
            "heun" if rec["kind"] == "heun" else "euler",
            rec.get("k", 1), reverse))
        return np.concatenate(outs), cost

    # ---- exact reference set -------------------------------------------
    print(f"[autotune] exact euler-{ref_steps} reference "
          f"({n_batches * B} samples, cfg_scale={cfg_scale:g})", flush=True)
    ref_rec = {"kind": "euler", "num_steps": ref_steps}
    exact, ref_cost = sample_set(ref_rec)
    enorm = np.linalg.norm(exact.reshape(len(exact), -1), axis=-1)
    D = int(np.prod(latent_shape))
    proj = (np.random.default_rng(42)
            .normal(size=(D, 192)).astype(np.float32) / np.sqrt(D))
    feats = lambda x: x.reshape(len(x), -1) @ proj
    mu_e, sig_e = activation_statistics(feats(exact))

    # the acceleration knobs (multistep/vcache/adaptive, and the split-CFG
    # heun program) are only EXERCISED by pipelines/sample.py on the
    # split-CFG path: cfg_scale > 1, mode ODE, cfg_interval_start > 0
    # (sample.py:130-146 warns and runs plain euler otherwise). When the
    # user's production settings don't take that path, recommending those
    # knobs would emit a config that silently runs UNaccelerated — so the
    # ladder collapses to plain step-count reduction, which always applies.
    accel_exercised = (
        cfg_scale > 1.0
        and str(sc.get("mode", "ODE")).upper() == "ODE"
        and start > 0.0
    )
    if not accel_exercised:
        print("[autotune] NOTE: this config does not take the split-CFG "
              "euler path (needs cfg_scale > 1, mode ODE, "
              "cfg_interval_start > 0) — pipelines.sample would ignore "
              "multistep/velocity-cache knobs, so only euler step-count "
              "candidates are gauged", flush=True)
    # ---- noise-floor probe ---------------------------------------------
    # tol far below any plausible floor -> the controller evaluates densely
    # and its min-calibration completes; the floor it reports is the lower
    # end of the useful tol range on THIS model's field
    floor, tol_cands = None, [0.01, 0.02, 0.05]
    if accel_exercised:
        probe = make_generate(ref_steps, method="vcacheA", tol=1e-6)
        z0 = jax.random.normal(jax.random.PRNGKey(1000),
                               (B,) + latent_shape, jnp.float32)
        _, pstats = probe(ema, z0)
        floor = float(np.asarray(pstats["noise_floor"]))
        if not np.isfinite(floor) or floor <= 0:
            floor = None
        tol_cands = ([round(floor * m, 5) for m in (2.0, 4.0, 8.0)]
                     if floor else [0.01, 0.02, 0.05])
        tol_cands = sorted({min(max(t, 1e-3), 0.2) for t in tol_cands})
        print(f"[autotune] measured noise floor: "
              f"{'%.5f' % floor if floor else 'n/a (below calibration)'}"
              f" -> adaptive tol candidates {tol_cands}", flush=True)

    # ---- candidate ladder ----------------------------------------------
    if args.smoke and not accel_exercised:
        cands = [("euler_8", {"kind": "euler", "num_steps": 8})]
    elif args.smoke:
        cands = [
            ("euler_8", {"kind": "euler", "num_steps": 8}),
            ("ab3_16", {"kind": "ab", "num_steps": 16, "order": 3}),
            ("heun_8", {"kind": "heun", "num_steps": 8}),
            ("vcache2_16", {"kind": "vcache", "num_steps": 16, "k": 2}),
            (f"vcacheA_tol{tol_cands[0]:g}",
             {"kind": "vcacheA", "num_steps": 16, "tol": tol_cands[0],
              "max_interval": 4}),
        ]
    elif not accel_exercised:
        cands = [(f"euler_{n}", {"kind": "euler", "num_steps": n})
                 for n in (125, 100, 50)]
    else:
        cands = (
            [(f"euler_{n}", {"kind": "euler", "num_steps": n})
             for n in (125, 100, 50)]
            + [(f"ab3_{n}", {"kind": "ab", "num_steps": n, "order": 3})
               for n in (100, 62)]
            + [(f"heun_{n}", {"kind": "heun", "num_steps": n})
               for n in (83, 62)]
            + [(f"vcache{k}_{ref_steps}",
                {"kind": "vcache", "num_steps": ref_steps, "k": k})
               for k in (3, 6)]
            + [(f"vcacheA_tol{t:g}",
                {"kind": "vcacheA", "num_steps": ref_steps, "tol": t,
                 "max_interval": 8})
               for t in tol_cands]
        )
    doc = {"config": os.path.abspath(args.config), "ckpt": ckpt,
           "platform": jax.default_backend(),
           "budget_rel_l2_p99": args.budget,
           "cfg_scale": cfg_scale, "timestep_shift": shift,
           "cfg_interval_start": start, "reverse": reverse,
           "n_samples": n_batches * B,
           "reference": f"euler_{ref_steps}", "reference_cost": ref_cost,
           "accel_exercised_by_production_path": accel_exercised,
           "noise_floor": floor, "methods": {}}

    rows = []
    for label, rec in cands:
        s, cost = sample_set(rec)
        dev = (np.linalg.norm((s - exact).reshape(len(s), -1), axis=-1)
               / enorm)
        mu, sig = activation_statistics(feats(s))
        fid = float(frechet_distance(mu_e, sig_e, mu, sig))
        row = {"label": label, "cost": cost,
               "cost_pct": 100 * cost / ref_cost,
               "rel_l2_p50": float(np.percentile(dev, 50)),
               "rel_l2_p99": float(np.percentile(dev, 99)),
               "latent_fid": fid, "rec": rec}
        rows.append(row)
        doc["methods"][label] = {k: v for k, v in row.items()
                                 if k not in ("label",)}
        print(f"[autotune] {label:18s} cost {cost:7.1f} "
              f"({row['cost_pct']:5.1f}%)  relL2 p50 {row['rel_l2_p50']:.5f} "
              f"p99 {row['rel_l2_p99']:.5f}  latent_fid {fid:.6f}", flush=True)

    # ---- selection ------------------------------------------------------
    feasible = [r for r in rows
                if r["rel_l2_p99"] <= args.budget and r["cost"] < ref_cost]
    feasible.sort(key=lambda r: (r["cost"], r["latent_fid"]))
    if feasible:
        best = feasible[0]
        block = _method_config(best["rec"])
        verdict = (f"{best['label']} meets the budget at "
                   f"{best['cost_pct']:.0f}% of exact cost "
                   f"(p99 rel-L2 {best['rel_l2_p99']:.5f} <= "
                   f"{args.budget:g})")
    else:
        best = None
        block = {"sampling_method": "euler",
                 "num_sampling_steps": ref_steps,
                 "multistep_order": 1, "velocity_cache_interval": 1,
                 "velocity_cache_adaptive": False}
        verdict = (f"NO acceleration met budget {args.budget:g} — keep "
                   f"exact euler-{ref_steps} (the acceleration matrix says "
                   "this happens on real fields; measuring it is the point)")
    # carry the user's own production settings through unchanged
    for k in ("mode", "cfg_scale", "timestep_shift", "cfg_interval_start",
              "cfg_channels", "reverse", "null_class"):
        if k in sc:
            block[k] = sc[k]

    doc["recommendation"] = {"verdict": verdict, "sample_block": block,
                             "winner": best["label"] if best else
                             f"euler_{ref_steps}"}
    out = args.out or "autotune_sampler.json"
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)

    import yaml

    yaml_block = yaml.safe_dump({"sample": block}, sort_keys=False)
    print(f"\n[autotune] VERDICT: {verdict}")
    print("[autotune] recommended config block:\n" + yaml_block, flush=True)
    print(f"[autotune] evidence -> {out}")
    if args.emit_yaml:
        with open(args.emit_yaml, "w") as f:
            f.write("# generated by vavae_tpu.apps.autotune_sampler\n"
                    f"# {verdict}\n" + yaml_block)
        print(f"[autotune] overlay -> {args.emit_yaml}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
