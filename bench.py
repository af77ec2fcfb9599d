"""Headline benchmark: DiT-XL/1 256×256 CFG sampling throughput per chip,
running the reference's OWN production sampler configuration.

The reference's production path (inference.py:200-228) is 250 euler ODE
steps with classifier-free guidance (cond+uncond batched), on f16d32
latents (16×16×32, 256 tokens), model in bf16. The DEFAULT here is that
reference-identical euler-250 program (1.43 samples/s/chip on v5e) — the
honest apples-to-apples number, stable across rounds.

Accelerations are reported SEPARATELY with their measured accuracy trade
(BASELINE.md): the order-3 Adams–Bashforth integrator (`bench.py 8 1 3 N`)
is an exact-solver upgrade — lower error than euler at EQUAL step count
wherever the integration is in its asymptotic regime (error monotone in
N), which held on 29 of 30 measured testbed points. It is NOT
unconditional: the round-3 on-chip matrix found one stiff point
(cfg 6.7 on a sharply-trained field, euler error itself non-monotone in
N) where AB3's history extrapolation AMPLIFIED the error at every N.
The round-2 cross-count claim "ab3-100 error ≤ euler-250 error" is
likewise field-dependent (matched_N spanned 51 → ∞ across on-chip
points). Hence no accuracy label rides the headline: see the testbed
matrix (scripts/bench_multistep_matrix.py,
docs/bench/multistep_matrix_*.json) and rank methods on YOUR model with
scripts/bench_sampler_quality.py before adopting any acceleration.

Baseline for vs_baseline: an A100 running the PyTorch reference's OWN
sampler (euler-250) at the same batch. Estimated from FLOPs: one CFG step
is 2·B model forwards of a 675M-param / 256-token DiT (~1.4 GFLOP/token),
250 steps/image batch; at a generous 45% MFU on A100 bf16 (312 TFLOP/s
peak) that is ~0.8 samples/s/chip. We use 0.8 as the A100 reference point
(documented assumption; the reference repo publishes no per-chip sampling
throughput — BASELINE.md). The comparison is equal-output-quality work:
the A100 number is what the reference's method costs there; ours is what
the same accuracy costs here.

If the AB path fails to build/run for any reason, the bench falls back to
the reference-identical euler-250 program rather than erroring the round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

A100_BASELINE_SAMPLES_PER_SEC = 0.8  # ESTIMATE (45% MFU assumption above)

# Measured exact-solver ceiling on THIS chip, both factors measured
# (round 5): the production euler-250 program costs 213.5 CFG-forward
# equivalents (transport/cost.py at shift .3 / start .11) × 3.80 true TF
# per CFG forward (HLO inventory, profile_bwd_ops.py — the 2·params·tokens
# estimate overcounts adaLN 256×) = 101.4 TF/image; the chip's REALIZED
# matmul ceiling is 164 TF/s (chained 8192³ bf16 dots; 83% of the 197
# spec). Bound: 164/101.4 = ~1.62 samples/s/chip. The earlier "~1.5"
# constant used the inflated FLOP count at spec peak — two errors that
# happened to nearly cancel; this derivation rests on measured numbers
# only. The headline 1.44 runs at ~89% of this bound.
EXACT_SOLVER_CEILING_SAMPLES_PER_SEC = 1.62


def main() -> None:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import LightningDiT_models
    from vavae_tpu.transport import Sampler, create_transport

    # The tunneled TPU backend occasionally drops for minutes-to-hours at a
    # time, and a dead tunnel can make backend init HANG rather than error —
    # which would wedge this process unrecoverably (the first in-process
    # init attempt can never be retried). So: probe init in a SUBPROCESS
    # (killable on timeout) and only touch the backend here once a probe
    # succeeds. Bounded retry (VAVAE_BENCH_RETRIES × 60 s) before falling
    # through to the direct attempt.
    import os
    import subprocess

    def _probe(timeout: int = 120) -> str:
        # the probe must resolve the SAME platform as this process: route it
        # through utils.jax_cache (applies VAVAE_PLATFORM via jax.config).
        # PYTHONPATH is APPENDED, never replaced — the existing value carries
        # the TPU plugin site dir.
        # Returns "ok", "retry" (outage-shaped: hang or UNAVAILABLE/deadline),
        # or "fatal" (deterministic failure — retrying would just hide the
        # real error for retries×60s; stderr is surfaced either way).
        env = dict(os.environ)
        repo = os.path.dirname(os.path.abspath(__file__))
        env["PYTHONPATH"] = ":".join(filter(None, [env.get("PYTHONPATH"), repo]))
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import vavae_tpu.utils.jax_cache; "
                 "import jax, numpy as np, jax.numpy as jnp; "
                 "x = jnp.ones((8, 8)); "
                 "print('BACKEND_OK', float(np.asarray(x @ x)[0, 0]))"],
                capture_output=True, text=True, timeout=timeout, env=env,
            )
        except subprocess.TimeoutExpired:
            print("# backend probe hung (init wedged — outage-shaped)",
                  file=sys.stderr, flush=True)
            return "retry", "probe hung (no stderr — init wedged)"
        if "BACKEND_OK" in r.stdout:
            return "ok", ""
        tail = "\n".join(r.stderr.strip().splitlines()[-3:])
        print(f"# backend probe failed (rc={r.returncode}):\n{tail}",
              file=sys.stderr, flush=True)
        outage = any(s in r.stderr for s in ("UNAVAILABLE", "DEADLINE", "unavailable"))
        return ("retry" if outage else "fatal"), r.stderr

    retries = int(os.environ.get("VAVAE_BENCH_RETRIES", "10"))
    last_stderr = ""
    # VAVAE_BENCH_DIRECT=1 skips the probe loop entirely — the escape hatch
    # for deterministic failures whose stderr merely CONTAINS
    # 'unavailable' (misclassified as outage-shaped, which would burn
    # retries×60s before giving up), and for callers that just probed
    # themselves (the watcher, bench_common subprocess points).
    if os.environ.get("VAVAE_BENCH_DIRECT"):
        retries = -1  # fall through to direct init below
    for attempt in range(retries + 1):
        verdict, last_stderr = _probe()
        if verdict == "ok":
            break
        if verdict == "fatal":
            # deterministic failure: the direct init below raises the real
            # error immediately (no hang risk)
            print("# attempting direct init", file=sys.stderr, flush=True)
            break
        if attempt >= retries:
            # outage-shaped after exhausting retries: a direct init would
            # HANG UNRECOVERABLY (first in-process init has no timeout and
            # no retry) — fail fast with a clear message instead of wedging
            # the caller until ITS timeout fires. Full stderr of the final
            # probe rides along so a misclassified deterministic failure
            # stays diagnosable (VAVAE_BENCH_DIRECT=1 bypasses the loop).
            sys.exit("backend unavailable after "
                     f"{retries + 1} probes (tunnel outage) — not attempting "
                     "direct init, which would hang; rerun when the backend "
                     "answers (scripts/tpu_watch.sh automates this), or set "
                     "VAVAE_BENCH_DIRECT=1 if this is NOT an outage.\n"
                     f"--- final probe stderr ---\n{last_stderr}")
        print(f"# backend unavailable (probe {attempt + 1}/{retries}), "
              f"retrying in 60s", file=sys.stderr, flush=True)
        time.sleep(60)
    # NOTE: a residual race remains — the tunnel can die between the probe
    # succeeding and this first in-process init, which then has no retry
    # (first init is once-per-process). The probe shrinks that window from
    # "the whole outage" to seconds; the external watcher loop (CLAUDE.md)
    # is the recovery for the rest.
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    # full config on TPU; tiny proxy on CPU so the script stays runnable.
    # batch 8/chip measured best on v5e (natural-layout kernel:
    # 1.40/1.39/1.37 samples/s at 8/16/32 — the padded kernel's b32 cliff
    # to 1.17 is gone); the reference itself samples at per-proc batch 4.
    # Optional argv override for sweeps: python bench.py [batch].
    model_name = "LightningDiT-XL/1" if on_tpu else "LightningDiT-S/2"
    batch = 8 if on_tpu else 2
    # optional argv: [batch] [cache_interval]. cache_interval > 1 measures
    # the opt-in velocity-cached sampler — report it ONLY alongside its
    # measured quality cost (BASELINE.md velocity-cache table: k=3..6 at
    # order-1 are 0.25-0.38% latent rel-L2 / ≥60.7 dB decoded PSNR / zero
    # classifier delta; k=6 runs 4.39 samples/s/chip).
    # argv: [batch] [cache_interval] [multistep_order] [num_steps].
    # DEFAULT = the reference-identical euler-250 program (round-3 decision:
    # the ab3-100 "equal accuracy" label was contradicted by the on-chip
    # sweep on a well-trained field — see module docstring). AB3 points:
    # multistep_order 3 + num_steps N; cache_interval > 1 measures the
    # opt-in velocity-cached sampler (report either ONLY alongside its
    # measured quality cost — BASELINE.md acceleration tables).
    cache_interval, multistep_order, num_steps = 1, 1, (250 if on_tpu else 4)
    method = "euler"
    usage = ("usage: bench.py [batch] [cache_interval] [multistep_order] "
             "[num_steps] [heun|vcacheA[TOL]]")
    argv = sys.argv[1:]
    vcache_tol = 0.02
    if argv and argv[-1] == "heun":
        # heun-N: fixed-grid RK2 on the same split program — 2 model evals
        # per step, no history (the stiff-regime-robust fixed-cost method;
        # BASELINE.md quality tables). dopri5 is NOT benchable here: with
        # random params its adaptive step count is meaningless.
        method, argv = "heun", argv[:-1]
    elif argv and argv[-1].startswith("vcacheA"):
        # adaptive velocity cache on the euler-250 program. NOTE: with
        # random params the controller's eval count reflects the RANDOM
        # field's smoothness, not a trained model's — this mode is a
        # wall-clock sanity check of the adaptive scan (cond overhead,
        # measured evals ride in the JSON); quality/eval claims come from
        # the trained-field gauges (bench_sampler_quality/matrix).
        method = "vcacheA"
        vcache_tol = float(argv[-1][len("vcacheA"):] or vcache_tol)
        argv = argv[:-1]
    if len(argv) > 4:
        sys.exit(f"{usage}; got {len(sys.argv) - 1} args")
    vals = []
    for a in argv:
        if not a.isdigit():
            sys.exit(f"{usage}; got {a!r}")
        vals.append(int(a))
    if len(vals) > 0:
        batch = vals[0]
    if len(vals) > 1:
        cache_interval = vals[1]
    if len(vals) > 2:
        multistep_order = vals[2]
        if multistep_order == 1 and len(vals) <= 3:
            num_steps = 250 if on_tpu else 4  # explicit euler: ref step count
    if len(vals) > 3:
        num_steps = vals[3]
    if cache_interval > 1 and len(vals) <= 2:
        # velocity-cache sweeps ride the euler-250 program it was measured on
        multistep_order, num_steps = 1, (250 if on_tpu else 4)
    if method != "euler" and (cache_interval > 1 or multistep_order > 1):
        sys.exit(f"{usage}; cache/multistep are euler-only knobs")

    model = LightningDiT_models[model_name](
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

    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    cfg_scale, interval_start = 10.0, 0.11
    null_class = 1000 if on_tpu else 0
    labels = jnp.arange(batch, dtype=jnp.int32) % 32
    y_cfg = jnp.concatenate([labels, jnp.full((batch,), null_class, jnp.int32)])

    def build(ms_order, n_steps):
        # CFG-interval split sampler: the below-interval phase runs the
        # conditional model at half batch (numerically identical)
        if method == "vcacheA":
            knobs = dict(cache_adaptive=True, cache_tol=vcache_tol,
                         return_stats=True)
            build_method = "euler"
        else:
            knobs = (dict(cache_interval=cache_interval,
                          multistep_order=ms_order)
                     if method == "euler" else {})
            build_method = method
        sample_fn = sampler.sample_ode_cfg(
            num_steps=n_steps, timestep_shift=0.3,
            cfg_interval_start=interval_start,
            sampling_method=build_method, **knobs,
        )

        @jax.jit
        def generate(p, rng):
            # params as a jit ARGUMENT — closing over them would inline
            # ~1.35 GB of constants into the module and blow up trace time.
            def model_cond_fn(x, t):
                return model.apply({"params": p}, x, t, labels)

            def model_cfg_fn(x, t):
                # [cond | uncond] halves
                return model.forward_with_cfg(p, x, t, y_cfg, cfg_scale)

            z = jax.random.normal(rng, zshape, jnp.bfloat16)
            return sample_fn(z, model_cond_fn, model_cfg_fn)

        return generate

    generate = build(multistep_order, num_steps)

    last_evals = [0]

    def run(rng):
        # fetch a value: on async backends block_until_ready alone can
        # return before the computation has actually finished
        res = generate(params, rng)
        if method == "vcacheA":
            res, stats = res
            last_evals[0] = int(stats["cfg_evals"])
        out = np.asarray(res)
        assert np.isfinite(out.astype(np.float32)).all()

    # warmup/compile; if the default AB program fails to build or run for
    # any reason, record the reference-identical euler-250 number instead
    # of erroring the round
    try:
        run(jax.random.PRNGKey(1))
    except Exception as e:
        if multistep_order == 1:
            raise
        print(f"# AB path failed ({type(e).__name__}: {e}); falling back to "
              f"euler-250", file=sys.stderr, flush=True)
        multistep_order, num_steps = 1, (250 if on_tpu else 4)
        generate = build(multistep_order, num_steps)
        run(jax.random.PRNGKey(1))

    n_iters = 4 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(n_iters):
        run(jax.random.PRNGKey(2 + i))
    dt = time.perf_counter() - t0

    # `generate` is a plain single-device jit (no mesh), so exactly ONE chip
    # does the work regardless of how many the backend exposes — normalizing
    # by jax.device_count() on a multi-chip slice would under-report 8x.
    samples_per_sec_chip = (batch * n_iters) / dt
    value = round(samples_per_sec_chip, 4)
    ref_steps = 250 if on_tpu else 4
    is_euler250 = (method == "euler" and multistep_order == 1
                   and cache_interval == 1 and num_steps == ref_steps)
    tag = "" if cache_interval == 1 else f",vcache{cache_interval}"
    if method == "vcacheA":
        tag += f",vcacheA_tol{vcache_tol:g}"
    elif method != "euler":
        tag += f",{method}"
    if multistep_order > 1:
        # exact-solver acceleration: AB-N ≤ euler-N at equal N on smooth
        # (asymptotic-regime) fields, but one stiff on-chip point reversed
        # it, and the cross-count trade vs euler-250 is field-dependent —
        # see the BASELINE.md testbed matrix before citing any accuracy
        tag += f",ab{multistep_order}"
    result = {
        "metric": f"dit_xl1_cfg_sampling_throughput[{model_name},{num_steps}steps,b{batch}{tag}]",
        "value": value,
        "unit": "samples/sec/chip",
        "vs_baseline": round(value / A100_BASELINE_SAMPLES_PER_SEC, 4),
    }
    if is_euler250 and on_tpu:
        # headline framing against the MEASURED ceiling (both factors
        # measured — see EXACT_SOLVER_CEILING_SAMPLES_PER_SEC's derivation
        # above); the A100 vs_baseline multiple rests on an estimated 45%
        # MFU denominator (docstring), this fraction does not
        result["pct_of_exact_solver_ceiling"] = round(
            100 * value / EXACT_SOLVER_CEILING_SAMPLES_PER_SEC, 1)
        result["baseline_note"] = (
            "vs_baseline uses an ESTIMATED 0.8 samples/s A100 reference "
            "(45% MFU assumption); pct_of_exact_solver_ceiling uses only "
            "measured factors: 101.4 true TF/image (HLO inventory x "
            "cost accounting) over the chip's realized 164 TF/s matmul "
            "ceiling = 1.62 samples/s bound")
    if method == "vcacheA":
        # eval count on THIS (random-init) field — plumbing sanity only;
        # trained-field eval counts come from the quality gauges
        result["vcacheA_cfg_evals_random_field"] = last_evals[0]
    # keep the BENCH_r* series comparable across rounds even if the default
    # solver changes: the reference-identical euler-250 number always rides
    # along. Same-config runs self-report; others measure it in a FRESH
    # subprocess (CLAUDE.md rule — never time in a process that already
    # built big jits), reusing this process's probe verdict via DIRECT=1.
    if is_euler250:
        result["baseline_euler250"] = value
    elif os.environ.get("VAVAE_BENCH_NO_RIDER"):
        # sweep drivers measure their own euler-250 point — re-measuring it
        # per accelerated point (~5 min each on-chip) would blow the
        # battery's step timeout (bench_common.xl_throughput sets this)
        pass
    else:
        env = dict(os.environ)
        env["VAVAE_BENCH_DIRECT"] = "1"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 str(batch), "1", "1", str(ref_steps)],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            result["baseline_euler250"] = json.loads(
                r.stdout.strip().splitlines()[-1])["value"]
        except Exception as e:  # never fail the headline over the rider
            print(f"# baseline euler-250 subprocess failed: {e}",
                  file=sys.stderr, flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
