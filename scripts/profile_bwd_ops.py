"""Op-level attribution of the DiT-XL/1 backward (round-5 verdict item 1).

The VERDICT asked for an xprof per-op table of the fwdbwd step. The tunneled
axon backend exports HOST-ONLY trace events (measured this round: a
jax.profiler window around a jitted matmul yields PjitFunction/PJRT host
spans and zero device-side XLA op events), so the attribution is built from
HLO inventory + program-shaped measurements instead:

  --part hlo      compile jit(value_and_grad(loss)) at B=16 policy=dots and
                  inventory every matmul (the TPU backend lowers dots to
                  window-1 `convolution`s) with shape, FLOPs, fwd/bwd
                  direction (op_name metadata: "transpose(jvp(...))" = bwd)
                  and scan-body multiplicity. NOTE: compiled cost_analysis
                  counts while bodies ONCE — the inventory multiplies by
                  trip count (28) and totals 10.98 TF vs cost_analysis's
                  0.40 TF.
  --part stacks   THE DECISIVE MEASUREMENT: each block component (mlp /
                  attention / adaLN / full block) as a 28-layer lax.scan +
                  jax.checkpoint(dots) stack — the real program structure —
                  timed fwd and fwd+bwd in a fresh process. Per-component
                  fwd-vs-bwd rate is the signal that either justifies or
                  kills a fused backward kernel.
  --part ceiling  chained 8192^3 bf16 dots: the chip's REALIZED matmul
                  ceiling (measured 164.6 TF/s = 83.6% of the 197 spec).
  --part bw       in-program HBM stream bandwidth (measured ~200 GB/s; the
                  819 GB/s spec is not reachable on this tunneled chip).
  --part dots     kept as a measured NEGATIVE: isolated-op timing is
                  uninterpretable on this backend — a lone
                  (4096,1152)x(1152,6144) bf16 dot costs ~1.1 ms vs its
                  0.37 ms roofline, IDENTICALLY under scan / unrolled /
                  single-call / batched-einsum (~0.7 ms per-op overhead the
                  real 28-iteration program does not pay). Do not use these
                  numbers for attribution; use --part stacks.
  --all           orchestrate + write docs/bench/onchip/bwd_op_profile.json.

Round-5 findings (the committed JSON; BASELINE.md "backward attribution"):
  mlp stack   fwd 141 / bwd 151 TF/s (bwd ABOVE fwd rate — the dW+dx dots a
              fused kernel would absorb already run at 91% of the realized
              ceiling; nothing to recover)
  attn stack  fwd 72.7 / bwd 93.6 TF/s (bwd at 1.29x fwd rate; the low
              absolute rate is attention's intrinsic K=72/N=256 intensity)
  block stack fwd 117.5 / bwd 107.2 TF/s (bwd at 0.91x fwd rate)
  => the "68% bwd MFU" of round 4 was an artifact of the 197 spec-peak
  denominator; against the realized 165 TF/s ceiling the composed backward
  runs at ~0.9x the forward's own rate, and the fused attention-backward +
  dW kernel is KILLED: its only recoverable cost is the d(qkv) HBM
  round-trip (~0.14 ms x 28 <= 4 ms of the 112 ms fwdbwd, ~3% of the step),
  far under the 10-15 ms hoped in the round-4 estimate.

Reference standard chased: ~72% step-MFU on 8xH800
(/root/reference/LightningDiT/docs/log.txt, 5.3 steps/s @ global 1024).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PEAK_TFLOPS = 197.0  # v5e bf16
DEPTH = 28  # XL blocks = trip count of the fwd/bwd block scans


# --------------------------------------------------------------------------
# part: hlo — compile the fwdbwd, dump + inventory the matmuls
#
# The TPU backend lowers every dot_general to a `convolution` op (window=1,
# or window=patch for the embedder), so the inventory walks convolutions.
# `metadata op_name` carries the flax module path AND the autodiff direction
# ("transpose(jvp(...))" = backward) — the per-op table groups on it.
# --------------------------------------------------------------------------

_COMP_RE = re.compile(r"(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\)\s*->.*\{")
_DEF_RE = re.compile(r"%([\w\.\-]+)\s*=\s*\(?(\w+)\[([0-9,]*)\]")
_CONV_RE = re.compile(
    r"%([\w\.\-]+)\s*=\s*(\w+)\[([0-9,]*)\][^ ]*\s+convolution\("
    r"%([\w\.\-]+),\s*%([\w\.\-]+)\)"
    r".*?dim_labels=(\S+?)[,\s]"
)
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _dims(s: str):
    return [int(x) for x in s.split(",") if x] if s else []


def _short_opname(op_name: str) -> str:
    # "jit(<lambda>)/transpose(jvp(LightningDiT))/blocks/attn/qkv/dot_general"
    tail = op_name.split("LightningDiT))/")[-1].split("LightningDiT)/")[-1]
    return tail.replace("/dot_general", "")


def inventory_hlo(text: str) -> dict:
    """Inventory convolutions (lowered matmuls) + Mosaic custom-calls."""
    comp = None
    comps: dict = {}
    while_bodies: list = []
    shapes: dict = {}  # %name -> dims (first tuple elem shape if tuple)
    bodies: dict = {}
    for line in text.splitlines():
        stripped = line.strip()
        m = _COMP_RE.match(stripped)
        if m:
            comp = m.group(1)
            comps.setdefault(comp, {"convs": [], "custom_calls": []})
            bodies[comp] = []
            continue
        if comp is None:
            continue
        bodies[comp].append(stripped)
        dm = _DEF_RE.match(stripped)
        if dm:
            shapes[dm.group(1)] = (dm.group(2), _dims(dm.group(3)))
        if " while(" in stripped:
            wb = re.search(r"body=%?([\w\.\-]+)", stripped)
            if wb:
                while_bodies.append(wb.group(1))
        cm = _CONV_RE.search(stripped)
        if cm:
            name, odt, oshape, lhs_n, rhs_n, dim_labels = cm.groups()
            out = _dims(oshape)
            rhs_spec = dim_labels.split("->")[0].split("_")[1]
            rdt, rsh = shapes.get(rhs_n, ("?", []))
            ldt = shapes.get(lhs_n, ("?", []))[0]
            if len(rsh) != len(rhs_spec):
                contraction, n_feat = 0, 0
            else:
                contraction = 1
                n_feat = 1
                for ch, d in zip(rhs_spec, rsh):
                    if ch == "o":
                        n_feat *= d
                    else:  # 'i' or a spatial digit: contracted
                        contraction *= d
            flops = 2.0 * contraction
            for d in out:
                flops *= d
            om = _OPNAME_RE.search(stripped)
            op_name = om.group(1) if om else ""
            comps[comp]["convs"].append({
                "out": out, "k": contraction, "n": n_feat,
                "m": (int(__import__("numpy").prod(out)) // max(n_feat, 1)),
                "dtype": f"{ldt}x{rdt}->{odt}",
                "flops": flops,
                "label": _short_opname(op_name),
                "bwd": "transpose(jvp" in op_name,
            })
        elif "custom-call" in stripped and "custom_call_target=" in stripped:
            tm = re.search(r'custom_call_target="([^"]+)"', stripped)
            om = _OPNAME_RE.search(stripped)
            comps[comp]["custom_calls"].append({
                "target": tm.group(1) if tm else "?",
                "label": _short_opname(om.group(1)) if om else "",
            })
    return {"computations": comps, "while_bodies": while_bodies,
            "bodies": bodies}


def _reachable(bodies: dict, roots: list) -> set:
    """Computations reachable (textually called) from the root bodies."""
    seen: set = set()
    frontier = list(roots)
    while frontier:
        c = frontier.pop()
        if c in seen or c not in bodies:
            continue
        seen.add(c)
        body = "\n".join(bodies[c])
        for other in bodies:
            if other != c and other not in seen and other in body:
                frontier.append(other)
    return seen


def run_hlo(batch: int, policy: str) -> dict:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bench_train_attrib import build

    model, trainer, state, rng, x, y = build(batch, policy)
    vg = jax.jit(
        lambda p, r, xx, yy: jax.value_and_grad(
            trainer._loss_fn, has_aux=True)(p, r, xx, yy)
    )
    compiled = vg.lower(state.params, rng, x, y).compile()
    text = compiled.as_text()
    with open("/tmp/fwdbwd_hlo.txt", "w") as f:
        f.write(text)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    inv = inventory_hlo(text)
    # multiplier: ops inside computations reachable from a while body run
    # DEPTH times (the fwd/bwd block scans are the only big whiles here)
    in_scan = _reachable(inv["bodies"], inv["while_bodies"])

    def _mult(cname: str, label: str) -> int:
        # op_name "while/body/..." marks scan-body ops even when the nested-
        # paren while-body header defeats the computation-name tracking
        if label.startswith("while/body") or cname in in_scan:
            return DEPTH
        return 1

    shapes: dict = {}
    for cname, c in inv["computations"].items():
        for d in c["convs"]:
            mult = _mult(cname, d["label"])
            key = (d["m"], d["k"], d["n"], d["dtype"], d["label"])
            s = shapes.setdefault(key, {
                "M": d["m"], "K": d["k"], "N": d["n"], "dtype": d["dtype"],
                "label": d["label"], "bwd": d["bwd"], "count": 0,
                "flops_each": d["flops"], "in_scan": mult > 1,
            })
            s["count"] += mult
    total_dot_flops = sum(s["flops_each"] * s["count"] for s in shapes.values())
    custom_calls: dict = {}
    for cname, c in inv["computations"].items():
        for cc in c["custom_calls"]:
            key = f'{cc["target"]}:{cc["label"]}'
            custom_calls[key] = custom_calls.get(key, 0) + _mult(
                cname, cc["label"])
    return {
        "part": "hlo", "batch": batch, "policy": policy,
        "cost_analysis_flops": float(ca.get("flops", 0.0)),
        "cost_analysis_bytes": float(ca.get("bytes accessed", 0.0)),
        "inventory_dot_flops": total_dot_flops,
        "n_while_bodies": len(inv["while_bodies"]),
        "dot_shapes": sorted(shapes.values(),
                             key=lambda s: -s["flops_each"] * s["count"]),
        "custom_calls": custom_calls,
        "hlo_path": "/tmp/fwdbwd_hlo.txt",
    }


# --------------------------------------------------------------------------
# part: dots — microbench distinct dot shapes (fresh process)
# --------------------------------------------------------------------------

def run_dots(shapes_json: str) -> dict:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    shapes = json.loads(shapes_json)
    results = []
    key = jax.random.PRNGKey(0)
    REP = 8
    for s in shapes:
        M, k, N = s["M"], s["K"], s["N"]
        if not (M and k and N) or M * k * N < 1e6:
            results.append({**s, "skipped": "tiny/unresolved — negligible"})
            continue
        dt = jnp.bfloat16 if s["dtype"].startswith("bf16") else jnp.float32
        odt = jnp.bfloat16 if s["dtype"].endswith("bf16") else jnp.float32
        a = jax.random.normal(key, (REP, M, k), dt)
        b = jax.random.normal(key, (REP, k, N), dt)

        def body(_, ab):
            return None, jnp.dot(ab[0], ab[1], preferred_element_type=odt)

        f = jax.jit(lambda aa, bb: lax.scan(body, None, (aa, bb))[1])

        def fence(o):
            # fetch ONE element, sliced ON DEVICE: np.asarray(full_output)
            # would time the ~30 MB/s tunnel transfer, not the dot (this
            # exact bug produced a 26-second "dot time" on the first run)
            np.asarray(o[-1, :1, :1])

        out = f(a, b)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(a, b)
        fence(out)
        dt_s = (time.perf_counter() - t0) / (4 * REP)
        fl = 2.0 * M * N * k
        by = (M * k + k * N) * a.dtype.itemsize + M * N * out.dtype.itemsize
        results.append({
            "M": M, "K": k, "N": N, "dtype": s["dtype"],
            "label": s.get("label"), "bwd": s.get("bwd"),
            "count": s["count"], "in_scan": s.get("in_scan"),
            "us_each": round(dt_s * 1e6, 2),
            "tflops": round(fl / dt_s / 1e12, 1),
            "pct_peak": round(100 * fl / dt_s / 1e12 / PEAK_TFLOPS, 1),
            "flops_each": fl, "bytes_each": by,
            "total_ms": round(dt_s * 1e3 * s["count"], 3),
        })
    return {"part": "dots", "results": results}


# --------------------------------------------------------------------------
# part: stacks — 28-layer COMPONENT stacks with the real program structure
#
# Isolated-op timing is uninterpretable on this backend (measured: a lone
# (4096,1152)x(1152,6144) bf16 dot costs ~1.1 ms vs its 0.37 ms roofline,
# identically under scan / unrolled / single-call / batched-einsum — a
# ~0.7 ms per-op overhead the real 28-iteration program does NOT pay, since
# the full fwd hits ~130 TF/s). So the attribution measures each block
# COMPONENT as a 28-layer scan + jax.checkpoint(dots) stack — the exact
# structure of the real model — where fwd-vs-bwd rate per component is the
# decisive signal: if only the attention stack's backward runs below its
# forward rate, a fused attention-backward kernel can win; if every
# component's backward runs at the same fraction, the gap is the dW/scan
# structure itself and no attention kernel recovers it.
# --------------------------------------------------------------------------

def run_stacks(batch: int) -> dict:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from vavae_tpu.models.posembed import rope_2d_freqs
    from vavae_tpu.ops.pallas.flash_attention import fused_qkv_attention

    B, N, C, H, Dh = batch, 256, 1152, 16, 72
    MLP_H = 6144  # fused w12 width (2x 3072)
    key = jax.random.PRNGKey(0)
    policy = jax.checkpoint_policies.checkpoint_dots
    cos, sin = rope_2d_freqs(Dh, 16)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    def glu(h):
        a, g = jnp.split(h, 2, axis=-1)
        return jax.nn.silu(a) * g

    # per-layer params, stacked over depth like the real nn.scan module
    def stack(shape):
        nonlocal key
        key, k = jax.random.split(key)
        return (jax.random.normal(k, (DEPTH,) + shape, jnp.bfloat16)
                * 0.02)

    components = {}

    # mlp: x @ W12 -> swiglu -> @ W3, residual
    W12, W3 = stack((C, MLP_H)), stack((MLP_H // 2, C))

    def mlp_body(x, w):
        w12, w3 = w
        return x + jnp.dot(glu(jnp.dot(x, w12)), w3), None

    components["mlp"] = (
        (W12, W3), mlp_body,
        DEPTH * (2 * B * N * C * MLP_H + 2 * B * N * (MLP_H // 2) * C))

    # attn: qkv proj -> Pallas natural-layout attention (in-kernel RoPE)
    # -> out proj, residual
    Wqkv, Wproj = stack((C, 3 * C)), stack((C, C))

    def attn_body(x, w):
        wqkv, wproj = w
        qkv = jnp.dot(x, wqkv).reshape(B, N, 3, H, Dh)
        o = fused_qkv_attention(qkv, rope=rope).reshape(B, N, C)
        return x + jnp.dot(o, wproj), None

    components["attn"] = (
        (Wqkv, Wproj), attn_body,
        DEPTH * (2 * B * N * C * 3 * C + 2 * B * N * C * C
                 + 4 * B * H * N * N * Dh))

    # adaLN: c -> silu -> dot -> 6-way modulation applied to x
    Wmod = stack((C, 6 * C))
    c = jax.random.normal(key, (B, C), jnp.bfloat16)

    def ada_body(x, w):
        m = jnp.dot(jax.nn.silu(c), w[0])
        sh, sc, g, sh2, sc2, g2 = jnp.split(m, 6, axis=-1)
        x = x * (1 + sc[:, None]) + sh[:, None]
        return x * g[:, None] * g2[:, None] + sh2[:, None] * sc2[:, None], None

    components["adaLN"] = ((Wmod,), ada_body,
                           DEPTH * 2 * B * C * 6 * C)

    # full block: adaLN-modulated attention + mlp (the real composition)
    def block_body(x, w):
        wqkv, wproj, w12, w3, wmod = w
        m = jnp.dot(jax.nn.silu(c), wmod)
        sh, sc, g, sh2, sc2, g2 = jnp.split(m, 6, axis=-1)
        h = x * (1 + sc[:, None]) + sh[:, None]
        qkv = jnp.dot(h, wqkv).reshape(B, N, 3, H, Dh)
        o = fused_qkv_attention(qkv, rope=rope).reshape(B, N, C)
        x = x + g[:, None] * jnp.dot(o, wproj)
        h = x * (1 + sc2[:, None]) + sh2[:, None]
        return x + g2[:, None] * jnp.dot(glu(jnp.dot(h, w12)), w3), None

    components["block"] = (
        (Wqkv, Wproj, W12, W3, Wmod), block_body,
        components["mlp"][2] + components["attn"][2]
        + components["adaLN"][2])

    def fence(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    x0 = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    out = {"part": "stacks", "batch": batch}
    for name, (params, body, dot_flops) in components.items():
        def fwd_fn(x, ps, body=body):
            return lax.scan(jax.checkpoint(body, policy=policy), x, ps)[0]

        def loss_fn(x, ps, body=body):
            return jnp.sum(fwd_fn(x, ps, body).astype(jnp.float32) ** 2)

        rec = {}
        for tag, fn in (("fwd", jax.jit(fwd_fn)),
                        ("fwdbwd", jax.jit(jax.grad(loss_fn, argnums=(0, 1))))):
            o = fn(x0, params)
            fence(o)
            t0 = time.perf_counter()
            iters = 6
            for _ in range(iters):
                o = fn(x0, params)
            fence(o)
            rec[tag] = (time.perf_counter() - t0) / iters * 1e3
        bwd_ms = rec["fwdbwd"] - rec["fwd"]
        out[name] = {
            "fwd_ms": round(rec["fwd"], 3),
            "fwdbwd_ms": round(rec["fwdbwd"], 3),
            "bwd_ms": round(bwd_ms, 3),
            "dot_tflop_fwd": round(dot_flops / 1e12, 3),
            # dots policy: fwd dots saved, bwd adds dW+dx = 2x fwd dots
            "fwd_tfs": round(dot_flops / rec["fwd"] / 1e9, 1),
            "bwd_tfs": round(2 * dot_flops / bwd_ms / 1e9, 1),
            "bwd_over_fwd_rate": round(
                (2 * dot_flops / bwd_ms) / (dot_flops / rec["fwd"]), 3),
        }
        print(json.dumps({"component": name, **out[name]}), flush=True)
    return out


# --------------------------------------------------------------------------
# part: attn — Pallas attention fwd / fwd+bwd standalone (fresh process)
# --------------------------------------------------------------------------

def run_attn(batch: int) -> dict:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.ops.pallas.flash_attention import fused_qkv_attention
    from vavae_tpu.models.posembed import rope_2d_freqs

    B, H, N, D = batch, 16, 256, 72
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3, H, D),
                            jnp.bfloat16)
    cos, sin = rope_2d_freqs(D, 16)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    def fwd(q):
        return fused_qkv_attention(q, rope=rope)

    def loss(q):
        return jnp.sum(fwd(q).astype(jnp.float32) ** 2)

    def fence(o):
        # one element, sliced on device — never fetch the full tensor over
        # the tunnel inside a timing loop
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf.ravel()[:1])

    recs = {}
    for name, fn in (("fwd", jax.jit(fwd)), ("fwdbwd", jax.jit(jax.grad(loss)))):
        out = fn(qkv)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(qkv)
        fence(out)
        recs[name] = (time.perf_counter() - t0) / 20 * 1e3
    # attention flops: QK^T + AV (fwd), bwd ~ 2x fwd + fwd recompute
    fl_fwd = 4.0 * B * H * N * N * D
    return {
        "part": "attn", "B": B, "H": H, "N": N, "D": D,
        "fwd_ms": round(recs["fwd"], 3),
        "fwdbwd_ms": round(recs["fwdbwd"], 3),
        "bwd_only_ms": round(recs["fwdbwd"] - recs["fwd"], 3),
        "fwd_flops": fl_fwd,
        "fwd_pct_peak": round(100 * fl_fwd / (recs["fwd"] / 1e3) / 1e12
                              / PEAK_TFLOPS, 1),
        # bwd computes dQ,dK,dV (2x fwd dots) + recompute of A (1x QK^T)
        "bwd_flops_est": fl_fwd * 2.5,
        "bwd_pct_peak": round(
            100 * fl_fwd * 2.5 / ((recs["fwdbwd"] - recs["fwd"]) / 1e3)
            / 1e12 / PEAK_TFLOPS, 1),
        "per_layer_x_depth_fwd_ms": round(recs["fwd"] * DEPTH, 2),
        "per_layer_x_depth_bwd_ms": round(
            (recs["fwdbwd"] - recs["fwd"]) * DEPTH, 2),
    }


# --------------------------------------------------------------------------
# part: ceiling — the chip's REALIZED matmul ceiling (fresh process)
# --------------------------------------------------------------------------

def run_ceiling() -> dict:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    key = jax.random.PRNGKey(0)
    S = 8192
    a = jax.random.normal(key, (S, S), jnp.bfloat16)
    b = jax.random.normal(key, (S, S), jnp.bfloat16)

    def chain(x, bb):
        # 8 data-dependent dots per call amortize the ~1 ms tunnel dispatch
        for _ in range(8):
            x = jnp.dot(x, bb, preferred_element_type=jnp.bfloat16)
        return x

    f = jax.jit(chain)
    o = f(a, b)
    np.asarray(o.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(4):
        o = f(o, b)
    np.asarray(o.ravel()[:1])
    dt = (time.perf_counter() - t0) / 32
    tfs = 2 * S ** 3 / dt / 1e12
    return {"part": "ceiling", "S": S, "tflops": round(tfs, 1),
            "pct_spec_peak": round(100 * tfs / PEAK_TFLOPS, 1)}


# --------------------------------------------------------------------------
# part: bw — HBM stream bandwidth (fresh process)
# --------------------------------------------------------------------------

def run_bw() -> dict:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    nbytes = 512 * 1024 * 1024
    x = jnp.ones((nbytes // 2,), jnp.bfloat16)
    f = jax.jit(lambda a: a + jnp.bfloat16(1))
    out = f(x)
    np.asarray(out[:1])
    t0 = time.perf_counter()
    it = 8
    for _ in range(it):
        out = f(out)
    np.asarray(out[:1])
    dt = (time.perf_counter() - t0) / it
    return {"part": "bw", "stream_gbs": round(2 * nbytes / dt / 1e9, 1),
            "note": "read+write of 512 MB inside one jit (a+1)"}


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

def _sub(args: list) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(f"subprocess {args[:2]} FAILED\n{out.stderr[-2000:]}",
              file=sys.stderr, flush=True)
        return {}
    return json.loads(lines[-1])


def run_all(batch: int, policy: str) -> None:
    hlo = _sub(["--part", "hlo", "--policy", policy, str(batch)])
    print(f"hlo: {len(hlo.get('dot_shapes', []))} distinct dot shapes, "
          f"inventory {hlo.get('inventory_dot_flops', 0)/1e12:.2f} TF vs "
          f"cost_analysis {hlo.get('cost_analysis_flops', 0)/1e12:.2f} TF "
          f"(cost_analysis counts while bodies ONCE)", flush=True)
    stacks = _sub(["--part", "stacks", str(batch)])
    ceiling = _sub(["--part", "ceiling"])
    bw = _sub(["--part", "bw"])
    fwdbwd = _sub(["--part", "fwdbwd_wall", "--policy", policy, str(batch)])

    wall = fwdbwd.get("ms", 0)
    block = stacks.get("block", {})
    report = {
        "batch": batch, "policy": policy,
        "measured_fwdbwd_ms": wall,
        "block_stack_fwdbwd_ms": block.get("fwdbwd_ms"),
        "residual_vs_block_stack_ms": (
            round(wall - block["fwdbwd_ms"], 2)
            if block.get("fwdbwd_ms") else None),
        "realized_matmul_ceiling_tfs": ceiling.get("tflops"),
        "realized_matmul_ceiling_pct_spec": ceiling.get("pct_spec_peak"),
        "stream_gbs": bw.get("stream_gbs"),
        "component_stacks": {k: v for k, v in stacks.items()
                             if k not in ("part", "batch")},
        "hlo": {k: v for k, v in hlo.items() if k != "part"},
    }
    out_path = os.path.join(REPO, "docs/bench/onchip/bwd_op_profile.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    summary = {"measured_fwdbwd_ms": wall, "stream_gbs": bw.get("stream_gbs")}
    for name, rec in report["component_stacks"].items():
        summary[name] = (f"fwd {rec['fwd_tfs']} TF/s, bwd {rec['bwd_tfs']} "
                         f"TF/s ({rec['bwd_over_fwd_rate']:.2f}x fwd rate)")
    print(json.dumps(summary), flush=True)
    print(f"full table -> {out_path}", flush=True)


def run_fwdbwd_wall(batch: int, policy: str) -> dict:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bench_train_attrib import run_part

    rec = run_part("fwdbwd", batch, policy)
    return {"part": "fwdbwd_wall", "ms": rec["ms"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=("hlo", "dots", "stacks", "attn", "bw",
                                       "ceiling", "fwdbwd_wall"))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--policy", choices=("nothing", "dots"), default="dots")
    ap.add_argument("--shapes", help="json list (for --part dots)")
    ap.add_argument("batch", nargs="?", type=int, default=16)
    args = ap.parse_args()

    if args.all:
        run_all(args.batch, args.policy)
        return
    if args.part == "hlo":
        rec = run_hlo(args.batch, args.policy)
    elif args.part == "dots":
        rec = run_dots(args.shapes)
    elif args.part == "stacks":
        rec = run_stacks(args.batch)
    elif args.part == "ceiling":
        rec = run_ceiling()
    elif args.part == "attn":
        rec = run_attn(args.batch)
    elif args.part == "bw":
        rec = run_bw()
    elif args.part == "fwdbwd_wall":
        rec = run_fwdbwd_wall(args.batch, args.policy)
    else:
        raise SystemExit("pass --part or --all")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
