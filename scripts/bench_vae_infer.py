"""Conv-VAE inference (tokenizer) throughput: encode / decode, fp32 vs bf16.

Measures wall time and XLA cost-analysis FLOPs in a FRESH process (see
CLAUDE.md: measurements after big jit builds are inflated by memory
pressure). Decode dominates (the f16d32 decoder is ~4x the encoder FLOPs).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_vae_infer.py [batch] [dtype] [ckpt]
  dtype: fp32 (default) | bf16
  ckpt:  optional f16d32 VAE checkpoint (.pt/.ckpt/.safetensors) — with
         dtype=bf16 the posterior-deviation gauge then measures the TRAINED
         model. Random init understates the ratio (random logvar is O(1);
         a trained kl_weight=1e-6 posterior is much tighter), so validate
         --dtype bf16 extraction against real weights before production use.
"""
from __future__ import annotations

import sys
import time

import vavae_tpu.utils.jax_cache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.models.vae import AutoencoderKL


def timeit(fn, *args, iters=10, settle=3):
    for _ in range(settle):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def flops(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") else jnp.float32
    peak = 197e12  # v5e bf16 peak

    vae = AutoencoderKL(embed_dim=32, ch=128, ch_mult=(1, 1, 2, 2, 4),
                        resolution=256, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    if len(sys.argv) > 3:
        # trained weights via the tokenizer facade's loader (same f16d32 arch)
        from vavae_tpu.tokenizer import VA_VAE

        # device_put BEFORE timing: the loader returns host numpy leaves, and
        # host-resident jit args are re-uploaded (~280 MB) on EVERY call —
        # round-3's battery recorded 3.3 img/s for a 844 img/s model this way
        params = jax.device_put(VA_VAE(None, ckpt_path=sys.argv[3]).params)
        print(f"loaded checkpoint {sys.argv[3]}", flush=True)
    else:
        params = vae.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), sample=False)["params"]
    x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32, -1, 1)
    z = jax.random.normal(rng, (batch, 16, 16, 32), jnp.float32)

    enc = jax.jit(lambda p, x: vae.apply({"params": p}, x, method=AutoencoderKL.encode).mean)
    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=AutoencoderKL.decode))

    for name, fn, arg in (("encode", enc, x), ("decode", dec, z)):
        t = timeit(fn, params, arg)
        fl = flops(fn, params, arg)
        print(
            f"{name} B={batch} {jnp.dtype(dtype).name}: {t:7.1f} ms  "
            f"{batch / t * 1e3:7.1f} img/s  {fl / 1e9:8.1f} GFLOP  "
            f"{fl / (t / 1e3) / peak * 100:5.1f}% of bf16 peak",
            flush=True,
        )

    if dtype == jnp.bfloat16:
        # quality gauge for --dtype bf16 extraction: how far the bf16-compute
        # posterior mean strays from fp32, against the posterior's OWN
        # sampling std (extraction draws posterior.sample, so deviation far
        # below the injected noise is statistically invisible downstream)
        vae32 = AutoencoderKL(embed_dim=32, ch=128, ch_mult=(1, 1, 2, 2, 4),
                              resolution=256, dtype=jnp.float32)
        post32 = jax.jit(lambda p, x: vae32.apply({"params": p}, x, method=AutoencoderKL.encode))(params, x)
        post16 = jax.jit(lambda p, x: vae.apply({"params": p}, x, method=AutoencoderKL.encode))(params, x)
        m32, m16 = np.asarray(post32.mean, np.float32), np.asarray(post16.mean, np.float32)
        std32 = np.exp(0.5 * np.asarray(post32.logvar, np.float32))
        dev = m16 - m32
        rel = np.linalg.norm(dev) / np.linalg.norm(m32)
        ratio = np.sqrt(np.mean(dev**2)) / np.sqrt(np.mean(std32**2))
        print(f"bf16 posterior-mean deviation: rel-L2 {rel:.2%}, "
              f"rms(dev)/rms(posterior std) {ratio:.3f}", flush=True)


if __name__ == "__main__":
    main()
