"""Conv roofline probe for the VA-VAE train step (VERDICT r1 weak #8).

The full GAN+VF step measures ~89 TFLOP/s effective fp32 (45% of v5e's
197 TFLOP/s bf16 peak). Is that a hard ceiling set by XLA's conv kernels
at the VAE's shapes, or is step orchestration leaving MXU idle? This
fresh-process microbench times, at the VAE's dominant shapes:

  - a big matmul (peak sanity),
  - each hot 3×3 conv fwd and fwd+bwd,
  - the conv with GroupNorm+swish prologue (fusion overhead probe),

and prints effective TFLOP/s per item. One jit per measurement, fetched
values, 3 settle steps (CLAUDE.md benchmarking rules).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_conv_roofline.py [fp32|bf16]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import vavae_tpu.utils.jax_cache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, settle=3):
    # fns must return SCALARS (device-side reduce): fetching a big output
    # through the tunnel measures transfer, not compute
    out = None
    for _ in range(settle):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    dtype = jnp.float32 if (len(sys.argv) < 2 or sys.argv[1] == "fp32") else jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    print(f"dtype={dtype.__name__}, backend={jax.default_backend()}", flush=True)

    # -- matmul peak sanity --------------------------------------------------
    n = 8192
    a = jax.random.normal(rng, (n, n), dtype)
    b = jax.random.normal(rng, (n, n), dtype)
    mm = jax.jit(lambda a, b: jnp.sum((a @ b) * a))  # reduce on device
    t = timeit(mm, a, b)
    print(f"matmul {n}^3: {2 * n**3 / t / 1e12:7.1f} TFLOP/s  ({t*1e3:.2f} ms)",
          flush=True)

    # -- VAE hot conv shapes (B=8, f16d32 enc/dec levels) -------------------
    B = 8
    shapes = [
        (256, 128, 128),  # level-1 enc/dec blocks (ch=128)
        (128, 128, 128),
        (64, 256, 256),
        (32, 256, 256),
        (16, 512, 512),
    ]
    # chain R convs inside ONE jit (data-dependent, no CSE) so the ~2.5 ms
    # per-call tunnel round-trip amortizes away on small shapes
    R = 16
    for hw, cin, cout in shapes:
        assert cin == cout
        x = jax.random.normal(rng, (B, hw, hw, cin), dtype)
        k = jax.random.normal(rng, (3, 3, cin, cout), dtype) * 0.02

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def chain(x, k):
            def body(y, _):
                return conv(y, k) + y * 0.1, None  # residual keeps scale sane

            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        flops = 2 * B * hw * hw * 9 * cin * cout * R
        t = timeit(jax.jit(lambda x, k: jnp.sum(chain(x, k))), x, k)
        eff_f = flops / t / 1e12

        def loss(k, x):
            return jnp.sum(jnp.square(chain(x, k)))

        g = jax.jit(lambda k, x: jax.tree_util.tree_map(
            jnp.sum, jax.grad(loss, argnums=(0, 1))(k, x)
        ))
        t2 = timeit(g, k, x)
        eff_b = 3 * flops / t2 / 1e12  # dk + dx ≈ 2× fwd FLOPs, + fwd

        def gn_swish_chain(x, k, scale, bias):
            def body(y, _):
                yg = y.reshape(B, hw, hw, 32, cin // 32)
                mu = jnp.mean(yg, axis=(1, 2, 4), keepdims=True)
                var = jnp.mean(jnp.square(yg - mu), axis=(1, 2, 4), keepdims=True)
                yn = ((yg - mu) / jnp.sqrt(var + 1e-6)).reshape(y.shape)
                yn = yn * scale + bias
                yn = yn * jax.nn.sigmoid(yn)
                return conv(yn, k) + y * 0.1, None

            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        scale = jnp.ones((cin,), dtype)
        bias = jnp.zeros((cin,), dtype)
        t3 = timeit(
            jax.jit(lambda x, k, s, b: jnp.sum(gn_swish_chain(x, k, s, b))),
            x, k, scale, bias,
        )
        eff_g = flops / t3 / 1e12
        print(
            f"conv {hw}x{hw}x{cin}->{cout} (x{R}): fwd {eff_f:6.1f} TF/s ({t*1e3:6.2f} ms)"
            f" | fwd+bwd {eff_b:6.1f} TF/s ({t2*1e3:6.2f} ms)"
            f" | gn+swish+conv {eff_g:6.1f} TF/s ({t3*1e3:6.2f} ms,"
            f" +{(t3-t)/t*100:4.0f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
