"""Profile the VA-VAE GAN+VF training step: where does the time go?

Times the full jitted step (VAE fwd, LPIPS, DINOv2 VF features, PatchGAN
disc, adaptive-weight VJPs, both optimizer updates) and ablations with each
big piece disabled, plus standalone forwards of the frozen nets, so the
attribution is measured rather than estimated.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_vae_step.py [batch]
"""
from __future__ import annotations

import sys
import time

import vavae_tpu.utils.jax_cache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.models.lpips import LPIPS
from vavae_tpu.models.vit import FoundationModel
from vavae_tpu.parallel.mesh import make_mesh
from vavae_tpu.train.vae_loss import VAELossConfig
from vavae_tpu.train.vae_trainer import VAETrainer
from vavae_tpu.models.vae import AutoencoderKL


def timeit(fn, *args, iters=10, settle=3):
    for _ in range(settle):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # fetch a real array: block_until_ready alone can return early on the
    # tunneled axon backend (CLAUDE.md)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    np.asarray(jax.tree_util.tree_map(lambda x: x.reshape(-1)[0], leaves[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def build(batch, use_vf=True, use_lpips=True, disc_factor=1.0, frozen_bf16=True):
    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    fm = FoundationModel(kind="dinov2").init_random(rng) if use_vf else None
    if use_lpips:
        lp = LPIPS()
        lp_vars = lp.init(rng, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
        lpips_fn = lambda v, a, b: lp.apply(v, a, b)
    else:
        lp_vars, lpips_fn = None, None
    vae = AutoencoderKL(embed_dim=32, ch=128, ch_mult=(1, 1, 2, 2, 4), resolution=256)
    trainer = VAETrainer(
        vae,
        mesh,
        loss_cfg=VAELossConfig(disc_start=0, disc_factor=disc_factor),
        use_vf=use_vf,
        aux_feature_fn=fm.feature_fn_p() if fm else None,
        aux_params=fm.params if fm else None,
        lpips_fn=lpips_fn,
        lpips_params=lp_vars,
        frozen_bf16=frozen_bf16,
    )
    state = trainer.replicate(trainer.init_state(rng))
    return trainer, state


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32, -1, 1)

    results = {}

    for name, kw in [
        ("full, frozen bf16", {}),
        ("full, frozen fp32", dict(frozen_bf16=False)),
        ("no vf", dict(use_vf=False)),
        ("no lpips", dict(use_lpips=False)),
        ("no disc", dict(disc_factor=0.0)),
    ]:
        trainer, state = build(batch, **kw)
        # the step DONATES state: thread it through instead of reusing
        for _ in range(4):
            state, metrics = trainer.train_step(state, rng, x)
        np.asarray(metrics["total_loss"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, metrics = trainer.train_step(state, rng, x)
        np.asarray(metrics["total_loss"])
        t = (time.perf_counter() - t0) / iters * 1e3
        results[name] = t
        print(f"{name:24s} {t:8.1f} ms/step   {batch / t * 1e3:6.1f} img/s", flush=True)

    # standalone frozen forwards
    fm = FoundationModel(kind="dinov2").init_random(jax.random.PRNGKey(0))
    fn = jax.jit(fm.feature_fn_p())
    t = timeit(fn, fm.params, x)
    print(f"{'dino fwd alone':24s} {t:8.1f} ms")

    lp = LPIPS()
    lp_vars = lp.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    lpf = jax.jit(lambda v, a, b: lp.apply(v, a, b))
    t = timeit(lpf, lp_vars, x, x)
    print(f"{'lpips fwd alone':24s} {t:8.1f} ms")

    vae = AutoencoderKL(embed_dim=32, ch=128, ch_mult=(1, 1, 2, 2, 4), resolution=256)
    vp = vae.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), sample=False)["params"]

    def recon_loss(p, x):
        post = vae.apply({"params": p}, x, method=AutoencoderKL.encode)
        dec = vae.apply({"params": p}, post.mean, method=AutoencoderKL.decode)
        return jnp.mean(jnp.abs(x - dec))

    vfwd = jax.jit(recon_loss)
    t = timeit(vfwd, vp, x)
    print(f"{'vae enc+dec fwd':24s} {t:8.1f} ms")
    vgrad = jax.jit(jax.grad(recon_loss))
    t = timeit(vgrad, vp, x)
    print(f"{'vae enc+dec fwd+bwd':24s} {t:8.1f} ms")


if __name__ == "__main__":
    main()
