"""Profile the VA-VAE GAN+VF training step: where does the time go?

Times the full jitted step (VAE fwd, LPIPS, DINOv2 VF features, PatchGAN
disc, adaptive-weight VJPs, both optimizer updates) and ablations with each
big piece disabled, plus standalone forwards of the frozen nets, so the
attribution is measured rather than estimated.

Every point runs in a FRESH subprocess (CLAUDE.md rule: a process that has
already built big jits inflates later standalone measurements up to ~7x —
a 13 ms DINOv2 forward measured 90 ms after four trainer builds).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_vae_step.py [batch]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

TRAINER_POINTS = [
    ("full, frozen bf16", {}),
    ("full, frozen fp32", dict(frozen_bf16=False)),
    ("no vf", dict(use_vf=False)),
    ("no lpips", dict(use_lpips=False)),
    ("no disc", dict(disc_factor=0.0)),
]
STANDALONE_POINTS = ["dino", "lpips", "vae_fwd", "vae_fwd_bwd"]


def timeit(fn, *args, iters=10, settle=3):
    import jax
    import numpy as np

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
    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.lpips import LPIPS
    from vavae_tpu.models.vae import AutoencoderKL
    from vavae_tpu.models.vit import FoundationModel
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.vae_loss import VAELossConfig
    from vavae_tpu.train.vae_trainer import VAETrainer

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


def run_point(point: str, batch: int) -> None:
    """Measure ONE point in this (fresh) process and print its line."""
    import vavae_tpu.utils.jax_cache  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (batch, 256, 256, 3), jnp.float32, -1, 1)

    for name, kw in TRAINER_POINTS:
        if name != point:
            continue
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
        print(f"{name:24s} {t:8.1f} ms/step   {batch / t * 1e3:6.1f} img/s", flush=True)
        return

    if point == "dino":
        from vavae_tpu.models.vit import FoundationModel

        fm = FoundationModel(kind="dinov2").init_random(jax.random.PRNGKey(0))
        fn = jax.jit(fm.feature_fn_p())
        t = timeit(fn, fm.params, x)
        print(f"{'dino fwd alone':24s} {t:8.1f} ms", flush=True)
        return
    if point == "lpips":
        from vavae_tpu.models.lpips import LPIPS

        lp = LPIPS()
        lp_vars = lp.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
        )
        lpf = jax.jit(lambda v, a, b: lp.apply(v, a, b))
        t = timeit(lpf, lp_vars, x, x)
        print(f"{'lpips fwd alone':24s} {t:8.1f} ms", flush=True)
        return
    if point in ("vae_fwd", "vae_fwd_bwd"):
        from vavae_tpu.models.vae import AutoencoderKL

        vae = AutoencoderKL(embed_dim=32, ch=128, ch_mult=(1, 1, 2, 2, 4), resolution=256)
        vp = vae.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), sample=False
        )["params"]

        def recon_loss(p, xv):
            post = vae.apply({"params": p}, xv, method=AutoencoderKL.encode)
            dec = vae.apply({"params": p}, post.mean, method=AutoencoderKL.decode)
            return jnp.mean(jnp.abs(xv - dec))

        if point == "vae_fwd":
            t = timeit(jax.jit(recon_loss), vp, x)
            print(f"{'vae enc+dec fwd':24s} {t:8.1f} ms", flush=True)
        else:
            t = timeit(jax.jit(jax.grad(recon_loss)), vp, x)
            print(f"{'vae enc+dec fwd+bwd':24s} {t:8.1f} ms", flush=True)
        return
    raise SystemExit(f"unknown point {point!r}")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--point":
        run_point(sys.argv[2], int(sys.argv[3]))
        return
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    points = [name for name, _ in TRAINER_POINTS] + STANDALONE_POINTS
    for point in points:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--point", point, str(batch)],
            env=os.environ,
        )
        if r.returncode != 0:
            print(f"# point {point!r} failed (rc={r.returncode})", flush=True)


if __name__ == "__main__":
    main()
