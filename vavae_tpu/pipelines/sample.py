"""Sampling pipeline: CFG ODE sampling → VAE decode → PNG folder (+FID).

Parity target: LightningDiT/inference.py:27-296 — EMA weights preferred,
euler/dopri5 ODE with timestep shift, CFG with interval gating, latent
un-normalization (x·σ/multiplier + μ), rank-interleaved PNG naming, demo
grid mode, and the final FID against a reference npz.

TPU-native: the entire 250-step CFG trajectory is one jitted program; batch
generation loops only on the host for PNG writes.
"""
from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.data.latent_dataset import ImgLatentDataset
from vavae_tpu.models.dit import create_dit
from vavae_tpu.parallel.mesh import make_mesh, multihost_init
from vavae_tpu.tokenizer import VA_VAE
from vavae_tpu.train import checkpoint as ckpt_lib
from vavae_tpu.train.dit_trainer import TrainState
from vavae_tpu.transport import Sampler
from vavae_tpu.utils.config import Config, load_config
from vavae_tpu.utils.torch_convert import dit_params_from_torch
from vavae_tpu.pipelines.train_dit import build_transport, create_logger


def load_dit_params(cfg: Config, model, ckpt_path: str, prefer_ema: bool = True):
    """EMA-preferred load from torch .pt or our checkpoints (inference.py:88-91)."""
    if str(ckpt_path).endswith((".msgpack", ".safetensors")):
        import jax

        dummy = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, model.input_size, model.input_size, model.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1,), jnp.int32),
            )["params"]
        )
        zeros = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), dummy)
        state = TrainState(step=np.zeros((), np.int32), params=zeros,
                           ema_params=zeros, opt_state=None)
        # restore only params/ema from a full train checkpoint
        restored = ckpt_lib.restore_checkpoint(ckpt_path, state)
        return restored.ema_params if prefer_ema else restored.params
    sd = ckpt_lib.load_torch_dit_checkpoint(ckpt_path, prefer_ema=prefer_ema)
    return jax.tree_util.tree_map(
        jnp.asarray,
        dit_params_from_torch(
            sd, model.depth, use_swiglu=model.use_swiglu,
            use_rmsnorm=model.use_rmsnorm,
            rope_heads=model.num_heads if model.use_rope else 0,
        ),
    )


def build_sample_fn(cfg: Config, model, params, latent_stats=None, mesh=None,
                    hold_params: bool = True):
    """Returns jitted fn(rng, labels) -> decoded-ready latents (B, h, w, C).

    With ``mesh`` the batch shards over the data axis across all local
    devices (params replicated) — on a v5e-8 host one call drives all 8
    chips; without it everything runs on the default device.

    ``hold_params=False`` skips placing/closing over ``params`` entirely:
    callers that only ever use the param-explicit ``wrapper.jit_fn`` handle
    (in-training EMA sampling) would otherwise pin a dead full-model copy
    in HBM for the rest of training."""
    sc = cfg.sample
    transport = build_transport(cfg)
    sampler = Sampler(transport)
    use_cfg = sc.get("cfg_scale", 1.0) > 1.0
    num_classes = cfg.data.num_classes
    # CFG null label. Default = num_classes, the row class-dropout actually
    # trains (LabelEmbedder allocates num_classes+1 rows, lightningdit.py
    # token_drop). The reference's micro-Doppler inference instead passes
    # y_null = num_classes-1 (generate_and_filter_samples.py:322 uses 31
    # with num_classes 32 = "31 users + null") — an UNTRAINED row, since its
    # own training dropout targets row 32. Set sample.null_class to
    # reproduce that quirk bit-for-bit with converted checkpoints.
    null_class = sc.get("null_class", num_classes)

    mode = sc.get("mode", "ODE")
    if mode.upper() == "ODE":
        sample_fn = sampler.sample_ode(
            sampling_method=sc.get("sampling_method", "euler"),
            num_steps=sc.get("num_sampling_steps", 250),
            atol=sc.get("atol", 1e-6),
            rtol=sc.get("rtol", 1e-3),
            # dopri5 step budget: on a stiff field at tight rtol, exhaustion
            # silently returns a partially-integrated state — raise this if
            # the controller stats (return_stats) show it being hit
            max_steps=sc.get("dopri5_max_steps", 1000),
            reverse=sc.get("reverse", False),
            timestep_shift=sc.get("timestep_shift", 0.0),
        )
    else:
        sde_fn = sampler.sample_sde(
            sampling_method=sc.get("sampling_method", "Euler"),
            diffusion_form=sc.get("diffusion_form", "sigma"),
            diffusion_norm=sc.get("diffusion_norm", 1.0),
            last_step=sc.get("last_step", "Mean"),
            last_step_size=sc.get("last_step_size", 0.04),
            num_steps=sc.get("num_sampling_steps", 250),
        )

    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    C = model.in_channels

    if latent_stats is not None:
        mean = jnp.asarray(latent_stats[0].reshape(1, 1, 1, -1))  # (1,C,1,1)→NHWC
        std = jnp.asarray(latent_stats[1].reshape(1, 1, 1, -1))
    else:
        mean, std = jnp.zeros((1, 1, 1, C)), jnp.ones((1, 1, 1, C))
    multiplier = cfg.data.get("latent_multiplier", 1.0)

    # CFG-interval split: run the below-interval phase with the conditional
    # model at half batch (numerically identical for euler; ~15% fewer
    # FLOPs). heun and dopri5 ride the same split program (the per-STEP
    # phase boundary is the natural generalization of the reference's
    # per-eval gate, lightningdit.py:436-439).
    interval_start = sc.get("cfg_interval_start", 0.0)
    method = sc.get("sampling_method", "euler").lower()
    use_split_cfg = (
        use_cfg
        and mode.upper() == "ODE"
        and method in ("euler", "heun", "dopri5")
        and interval_start > 0.0
    )
    is_split_euler = use_split_cfg and method == "euler"
    # euler-only acceleration knobs that a non-euler (or non-split) program
    # silently ignores — warn by NAME so a config combining e.g. dopri5 with
    # multistep_order: 3 doesn't quietly run plain dopri5
    _euler_only = {
        "velocity_cache_interval": sc.get("velocity_cache_interval", 1) > 1,
        "velocity_cache_adaptive": bool(sc.get("velocity_cache_adaptive", False)),
        "multistep_order": sc.get("multistep_order", 1) > 1,
    }
    if any(_euler_only.values()) and not is_split_euler:
        import warnings

        warnings.warn(
            f"sample.{'/'.join(k for k, v in _euler_only.items() if v)} "
            "only applies on the split-CFG euler path (cfg_scale > 1, mode "
            "ODE, sampling_method euler, cfg_interval_start > 0) — sampling "
            f"will run plain {method} with no acceleration.",
            stacklevel=2,
        )
    if use_split_cfg:
        euler_knobs = (
            dict(
                # opt-in training-free acceleration: reuse the velocity
                # between model evaluations (1 = exact; 2-4 trade small
                # quality for FLOPs)
                cache_interval=sc.get("velocity_cache_interval", 1),
                # 1 = linear forecast from the last two evals (default; same
                # cost, lower error), 0 = hold the last velocity
                cache_order=sc.get("velocity_cache_order", 1),
                # >1 switches the integrator to Adams-Bashforth of that
                # order: an EXACT-solver acceleration — same per-step cost,
                # O(h^order) accuracy (BASELINE.md testbed matrix)
                multistep_order=sc.get("multistep_order", 1),
                # error-CONTROLLED cache interval (round-4): the realized
                # forecast error at each model eval drives the next gap
                # toward velocity_cache_tol, capped at
                # velocity_cache_max_interval — see odeint_euler_cached_adaptive
                cache_adaptive=bool(sc.get("velocity_cache_adaptive", False)),
                cache_tol=sc.get("velocity_cache_tol", 0.02),
                cache_max_interval=sc.get("velocity_cache_max_interval", 8),
            )
            if is_split_euler
            else {}
        )
        cfg_sample_fn = sampler.sample_ode_cfg(
            num_steps=sc.get("num_sampling_steps", 250),
            timestep_shift=sc.get("timestep_shift", 0.0),
            cfg_interval_start=interval_start,
            reverse=sc.get("reverse", False),
            sampling_method=method,
            rtol=sc.get("rtol", 1e-3),
            atol=sc.get("atol", 1e-6),
            max_steps=sc.get("dopri5_max_steps", 1000),
            **euler_knobs,
        )

    is_sde = mode.upper() != "ODE"

    def generate(p, rng, labels):
        # p rides as a jit ARGUMENT: closing over the param tree would embed
        # it into the module as inline constants (675M params ≈ GBs of
        # literals), exploding trace+compile time.
        B = labels.shape[0]
        rng, z_rng = jax.random.split(rng)
        z = jax.random.normal(z_rng, (B, latent_size, latent_size, C), jnp.float32)
        if use_cfg:
            y_in = jnp.concatenate(
                [labels, jnp.full((B,), null_class, labels.dtype)]
            )

            def model_fn(x, t):
                return model.forward_with_cfg(
                    p,
                    x,
                    t,
                    y_in,
                    sc.get("cfg_scale", 1.0),
                    cfg_interval=not use_split_cfg,
                    cfg_interval_start=interval_start,
                    cfg_channels=sc.get("cfg_channels"),
                )

            if use_split_cfg:
                def model_cond_fn(x, t):
                    return model.apply({"params": p}, x, t, labels)

                samples = cfg_sample_fn(z, model_cond_fn, model_fn)
            else:
                z_in = jnp.concatenate([z, z], axis=0)
                if is_sde:
                    samples = sde_fn(rng, z_in, model_fn)[:B]
                else:
                    samples = sample_fn(z_in, model_fn)[:B]
        else:

            def model_fn(x, t):
                return model.apply({"params": p}, x, t, labels)

            samples = sde_fn(rng, z, model_fn) if is_sde else sample_fn(z, model_fn)
        # un-normalize (inference.py:220)
        return samples * std / multiplier + mean

    if mesh is not None:
        from vavae_tpu.parallel.mesh import data_sharding, replicated

        rep = replicated(mesh)
        jit_generate = jax.jit(
            generate,
            in_shardings=(rep, rep, data_sharding(mesh, 1)),
            out_shardings=data_sharding(mesh, 4),
        )
    else:
        jit_generate = jax.jit(generate)
    if hold_params:
        held = jax.device_put(params, rep) if mesh is not None else jax.device_put(params)
        wrapper = lambda rng, labels: jit_generate(held, rng, labels)
    else:
        def wrapper(rng, labels):  # type: ignore[misc]
            raise ValueError(
                "built with hold_params=False — call wrapper.jit_fn(params, "
                "rng, labels) with explicit params"
            )
    # param-explicit handle for callers that swap weights without recompiling
    # (e.g. in-training EMA sampling)
    wrapper.jit_fn = jit_generate
    return wrapper


def load_latent_stats(cfg: Config):
    """De-normalization stats when ``data.latent_norm`` is set, else None.

    Never silently samples without the stats the config asked for —
    wrongly-scaled latents decode to garbage after hours of chip time
    (inference.py reads the same stats from its latents_stats.pt). Shared
    by do_sample and apps/generate_and_filter."""
    if not cfg.data.get("latent_norm", False):
        return None
    data_path = cfg.data.get("data_path")
    if not data_path or not os.path.isdir(data_path):
        raise FileNotFoundError(
            f"latent_norm: true but data.data_path is not a directory: "
            f"{data_path!r} — point it at the extracted-latents "
            "dump (pipelines.extract_features) that holds the stats "
            "cache, or set data.latent_norm: false"
        )
    return ImgLatentDataset(data_path, latent_norm=True).latent_stats


def do_sample(cfg: Config, demo: bool = False) -> str:
    multihost_init()
    logger = create_logger()

    latent_stats = load_latent_stats(cfg)

    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)
    params = load_dit_params(cfg, model, cfg.ckpt_path)

    vae = VA_VAE(
        cfg.get("vae", {}).get("config"),
        ckpt_path=cfg.get("vae", {}).get("ckpt_path"),
        img_size=cfg.data.image_size,
    )
    # shard each batch over all local devices when it divides evenly
    # (on a v5e-8 host one call then drives all 8 chips)
    from vavae_tpu.parallel.mesh import local_mesh_if_divisible

    batch_for_run = (
        len(cfg.get("demo_labels", list(range(8)))) if demo
        else cfg.sample.get("per_proc_batch_size", 4)
    )
    generate = build_sample_fn(
        cfg, model, params, latent_stats,
        mesh=local_mesh_if_divisible(batch_for_run),
    )

    sc = cfg.sample
    exp_name = cfg.train.get("exp_name", "samples")
    folder = cfg.get(
        "sample_folder",
        os.path.join(cfg.train.get("output_dir", "output"), f"{exp_name}_samples"),
    )
    os.makedirs(folder, exist_ok=True)

    from PIL import Image

    rng = jax.random.PRNGKey(cfg.train.get("global_seed", 0) + jax.process_index())
    if demo:
        labels = jnp.asarray(
            cfg.get("demo_labels", list(range(8))), jnp.int32
        )
        lat = generate(rng, labels)
        imgs = vae.decode_to_images(lat)
        n = len(imgs)
        cols = min(4, n)
        rows = math.ceil(n / cols)
        S = imgs.shape[1]
        grid = np.zeros((rows * S, cols * S, 3), np.uint8)
        for i, im in enumerate(imgs):
            r, c = divmod(i, cols)
            grid[r * S : (r + 1) * S, c * S : (c + 1) * S] = im
        out = os.path.join(folder, "demo_grid.png")
        Image.fromarray(grid).save(out)
        logger.info(f"saved demo grid to {out}")
        return folder

    per_batch = sc.get("per_proc_batch_size", 4)
    fid_num = sc.get("fid_num", 50000)
    n_proc = jax.process_count()
    total = int(math.ceil(fid_num / (per_batch * n_proc))) * per_batch * n_proc
    iters = total // (per_batch * n_proc)
    logger.info(f"sampling {total} images ({iters} iters × {per_batch}/proc)")
    idx = jax.process_index()
    from vavae_tpu.utils.png_native import write_pngs

    for i in range(iters):
        rng, lrng, srng = jax.random.split(rng, 3)
        labels = jax.random.randint(lrng, (per_batch,), 0, cfg.data.num_classes)
        lat = generate(srng, labels)
        imgs = vae.decode_to_images(lat)
        # threaded native PNG dump (PIL fallback) — rank-interleaved naming
        # matching the reference (inference.py:224-226)
        base = (i * n_proc + idx) * per_batch
        paths = [os.path.join(folder, f"{base + j:06d}.png") for j in range(len(imgs))]
        write_pngs(imgs, paths)
        if (i + 1) % 50 == 0:
            logger.info(f"{(i + 1) * per_batch} images done on proc {idx}")
    return folder


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, overrides=args.overrides)
    folder = do_sample(cfg, demo=args.demo)
    if not args.demo and cfg.data.get("fid_reference_file") and jax.process_index() == 0:
        from vavae_tpu.eval.fid import fid_folder_vs_npz

        score = fid_folder_vs_npz(folder, cfg.data.fid_reference_file)
        print(f"FID: {score:.4f}")


if __name__ == "__main__":
    main()
