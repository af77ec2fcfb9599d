"""DiT training pipeline (entry point).

Parity target: LightningDiT/train.py:38-327 (throughput-logged hot loop,
EMA every step, periodic checkpoint+validation) merged with the small-data
additions of train_dit_s_official.py:52-523 (config EMA decay, val-loss
early stopping with patience, resume).

Run:  python -m vavae_tpu.pipelines.train_dit --config configs/xxx.yaml
All reference YAML keys are honored (data/vae/model/train/optimizer/
transport sections).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from glob import glob

import jax
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.data.latent_dataset import ImgLatentDataset
from vavae_tpu.models.dit import create_dit
from vavae_tpu.parallel.mesh import make_mesh, multihost_init
from vavae_tpu.train import checkpoint as ckpt_lib
from vavae_tpu.train.dit_trainer import DiTTrainer, TrainState
from vavae_tpu.transport import create_transport
from vavae_tpu.utils.config import Config, load_config
from vavae_tpu.utils.torch_convert import dit_params_from_torch


def create_logger(log_dir: str | None = None) -> logging.Logger:
    logger = logging.getLogger("vavae_tpu")
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter("[%(asctime)s] %(message)s", "%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir and jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def build_transport(cfg: Config):
    t = cfg.transport
    return create_transport(
        t.get("path_type", "Linear"),
        t.get("prediction", "velocity"),
        t.get("loss_weight"),
        t.get("train_eps"),
        t.get("sample_eps"),
        use_cosine_loss=t.get("use_cosine_loss", False),
        use_lognorm=t.get("use_lognorm", False),
        partial_train=t.get("partitial_train"),  # reference key spelling
        partial_ratio=t.get("partial_ratio", 1.0),
        shift_lg=t.get("shift_lg", False),
    )


def do_train(cfg: Config) -> TrainState:
    multihost_init()
    mesh = make_mesh()

    exp_dir = os.path.join(cfg.train.output_dir, cfg.train.get("exp_name") or "exp")
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    logger = create_logger(exp_dir)

    downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
    latent_size = cfg.data.image_size // downsample
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)
    transport = build_transport(cfg)

    opt_cfg = cfg.get("optimizer", Config())
    trainer = DiTTrainer(
        model,
        transport,
        mesh,
        lr=opt_cfg.get("lr", 2e-4),
        beta2=opt_cfg.get("beta2", 0.95),
        weight_decay=opt_cfg.get("weight_decay", 0.0),
        max_grad_norm=opt_cfg.get("max_grad_norm"),
        ema_decay=cfg.train.get("ema_decay", 0.9999),
    )

    dataset = ImgLatentDataset(
        cfg.data.data_path,
        latent_norm=cfg.data.get("latent_norm", False),
        latent_multiplier=cfg.data.get("latent_multiplier", 0.18215),
    )
    valid_dataset = None
    if cfg.data.get("valid_path"):
        valid_dataset = ImgLatentDataset(
            cfg.data.valid_path,
            latent_norm=cfg.data.get("latent_norm", False),
            latent_multiplier=cfg.data.get("latent_multiplier", 0.18215),
        )

    global_bs = cfg.train.global_batch_size
    per_proc_bs = global_bs // jax.process_count()
    C = model.in_channels
    rng = jax.random.PRNGKey(cfg.train.get("global_seed", 0))

    state = trainer.init_state(rng, (global_bs, latent_size, latent_size, C))

    # optional pretrained weights (reference 'weight_init'/'ckpt' keys)
    init_path = cfg.train.get("weight_init") or cfg.train.get("ckpt")
    if init_path and os.path.exists(str(init_path)):
        if str(init_path).endswith((".msgpack", ".safetensors")):
            state = ckpt_lib.restore_checkpoint(str(init_path), state)
            logger.info(f"restored checkpoint weights from {init_path}")
        else:
            sd = ckpt_lib.load_torch_dit_checkpoint(str(init_path))
            params = jax.tree_util.tree_map(
                np.asarray,
                dit_params_from_torch(
                    sd,
                    model.depth,
                    use_swiglu=model.use_swiglu,
                    use_rmsnorm=model.use_rmsnorm,
                    rope_heads=model.num_heads if model.use_rope else 0,
                ),
            )
            # distinct copies — params/ema sharing buffers breaks state
            # donation in the jitted step
            state = state.replace(
                params=params,
                ema_params=jax.tree_util.tree_map(np.copy, params),
            )
            logger.info(f"converted torch weights from {init_path}")

    # resume from latest step-numbered checkpoint
    if cfg.train.get("resume", True):
        latest = ckpt_lib.latest_checkpoint(ckpt_dir)
        if latest:
            state = ckpt_lib.restore_checkpoint(latest, state)
            logger.info(f"resumed from {latest} at step {int(state.step)}")

    state = trainer.replicate(state)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    logger.info(f"LightningDiT parameters: {n_params / 1e6:.2f}M")
    logger.info(f"dataset: {len(dataset):,} latents; global batch {global_bs}")

    from vavae_tpu.utils.metrics_logger import MetricsLogger

    metrics_log = MetricsLogger(os.path.join(exp_dir, "tb"))
    metrics_log.log_text("config", str(cfg.to_dict()))

    log_every = cfg.train.get("log_every", 100)
    ckpt_every = cfg.train.get("ckpt_every", 20000)
    max_steps = cfg.train.max_steps
    patience = cfg.train.get("early_stopping_patience")
    best_val, bad_evals = float("inf"), 0

    it = dataset.batches(
        per_proc_bs,
        seed=cfg.train.get("global_seed", 0),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    from vavae_tpu.utils.preemption import PreemptionGuard

    running, log_steps, t_start = 0.0, 0, time.time()
    step = int(jax.device_get(state.step))
    guard = PreemptionGuard().__enter__()
    while step < max_steps:
        if guard.should_stop:
            # preemption (SIGTERM): checkpoint the in-flight state and exit
            # cleanly so the relaunch resumes here instead of at ckpt_every
            ckpt_lib.save_checkpoint(ckpt_dir, step, jax.device_get(state), cfg.to_dict())
            logger.info(f"preempted: checkpointed at step {step}, exiting")
            break
        batch = trainer.shard_batch(next(it))
        state, metrics = trainer.train_step(state, rng, batch)
        step += 1
        running += float(jax.device_get(metrics["loss"]))
        log_steps += 1

        if step % log_every == 0:
            jax.block_until_ready(state.params)
            dt = time.time() - t_start
            sps = log_steps / dt
            logger.info(
                f"(step={step:07d}) Train Loss: {running / log_steps:.4f}, "
                f"Train Steps/Sec: {sps:.2f}, Img/Sec: {sps * global_bs:.1f}"
            )
            metrics_log.log_scalars(
                step,
                {"train/loss": running / log_steps, "train/steps_per_sec": sps,
                 "train/grad_norm": float(jax.device_get(metrics["grad_norm"]))},
            )
            running, log_steps, t_start = 0.0, 0, time.time()

        sample_every = cfg.train.get("sample_every")
        if sample_every and step % sample_every == 0:
            # in-training EMA sampling (reference train_dit_s_official.py:557-660)
            _sample_grid(cfg, trainer, state, exp_dir, step, logger)

        if step % ckpt_every == 0 and step > 0:
            ckpt_lib.save_checkpoint(ckpt_dir, step, jax.device_get(state), cfg.to_dict())
            logger.info(f"saved checkpoint at step {step}")
            if valid_dataset is not None:
                val = evaluate(trainer, state, valid_dataset, per_proc_bs, rng)
                logger.info(f"(step={step:07d}) Validation Loss: {val:.4f}")
                metrics_log.log_scalars(step, {"val/loss": val})
                if patience:
                    if val < best_val - 1e-6:
                        best_val, bad_evals = val, 0
                        ckpt_lib.save_checkpoint(
                            os.path.join(exp_dir, "best"), step, jax.device_get(state)
                        )
                    else:
                        bad_evals += 1
                        if bad_evals >= patience:
                            logger.info(f"early stopping at step {step}")
                            break

    guard.__exit__()
    ckpt_lib.save_checkpoint(ckpt_dir, step, jax.device_get(state), cfg.to_dict())
    metrics_log.close()
    logger.info("training done")
    return state


def _sample_grid(cfg, trainer, state, exp_dir, step, logger, n: int = 8):
    """Sample a small grid with the EMA weights mid-training; decodes through
    the VAE when configured, else saves raw latents (.npy)."""
    import jax.numpy as jnp

    from vavae_tpu.pipelines.sample import build_sample_fn

    try:
        ema = jax.device_get(state.ema_params)
        generate = build_sample_fn(cfg, trainer.model, ema)
        labels = jnp.arange(n, dtype=jnp.int32) % cfg.data.num_classes
        lat = np.asarray(generate(jax.random.PRNGKey(step), labels))
        out_dir = os.path.join(exp_dir, "train_samples")
        os.makedirs(out_dir, exist_ok=True)
        vae_ckpt = cfg.get("vae", {}).get("ckpt_path")
        if vae_ckpt and os.path.exists(str(vae_ckpt)):
            from vavae_tpu.tokenizer import VA_VAE
            from vavae_tpu.utils.image_grid import save_image_grid

            vae = VA_VAE(cfg.get("vae", {}).get("config"), ckpt_path=vae_ckpt,
                         img_size=cfg.data.image_size)
            imgs = vae.decode_to_images(jnp.asarray(lat))
            save_image_grid(imgs, os.path.join(out_dir, f"step{step:07d}.png"))
        else:
            np.save(os.path.join(out_dir, f"step{step:07d}_latents.npy"), lat)
        logger.info(f"(step={step:07d}) wrote training samples")
    except Exception as e:  # sampling must never kill a training run
        logger.info(f"in-training sampling failed: {e}")


def evaluate(trainer, state, dataset, batch_size, rng, max_batches: int = 50) -> float:
    losses = []
    it = dataset.batches(
        batch_size,
        shuffle=False,
        epochs=1,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    for i, batch in enumerate(it):
        if i >= max_batches:
            break
        m = trainer.eval_step(state, rng, trainer.shard_batch(batch))
        losses.append(float(jax.device_get(m["val_loss"])))
    return float(np.mean(losses)) if losses else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = ap.parse_args()
    cfg = load_config(args.config, overrides=args.overrides)
    do_train(cfg)


if __name__ == "__main__":
    main()
