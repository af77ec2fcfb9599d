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


def load_weight_init(init_path: str, state: TrainState, model, logger) -> TrainState:
    """Pretrained WEIGHTS-ONLY init for a finetune run.

    Matches the reference loader's semantics (train_dit_s_official.py:525-554
    ``load_weights_with_shape_check``): model weights copy over (lenient —
    shape-mismatched leaves such as a different-num_classes label embedder
    keep the fresh init), while step, optimizer state and the LR schedule
    restart at zero and EMA re-seeds from the loaded params (the reference's
    post-load ``deepcopy(model)``). Resume, by contrast, restores the FULL
    state strictly (see do_train below)."""
    if init_path.endswith((".msgpack", ".safetensors")):
        restored = ckpt_lib.restore_checkpoint(
            init_path, state, lenient=init_path.endswith(".safetensors")
        )
        params = restored.params
        logger.info(f"restored checkpoint weights from {init_path}")
    else:
        sd = ckpt_lib.load_torch_dit_checkpoint(init_path)
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
        logger.info(f"converted torch weights from {init_path}")
    # cast to the fresh init's leaf dtypes: a bf16-params checkpoint would
    # otherwise seed a bf16 EMA, which update_ema rejects at decay 0.9999
    # (the 1e-4 increment underflows bf16 — train/ema.py), and silently
    # train in bf16 where the model was initialized f32.
    # Distinct copies — params/ema sharing buffers breaks state donation in
    # the jitted step.
    params = jax.tree_util.tree_map(
        lambda p, q: np.asarray(jax.device_get(p), dtype=q.dtype),
        params, jax.device_get(state.params),
    )
    return state.replace(
        params=params,
        ema_params=jax.tree_util.tree_map(
            lambda p: np.array(p, dtype=np.float32), params
        ),
    )


def do_train(cfg: Config) -> TrainState:
    multihost_init()
    par = cfg.get("parallel", Config())
    mesh = make_mesh(
        data=par.get("data", -1) if par.get("data", -1) > 0 else None,
        fsdp=par.get("fsdp", 1),
        tensor=par.get("tensor", 1),
    )

    exp_dir = os.path.join(cfg.train.output_dir, cfg.train.get("exp_name") or "exp")
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    logger = create_logger(exp_dir)

    downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
    latent_size = cfg.data.image_size // downsample
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)
    transport = build_transport(cfg)

    dataset = ImgLatentDataset(
        cfg.data.data_path,
        latent_norm=cfg.data.get("latent_norm", False),
        latent_multiplier=cfg.data.get("latent_multiplier", 0.18215),
    )

    global_bs = cfg.train.global_batch_size
    steps_per_epoch = max(len(dataset) // global_bs, 1)
    # step- or epoch-based run length (config_dit_base.yaml uses max_epochs)
    if cfg.train.get("max_epochs"):
        max_steps = int(cfg.train.max_epochs) * steps_per_epoch
    else:
        max_steps = cfg.train.max_steps

    opt_cfg = cfg.get("optimizer", Config())
    sched = cfg.get("scheduler", Config())
    sched_type = sched.get("type", "constant")
    trainer = DiTTrainer(
        model,
        transport,
        mesh,
        lr=opt_cfg.get("lr", 2e-4),
        beta2=opt_cfg.get("beta2", 0.95),
        weight_decay=opt_cfg.get("weight_decay", 0.0),
        max_grad_norm=opt_cfg.get("max_grad_norm"),
        ema_decay=cfg.train.get("ema_decay", 0.9999),
        # k>1 applies decay^k every k-th step (same time constant, k× less
        # fp32 EMA traffic); 1 = reference-exact per-step EMA
        ema_every=cfg.train.get("ema_every", 1),
        # scheduler block (config_dit_base.yaml:70-74): cosine over T_max
        # epochs (or the whole run) down to eta_min
        lr_schedule="cosine" if sched_type in ("cosine", "warmup_cosine") else None,
        total_steps=(
            int(sched.get("T_max", 0)) * steps_per_epoch
            if sched.get("T_max") and cfg.train.get("max_epochs")
            else max_steps
        ),
        min_lr=sched.get("eta_min", 0.0),
        warmup_steps=sched.get("warmup_steps", 0),
        adam_mu_dtype=opt_cfg.get("adam_mu_dtype"),
        grad_accum=cfg.train.get("grad_accum", 1),
    )
    valid_dataset = None
    if cfg.data.get("valid_path"):
        valid_dataset = ImgLatentDataset(
            cfg.data.valid_path,
            latent_norm=cfg.data.get("latent_norm", False),
            latent_multiplier=cfg.data.get("latent_multiplier", 0.18215),
        )

    per_proc_bs = global_bs // jax.process_count()
    C = model.in_channels
    rng = jax.random.PRNGKey(cfg.train.get("global_seed", 0))

    state = trainer.init_state(rng, (global_bs, latent_size, latent_size, C))

    # optional pretrained weights (reference 'weight_init'/'ckpt' keys)
    init_path = cfg.train.get("weight_init") or cfg.train.get("ckpt")
    if init_path:
        if not os.path.exists(str(init_path)):
            # never silently train from scratch on a typo'd pretrained path
            raise FileNotFoundError(
                f"train.weight_init/ckpt points at a missing file: "
                f"{init_path!r}"
            )
        state = load_weight_init(str(init_path), state, model, logger)

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
    # epoch-based checkpointing (config_dit_base.yaml ckpt_every_epoch)
    if cfg.train.get("ckpt_every_epoch"):
        ckpt_every = int(cfg.train.ckpt_every_epoch) * steps_per_epoch
    else:
        ckpt_every = cfg.train.get("ckpt_every", 20000)
    patience = cfg.train.get("early_stopping_patience") or cfg.train.get("patience")
    min_delta = cfg.train.get("min_delta", 1e-6)
    best_val, bad_evals = float("inf"), 0

    it = dataset.batches(
        per_proc_bs,
        seed=cfg.train.get("global_seed", 0),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    from vavae_tpu.utils.preemption import PreemptionGuard

    # Overlap checkpoint disk writes with training (train.async_checkpoint,
    # default on): this VM's ~12 MB/s disk makes a synchronous XL-size save
    # a multi-minute step-loop stall. The device→host snapshot stays on this
    # thread; only the serialize+write runs in the background.
    writer = (
        ckpt_lib.AsyncCheckpointer()
        if cfg.train.get("async_checkpoint", True)
        else None
    )

    def save_ckpt(dir_: str, at_step: int, with_cfg: bool = True, sync: bool = False):
        config = cfg.to_dict() if with_cfg else None
        if writer is None:
            ckpt_lib.save_checkpoint(dir_, at_step, state, config)
        else:
            writer.save(dir_, at_step, state, config)
            if sync:
                writer.wait()

    from vavae_tpu.utils.profiling import WindowTracer

    tracer = WindowTracer()  # VAVAE_PROFILE=/dir captures an xprof window
    loss_acc, log_steps, t_start = [], 0, time.time()
    step = int(jax.device_get(state.step))
    guard = PreemptionGuard().__enter__()
    completed = False
    try:
        while step < max_steps:
            if guard.should_stop:
                # preemption (SIGTERM): checkpoint the in-flight state and exit
                # cleanly so the relaunch resumes here instead of at ckpt_every
                save_ckpt(ckpt_dir, step, sync=True)
                logger.info(f"preempted: checkpointed at step {step}, exiting")
                break
            batch = trainer.shard_batch(next(it))
            state, metrics = trainer.train_step(state, rng, batch)
            step += 1
            tracer.step(step, sync_on=metrics["loss"])
            # keep the loss ON DEVICE — fetching per step blocks the host on the
            # step and serializes batch prep with device compute; everything is
            # pulled in one transfer at log points
            loss_acc.append(metrics["loss"])
            log_steps += 1

            if step % log_every == 0:
                # time AFTER a value fetch: on the tunneled backend
                # block_until_ready can return before completion (CLAUDE.md) —
                # the fetched mean forces every accumulated step to have run
                avg_loss = float(np.mean(jax.device_get(loss_acc)))
                dt = time.time() - t_start
                sps = log_steps / dt
                logger.info(
                    f"(step={step:07d}) Train Loss: {avg_loss:.4f}, "
                    f"Train Steps/Sec: {sps:.2f}, Img/Sec: {sps * global_bs:.1f}"
                )
                metrics_log.log_scalars(
                    step,
                    {"train/loss": avg_loss, "train/steps_per_sec": sps,
                     "train/grad_norm": float(jax.device_get(metrics["grad_norm"]))},
                )
                loss_acc, log_steps, t_start = [], 0, time.time()

            sample_every = cfg.train.get("sample_every")
            if sample_every and step % sample_every == 0:
                # in-training EMA sampling (reference train_dit_s_official.py:557-660)
                _sample_grid(cfg, trainer, state, exp_dir, step, logger,
                             latent_stats=dataset.latent_stats if cfg.data.get("latent_norm") else None)

            if step % ckpt_every == 0 and step > 0:
                save_ckpt(ckpt_dir, step)
                logger.info(f"saved checkpoint at step {step}")
                if valid_dataset is not None:
                    val = evaluate(trainer, state, valid_dataset, per_proc_bs, rng)
                    logger.info(f"(step={step:07d}) Validation Loss: {val:.4f}")
                    metrics_log.log_scalars(step, {"val/loss": val})
                    if patience:
                        if val < best_val - min_delta:
                            best_val, bad_evals = val, 0
                            save_ckpt(os.path.join(exp_dir, "best"), step,
                                      with_cfg=False)
                        else:
                            bad_evals += 1
                            if bad_evals >= patience:
                                logger.info(f"early stopping at step {step}")
                                break

        completed = True
    finally:
        # always restore the signal handler, close any open trace window,
        # and best-effort checkpoint on an abnormal exit (e.g. a re-raised
        # async-writer error) — without masking the original exception
        guard.__exit__()
        tracer.close()
        if not completed:
            try:
                save_ckpt(ckpt_dir, step, sync=True)
                metrics_log.close()
            except Exception as e:  # noqa: BLE001
                logger.error(f"final checkpoint after failure also failed: {e}")
    save_ckpt(ckpt_dir, step, sync=True)
    metrics_log.close()
    logger.info("training done")
    return state


def _sample_grid(cfg, trainer, state, exp_dir, step, logger, n: int = 8,
                 latent_stats=None):
    """Sample a small grid with the EMA weights mid-training; decodes through
    the VAE when configured, else saves raw latents (.npy).

    The compiled sampler and the VAE are built ONCE and cached — only the
    EMA params (a jit argument) change between calls."""
    import jax.numpy as jnp

    from vavae_tpu.pipelines.sample import build_sample_fn

    try:
        cache = _sample_grid.__dict__.setdefault("_cache", {})
        if "gen" not in cache:
            # only the param-explicit jit_fn is ever used — hold_params=False
            # so no dead full-model copy stays pinned in HBM for the run
            cache["gen"] = build_sample_fn(
                cfg, trainer.model, state.ema_params,
                latent_stats=latent_stats, hold_params=False,
            )
            vae_ckpt = cfg.get("vae", {}).get("ckpt_path")
            cache["vae"] = None
            if vae_ckpt and os.path.exists(str(vae_ckpt)):
                from vavae_tpu.tokenizer import VA_VAE

                cache["vae"] = VA_VAE(
                    cfg.get("vae", {}).get("config"), ckpt_path=vae_ckpt,
                    img_size=cfg.data.image_size,
                )
        labels = jnp.arange(n, dtype=jnp.int32) % cfg.data.num_classes
        lat = np.asarray(
            cache["gen"].jit_fn(state.ema_params, jax.random.PRNGKey(step), labels)
        )
        out_dir = os.path.join(exp_dir, "train_samples")
        os.makedirs(out_dir, exist_ok=True)
        if cache["vae"] is not None:
            from vavae_tpu.utils.image_grid import save_image_grid

            imgs = cache["vae"].decode_to_images(jnp.asarray(lat))
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
