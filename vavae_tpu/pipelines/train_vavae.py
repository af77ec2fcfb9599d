"""VA-VAE training pipeline: epoch loop + the official 3-stage recipe.

Parity targets:
  - vavae/main.py (Lightning launcher: config-driven model, auto-resume,
    val/rec_loss checkpointing, ImageLogger) — collapsed to one plain loop.
  - vavae/configs/f16d32_vfdinov2_long.yaml:1-9 — the staged recipe:
      stage 1: 100 ep, vf_weight 0.5, no margins
      stage 2:  15 ep, vf_weight 0.1, no margins
      stage 3:  15 ep, vf_weight 0.1, margins distmat 0.25 / cos 0.5
  - microdoppler_finetune/step4_train_vavae.py:506-552 — per-stage params
    (disc_start, vf_weight, margins, lr, epochs) and best-val ckpt chaining.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.data.prefetch import prefetch
from vavae_tpu.models.vae import vae_from_ddconfig
from vavae_tpu.parallel.mesh import make_mesh, multihost_init, shard_batch
from vavae_tpu.train import checkpoint as ckpt_lib
from vavae_tpu.train.vae_loss import VAELossConfig
from vavae_tpu.train.vae_trainer import VAETrainer, VAETrainState
from vavae_tpu.utils.config import Config, load_config
from vavae_tpu.pipelines.train_dit import create_logger

# the official 3-stage recipe (f16d32_vfdinov2_long.yaml)
OFFICIAL_STAGES = [
    dict(epochs=100, vf_weight=0.5, distmat_margin=0.0, cos_margin=0.0),
    dict(epochs=15, vf_weight=0.1, distmat_margin=0.0, cos_margin=0.0),
    dict(epochs=15, vf_weight=0.1, distmat_margin=0.25, cos_margin=0.5),
]


def build_vae_trainer(
    cfg: Config,
    mesh,
    stage_overrides: Optional[dict] = None,
    aux_feature_fn=None,     # param-explicit: (aux_params, x) -> features
    aux_params=None,
    lpips_fn=None,           # param-explicit: (lpips_params, a, b) -> dists
    lpips_params=None,
    vf_dim: int = 1024,      # foundation feature dim (sizes the projector)
) -> VAETrainer:
    p = cfg.model.params
    lc = dict(p.lossconfig.params)
    if stage_overrides:
        lc.update({k: v for k, v in stage_overrides.items() if k != "epochs" and k != "lr"})
    loss_cfg = VAELossConfig(
        disc_start=lc.get("disc_start", 5001),
        kl_weight=lc.get("kl_weight", 1e-6),
        disc_weight=lc.get("disc_weight", 0.5),
        vf_weight=lc.get("vf_weight", 0.1),
        adaptive_vf=lc.get("adaptive_vf", True),
        distmat_margin=lc.get("distmat_margin", 0.0),
        cos_margin=lc.get("cos_margin", 0.0),
        perceptual_weight=lc.get("perceptual_weight", 1.0 if lpips_fn else 0.0),
    )
    dd = p.ddconfig
    # opt-in mixed precision for the VAE itself: bf16 conv/attn compute with
    # fp32 params, optimizers and losses (GroupNorm stats stay fp32 inside
    # flax). Measured 1.25x on v5e (184 -> 147 ms/step at B=8). Default fp32
    # matches the reference recipe (f16d32_vfdinov2.yaml:66).
    dtype_names = {
        "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
        "fp32": jnp.float32, "float32": jnp.float32,
    }
    dtype_key = str(p.get("compute_dtype", "fp32"))
    if dtype_key not in dtype_names:
        raise ValueError(
            f"model.params.compute_dtype={dtype_key!r}: expected one of "
            f"{sorted(dtype_names)} (a typo here would otherwise silently "
            "train fp32)"
        )
    compute_dtype = dtype_names[dtype_key]
    # honor the FULL ddconfig — a yaml with num_res_blocks: 1 or
    # attn_resolutions: [] used to silently train the default architecture
    vae = vae_from_ddconfig(p.embed_dim, dd, dtype=compute_dtype)
    lr = (stage_overrides or {}).get("lr") or cfg.model.get("base_learning_rate", 1e-4)
    # truthiness, matching run_stages: `use_vf: false` means OFF — the old
    # `is not None` put the trainer in VF mode with no foundation fn, saving
    # an untrained random projector into every checkpoint (which downstream
    # VF-alignment checks key on)
    use_vf = bool(p.get("use_vf"))
    return VAETrainer(
        vae,
        mesh,
        loss_cfg=loss_cfg,
        lr=lr,
        use_vf=use_vf,
        vf_dim=vf_dim,
        aux_feature_fn=aux_feature_fn,
        aux_params=aux_params,
        lpips_fn=lpips_fn,
        lpips_params=lpips_params,
        frozen_bf16=p.get("frozen_bf16", True),
    )


def make_aux_feature_fn(kind: str, weights_path: Optional[str] = None, allow_random: bool = False):
    """Returns (param-explicit feature fn, frozen params, feature_dim) — the
    params are passed into the jitted train step as arguments, never closure
    constants; feature_dim sizes the reverse projector (1024 for ViT-L, 64
    for the "-tiny" smoke testbed)."""
    from vavae_tpu.models.vit import FoundationModel

    fm = FoundationModel(kind=kind)
    try:
        fm.load(weights_path)
    except FileNotFoundError:
        if not allow_random:
            raise
        fm.init_random(jax.random.PRNGKey(0))
    return fm.feature_fn_p(), fm.params, fm.feature_dim


def make_lpips_fn(weights_path: Optional[str] = None):
    """Returns (param-explicit lpips fn, variables) or (None, None)."""
    try:
        from vavae_tpu.models.lpips import load_lpips

        model, variables = load_lpips(weights_path)
        return (lambda v, a, b: model.apply(v, a, b)), variables
    except FileNotFoundError:
        return None, None


def train_epochs(
    trainer: VAETrainer,
    state: VAETrainState,
    dataset,
    *,
    epochs: int,
    batch_size: int,
    logger,
    ckpt_dir: str,
    log_every: int = 100,
    seed: int = 0,
    val_dataset=None,
    start_epoch: int = 0,
    async_ckpt: bool = True,
    log_images_every: int = 750,
):
    """Returns (state, best_val_path, preempted). dataset yields
    (B, H, W, 3) in [-1,1]. ``preempted`` is True when SIGTERM ended the
    run mid-epoch — the caller must stop (not chain further stages).

    ``start_epoch`` keeps the per-epoch shuffle seeds on the same schedule
    when a run resumes mid-stage (auto-resume in ``run_stages``)."""
    rng = jax.random.PRNGKey(seed)
    best_dir = os.path.join(ckpt_dir, "best")
    # re-seed the monitor from a previous run's record so a resumed run
    # can't overwrite a better pre-interruption 'best' checkpoint
    best_val, best_path = float("inf"), None
    metric_file = os.path.join(best_dir, "metric.json")
    if start_epoch > 0 and os.path.exists(metric_file):
        with open(metric_file) as f:
            rec = json.load(f)
        best_val = float(rec.get("val", float("inf")))
        best_path = ckpt_lib.latest_checkpoint(best_dir)
    # async checkpointing (train.async_checkpoint, default on): the epoch-end
    # save overlaps the next epoch's steps; epoch.json / best metric.json are
    # written by the worker AFTER the ckpt file is durable so resume
    # bookkeeping can never outrun its checkpoint
    writer = ckpt_lib.AsyncCheckpointer() if async_ckpt else None
    from vavae_tpu.utils.metrics_logger import MetricsLogger
    from vavae_tpu.utils.preemption import PreemptionGuard
    from vavae_tpu.utils.profiling import WindowTracer

    tracer = WindowTracer()  # VAVAE_PROFILE=/dir captures an xprof window
    tracer_step = 0
    # TB + JSONL scalars (the Lightning TB logger, vavae/main.py:578) and
    # SIGTERM preemption (mid-epoch checkpoint instead of losing the epoch —
    # same guard the DiT loop uses). Guard entered without `with` to keep
    # the loop body's indentation; __exit__ runs in the shared epilogue.
    mlog = MetricsLogger(os.path.join(ckpt_dir, "tb"))
    guard = PreemptionGuard().__enter__()
    loss_acc, log_steps, t0 = [], 0, time.time()
    for epoch in range(start_epoch, epochs):
        t_epoch = time.time()
        # prefetch: batch i+1 decodes on a background thread while the
        # device runs step i (trainer.train_step returns without blocking)
        for batch in prefetch(dataset.batches(
            batch_size,
            seed=seed + epoch,
            epochs=1,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )):
            images = batch[0] if isinstance(batch, tuple) else batch
            state, metrics = trainer.train_step(
                state, rng, shard_batch(trainer.mesh, images)
            )
            # loss stays on device until the log point (a per-step fetch
            # would serialize host batch prep with device compute)
            loss_acc.append(metrics["rec_loss"])
            log_steps += 1
            tracer_step += 1
            tracer.step(tracer_step, sync_on=metrics["rec_loss"])
            if (
                log_images_every
                and tracer_step % log_images_every == 0
                # single-process only: the sharded reconstruct + shard_batch
                # are collectives every process must enter — gating them on
                # process 0 would deadlock a multihost run. (The reference's
                # ImageLogger logs rank 0's local batch; a multihost grid
                # would need an allgather nobody looks at mid-training.)
                and jax.process_count() == 1
            ):
                # Lightning ImageLogger equivalent (vavae/main.py:317-431,
                # batch_frequency 750): input/recon grids to <ckpt_dir>/images
                from vavae_tpu.utils.image_grid import log_reconstructions

                dec = trainer.reconstruct(state, shard_batch(trainer.mesh, images))
                log_reconstructions(
                    os.path.join(ckpt_dir, "images"),
                    int(jax.device_get(state.step)),
                    np.asarray(images),
                    np.asarray(jax.device_get(dec)),
                )
            if guard.should_stop:
                # preemption (SIGTERM): checkpoint mid-epoch and exit.
                # epoch.json records only the COMPLETED epochs (this one is
                # partial), written explicitly because stage_epochs_done's
                # checkpoint-count fallback would otherwise count this
                # mid-epoch save as a finished first epoch — resume re-runs
                # the interrupted epoch on the saved (newer) weights
                if writer is not None:
                    writer.wait()  # order after any in-flight epoch save
                step_now = int(jax.device_get(state.step))
                ckpt_lib.save_checkpoint(ckpt_dir, step_now, state)
                if jax.process_index() == 0:
                    with open(os.path.join(ckpt_dir, "epoch.json"), "w") as f:
                        json.dump({"epochs_done": epoch}, f)
                logger.info(f"preempted at step {step_now}: checkpoint saved")
                tracer.close()
                mlog.close()
                guard.__exit__()
                return state, best_path, True
            if log_steps % log_every == 0:
                dt = time.time() - t0
                step_now = int(jax.device_get(state.step))
                rec = float(np.mean(jax.device_get(loss_acc)))
                logger.info(
                    f"epoch {epoch} step {step_now}: "
                    f"rec {rec:.4f}, {log_steps / dt:.2f} it/s"
                )
                mlog.log_scalars(
                    step_now, {"train/rec_loss": rec, "train/it_per_s": log_steps / dt}
                )
                loss_acc, log_steps, t0 = [], 0, time.time()

        # end-of-epoch validation + best-ckpt (monitor val/rec_loss)
        if val_dataset is not None:
            vals = []
            for batch in val_dataset.batches(
                batch_size, shuffle=False, epochs=1,
                process_index=jax.process_index(), process_count=jax.process_count(),
            ):
                images = batch[0] if isinstance(batch, tuple) else batch
                m = trainer.eval_step(state, rng, shard_batch(trainer.mesh, images))
                vals.append(float(jax.device_get(m["val/rec_loss"])))
            val = float(np.mean(vals)) if vals else float("nan")
            logger.info(f"epoch {epoch}: val/rec_loss {val:.4f}")
            mlog.log_scalars(
                int(jax.device_get(state.step)), {"val/rec_loss": val}
            )
            if val < best_val:
                best_val = val
                step_now, val_now = int(jax.device_get(state.step)), best_val

                def record_best(step=step_now, val=val_now):
                    with open(metric_file, "w") as f:
                        json.dump({"val": val, "step": step}, f)

                if writer is not None:
                    best_path = writer.save(best_dir, step_now, state,
                                            on_complete=record_best)
                else:
                    best_path = ckpt_lib.save_checkpoint(best_dir, step_now, state)
                    if jax.process_index() == 0:
                        record_best()

        def record_epoch(done=epoch + 1):
            # explicit epochs-done record: a zero-optimizer-step epoch (shard
            # smaller than batch_size) saves under an unchanged step number,
            # so counting distinct checkpoints would silently undercount and
            # re-run completed epochs on resume
            with open(os.path.join(ckpt_dir, "epoch.json"), "w") as f:
                json.dump({"epochs_done": done}, f)

        if writer is not None:
            writer.save(ckpt_dir, int(jax.device_get(state.step)), state,
                        on_complete=record_epoch)
        else:
            ckpt_lib.save_checkpoint(ckpt_dir, int(jax.device_get(state.step)), state)
            if jax.process_index() == 0:
                record_epoch()
        # CUDACallback parity (vavae/main.py:433-453): epoch wall time +
        # peak device memory (when the backend reports it)
        epoch_scalars = {"epoch/duration_s": time.time() - t_epoch}
        try:
            mem = jax.local_devices()[0].memory_stats()
            if mem and "peak_bytes_in_use" in mem:
                epoch_scalars["epoch/peak_mem_mb"] = mem["peak_bytes_in_use"] / 1e6
        except Exception:
            pass
        mlog.log_scalars(int(jax.device_get(state.step)), epoch_scalars)
    tracer.close()
    mlog.close()
    guard.__exit__()
    if writer is not None:
        # the stage's last write must be durable before the caller chains the
        # next stage (auto-resume counts files on disk)
        writer.wait()
    return state, best_path, False


def stage_epochs_done(stage_dir: str) -> int:
    """Completed epochs in a stage dir: the explicit epoch.json record,
    falling back to distinct-checkpoint counting for legacy dirs."""
    p = os.path.join(stage_dir, "epoch.json")
    if os.path.exists(p):
        with open(p) as f:
            return int(json.load(f).get("epochs_done", 0))
    return ckpt_lib.checkpoint_count(stage_dir)


def _load_pretrained(state: VAETrainState, path: str, cfg: Config, logger) -> VAETrainState:
    """Initialize the generator's VAE (and projector, when present) from a
    checkpoint: ours (.safetensors/.msgpack full train state) or a reference
    torch .ckpt/.pt (converted)."""
    if path.endswith((".safetensors", ".msgpack")):
        # lenient: pretrained-init may come from a differently-shaped run
        # (reference load_weights_with_shape_check semantics). WEIGHTS ONLY:
        # step and both optimizer states stay fresh — a weight_init must not
        # inherit the old run's step counter (disc_start gating, stage ckpt
        # numbering) or its Adam moments
        restored = ckpt_lib.restore_checkpoint(
            path, state, lenient=path.endswith(".safetensors")
        )
        return state.replace(
            gen_params=restored.gen_params,
            disc_params=restored.disc_params,
            disc_batch_stats=restored.disc_batch_stats,
        )
    import torch

    from vavae_tpu.utils.torch_convert import vae_params_from_torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd_np = {
        k: v.numpy() for k, v in sd.items()
        if hasattr(v, "numpy") and not k.startswith(("loss.", "foundation_model."))
    }
    vae_np = {k: v for k, v in sd_np.items() if not k.startswith("linear_proj")}
    gen = dict(state.gen_params)
    gen["vae"] = jax.tree_util.tree_map(
        jnp_asarray,
        vae_params_from_torch(
            vae_np,
            resolution=cfg.model.params.ddconfig.get("resolution", 256),
            dec_attn_resolutions=(16,),
        ),
    )
    # reverse-projection 1x1 conv (autoencoder.py:322-324), when checkpointed
    if "proj" in gen and "linear_proj.weight" in sd_np:
        w = sd_np["linear_proj.weight"]  # (out, in, 1, 1) conv or (out, in)
        w = w.reshape(w.shape[0], w.shape[1])
        gen["proj"] = {"kernel": jnp_asarray(w.T.reshape(1, 1, *w.T.shape))}
    logger.info(f"loaded pretrained VAE weights from {path}")
    return state.replace(gen_params=gen)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def run_stages(
    cfg: Config,
    dataset,
    val_dataset=None,
    stages: Sequence[dict] = OFFICIAL_STAGES,
    output_dir: str = "output/vavae",
    batch_size: int = 8,
    allow_random_foundation: bool = False,
    resume: bool = True,
):
    """The 3-stage VF-alignment recipe with best-ckpt chaining between stages.

    With ``resume`` (default), an interrupted run picks up where it left
    off: each stage dir holds one checkpoint per completed epoch, so
    completed stages are skipped (their latest state restored for chaining)
    and a partial stage restarts at its next epoch — the TPU-preemption
    equivalent of the reference Lightning launcher's auto-resume from the
    latest ``epoch=*.ckpt`` (vavae/main.py:522-531).
    """
    multihost_init()
    mesh = make_mesh()
    logger = create_logger(output_dir)

    use_vf = cfg.model.params.get("use_vf")
    aux_fn, aux_params, vf_dim = (
        make_aux_feature_fn(use_vf, allow_random=allow_random_foundation)
        if use_vf
        else (None, None, 1024)
    )
    lpips_fn, lpips_params = make_lpips_fn()

    state = None
    for si, stage in enumerate(stages):
        trainer = build_vae_trainer(
            cfg, mesh, stage_overrides=stage,
            aux_feature_fn=aux_fn, aux_params=aux_params,
            lpips_fn=lpips_fn, lpips_params=lpips_params,
            vf_dim=vf_dim,
        )
        stage_dir = os.path.join(output_dir, f"stage{si + 1}")
        if not resume and ckpt_lib.checkpoint_count(stage_dir) > 0:
            # a later default-resume run would mix this run's checkpoints
            # with the abandoned ones and restore an inconsistent 'latest'
            raise RuntimeError(
                f"--no_resume requested but {stage_dir} already holds "
                "checkpoints from a previous run — delete the stage dirs "
                "(or choose a fresh --output_dir) before starting over"
            )
        epochs_done = stage_epochs_done(stage_dir) if resume else 0
        if epochs_done > 0:
            # resume mid- (or post-)stage: full train state incl. optimizers
            fresh = trainer.init_state(jax.random.PRNGKey(si))
            restored = ckpt_lib.restore_checkpoint(
                ckpt_lib.latest_checkpoint(stage_dir), jax.device_get(fresh)
            )
            state = trainer.replicate(restored)
            logger.info(
                f"stage {si + 1}: resumed {epochs_done}/{stage['epochs']} "
                f"epochs from {stage_dir} (step {int(jax.device_get(state.step))})"
            )
            if epochs_done >= stage["epochs"]:
                # stage complete: chain its BEST-val state when one was
                # recorded (reference step4 train_stage:560-620 chains the
                # best checkpoint, not the final epoch), else the latest
                best_ck = ckpt_lib.latest_checkpoint(os.path.join(stage_dir, "best"))
                if best_ck:
                    state = trainer.replicate(
                        ckpt_lib.restore_checkpoint(best_ck, jax.device_get(fresh))
                    )
                    logger.info(f"stage {si + 1}: chaining best-val {best_ck}")
                continue
        elif state is None:
            fresh = trainer.init_state(jax.random.PRNGKey(0))
            # pretrained stage-1 init (reference weight_init / step4 stage-1
            # loads the released f16d32 weights before finetuning)
            init_path = cfg.get("weight_init") or cfg.get("ckpt_path")
            if init_path and os.path.exists(str(init_path)):
                fresh = _load_pretrained(fresh, str(init_path), cfg, logger)
            state = trainer.replicate(fresh)
        else:
            # chain: keep params, fresh optimizers per stage
            fresh = trainer.init_state(jax.random.PRNGKey(si))
            state = trainer.replicate(
                fresh.replace(
                    gen_params=jax.device_get(state.gen_params),
                    disc_params=jax.device_get(state.disc_params),
                    disc_batch_stats=jax.device_get(state.disc_batch_stats),
                    step=jax.device_get(state.step),
                )
            )
        logger.info(f"=== stage {si + 1}/{len(stages)}: {stage} ===")
        state, best_path, preempted = train_epochs(
            trainer,
            state,
            dataset,
            epochs=stage["epochs"],
            batch_size=batch_size,
            logger=logger,
            ckpt_dir=stage_dir,
            val_dataset=val_dataset,
            start_epoch=epochs_done,
            async_ckpt=cfg.get("train", Config()).get("async_checkpoint", True),
            # reference ImageLogger batch_frequency (main.py:635); 0 disables
            log_images_every=cfg.get("train", Config()).get("log_images_every", 750),
        )
        if preempted:
            # SIGTERM mid-stage: training a later stage from PARTIAL weights
            # would pollute its dir with checkpoints resume then trusts —
            # exit cleanly; relaunch auto-resumes this stage
            logger.info(
                f"preempted during stage {si + 1} — exiting for relaunch "
                "(auto-resume continues this stage)"
            )
            return state
        # best-val chaining (reference step4 train_stage:560-620): the next
        # stage starts from the best-val checkpoint, not the final epoch.
        # Resolved by the deterministic dir scan — NOT the returned
        # best_path, which is "" on non-zero processes and would desync a
        # multihost run's restores.
        best_ck = ckpt_lib.latest_checkpoint(os.path.join(stage_dir, "best"))
        if best_ck:
            state = trainer.replicate(
                ckpt_lib.restore_checkpoint(best_ck, jax.device_get(state))
            )
            logger.info(f"stage {si + 1}: chaining best-val {best_ck}")
    return state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="VAE config yaml (OmegaConf format)")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--val_path", default=None)
    ap.add_argument("--output_dir", default="output/vavae")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--stages", default="official", choices=["official", "single"])
    ap.add_argument("--no_resume", action="store_true",
                    help="start from scratch even if stage checkpoints exist")
    ap.add_argument("--allow_random_foundation", action="store_true",
                    help="random-init the frozen foundation net when "
                         "VAVAE_*_WEIGHTS is unset (plumbing smoke only)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.base, overrides=args.overrides)

    from vavae_tpu.data.image_folder import ImageFolderDataset

    dataset = ImageFolderDataset(args.data_path, image_size=cfg.model.params.ddconfig.resolution)
    val_dataset = (
        ImageFolderDataset(args.val_path, image_size=cfg.model.params.ddconfig.resolution)
        if args.val_path
        else None
    )
    if "stages" in cfg:
        # staged recipe from the config file (configs/vavae_f16d32_long.yaml,
        # configs/vavae_microdoppler_finetune.yaml)
        stages = [dict(s) for s in cfg.stages]
    elif args.stages == "official":
        stages = OFFICIAL_STAGES
    else:
        stages = [dict(epochs=cfg.get("train", {}).get("max_epochs", 50))]
    run_stages(
        cfg, dataset, val_dataset, stages=stages,
        output_dir=args.output_dir, batch_size=args.batch_size,
        allow_random_foundation=args.allow_random_foundation,
        resume=not args.no_resume,
    )


if __name__ == "__main__":
    main()
