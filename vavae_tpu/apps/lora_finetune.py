"""LoRA finetuning CLI for a pretrained DiT.

Parity target: step11_lora_finetune_dit_xl.py — load a base checkpoint,
inject rank-r adapters on qkv/proj/w12/w3, train only the adapters on the
micro-Doppler latents, save LoRA-only checkpoints (and optionally the merged
weights for the standard sampling pipeline).

Run:
  python -m vavae_tpu.apps.lora_finetune --config configs/dit_s_microdoppler.yaml \
      --base_ckpt dit.safetensors --rank 8 --alpha 16 --steps 2000
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.data.latent_dataset import ImgLatentDataset
from vavae_tpu.models.dit import create_dit
from vavae_tpu.parallel.mesh import make_mesh, multihost_init
from vavae_tpu.pipelines.sample import load_dit_params
from vavae_tpu.pipelines.train_dit import build_transport, create_logger
from vavae_tpu.train import checkpoint as ckpt_lib
from vavae_tpu.train.lora import save_lora
from vavae_tpu.train.lora_trainer import LoRATrainer
from vavae_tpu.utils.config import load_config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--base_ckpt", required=True,
                    help="pretrained DiT (.pt/.msgpack/.safetensors)")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=16.0)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch_size", type=int, default=None, help="global batch")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--export_merged", action="store_true",
                    help="also save base+LoRA merged weights for sampling")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = load_config(args.config, overrides=args.overrides)
    multihost_init()
    mesh = make_mesh()
    out_dir = args.out_dir or os.path.join(
        cfg.train.get("output_dir", "output"),
        f"{cfg.train.get('exp_name', 'exp')}_lora_r{args.rank}",
    )
    logger = create_logger(out_dir)

    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)
    base_params = load_dit_params(cfg, model, args.base_ckpt, prefer_ema=True)
    transport = build_transport(cfg)

    trainer = LoRATrainer(
        model, transport, mesh, rank=args.rank, alpha=args.alpha, lr=args.lr,
        max_grad_norm=cfg.get("optimizer", {}).get("max_grad_norm"),
    )
    rng = jax.random.PRNGKey(cfg.train.get("global_seed", 0))
    state = trainer.replicate(trainer.init_state(rng, base_params))
    base_params = trainer.replicate(base_params)
    from vavae_tpu.train.lora import lora_size

    logger.info(
        f"LoRA r={args.rank}: {lora_size(state.lora) / 1e6:.2f}M trainable"
    )

    dataset = ImgLatentDataset(
        cfg.data.data_path,
        latent_norm=cfg.data.get("latent_norm", False),
        latent_multiplier=cfg.data.get("latent_multiplier", 1.0),
    )
    global_bs = args.batch_size or cfg.train.get("global_batch_size", 16)
    if global_bs % jax.process_count():
        raise SystemExit(
            f"global batch {global_bs} must divide the process count "
            f"({jax.process_count()})"
        )
    per_proc = global_bs // jax.process_count()
    n_local = jax.local_device_count()
    if per_proc % n_local:
        # round UP so the sharded train step gets even per-device splits
        per_proc = ((per_proc + n_local - 1) // n_local) * n_local
        print(f"note: per-process batch rounded up to {per_proc} "
              f"(multiple of {n_local} local devices)")
    it = dataset.batches(
        per_proc, seed=cfg.train.get("global_seed", 0),
        process_index=jax.process_index(), process_count=jax.process_count(),
    )

    t0, running = time.time(), 0.0
    for step in range(1, args.steps + 1):
        state, m = trainer.train_step(state, base_params, rng, trainer.shard_batch(next(it)))
        running += float(jax.device_get(m["loss"]))
        if step % cfg.train.get("log_every", 100) == 0:
            sps = cfg.train.get("log_every", 100) / (time.time() - t0)
            logger.info(f"(step={step:06d}) loss {running / cfg.train.get('log_every', 100):.4f}, {sps:.2f} it/s")
            t0, running = time.time(), 0.0

    os.makedirs(out_dir, exist_ok=True)
    lora_path = os.path.join(out_dir, f"lora_{args.steps:06d}.msgpack")
    save_lora(lora_path, jax.device_get(state.ema_lora))
    logger.info(f"saved LoRA-only checkpoint to {lora_path}")
    if args.export_merged:
        merged = trainer.merged_params(jax.device_get(base_params), state)
        from vavae_tpu.train.dit_trainer import TrainState

        export = TrainState(step=np.asarray(args.steps), params=merged,
                            ema_params=merged, opt_state=None)
        ckpt_lib.save_checkpoint(out_dir, args.steps, export)
        logger.info("saved merged weights for the sampling pipeline")


if __name__ == "__main__":
    main()
