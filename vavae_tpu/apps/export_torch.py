"""Export a checkpoint trained HERE back to the reference's torch format.

Completes the two-way migration story (docs/MIGRATION.md): torch→jax import
has existed since round 1 (utils/torch_convert.py); this is the inverse.

  - ``--kind dit``: our TrainState .safetensors → ``{"model": ..., "ema": ...}``
    .pt, loadable by the reference's inference.py / train resume
    (checkpoint keys per LightningDiT/train.py save + inference.py:88-91
    EMA preference). RoPE q,k columns are permuted back to the reference's
    interleaved layout and the frozen sincos ``pos_embed`` is synthesized.
  - ``--kind vae``: our VAETrainState .safetensors → ``{"state_dict": ...}``
    .ckpt with the reference AutoencoderKL naming (tokenizer/autoencoder.py
    init_from_ckpt reads sd["state_dict"]). Generator weights only — the
    discriminator/VF loss stack is training-time machinery the reference's
    inference path never loads.

Run:  python -m vavae_tpu.apps.export_torch --kind dit --config cfg.yaml \
          --ckpt checkpoints/0080000.safetensors --out dit_export.pt
"""
from __future__ import annotations

import argparse
import os


def export_dit(config_path: str, ckpt_path: str, out: str, overrides=()) -> str:
    import jax
    import numpy as np
    import torch

    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import load_dit_params
    from vavae_tpu.train.dit_trainer import TrainState
    from vavae_tpu.train import checkpoint as ckpt_lib
    from vavae_tpu.utils.config import load_config
    from vavae_tpu.utils.torch_export import dit_params_to_torch

    cfg = load_config(config_path, overrides=overrides)
    latent_size = cfg.data.image_size // cfg.get("vae", {}).get("downsample_ratio", 16)
    model = create_dit(cfg.model, latent_size, cfg.data.num_classes)

    # restore BOTH param trees from the train state (reference checkpoints
    # carry model+ema; inference prefers ema)
    dummy = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            np.zeros((1, latent_size, latent_size, model.in_channels), np.float32),
            np.zeros((1,), np.float32),
            np.zeros((1,), np.int32),
        )["params"]
    )
    zeros = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), dummy)
    state = TrainState(step=np.zeros((), np.int32), params=zeros,
                       ema_params=zeros, opt_state=None)
    restored = ckpt_lib.restore_checkpoint(ckpt_path, state)

    rope_heads = model.num_heads if model.use_rope else 0
    kw = dict(patch_size=model.patch_size, rope_heads=rope_heads,
              input_size=model.input_size)
    to_t = lambda tree: {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in dit_params_to_torch(jax.device_get(tree), **kw).items()
    }
    payload = {
        "model": to_t(restored.params),
        "ema": to_t(restored.ema_params),
        "steps": int(np.asarray(jax.device_get(restored.step))),
    }
    torch.save(payload, out)
    print(f"exported DiT (model+ema, step {payload['steps']}) to {out}")
    return out


def export_vae(ckpt_path: str, out: str) -> str:
    import numpy as np
    import torch
    from flax import traverse_util

    from vavae_tpu.utils.torch_export import vae_params_to_torch

    # the stored tree layout is self-describing — pull the generator's vae
    # subtree straight from the flat state dict (no model rebuild needed)
    import json as _json

    import ml_dtypes
    from safetensors import safe_open
    from safetensors.numpy import load_file

    with safe_open(ckpt_path, framework="numpy") as f:
        meta = _json.loads((f.metadata() or {}).get("tree", "{}"))
    tensors = dict(load_file(ckpt_path))
    for k, dt in meta.get("dtypes", {}).items():
        if dt == "bfloat16" and k in tensors:
            tensors[k] = tensors[k].view(ml_dtypes.bfloat16)
    flat = {
        tuple(k.split("|")): v for k, v in tensors.items()
        if k.startswith("gen_params|vae|")
    }
    if not flat:
        raise SystemExit(
            f"{ckpt_path} holds no gen_params|vae| leaves — expected a "
            "VAETrainState checkpoint from pipelines.train_vavae"
        )
    vae_tree = traverse_util.unflatten_dict(
        {k[2:]: v for k, v in flat.items()}
    )
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
        for k, v in vae_params_to_torch(vae_tree).items()
    }
    torch.save({"state_dict": sd}, out)
    print(f"exported VAE ({len(sd)} tensors) to {out}")
    return out


def main() -> None:
    import vavae_tpu.utils.jax_cache  # noqa: F401

    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=["dit", "vae"])
    ap.add_argument("--ckpt", required=True, help="our .safetensors checkpoint")
    ap.add_argument("--out", required=True, help="torch .pt/.ckpt output path")
    ap.add_argument("--config", default=None,
                    help="model config (required for --kind dit)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    if not os.path.exists(args.ckpt):
        raise SystemExit(f"checkpoint not found: {args.ckpt}")
    if args.kind == "dit":
        if not args.config:
            raise SystemExit("--kind dit requires --config")
        export_dit(args.config, args.ckpt, args.out, args.overrides)
    else:
        export_vae(args.ckpt, args.out)


if __name__ == "__main__":
    main()
