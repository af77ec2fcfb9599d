"""VA-VAE validation + export tools.

Parity target: microdoppler_finetune/step5_validate_export.py —
  - per-user reconstruction quality (:336)
  - VF-alignment check (:464): cosine between projected latents and frozen
    foundation features
  - latent user-discrimination (:592): class separability of latents
    (silhouette-style between/within distance ratio + linear probe accuracy)
  - latent statistics extraction (:733, :943)
  - encoder export for DiT training (:1015): a standalone msgpack with the
    encoder+quant_conv params.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.eval.metrics import psnr, ssim


def per_user_reconstruction(
    vae, dataset, num_users: int, batch_size: int = 16, max_per_user: int = 32
) -> Dict[int, Dict[str, float]]:
    """PSNR/SSIM per user over the validation set."""
    by_user: Dict[int, list] = {u: [] for u in range(num_users)}
    for img, label in (dataset[i] for i in range(len(dataset))):
        if len(by_user.setdefault(int(label), [])) < max_per_user:
            by_user[int(label)].append(img)
    results = {}
    for uid, imgs in by_user.items():
        if not imgs:
            continue
        x = np.stack(imgs)
        z = vae.encode_moments(x).mode()
        dec = np.asarray(vae.decode(z))
        a = np.clip((x + 1) / 2, 0, 1)
        b = np.clip((dec + 1) / 2, 0, 1)
        results[uid] = {
            "psnr": float(np.mean(np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), 1.0)))),
            "ssim": float(np.mean(np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), 1.0)))),
            "n": len(imgs),
        }
    return results


def vf_alignment_check(
    vae, proj_params, aux_feature_fn: Callable, images: np.ndarray
) -> Dict[str, float]:
    """Mean channel-cosine between projected latents and foundation features
    (step5_validate_export.py:464)."""
    z = vae.encode_moments(images).mode()
    z_proj = jnp.einsum("bhwc,cd->bhwd", z, proj_params["kernel"][0, 0])
    aux = aux_feature_fn(jnp.asarray(images))
    if aux.shape[1:3] != z_proj.shape[1:3]:
        # latent grid (img/16) vs foundation grid (224/14=16): equal at the
        # production 256px, resized like the trainer would otherwise
        aux = jax.image.resize(
            aux, (aux.shape[0],) + z_proj.shape[1:3] + (aux.shape[-1],),
            method="linear",
        )
    zf = z_proj / jnp.maximum(jnp.linalg.norm(z_proj, axis=-1, keepdims=True), 1e-12)
    af = aux / jnp.maximum(jnp.linalg.norm(aux, axis=-1, keepdims=True), 1e-12)
    cos = jnp.sum(zf * af, axis=-1)
    return {
        "mean_cosine": float(jnp.mean(cos)),
        "min_cosine": float(jnp.min(cos)),
        "frac_above_0.5": float(jnp.mean((cos > 0.5).astype(jnp.float32))),
    }


def load_trained_vae(train_config: str, train_ckpt: str):
    """encode_moments facade over the generator restored from a TRAINING
    checkpoint + its training config. The reference's step5 validates the
    model it just trained (step5_validate_export.py:336,464); the default
    VA_VAE facade here is f16d32-only, so arbitrary training configs (e.g.
    the tiny drive testbed) need the architecture rebuilt from their yaml."""
    from flax import traverse_util
    from safetensors import safe_open

    from vavae_tpu.models.vae import AutoencoderKL, vae_from_ddconfig
    from vavae_tpu.train.checkpoint import _SEP
    from vavae_tpu.utils.config import load_config

    cfg = load_config(train_config)
    p = cfg.model.params
    # FULL ddconfig: dropping num_res_blocks/attn_resolutions/z_channels/
    # out_ch/double_z here silently rebuilt the default architecture for any
    # non-default training run (reference step5 validates the model it just
    # trained, whatever its config — step5_validate_export.py:336,464)
    model = vae_from_ddconfig(p.embed_dim, p.ddconfig)
    prefix = _SEP.join(("gen_params", "vae")) + _SEP
    flat = {}
    with safe_open(train_ckpt, framework="np") as f:
        for k in f.keys():
            if k.startswith(prefix):
                flat[k[len(prefix):]] = jnp.asarray(f.get_tensor(k))
    if not flat:
        raise ValueError(f"{train_ckpt} carries no gen_params/vae leaves")
    params = traverse_util.unflatten_dict(flat, sep=_SEP)

    class _TrainedEncoder:
        def __init__(self):
            # exposed for diagnostics (the TPU suite bisects transfer-layer
            # corruption from apply-path bugs by checking these leaves)
            self.model = model
            self.params = params

        def encode_moments(self, images):
            return model.apply(
                {"params": params}, jnp.asarray(images), method=AutoencoderKL.encode
            )

    return _TrainedEncoder()


def load_vf_projector(train_ckpt: str):
    """The VF projector rides the TRAINING state (gen_params/proj — the
    inference VA_VAE checkpoint doesn't carry it); None if this run trained
    without VF."""
    from safetensors import safe_open

    with safe_open(train_ckpt, framework="np") as f:
        key = "gen_params|proj|kernel"
        if key not in f.keys():
            return None
        return {"kernel": jnp.asarray(f.get_tensor(key))}


def latent_user_discrimination(
    latents: np.ndarray, labels: np.ndarray
) -> Dict[str, float]:
    """Separability of per-user latent clusters (step5:592): between/within
    distance ratio and a nearest-centroid probe accuracy."""
    flat = latents.reshape(len(latents), -1)
    users = np.unique(labels)
    centroids = np.stack([flat[labels == u].mean(axis=0) for u in users])
    within = np.mean(
        [np.linalg.norm(flat[labels == u] - c, axis=-1).mean()
         for u, c in zip(users, centroids)]
    )
    d_cc = np.linalg.norm(centroids[:, None] - centroids[None], axis=-1)
    between = d_cc[np.triu_indices(len(users), 1)].mean() if len(users) > 1 else 0.0
    # nearest-centroid accuracy
    d = np.linalg.norm(flat[:, None] - centroids[None], axis=-1)
    pred = users[d.argmin(axis=-1)]
    return {
        "between_within_ratio": float(between / max(within, 1e-12)),
        "nearest_centroid_acc": float((pred == labels).mean()),
    }


def latent_statistics(latents_nhwc: np.ndarray) -> Dict[str, np.ndarray]:
    """Channel stats over dims (batch, h, w) — reference step6:243-247 computes
    over torch dims [0,2,3] on NCHW, i.e. the same channel axis."""
    mean = latents_nhwc.mean(axis=(0, 1, 2))
    std = latents_nhwc.std(axis=(0, 1, 2), ddof=1)
    return {
        "mean": mean.astype(np.float32).reshape(1, -1, 1, 1),  # reference layout
        "std": std.astype(np.float32).reshape(1, -1, 1, 1),
        "global_mean": np.float32(latents_nhwc.mean()),
        "global_std": np.float32(latents_nhwc.std()),
    }


def export_encoder(vae, out_path: str) -> str:
    """Standalone encoder+quant_conv export (step5:1015) for DiT extraction."""
    from flax import serialization

    subset = {
        "encoder": jax.device_get(vae.params["encoder"]),
        "quant_conv": jax.device_get(vae.params["quant_conv"]),
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(subset))
    return out_path


def main() -> None:
    """CLI mirroring step5_validate_export.py: recon quality per user,
    latent user-discrimination, latent statistics, optional encoder export."""
    import argparse
    import json

    import vavae_tpu.utils.jax_cache  # noqa: F401
    from vavae_tpu.data.image_folder import SplitFileDataset
    from vavae_tpu.tokenizer import VA_VAE

    ap = argparse.ArgumentParser()
    ap.add_argument("--split_file", required=True)
    ap.add_argument("--split", default="val", choices=["train", "val"])
    ap.add_argument("--vae_config", default=None)
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--num_users", type=int, default=31)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--max_per_user", type=int, default=32)
    ap.add_argument("--out", default=None, help="JSON report path")
    ap.add_argument("--export_encoder", default=None,
                    help="write a standalone encoder+quant_conv msgpack here")
    ap.add_argument("--train_ckpt", default=None,
                    help="train_vavae safetensors carrying the VF projector "
                         "(gen_params/proj) — enables the VF alignment check")
    ap.add_argument("--vf_kind", default="dinov2",
                    choices=["dinov2", "mae", "dinov2-tiny", "mae-tiny"],
                    help="foundation net; -tiny = weight-free smoke testbed")
    ap.add_argument("--train_config", default=None,
                    help="training yaml of --train_ckpt: rebuilds the TRAINED "
                         "generator for the VF check (required when its "
                         "architecture differs from the f16d32 facade)")
    ap.add_argument("--allow_random_foundation", action="store_true",
                    help="random-init foundation weights when VAVAE_*_WEIGHTS "
                         "is unset (plumbing smoke only — scores meaningless)")
    args = ap.parse_args()
    if args.train_config and not args.train_ckpt:
        ap.error("--train_config only applies to the VF check and requires "
                 "--train_ckpt (the projector lives in the training checkpoint)")

    vae = VA_VAE(args.vae_config, ckpt_path=args.vae_ckpt, img_size=args.image_size)
    ds = SplitFileDataset(args.split_file, args.split, image_size=args.image_size)

    recon = per_user_reconstruction(
        vae, ds, args.num_users, max_per_user=args.max_per_user
    )
    imgs, labels = zip(*(ds[i] for i in range(len(ds))))
    x = np.stack(imgs)
    lab = np.asarray(labels, np.int64)
    latents = np.concatenate([
        np.asarray(vae.encode_moments(x[s : s + 32]).mode())
        for s in range(0, len(x), 32)
    ])
    disc = latent_user_discrimination(latents, lab)
    stats = latent_statistics(latents)

    report = {
        "per_user_reconstruction": recon,
        "latent_user_discrimination": disc,
        "latent_stats": {
            "global_mean": float(stats["global_mean"]),
            "global_std": float(stats["global_std"]),
            "channel_mean_first8": stats["mean"].reshape(-1)[:8].tolist(),
        },
    }
    if args.train_ckpt:
        # VF alignment (step5_validate_export.py:464): projected latents vs
        # frozen foundation features
        proj = load_vf_projector(args.train_ckpt)
        if proj is None:
            print("no VF projector in the training checkpoint "
                  "(trained without VF) — skipping VF alignment"
                  + (" (and the --train_config generator rebuild)"
                     if args.train_config else ""))
        else:
            from vavae_tpu.pipelines.train_vavae import make_aux_feature_fn

            fn_p, aux_params, _ = make_aux_feature_fn(
                args.vf_kind, allow_random=args.allow_random_foundation
            )
            enc = (
                load_trained_vae(args.train_config, args.train_ckpt)
                if args.train_config
                else vae
            )
            vf = vf_alignment_check(
                enc, proj, lambda im: fn_p(aux_params, im), x[:32]
            )
            report["vf_alignment"] = vf
            print(f"VF alignment: mean cosine {vf['mean_cosine']:.3f}, "
                  f"frac>0.5 {vf['frac_above_0.5']:.2f}")

    mean_psnr = np.mean([r["psnr"] for r in recon.values()]) if recon else float("nan")
    print(
        f"users {len(recon)}: mean psnr {mean_psnr:.2f}, "
        f"between/within {disc['between_within_ratio']:.3f}, "
        f"centroid acc {disc['nearest_centroid_acc']:.3f}"
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {args.out}")
    if args.export_encoder:
        print(f"encoder exported to {export_encoder(vae, args.export_encoder)}")


if __name__ == "__main__":
    main()
