"""Convert pre-encoded .pt latent dumps into official safetensors shards.

Parity target: prepare_safetensors_dataset.py:13-167 — reads
``{split}_latents.pt`` (a dict with ``latents``/``user_ids``, a list of
per-sample dicts keyed ``latent``/``tensor``/``latents`` (+``user_id``), a
bare list of tensors, or one stacked tensor), computes channel-wise
mean/std over dims [0,2,3], writes ``latents_stats.pt``, and packs shards
of 1000 as ``latents_rank00_shard{k:03d}.safetensors`` holding
{latents, latents_flip, labels} (flip == latents: the legacy dumps carry no
flip augmentation).

Reference quirk, surfaced as a flag: prepare_safetensors_dataset.py:131-132
EXTRACTS user_ids but then writes all-zero labels (unconditional). Default
here matches that behavior; ``--use_labels`` keeps the real user ids so the
converted shards can drive conditional training.

Output is consumed by ``data/latent_dataset.ImgLatentDataset`` (which also
reads the torch stats cache transparently) and byte-compatible with the
reference's ImgLatentDataset.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np
from vavae_tpu.utils.safetensors_io import save_file


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return np.asarray(t, np.float32)
    return np.asarray(t.detach().cpu().to(dtype=__import__("torch").float32))


def load_legacy_latents(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Torch-load a legacy latent dump in any of the reference's accepted
    layouts → (latents [N,C,H,W] f32, user_ids [N] or None)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    user_ids: Optional[np.ndarray] = None

    if isinstance(data, dict):
        latents = data["latents"]
        if data.get("user_ids") is not None:
            user_ids = np.asarray(data["user_ids"], np.int64)
    elif isinstance(data, (list, tuple)):
        if not data:
            raise ValueError(f"{path}: empty latent list")
        if isinstance(data[0], dict):
            lat_list, uid_list = [], []
            for item in data:
                for key in ("latent", "tensor", "latents"):
                    if key in item:
                        lat_list.append(item[key])
                        break
                else:
                    tensor_keys = [
                        k for k, v in item.items() if isinstance(v, torch.Tensor)
                    ]
                    if not tensor_keys:
                        continue  # reference skips non-tensor entries too
                    lat_list.append(item[tensor_keys[0]])
                uid_list.append(int(item.get("user_id", 0)))
            latents = torch.stack([torch.as_tensor(t) for t in lat_list])
            user_ids = np.asarray(uid_list, np.int64)
        else:
            latents = torch.stack([torch.as_tensor(t) for t in data])
    else:  # single stacked tensor (or one CHW sample)
        latents = data.unsqueeze(0) if data.dim() == 3 else data

    lat = _to_numpy(latents)
    if lat.ndim != 4:
        raise ValueError(f"{path}: expected [N,C,H,W] latents, got {lat.shape}")
    if user_ids is not None and len(user_ids) != len(lat):
        raise ValueError(
            f"{path}: {len(user_ids)} user_ids for {len(lat)} latents"
        )
    return lat, user_ids


def convert_split(
    input_dir: str,
    output_dir: str,
    split: str,
    shard_size: int = 1000,
    use_labels: bool = False,
) -> int:
    """Convert ``{input_dir}/{split}_latents.pt`` → shards in output_dir.
    Returns the number of shards written."""
    src = os.path.join(input_dir, f"{split}_latents.pt")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    os.makedirs(output_dir, exist_ok=True)

    latents, user_ids = load_legacy_latents(src)
    n = len(latents)

    # channel stats over [0,2,3], cached in BOTH formats: the reference's
    # torch layout ([C,1,1] tensors in latents_stats.pt) and our numpy cache
    # ((1,C,1,1) in latents_stats.safetensors) so either consumer skips the
    # sampling pass.
    mean = latents.mean(axis=(0, 2, 3), keepdims=True)  # (1,C,1,1)
    std = latents.std(axis=(0, 2, 3), keepdims=True, ddof=1)
    import torch

    torch.save(
        {"mean": torch.from_numpy(mean[0]), "std": torch.from_numpy(std[0])},
        os.path.join(output_dir, "latents_stats.pt"),
    )
    save_file(
        {"mean": mean, "std": std},
        os.path.join(output_dir, "latents_stats.safetensors"),
    )

    if use_labels and user_ids is not None:
        labels = user_ids.astype(np.int64)
    else:
        labels = np.zeros(n, np.int64)  # reference: unconditional zeros

    shards = 0
    for start in range(0, n, shard_size):
        chunk = latents[start : start + shard_size]
        save_file(
            {
                "latents": chunk,
                "latents_flip": chunk,  # no flip aug in the legacy dumps
                "labels": labels[start : start + shard_size],
            },
            os.path.join(output_dir, f"latents_rank00_shard{shards:03d}.safetensors"),
        )
        shards += 1
    print(f"{split}: {n} latents -> {shards} shards in {output_dir}")
    return shards


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_dir", default="./latents",
                    help="dir holding {train,val}_latents.pt")
    ap.add_argument("--output_dir", default="./latents_safetensors")
    ap.add_argument("--splits", default="train,val")
    ap.add_argument("--shard_size", type=int, default=1000)
    ap.add_argument("--use_labels", action="store_true",
                    help="keep real user_ids as labels (reference writes "
                         "zeros even when user_ids exist)")
    args = ap.parse_args()

    for split in [s for s in args.splits.split(",") if s]:
        out = os.path.join(args.output_dir, split)
        convert_split(
            args.input_dir, out, split,
            shard_size=args.shard_size, use_labels=args.use_labels,
        )
    print(f"done; point data_path at {os.path.join(args.output_dir, 'train')}")


if __name__ == "__main__":
    main()
