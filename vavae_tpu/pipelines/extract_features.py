"""Latent extraction: VAE-encode an image folder into safetensors shards.

Parity target: LightningDiT/extract_features.py:15-155 — two deterministic
passes (original + horizontally flipped) encoded with posterior sampling,
written as shards {latents, latents_flip, labels} of ≤10k images, then the
channel-stats cache is built. Shard tensors are stored CHW so the output is
byte-compatible with the reference's ImgLatentDataset consumers.

TPU-native: images are encoded in jit-compiled batches on the device mesh
(batch-sharded); rank-striped file naming replaces DistributedSampler.
"""
from __future__ import annotations

import argparse
import os
from glob import glob
from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from vavae_tpu.utils.safetensors_io import save_file

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.data.prefetch import prefetch as _prefetch
from vavae_tpu.parallel.mesh import make_mesh, multihost_init, process_fname, shard_batch
from vavae_tpu.tokenizer import VA_VAE, preprocess_images

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".JPEG", ".PNG")


def list_image_folder(root: str) -> List[Tuple[str, int]]:
    """ImageFolder semantics: class-per-subdir, sorted class names → ids."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    items: List[Tuple[str, int]] = []
    for ci, cname in enumerate(classes):
        for path in sorted(glob(os.path.join(root, cname, "*"))):
            if path.endswith(IMG_EXTS):
                items.append((path, ci))
    return items


def iter_batches(
    items: List[Tuple[str, int]], batch_size: int, image_size: int
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    from PIL import Image

    for s in range(0, len(items), batch_size):
        chunk = items[s : s + batch_size]
        pil = [Image.open(p) for p, _ in chunk]
        x = preprocess_images(pil, image_size, hflip=False)
        x_flip = x[:, :, ::-1, :].copy()
        labels = np.array([l for _, l in chunk], np.int32)
        for im in pil:
            im.close()
        yield x, x_flip, labels


def extract(
    data_path: str,
    output_path: str,
    vae: VA_VAE,
    batch_size: int = 64,
    image_size: int = 256,
    shard_size: int = 10000,
    seed: int = 0,
    split_file: str | None = None,
    split: str = "train",
) -> None:
    multihost_init()
    os.makedirs(output_path, exist_ok=True)
    if split_file:
        # split-file driven extraction (extract_microdoppler_features.py:87-110
        # + microdoppler_dataset_diffusion.py) — user ids become labels
        from vavae_tpu.data.image_folder import SplitFileDataset

        items = SplitFileDataset(
            split_file, split, image_size=image_size, root=data_path
        ).items
    else:
        items = list_image_folder(data_path)
    # rank-striped split across processes
    items = items[jax.process_index() :: jax.process_count()]

    rng = jax.random.PRNGKey(seed + jax.process_index())
    lat_acc: list[np.ndarray] = []
    flip_acc: list[np.ndarray] = []
    lab_acc: list[np.ndarray] = []
    shard_idx = 0
    count = 0

    def flush():
        nonlocal shard_idx, lat_acc, flip_acc, lab_acc
        if not lab_acc:
            return
        fname = process_fname("latents", ".safetensors", shard_idx)
        save_file(
            {
                # store CHW for byte-compat with the reference shard format
                "latents": np.transpose(np.concatenate(lat_acc), (0, 3, 1, 2)),
                "latents_flip": np.transpose(np.concatenate(flip_acc), (0, 3, 1, 2)),
                "labels": np.concatenate(lab_acc),
            },
            os.path.join(output_path, fname),
        )
        print(f"saved {fname} ({sum(len(a) for a in lab_acc)} items)")
        shard_idx += 1
        lat_acc, flip_acc, lab_acc = [], [], []

    def collect(pending):
        nonlocal count
        z_dev, zf_dev, labels = pending
        lat_acc.append(np.asarray(z_dev, np.float32))
        flip_acc.append(np.asarray(zf_dev, np.float32))
        lab_acc.append(labels)
        count += len(labels)
        if sum(len(a) for a in lab_acc) >= shard_size:
            flush()

    # software pipeline: a background thread decodes images (PIL is the host
    # bottleneck), dispatch for batch i+1 is issued before fetching batch i,
    # so host IO, device compute, and the result transfer overlap
    pending = None
    for x, x_flip, labels in _prefetch(iter_batches(items, batch_size, image_size)):
        rng, r1, r2 = jax.random.split(rng, 3)
        z_dev = vae.encode_images(x, rng=r1)
        zf_dev = vae.encode_images(x_flip, rng=r2)
        if pending is not None:
            collect(pending)
        pending = (z_dev, zf_dev, labels)
    if pending is not None:
        collect(pending)
    flush()
    print(f"process {jax.process_index()}: encoded {count} images")

    if jax.process_index() == 0:
        # build the stats cache (reference extract_features.py:154)
        from vavae_tpu.data.latent_dataset import ImgLatentDataset

        ImgLatentDataset(output_path, latent_norm=True)
        print("latent stats cached")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="tokenizer config yaml")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--split_file", default=None,
                    help="split JSON (any reference layout); labels = user ids")
    ap.add_argument("--split", default="train")
    ap.add_argument("--dtype", choices=("fp32", "bf16"), default="fp32",
                    help="encoder COMPUTE dtype (params and stored latents stay "
                    "fp32); bf16 roughly halves encode time at a latent "
                    "deviation far below the posterior's own sampling std "
                    "(measured by scripts/bench_vae_infer.py bf16)")
    args = ap.parse_args()
    from vavae_tpu.parallel.mesh import make_mesh

    # the facade pads remainder batches transparently, so every local device
    # participates regardless of batch size
    vae = VA_VAE(args.config, ckpt_path=args.vae_ckpt, img_size=args.image_size,
                 dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
                 mesh=make_mesh())
    extract(
        args.data_path,
        args.output_path,
        vae,
        batch_size=args.batch_size,
        image_size=args.image_size,
        split_file=args.split_file,
        split=args.split,
    )


if __name__ == "__main__":
    main()
