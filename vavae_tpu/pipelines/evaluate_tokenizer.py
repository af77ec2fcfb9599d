"""Tokenizer reconstruction evaluation: rFID, PSNR, SSIM, LPIPS.

Parity target: LightningDiT/evaluate_tokenizer.py:38-221 — encode/decode the
validation set, dump reference + decoded PNGs, compute PSNR/SSIM/LPIPS on
the [0,1] pairs and rFID between the two folders; metrics averaged across
processes.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.eval.metrics import psnr, ssim
from vavae_tpu.pipelines.extract_features import iter_batches, list_image_folder
from vavae_tpu.tokenizer import VA_VAE


def evaluate_tokenizer(
    vae: VA_VAE,
    data_path: str,
    output_path: Optional[str] = None,
    max_images: Optional[int] = None,
    batch_size: int = 16,
    image_size: int = 256,
    lpips_weights: Optional[str] = None,
    fid_weights: Optional[str] = None,
    sample_posterior: bool = True,
    seed: int = 0,
) -> dict:
    items = list_image_folder(data_path)
    if max_images:
        items = items[:max_images]
    items = items[jax.process_index() :: jax.process_count()]
    if not items:
        raise ValueError(
            f"no images for process {jax.process_index()} — empty/wrong "
            f"--data_path {data_path!r} or max_images smaller than the "
            "process count"
        )

    lpips_fn = None
    try:
        from vavae_tpu.models.lpips import load_lpips

        lp_model, lp_vars = load_lpips(lpips_weights)
        _lpips_jit = jax.jit(lambda v, a, b: lp_model.apply(v, a, b))
        lpips_fn = lambda a, b: _lpips_jit(lp_vars, a, b)  # vars as jit arg
    except FileNotFoundError:
        pass

    if output_path:
        os.makedirs(os.path.join(output_path, "ref"), exist_ok=True)
        os.makedirs(os.path.join(output_path, "dec"), exist_ok=True)

    rng = jax.random.PRNGKey(seed)
    psnrs, ssims, lpips_vals = [], [], []
    n_done = 0
    from PIL import Image

    for x, _, _ in iter_batches(items, batch_size, image_size):
        rng, step_rng = jax.random.split(rng)
        if sample_posterior:
            z = vae.encode_images(x, rng=step_rng)
        else:
            z = vae.encode_moments(x).mode()
        dec = np.asarray(vae.decode(z))  # [-1, 1]

        a01 = np.clip((x + 1.0) / 2.0, 0, 1)
        b01 = np.clip((dec + 1.0) / 2.0, 0, 1)
        psnrs.append(np.asarray(psnr(jnp.asarray(a01), jnp.asarray(b01), data_range=1.0)))
        ssims.append(np.asarray(ssim(jnp.asarray(a01), jnp.asarray(b01), data_range=1.0)))
        if lpips_fn is not None:
            lpips_vals.append(np.asarray(lpips_fn(jnp.asarray(x), jnp.asarray(dec))))

        if output_path:
            # rank-tagged names (reference evaluate_tokenizer.py:100):
            # processes share the folders and must never collide
            tag = f"{jax.process_index():02d}"
            for i in range(len(x)):
                Image.fromarray((a01[i] * 255).astype(np.uint8)).save(
                    os.path.join(output_path, "ref", f"{tag}_{n_done + i:06d}.png")
                )
                Image.fromarray((b01[i] * 255).astype(np.uint8)).save(
                    os.path.join(output_path, "dec", f"{tag}_{n_done + i:06d}.png")
                )
        n_done += len(x)

    # cross-process reduction (reference all_reduce(AVG), :144-145) — here a
    # size-weighted mean via summed (value, count) pairs
    sums = np.asarray([
        np.concatenate(psnrs).sum(),
        np.concatenate(ssims).sum(),
        np.concatenate(lpips_vals).sum() if lpips_vals else 0.0,
        float(n_done),
        float(sum(len(v) for v in lpips_vals)),
    ])
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        sums = np.asarray(multihost_utils.process_allgather(jnp.asarray(sums))).sum(axis=0)
    results = {
        "psnr": float(sums[0] / sums[3]),
        "ssim": float(sums[1] / sums[3]),
        "num_images": int(sums[3]),
    }
    if sums[4] > 0:
        results["lpips"] = float(sums[2] / sums[4])

    if output_path:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # every process's PNGs must be on disk before rank 0 reads them
            multihost_utils.sync_global_devices("tokenizer_eval_pngs")
        if jax.process_index() == 0:
            try:
                from vavae_tpu.eval.fid import fid_given_paths

                results["rfid"] = fid_given_paths(
                    os.path.join(output_path, "ref"),
                    os.path.join(output_path, "dec"),
                    weights_path=fid_weights,
                )
            except FileNotFoundError:
                pass
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--output_path", default=None)
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--metrics_json", default=None,
                    help="also dump the results dict as JSON (runbook "
                    "consumers parse this instead of scraping stdout)")
    args = ap.parse_args()
    from vavae_tpu.parallel.mesh import make_mesh

    # the facade pads remainder batches transparently, so every local device
    # participates regardless of batch size
    vae = VA_VAE(args.config, ckpt_path=args.vae_ckpt, img_size=args.image_size,
                 mesh=make_mesh())
    results = evaluate_tokenizer(
        vae,
        args.data_path,
        output_path=args.output_path,
        max_images=args.max_images,
        image_size=args.image_size,
    )
    print(results)
    if args.metrics_json and jax.process_index() == 0:
        import json

        os.makedirs(os.path.dirname(os.path.abspath(args.metrics_json)), exist_ok=True)
        with open(args.metrics_json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
