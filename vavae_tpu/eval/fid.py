"""Fréchet Inception Distance: activation statistics + Fréchet math.

Parity target: LightningDiT/tools/calculate_fid.py:524-651
(calculate_frechet_distance with scipy sqrtm + eps fallback;
calculate_fid_given_paths over png folders / ADM npz files with an optional
sample-count cap) and tools/save_npz.py (ADM arr_0 packer).
"""
from __future__ import annotations

import os
from glob import glob
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||μ1−μ2||² + Tr(Σ1 + Σ2 − 2√(Σ1Σ2)) with the standard eps fallback."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


class FIDExtractor:
    """Jitted InceptionV3-FID activations over uint8/float image batches."""

    def __init__(self, weights_path: Optional[str] = None, batch_size: int = 50):
        from vavae_tpu.eval.inception import load_inception

        self.model, self.variables = load_inception(weights_path)
        self.batch_size = batch_size
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def activations(self, images: Iterable[np.ndarray]) -> np.ndarray:
        """images: iterable of (B, H, W, 3) uint8 or float[0,1] arrays."""
        out: list = []
        for batch in images:
            x = np.asarray(batch)
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            # pad the tail batch to the compiled batch size, then trim
            n = x.shape[0]
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n, *x.shape[1:]), x.dtype)
                x = np.concatenate([x, pad])
            acts = np.asarray(self._apply(self.variables, jnp.asarray(x)))[:n]
            out.append(acts)
        if not out:
            raise ValueError(
                "no images to extract activations from — empty folder/npz "
                "or a wrong path"
            )
        return np.concatenate(out)


def _iter_folder(path: str, batch_size: int, max_images: Optional[int]):
    from PIL import Image

    files = sorted(
        f
        for f in glob(os.path.join(path, "*"))
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))
    )
    if max_images:
        files = files[:max_images]
    for s in range(0, len(files), batch_size):
        imgs = []
        for f in files[s : s + batch_size]:
            with Image.open(f) as im:
                imgs.append(np.asarray(im.convert("RGB"), np.uint8))
        yield np.stack(imgs)


def _iter_npz(path: str, batch_size: int, max_images: Optional[int]):
    data = np.load(path)["arr_0"]  # ADM format (N, H, W, 3) uint8
    if max_images:
        data = data[:max_images]
    for s in range(0, len(data), batch_size):
        yield data[s : s + batch_size]


def _precomputed_stats(path: str):
    """(mu, sigma) when ``path`` is a precomputed stats npz, else None."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            if "mu" in f and "sigma" in f:
                return f["mu"], f["sigma"]
    return None


def compute_statistics_of_path(
    path: str,
    extractor: FIDExtractor,
    max_images: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    stats = _precomputed_stats(path)
    if stats is not None:
        return stats
    if path.endswith(".npz"):
        it = _iter_npz(path, extractor.batch_size, max_images)
    else:
        it = _iter_folder(path, extractor.batch_size, max_images)
    try:
        acts = extractor.activations(it)
    except ValueError as e:
        raise ValueError(f"{e}: {path!r}") from None
    return activation_statistics(acts)


def fid_given_paths(
    path1: str,
    path2: str,
    weights_path: Optional[str] = None,
    batch_size: int = 50,
    max_images: Optional[int] = None,
) -> float:
    """FID between two image folders / npz files (reference :629-651).

    The Inception extractor (and its weights) loads lazily — two
    precomputed mu/sigma npz files compare without any weights, which is
    the whole point of --save_stats."""
    stats = [_precomputed_stats(path1), _precomputed_stats(path2)]
    if not all(s is not None for s in stats):
        ex = FIDExtractor(weights_path, batch_size)
        for i, (s, p) in enumerate(zip(stats, (path1, path2))):
            if s is None:
                stats[i] = compute_statistics_of_path(p, ex, max_images)
    (mu1, s1), (mu2, s2) = stats
    return frechet_distance(mu1, s1, mu2, s2)


def fid_folder_vs_npz(folder: str, npz_path: str, **kw) -> float:
    return fid_given_paths(folder, npz_path, **kw)


def create_npz_from_sample_folder(
    folder: str, num: int = 50000, out: Optional[str] = None
) -> str:
    """Pack %06d.png samples into ADM-format arr_0 npz (tools/save_npz.py).

    Writes directly to ``out`` when given (no tempfile-then-rename: a rename
    fails across filesystems and would clobber the default {folder}.npz as a
    side effect); defaults to the reference's {folder}.npz."""
    from PIL import Image

    samples = []
    for i in range(num):
        with Image.open(os.path.join(folder, f"{i:06d}.png")) as im:
            samples.append(np.asarray(im.convert("RGB"), np.uint8))
    arr = np.stack(samples)
    out = out or f"{folder}.npz"
    np.savez(out, arr_0=arr)
    return out


def main() -> None:
    """Runnable FID tool mirroring the reference CLIs.

    Parity targets: ``tools/calculate_fid.py`` (``python calculate_fid.py
    path1 path2`` → FID between two folders/npz), ``tools/save_npz.py``
    (pack a %06d.png sample folder into an ADM arr_0 npz), plus a
    pytorch-fid-style ``--save_stats`` mode that precomputes mu/sigma for a
    reference set so repeated evals skip the 50k Inception pass.
    """
    import argparse

    import vavae_tpu.utils.jax_cache  # noqa: F401  (VAVAE_PLATFORM pin)

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("paths", nargs="*",
                    help="two image folders / npz files (arr_0 or mu+sigma)")
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--weights", default=None,
                    help="FID InceptionV3 torch weights (default: "
                         "$VAVAE_FID_WEIGHTS)")
    ap.add_argument("--save_stats", default=None,
                    help="compute mu/sigma of paths[0] and write them to "
                         "this npz instead of computing a FID")
    ap.add_argument("--save_npz", default=None,
                    help="pack the %%06d.png folder paths[0] into an ADM "
                         "arr_0 npz (tools/save_npz.py) instead of a FID")
    ap.add_argument("--num", type=int, default=50000,
                    help="image count for --save_npz")
    args = ap.parse_args()

    if args.save_npz:
        if len(args.paths) != 1:
            ap.error("--save_npz takes exactly one sample folder")
        create_npz_from_sample_folder(
            args.paths[0], num=args.num, out=args.save_npz
        )
        print(f"saved {args.num} samples to {args.save_npz}")
        return
    if args.save_stats:
        if len(args.paths) != 1:
            ap.error("--save_stats takes exactly one image folder / npz")
        ex = FIDExtractor(args.weights, args.batch_size)
        mu, sigma = compute_statistics_of_path(args.paths[0], ex, args.max_images)
        np.savez(args.save_stats, mu=mu, sigma=sigma)
        print(f"saved statistics of {args.paths[0]} to {args.save_stats}")
        return
    if len(args.paths) != 2:
        ap.error("need exactly two paths to compute a FID")
    score = fid_given_paths(
        args.paths[0], args.paths[1],
        weights_path=args.weights,
        batch_size=args.batch_size,
        max_images=args.max_images,
    )
    print(f"FID: {score:.6f}")


if __name__ == "__main__":
    main()
