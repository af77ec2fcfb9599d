"""Latent-shard dataset over safetensors files.

Parity target: LightningDiT/datasets/img_latent_dataset.py:16-90 — shards
hold {latents, latents_flip, labels} (latents stored CHW for on-disk format
compatibility with the reference), per-item lazy slice reads, a random
original/flip choice, channel-wise normalization (x − μ)/σ · multiplier,
and channel stats computed from ≤10k random samples then cached.

Differences by design:
  - returns NHWC numpy (the TPU layout); the CHW→HWC transpose happens at
    read time.
  - stats cache is ``latents_stats.safetensors`` (pure numpy I/O); the
    reference's torch ``latents_stats.pt`` is read transparently if present
    so reference-produced shard dirs work as-is.
  - batching is an explicit seeded iterator (replaces DataLoader+sampler);
    per-host sharding for multi-process runs is index-striped.
"""
from __future__ import annotations

import os
from glob import glob
from typing import Iterator, Optional, Tuple

import numpy as np
from safetensors import safe_open
from vavae_tpu.utils.safetensors_io import save_file


class ImgLatentDataset:
    def __init__(
        self,
        data_dir: str,
        latent_norm: bool = True,
        latent_multiplier: float = 1.0,
        seed: int = 0,
    ):
        self.data_dir = data_dir
        self.latent_norm = latent_norm
        self.latent_multiplier = float(latent_multiplier)
        self._rng = np.random.default_rng(seed)

        self.files = sorted(glob(os.path.join(data_dir, "*.safetensors")))
        self.files = [f for f in self.files if not f.endswith("latents_stats.safetensors")]
        if not self.files:
            raise FileNotFoundError(f"no latent shards in {data_dir}")

        # index -> (file, offset) map
        self._index: list[tuple[str, int]] = []
        for path in self.files:
            with safe_open(path, framework="numpy") as f:
                n = f.get_slice("labels").get_shape()[0]
            self._index.extend((path, i) for i in range(n))

        self._mean: Optional[np.ndarray] = None
        self._std: Optional[np.ndarray] = None
        if latent_norm:
            self._mean, self._std = self._latent_stats()

        # native (C++/mmap/threaded) batch assembler; pure-Python fallback
        self._native = None
        if os.environ.get("VAVAE_NATIVE_LOADER", "1") != "0":
            try:
                from vavae_tpu.data.native_loader import NativeShardReader

                self._native = NativeShardReader(self.files)
                if len(self._native) != len(self._index):
                    self._native = None
            except Exception:
                self._native = None

    # -- stats ---------------------------------------------------------------

    def _latent_stats(self) -> Tuple[np.ndarray, np.ndarray]:
        """Channel stats (1, C, 1, 1) matching the reference cache layout."""
        np_cache = os.path.join(self.data_dir, "latents_stats.safetensors")
        pt_cache = os.path.join(self.data_dir, "latents_stats.pt")
        if os.path.exists(np_cache):
            with safe_open(np_cache, framework="numpy") as f:
                return f.get_tensor("mean"), f.get_tensor("std")
        if os.path.exists(pt_cache):
            import torch

            stats = torch.load(pt_cache, map_location="cpu", weights_only=False)
            return stats["mean"].numpy(), stats["std"].numpy()
        mean, std = self.compute_latent_stats()
        # atomic publish: concurrent processes may compute simultaneously
        # (multi-process startup with a cold cache); a reader must never
        # safe_open a half-written file
        tmp = f"{np_cache}.tmp.{os.getpid()}"
        save_file({"mean": mean, "std": std}, tmp)
        os.replace(tmp, np_cache)
        return mean, std

    def compute_latent_stats(self, num_samples: int = 10000) -> Tuple[np.ndarray, np.ndarray]:
        n = min(num_samples, len(self._index))
        idxs = self._rng.choice(len(self._index), n, replace=False)
        lats = np.stack([self._read("latents", int(i)) for i in idxs])  # (n, C, H, W)
        mean = lats.mean(axis=(0, 2, 3), keepdims=True)[0][None]  # (1, C, 1, 1)
        std = lats.std(axis=(0, 2, 3), keepdims=True, ddof=1)[0][None]
        return mean.astype(np.float32), std.astype(np.float32)

    @property
    def latent_stats(self) -> Tuple[np.ndarray, np.ndarray]:
        """(mean, std) each (1, C, 1, 1) — used by sampling to un-normalize."""
        if self._mean is None:
            return (
                np.zeros((1, 1, 1, 1), np.float32),
                np.ones((1, 1, 1, 1), np.float32),
            )
        return self._mean, self._std

    # -- item access -----------------------------------------------------------

    def _read(self, key: str, idx: int) -> np.ndarray:
        path, off = self._index[idx]
        with safe_open(path, framework="numpy") as f:
            return np.asarray(f.get_slice(key)[off : off + 1])[0]

    def __len__(self) -> int:
        return len(self._index)

    def _item(self, idx: int, flip: bool) -> Tuple[np.ndarray, np.ndarray]:
        lat = self._read("latents_flip" if flip else "latents", idx).astype(np.float32)
        label = self._read("labels", idx)
        if self.latent_norm:
            lat = (lat - self._mean[0]) / self._std[0]
        lat = lat * self.latent_multiplier
        return np.transpose(lat, (1, 2, 0)), np.asarray(label, np.int32)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (latent NHWC-single (H, W, C) float32, label int32)."""
        return self._item(idx, bool(self._rng.random() > 0.5))

    # -- batching ---------------------------------------------------------------

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        epochs: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (latents (B, H, W, C), labels (B,)) numpy batches forever
        (or for ``epochs`` passes). ``batch_size`` is the PER-PROCESS size."""
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(self))
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            if process_count > 1:
                # equalize BEFORE striping: otherwise processes get counts
                # differing by one and a data-parallel step's collective on
                # the extra batch waits forever (multihost deadlock)
                order = order[: len(order) - (len(order) % process_count)]
            order = order[process_index::process_count]
            stop = len(order) - (len(order) % batch_size) if drop_last else len(order)
            if stop == 0:
                msg = (
                    f"per-process dataset ({len(order)} items after striping "
                    f"{process_count} ways) is smaller than batch_size "
                    f"{batch_size}"
                    + (" with drop_last" if drop_last else "")
                    + " — the epoch yields zero batches"
                )
                if epochs is None:
                    # an infinite loop would otherwise spin forever yielding
                    # nothing, blocking the caller with no error message
                    raise ValueError(msg + " and epochs=None would spin forever")
                import warnings

                warnings.warn(msg, stacklevel=2)
            # disjoint seed space from the shuffle stream (seed+epoch):
            # seeding flips with seed+epoch+1 would make epoch e's flips and
            # epoch e+1's permutation the same PCG64 stream
            flip_rng = np.random.default_rng([seed, epoch, 1])
            mean, std = self.latent_stats if self.latent_norm else (
                np.zeros((1, self._native.C if self._native else 1, 1, 1), np.float32),
                np.ones((1, self._native.C if self._native else 1, 1, 1), np.float32),
            )
            for s in range(0, stop, batch_size):
                idxs = order[s : s + batch_size]
                # ONE flip stream for both paths: the fallback must replay
                # the exact flips the native loader would draw for the same
                # (seed, epoch) — resuming on a box without the native
                # reader keeps the data order reproducible
                flips = (flip_rng.random(len(idxs)) > 0.5).astype(np.uint8)
                if self._native is not None:
                    lats, labels = self._native.batch(
                        idxs.astype(np.int64), flips, mean, std, self.latent_multiplier
                    )
                    yield lats, labels
                else:
                    items = [self._item(int(i), bool(fl)) for i, fl in zip(idxs, flips)]
                    lats = np.stack([it[0] for it in items])
                    labels = np.stack([it[1] for it in items]).reshape(-1)
                    yield lats, labels
            epoch += 1
