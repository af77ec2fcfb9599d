"""Image-folder datasets (VAE training / micro-Doppler).

Parity targets:
  - vavae/ldm/data/microdoppler.py:7-50 (recursive scan, resize +
    center-crop, [-1, 1] scaling)
  - microdoppler_dataset_diffusion.py:16-120 (split-file driven, user ids)
Returns NHWC float32 batches.
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".JPEG", ".PNG")


def _load_image(path: str, image_size: int) -> np.ndarray:
    """Resize (short side) + center crop + [-1, 1], matching the LDM
    microdoppler transform (resize to size, center-crop, scale)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        scale = image_size / min(w, h)
        im = im.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        arr = np.asarray(im, np.float32)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    arr = arr[cy : cy + image_size, cx : cx + image_size]
    return arr / 127.5 - 1.0


class ImageFolderDataset:
    """Recursive folder scan; class id from the immediate parent dir when the
    layout is class-per-subdir, else 0."""

    def __init__(self, root: str, image_size: int = 256, recursive: bool = True):
        self.root = root
        self.image_size = image_size
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.items: List[Tuple[str, int]] = []
        if classes:
            for c in classes:
                pattern = os.path.join(root, c, "**", "*") if recursive else os.path.join(root, c, "*")
                for p in sorted(glob(pattern, recursive=recursive)):
                    if p.endswith(IMG_EXTS):
                        self.items.append((p, self.class_to_idx[c]))
        else:
            for p in sorted(glob(os.path.join(root, "*"))):
                if p.endswith(IMG_EXTS):
                    self.items.append((p, 0))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        path, label = self.items[idx]
        return _load_image(path, self.image_size), label

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
        workers: int = 8,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """``workers`` threads decode the images of each batch concurrently
        (PIL decode/resize releases the GIL; the torch-DataLoader-workers
        equivalent for the image-input training loops). Ordering and the
        shuffle stream are identical for any worker count."""
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=max(1, workers)) if workers > 1 else None
        try:
            epoch = 0
            while epochs is None or epoch < epochs:
                order = np.arange(len(self))
                if shuffle:
                    np.random.default_rng(seed + epoch).shuffle(order)
                order = order[process_index::process_count]
                stop = len(order) - (len(order) % batch_size) if drop_last else len(order)
                for s in range(0, stop, batch_size):
                    idxs = [int(i) for i in order[s : s + batch_size]]
                    items = list(pool.map(self.__getitem__, idxs)) if pool else [
                        self[i] for i in idxs
                    ]
                    imgs, labels = zip(*items)
                    yield np.stack(imgs), np.asarray(labels, np.int32)
                epoch += 1
        finally:
            if pool:
                pool.shutdown(wait=False)


class SplitFileDataset(ImageFolderDataset):
    """Micro-Doppler split-file dataset (prepare_dataset_split.py JSON format:
    {"train": [{"path":..., "user_id":...}, ...], "val": [...]})."""

    def __init__(self, split_file: str, split: str = "train", image_size: int = 256,
                 root: Optional[str] = None, user_id: Optional[int] = None):
        self.image_size = image_size
        with open(split_file) as f:
            data = json.load(f)
        entries = data[split]
        self.items = []
        for e in entries:
            if isinstance(e, dict):
                path, uid = e.get("path") or e.get("file"), int(e.get("user_id", e.get("label", 0)))
            else:
                path, uid = e[0], int(e[1])
            if root and not os.path.isabs(path):
                path = os.path.join(root, path)
            if user_id is None or uid == user_id:
                self.items.append((path, uid))
        self.class_to_idx = {}
