"""Micro-Doppler dataset split: 31-user folder scan → train/val JSON.

Parity target: prepare_dataset_split.py:13-150 — per-user 8:2 split with
seed 42, JSON manifest {train: [{path, user_id}], val: [...]}, plus a
validation pass over the split.
"""
from __future__ import annotations

import argparse
import json
import os
from glob import glob

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".JPEG", ".PNG")


def create_dataset_split(
    data_root: str,
    output_file: str,
    train_ratio: float = 0.8,
    seed: int = 42,
) -> dict:
    users = sorted(
        d for d in os.listdir(data_root) if os.path.isdir(os.path.join(data_root, d))
    )
    rng = np.random.default_rng(seed)
    split = {"train": [], "val": [], "user_map": {u: i for i, u in enumerate(users)}}
    for uid, user in enumerate(users):
        files = sorted(
            f
            for f in glob(os.path.join(data_root, user, "**", "*"), recursive=True)
            if f.endswith(IMG_EXTS)
        )
        order = rng.permutation(len(files))
        n_train = int(round(len(files) * train_ratio))
        for rank, idx in enumerate(order):
            entry = {"path": files[idx], "user_id": uid}
            (split["train"] if rank < n_train else split["val"]).append(entry)
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as f:
        json.dump(split, f, indent=2)
    return split


def validate_split(split_file: str) -> dict:
    with open(split_file) as f:
        split = json.load(f)
    stats: dict = {"num_users": len(split.get("user_map", {})),
                   "train": len(split["train"]), "val": len(split["val"])}
    train_paths = {e["path"] for e in split["train"]}
    val_paths = {e["path"] for e in split["val"]}
    stats["overlap"] = len(train_paths & val_paths)
    assert stats["overlap"] == 0, "train/val leak!"
    per_user: dict = {}
    for e in split["train"]:
        per_user.setdefault(e["user_id"], [0, 0])[0] += 1
    for e in split["val"]:
        per_user.setdefault(e["user_id"], [0, 0])[1] += 1
    stats["per_user"] = per_user
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--output", default="dataset_split.json")
    ap.add_argument("--train_ratio", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    split = create_dataset_split(args.data_root, args.output, args.train_ratio, args.seed)
    print(f"train {len(split['train'])}, val {len(split['val'])}, "
          f"users {len(split['user_map'])}")
    print(validate_split(args.output))


if __name__ == "__main__":
    main()
