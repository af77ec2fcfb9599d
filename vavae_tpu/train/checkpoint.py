"""Checkpoint manager: msgpack pytree snapshots with step-numbered files.

Replaces the reference's rank0 torch.save({model, ema, opt, config})
(LightningDiT/train.py:240-252). Resume picks the HIGHEST STEP NUMBER — not
the biggest file, which is the reference's known quirk (train.py:164-179).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(ckpt_dir: str, step: int, state: Any, config: Optional[dict] = None) -> str:
    """Serialize a pytree ``state`` to {ckpt_dir}/{step:07d}.msgpack (process 0 only)."""
    if jax.process_index() != 0:
        return ""
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.device_get(state)
    path = os.path.join(ckpt_dir, f"{step:07d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    os.replace(tmp, path)
    if config is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(\d+)\.msgpack", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into a pytree with the same structure as ``target``."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_torch_dit_checkpoint(path: str, prefer_ema: bool = True) -> dict:
    """Read a reference .pt DiT checkpoint into numpy (host-side torch CPU).

    Returns the raw state-dict (keys like 'blocks.0.attn.qkv.weight'); use
    utils/torch_convert.py to map it onto our param tree.
    """
    import torch  # CPU-only torch is available in the image

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    key = "ema" if (prefer_ema and isinstance(ckpt, dict) and "ema" in ckpt) else "model"
    sd = ckpt[key] if isinstance(ckpt, dict) and key in ckpt else ckpt
    return {k.replace("module.", ""): v.numpy() for k, v in sd.items()}
