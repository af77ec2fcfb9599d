"""LPIPS perceptual metric (VGG16 backbone) in flax, NHWC.

Parity target: LightningDiT/models/lpips.py:47-176 (the taming-transformers
LPIPS: scaling layer, VGG16 feature taps relu{1_2,2_2,3_3,4_3,5_3},
channel-unit-normalized squared diffs, 1×1 linear heads, spatial mean,
sum over taps).

Weights: the GENUINE taming ``vgg.pth`` download (URL_MAP['vgg_lpips'])
contains ONLY the scaling layer and the ``lin*`` 1×1 heads — the reference
builds the VGG16 backbone from ``torchvision.models.vgg16(pretrained=True)``
and loads vgg.pth with strict=False (LightningDiT/models/lpips.py:53,65-68).
So two artifacts are accepted here (no downloads, zero-egress):
  - VAVAE_LPIPS_WEIGHTS: vgg.pth (lin heads), or a FULL LPIPS module dump
    that already bundles ``net.slice*`` conv weights;
  - VAVAE_VGG16_WEIGHTS: the torchvision vgg16 state dict
    (``features.N.weight`` layout) — required iff vgg.pth lacks the convs.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 'features' conv layout: channels per conv, 'M' = maxpool
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# taps AFTER the relu of these conv indices (0-based over convs)
_TAP_AFTER_CONV = {1: 0, 3: 1, 6: 2, 9: 3, 12: 4}
_TAP_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = [None] * 5
        conv_i = 0
        for item in _VGG16_CFG:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            else:
                x = nn.Conv(item, (3, 3), padding=1, name=f"conv{conv_i}",
                            precision=jax.lax.Precision.HIGHEST)(x)
                x = nn.relu(x)
                if conv_i in _TAP_AFTER_CONV:
                    taps[_TAP_AFTER_CONV[conv_i]] = x
                conv_i += 1
        return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips(a, b): inputs (B, H, W, 3) in [-1, 1] → (B,) distances."""

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.asarray(_SHIFT).reshape(1, 1, 1, 3)
        scale = jnp.asarray(_SCALE).reshape(1, 1, 1, 3)
        net = VGG16Features(name="net")
        fa = net((a - shift) / scale)
        fb = net((b - shift) / scale)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}",
                          precision=jax.lax.Precision.HIGHEST)(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def lpips_params_from_torch(sd, vgg_sd=None) -> dict:
    """Convert LPIPS torch weights to our param tree.

    ``sd``: the taming vgg.pth state dict (lin heads; may also bundle the
    VGG convs if it is a full-module dump). ``vgg_sd``: a torchvision vgg16
    state dict (``features.N.*``) consulted for any conv ``sd`` lacks — the
    genuine vgg.pth download has none of them.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vgg_sd = {k: np.asarray(v) for k, v in (vgg_sd or {}).items()}
    params: dict = {"net": {}}
    # torchvision vgg16 features module indices of the convs
    conv_torch_idx = []
    i = 0
    for item in _VGG16_CFG:
        if item == "M":
            i += 1
        else:
            conv_torch_idx.append(i)
            i += 2  # conv + relu

    # the taming checkpoint nests VGG under keys like
    # 'net.slice1.0.weight' … or a flat 'features.N.weight' layout
    def find(names):
        for n in names:
            if n in sd:
                return sd[n]
        for n in names:
            if n in vgg_sd:
                return vgg_sd[n]
        return None

    # slices boundaries in the taming LPIPS implementation
    slice_of_conv = []  # (slice_idx, idx_within_slice) per conv
    slice_bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    for ci, ti in enumerate(conv_torch_idx):
        for si, (lo, hi) in enumerate(slice_bounds):
            if lo <= ti < hi:
                slice_of_conv.append((si + 1, ti - lo))
                break

    for ci, ti in enumerate(conv_torch_idx):
        si, within = slice_of_conv[ci]
        w = find([f"net.slice{si}.{ti}.weight", f"net.slice{si}.{within}.weight",
                  f"features.{ti}.weight", f"net.features.{ti}.weight"])
        bvec = find([f"net.slice{si}.{ti}.bias", f"net.slice{si}.{within}.bias",
                     f"features.{ti}.bias", f"net.features.{ti}.bias"])
        if w is None:
            raise KeyError(
                f"VGG conv {ci} (torch idx {ti}) not found. The genuine taming "
                "vgg.pth contains only the lin heads — also provide the "
                "torchvision vgg16 state dict (features.N.weight layout) via "
                "VAVAE_VGG16_WEIGHTS / the vgg16_path argument."
            )
        params["net"][f"conv{ci}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": bvec,
        }

    for i in range(5):
        w = find([f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"])
        if w is None:
            raise KeyError(f"lin{i} weights not found")
        params[f"lin{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return params


def load_lpips(weights_path: str | None = None, vgg16_path: str | None = None):
    model = LPIPS()
    weights_path = weights_path or os.environ.get("VAVAE_LPIPS_WEIGHTS")
    vgg16_path = vgg16_path or os.environ.get("VAVAE_VGG16_WEIGHTS")
    if weights_path and os.path.exists(weights_path):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        vgg_sd = None
        if vgg16_path and os.path.exists(vgg16_path):
            vgg_sd = torch.load(vgg16_path, map_location="cpu", weights_only=False)
            if hasattr(vgg_sd, "state_dict"):  # a pickled module, not a dict
                vgg_sd = vgg_sd.state_dict()
        params = jax.tree_util.tree_map(
            jnp.asarray, lpips_params_from_torch(sd, vgg_sd)
        )
        return model, {"params": params}
    raise FileNotFoundError(
        "LPIPS VGG weights not found. Provide the taming 'vgg.pth' via "
        "VAVAE_LPIPS_WEIGHTS=/path/to/vgg.pth — and, since that file holds "
        "only the lin heads, the torchvision vgg16 state dict via "
        "VAVAE_VGG16_WEIGHTS=/path/to/vgg16.pth"
    )
