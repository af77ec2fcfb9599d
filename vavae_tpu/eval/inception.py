"""FID InceptionV3 feature extractor in flax (NHWC, inference-only).

Parity target: LightningDiT/tools/calculate_fid.py:64-210 — the pytorch-fid
InceptionV3 (torchvision inception_v3 with the FID-specific tweaks: average
pools with count_include_pad=False in the A/C/E mixed blocks, max-pool
branch in the final E block, FID weights from pt_inception-2015-12-05).

Weights: converted from the pytorch-fid checkpoint via
``inception_params_from_torch`` (the file must be provided locally —
set VAVAE_FID_WEIGHTS or pass weights_path; there is no download here).
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

FID_DIMS = 2048


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple
    stride: int = 1
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels,
            self.kernel,
            strides=self.stride,
            padding=self.padding,
            use_bias=False,
            name="conv",
            # metric net: fp32 conv math even on TPU (default bf16 multiplies
            # perturb FID features; the SSIM incident, eval/metrics.py)
            precision=jax.lax.Precision.HIGHEST,
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.1, name="bn"
        )(x)
        return nn.relu(x)


def _pad(k):
    """symmetric padding tuple for kernel size k (int or (kh, kw))."""
    if isinstance(k, int):
        k = (k, k)
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


def avg_pool_3x3_nopad_count(x):
    """3×3 stride-1 avg pool, pad 1, count_include_pad=False (FID quirk)."""
    ones = jnp.ones_like(x[..., :1])
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return summed / counts


def max_pool(x, k, s, pad=0):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, k, k, 1),
        (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(5), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_nopad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3_nopad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # "avg" (FID 7b) or "max" (FID 7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = avg_pool_3x3_nopad_count(x)
        else:
            bp = max_pool(x, 3, 1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-d) feature extractor.

    Input: (B, H, W, 3) float in [0, 1]; resized to 299 bilinear and mapped
    to [-1, 1] (the pytorch-fid resize_input/normalize_input path).
    """

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            # calculate_fid.py:196 F.interpolate(bilinear, align_corners=
            # False), no antialias — torch-exact weights (utils/interp.py)
            from vavae_tpu.utils.interp import torch_resize_2d

            x = torch_resize_2d(x, (299, 299), "bilinear", antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(3), name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_type="avg", name="Mixed_7b")(x)
        x = InceptionE(pool_type="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, 2048)


def inception_params_from_torch(sd) -> dict:
    """Convert a pytorch-fid state dict to {params, batch_stats} trees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, dotted, leaf):
        node = tree
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    for key, val in sd.items():
        if key.startswith("fc.") or key.startswith("AuxLogits"):
            continue
        parts = key.split(".")
        mod = ".".join(parts[:-1])  # e.g. Mixed_5b.branch1x1.conv
        leaf = parts[-1]
        if mod.endswith(".conv"):
            if leaf == "weight":
                put(params, mod.replace(".conv", "") + ".conv.kernel",
                    np.transpose(val, (2, 3, 1, 0)))
        elif mod.endswith(".bn"):
            base = mod.replace(".bn", "") + ".bn."
            if leaf == "weight":
                put(params, base + "scale", val)
            elif leaf == "bias":
                put(params, base + "bias", val)
            elif leaf == "running_mean":
                put(stats, base + "mean", val)
            elif leaf == "running_var":
                put(stats, base + "var", val)
    return {"params": params, "batch_stats": stats}


def load_inception(weights_path: str | None = None, allow_random: bool = False):
    """Returns (model, variables). Raises with guidance if weights missing,
    unless ``allow_random`` (or VAVAE_FID_ALLOW_RANDOM=1): random-init weights
    still give valid RELATIVE comparisons (FID(a,a)=0) for smoke runs/tests,
    but absolute values are meaningless — production FID needs the
    pytorch-fid weights."""
    model = InceptionV3FID()
    weights_path = weights_path or os.environ.get("VAVAE_FID_WEIGHTS")
    allow_random = allow_random or os.environ.get("VAVAE_FID_ALLOW_RANDOM") == "1"
    if weights_path and os.path.exists(weights_path):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        variables = jax.tree_util.tree_map(
            jnp.asarray, inception_params_from_torch(sd)
        )
        return model, variables
    if allow_random:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        return model, variables
    raise FileNotFoundError(
        "FID Inception weights not found. Download pt_inception-2015-12-05"
        " (pytorch-fid) and set VAVAE_FID_WEIGHTS=/path/to/weights.pth"
        " (or set VAVAE_FID_ALLOW_RANDOM=1 for smoke runs)"
    )
