"""Frozen ViT-L foundation models (DINOv2 / MAE) for VF alignment, in flax.

Parity target: vavae/ldm/models/foundation_models.py:12-64 — timm
``vit_large_patch14_dinov2.lvd142m`` (LayerScale, patch 14) and
``vit_large_patch16_224.mae`` (patch 16), used frozen: resize input to 224
(dinov2 path, bilinear align_corners=False ≈ jax.image half-pixel),
forward_features, drop the cls token, reshape patch tokens to a spatial
feature map (B, h, w, 1024) [reference returns NCHW; we keep NHWC].

Weights: converted from a timm/torch state dict provided locally
(VAVAE_DINOV2_WEIGHTS / VAVAE_MAE_WEIGHTS) — no downloads here.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_layerscale: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * C, name="qkv")(h).reshape(B, N, 3, self.num_heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (C // self.num_heads) ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, C)
        attn = nn.Dense(C, name="proj")(attn)
        if self.use_layerscale:
            attn = attn * self.param("ls1", nn.initializers.constant(1e-5), (C,))
        x = x + attn

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2")(h)
        if self.use_layerscale:
            h = h * self.param("ls2", nn.initializers.constant(1e-5), (C,))
        return x + h


class TimmViT(nn.Module):
    """timm-compatible ViT encoder returning normed tokens (B, 1+N, D)."""

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    use_layerscale: bool = True
    pretrain_grid: int = 37  # pos-embed grid of the pretrained ckpt (518/14)

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            name="patch_embed",
        )(x)
        x = x.reshape(B, gh * gw, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.pretrain_grid**2, self.embed_dim),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            # timm resample_abs_pos_embed: F.interpolate(bicubic,
            # antialias=True) — torch-exact static weight matrices
            # (utils/interp.py), NOT jax.image.resize (different kernel)
            from vavae_tpu.utils.interp import torch_resize_2d

            g = self.pretrain_grid
            grid = pos_patch.reshape(1, g, g, self.embed_dim)
            grid = torch_resize_2d(grid, (gh, gw), "bicubic", antialias=True)
            pos_patch = grid.reshape(1, gh * gw, self.embed_dim)

        x = x + pos_patch
        cls_tok = jnp.tile(cls + pos_cls, (B, 1, 1))
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(self.depth):
            x = ViTBlock(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.use_layerscale,
                name=f"block_{i}",
            )(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


@dataclasses.dataclass
class FoundationModel:
    """aux_foundation_model equivalent: images [-1,1] NHWC → feature map."""

    kind: str = "dinov2"  # or "mae"; "-tiny" suffix = smoke testbed (below)
    feature_dim: int = 1024

    def __post_init__(self):
        # "<kind>-tiny" keeps the patch/grid conventions but shrinks the net
        # (dim 64, depth 2) so CPU drives/tests can exercise the full
        # VF-alignment plumbing without a ViT-L forward. No pretrained
        # weights exist for it — use --allow_random_foundation.
        base, _, variant = self.kind.partition("-")
        tiny = dict(embed_dim=64, depth=2, num_heads=2) if variant == "tiny" else {}
        if variant not in ("", "tiny"):
            raise ValueError(self.kind)
        if tiny:
            self.feature_dim = tiny["embed_dim"]
        if base == "dinov2":
            self.model = TimmViT(
                patch_size=14, use_layerscale=True, pretrain_grid=37, **tiny
            )
        elif base == "mae":
            self.model = TimmViT(
                patch_size=16, use_layerscale=False, pretrain_grid=14, **tiny
            )
        else:
            raise ValueError(self.kind)
        self.params: Optional[dict] = None

    def load(self, weights_path: Optional[str] = None) -> "FoundationModel":
        env = (
            "VAVAE_DINOV2_WEIGHTS"
            if self.kind.startswith("dinov2")
            else "VAVAE_MAE_WEIGHTS"
        )
        if self.kind.endswith("-tiny"):
            # tiny testbed variants have no pretrained weights by definition
            raise FileNotFoundError(
                f"{self.kind} is the weight-free smoke testbed — there are no "
                "pretrained weights to load; use init_random() / "
                "--allow_random_foundation"
            )
        weights_path = weights_path or os.environ.get(env)
        if not (weights_path and os.path.exists(weights_path)):
            raise FileNotFoundError(
                f"{self.kind} ViT-L weights not found; set {env}=/path/to/ckpt"
            )
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.params = jax.tree_util.tree_map(
            jnp.asarray, vit_params_from_timm({k: v.numpy() for k, v in sd.items()})
        )
        return self

    def init_random(self, rng) -> "FoundationModel":
        """Random-init fallback (tests / smoke runs without weights)."""
        size = 224  # init only shapes the traced input; all kinds use 224
        x = jnp.zeros((1, size, size, 3))
        self.params = self.model.init({"params": rng}, x)["params"]
        return self

    def feature_fn_p(self):
        """Param-explicit feature fn for use INSIDE jit: fn(params, x).

        Pass ``self.params`` as a jit argument rather than closing over it —
        a closed-over param tree gets embedded into the compiled module as
        inline constants (ViT-L is ~1.2 GB of them), exploding trace/compile
        time."""
        model, kind = self.model, self.kind

        def fn(params, x):
            B = x.shape[0]
            if kind.partition("-")[0] == "dinov2":
                # foundation_models.py:56 F.interpolate(bilinear,
                # align_corners=False) — NO antialias; jax.image.resize
                # antialiases downsamples by default and would diverge
                from vavae_tpu.utils.interp import torch_resize_2d

                x = torch_resize_2d(x, (224, 224), "bilinear", antialias=False)
            # reshape by the net's actual token grid. The reference reshapes
            # by original/16 (foundation_models.py:57), which coincides with
            # the true grid at its only input size (256: 224/14 = 256/16 =
            # 16; mae: no resize, patch 16) — the true grid additionally
            # stays correct for other sizes (the tiny testbeds drive 32 px).
            gh = x.shape[1] // model.patch_size
            gw = x.shape[2] // model.patch_size
            tokens = model.apply({"params": params}, x)
            patch = tokens[:, 1:]
            return jax.lax.stop_gradient(patch.reshape(B, gh, gw, -1))

        return fn

    def feature_fn(self):
        """Convenience host-side fn(images NHWC [-1,1]) -> (B, h, w, 1024).

        For calls inside a jitted step use ``feature_fn_p`` and pass
        ``self.params`` explicitly."""
        assert self.params is not None, "call load() or init_random() first"
        fn_p = self.feature_fn_p()
        params = self.params
        return lambda x: fn_p(params, x)


def vit_params_from_timm(sd) -> dict:
    """Convert a timm ViT state dict to the TimmViT param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    for i in range(depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
            "qkv": {
                "kernel": np.transpose(sd[f"{p}.attn.qkv.weight"], (1, 0)),
                "bias": sd[f"{p}.attn.qkv.bias"],
            },
            "proj": {
                "kernel": np.transpose(sd[f"{p}.attn.proj.weight"], (1, 0)),
                "bias": sd[f"{p}.attn.proj.bias"],
            },
            "fc1": {
                "kernel": np.transpose(sd[f"{p}.mlp.fc1.weight"], (1, 0)),
                "bias": sd[f"{p}.mlp.fc1.bias"],
            },
            "fc2": {
                "kernel": np.transpose(sd[f"{p}.mlp.fc2.weight"], (1, 0)),
                "bias": sd[f"{p}.mlp.fc2.bias"],
            },
        }
        if f"{p}.ls1.gamma" in sd:
            blk["ls1"] = sd[f"{p}.ls1.gamma"]
            blk["ls2"] = sd[f"{p}.ls2.gamma"]
        params[f"block_{i}"] = blk
    return params
