"""VA_VAE / MAR_VAE tokenizer facades: config-driven, jit-compiled encode/decode.

Parity target: LightningDiT/tokenizer/vavae.py:20-82 and marvae.py:8-44 —
ADM center-crop preprocessing, [-1, 1] normalization, ``encode_images``
(posterior sample), ``decode_to_images`` (uint8 HWC via clamp(127.5·x+128)).

Checkpoints: accepts either a reference torch ``.pt/.ckpt`` (converted on
load via utils/torch_convert.py) or this framework's ``.safetensors``
(legacy ``.msgpack`` also restores).
Images flow NHWC end to end.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vavae_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from vavae_tpu.utils.torch_convert import vae_params_from_torch


def center_crop_arr(img, image_size: int) -> np.ndarray:
    """ADM center crop (reference tokenizer/autoencoder.py:501-519): BOX
    downsample by 2 while ≥2× target, BICUBIC resize to target on the short
    side, center crop. ``img`` is a PIL Image; returns (S, S, 3) uint8."""
    from PIL import Image

    while min(*img.size) >= 2 * image_size:
        img = img.resize(tuple(x // 2 for x in img.size), resample=Image.BOX)
    scale = image_size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size), resample=Image.BICUBIC)
    arr = np.array(img)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy : cy + image_size, cx : cx + image_size]


def preprocess_images(pil_images, image_size: int, hflip: bool = False) -> np.ndarray:
    """PIL list → (B, S, S, 3) float32 in [-1, 1], optional horizontal flip."""
    arrs = [center_crop_arr(im.convert("RGB"), image_size) for im in pil_images]
    x = np.stack(arrs).astype(np.float32) / 255.0
    if hflip:
        x = x[:, :, ::-1, :]
    return (x - 0.5) / 0.5


class VA_VAE:
    """Vision-foundation-model-aligned VAE (f16d32 by default)."""

    model_type = "vavae"

    def __init__(
        self,
        config: Optional[str] = None,
        *,
        embed_dim: int = 32,
        ckpt_path: Optional[str] = None,
        img_size: int = 256,
        dtype=jnp.float32,
        seed: int = 0,
        mesh=None,
    ):
        ddconfig = None
        if config is not None:
            with open(config) as f:
                cfg = yaml.safe_load(f)
            embed_dim = cfg["model"]["params"]["embed_dim"]
            # config wins only when it actually NAMES a checkpoint: a yaml
            # carrying `ckpt_path: null` (every training config does) must
            # not silently discard an explicitly-passed ckpt_path — that
            # exact shadowing made extract_features --vae_ckpt run on
            # random weights (round-5 e2e rehearsal caught it)
            ckpt_path = cfg.get("ckpt_path") or ckpt_path
            # honor the FULL ddconfig when the yaml carries one (the
            # reference facade reads only embed_dim, vavae.py:30-42, but its
            # trainer builds from **ddconfig — a non-default architecture
            # must round-trip through this facade too). The facade's
            # img_size keeps controlling `resolution` (attention placement
            # tracks the actual input size, matching the legacy behavior).
            ddconfig = cfg["model"]["params"].get("ddconfig")
        self.embed_dim = embed_dim
        self.img_size = img_size
        self.downsample = 16
        if ddconfig is not None:
            from vavae_tpu.models.vae import vae_from_ddconfig

            self._arch = {
                "ch": ddconfig.get("ch", 128),
                "ch_mult": tuple(ddconfig.get("ch_mult", (1, 1, 2, 2, 4))),
                "num_res_blocks": ddconfig.get("num_res_blocks", 2),
                # None → legacy (16,); an explicit [] genuinely means no attn
                # (must match AutoencoderKL.setup's resolution gating)
                "attn_resolutions": (16,)
                if ddconfig.get("attn_resolutions") is None
                else tuple(ddconfig["attn_resolutions"]),
                "resolution": img_size,
            }
            self.downsample = 2 ** (len(self._arch["ch_mult"]) - 1)
            self.model = vae_from_ddconfig(
                embed_dim,
                {**ddconfig, "resolution": img_size},
                dtype=dtype,
                model_type=self.model_type,
            )
        else:
            self._arch = {
                "ch": 128,
                "ch_mult": (1, 1, 2, 2, 4),
                "num_res_blocks": 2,
                "attn_resolutions": (16,),
                "resolution": img_size,
            }
            self.model = AutoencoderKL(
                embed_dim=embed_dim,
                ch_mult=(1, 1, 2, 2, 4),
                resolution=img_size,
                model_type=self.model_type,
                dtype=dtype,
            )
        self._rng = jax.random.PRNGKey(seed)
        self.params = self._load_params(ckpt_path)

        enc = lambda p, x: self.model.apply({"params": p}, x, method=AutoencoderKL.encode)
        dec = lambda p, z: self.model.apply({"params": p}, z, method=AutoencoderKL.decode)
        if mesh is not None:
            # batch-shard encode/decode over all local devices (extraction /
            # tokenizer-eval drive every chip of a v5e-8 host per call);
            # batch sizes must divide the data-axis size
            from vavae_tpu.parallel.mesh import data_sharding, replicated

            rep = replicated(mesh)
            ds4 = data_sharding(mesh, 4)
            self._encode = jax.jit(enc, in_shardings=(rep, ds4))
            self._decode = jax.jit(dec, in_shardings=(rep, ds4), out_shardings=ds4)
            self.params = jax.device_put(self.params, rep)
            self._ds4 = ds4
            # batches must divide the data axis — _pad_batch rounds up
            # transparently and callers slice back via the true length
            self._batch_mult = mesh.shape["data"] * mesh.shape["fsdp"]
        else:
            self._encode = jax.jit(enc)
            self._decode = jax.jit(dec)
            self._ds4 = None
            self._batch_mult = 1

    def _pad_batch(self, x: jax.Array):
        """Round the batch up to a multiple of the mesh's data-axis size,
        and commit the batch to the data sharding the encode/decode jits
        declare — a chained call (decode of encode's output, whose sharding
        the compiler chose) must be RE-laid out, not rejected: jit raises on
        a committed arg whose sharding differs from in_shardings."""
        B = x.shape[0]
        pad = (-B) % self._batch_mult
        if pad != 0:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        if self._ds4 is not None:
            x = jax.device_put(x, self._ds4)
        return x, B

    def _fresh_params(self):
        # param shapes don't depend on input resolution; init with a small
        # (16-divisible) image to keep the init trace cheap
        z = jnp.zeros((1, 32, 32, 3), jnp.float32)
        return self.model.init({"params": self._rng}, z, sample=False)["params"]

    def _load_params(self, ckpt_path: Optional[str]):
        if ckpt_path is None:
            return self._fresh_params()  # tests / training-from-scratch
        if not os.path.exists(str(ckpt_path)):
            # a typo'd path must not silently yield random weights — every
            # latent/image downstream would be garbage with no error
            raise FileNotFoundError(
                f"VAE checkpoint {ckpt_path!r} does not exist (pass "
                "ckpt_path=None explicitly for fresh random params)"
            )
        if str(ckpt_path).endswith((".msgpack", ".safetensors")):
            from vavae_tpu.train.checkpoint import restore_checkpoint

            return restore_checkpoint(str(ckpt_path), self._fresh_params())
        # torch checkpoint (reference format)
        import torch

        sd = torch.load(str(ckpt_path), map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {
            k: v.numpy()
            for k, v in sd.items()
            if hasattr(v, "numpy") and not k.startswith(("loss.", "foundation_model.", "linear_proj"))
        }
        dec_attn = self._arch["attn_resolutions"] if self.model_type == "vavae" else ()
        return jax.tree_util.tree_map(
            jnp.asarray,
            vae_params_from_torch(
                sd,
                ch=self._arch["ch"],
                ch_mult=self._arch["ch_mult"],
                num_res_blocks=self._arch["num_res_blocks"],
                attn_resolutions=self._arch["attn_resolutions"],
                dec_attn_resolutions=dec_attn,
                resolution=self._arch["resolution"],
            ),
        )

    # -- API (reference vavae.py:61-82) ---------------------------------------

    def encode_images(self, images: np.ndarray, rng: Optional[jax.Array] = None) -> jax.Array:
        """images: (B, H, W, 3) in [-1, 1] → sampled latents (B, h, w, C)."""
        x, B = self._pad_batch(jnp.asarray(images))
        posterior: DiagonalGaussian = self._encode(self.params, x)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        return posterior.sample(rng)[:B]

    def encode_moments(self, images: np.ndarray) -> DiagonalGaussian:
        x, B = self._pad_batch(jnp.asarray(images))
        post = self._encode(self.params, x)
        return DiagonalGaussian(post.mean[:B], post.logvar[:B])

    def decode_to_images(self, z: jax.Array) -> np.ndarray:
        """latents → (B, H, W, 3) uint8 (clamp(127.5·x + 128))."""
        zp, B = self._pad_batch(jnp.asarray(z))
        dec = self._decode(self.params, zp)[:B]
        img = jnp.clip(127.5 * dec + 128.0, 0, 255).astype(jnp.uint8)
        return np.asarray(img)

    def decode(self, z: jax.Array) -> jax.Array:
        zp, B = self._pad_batch(jnp.asarray(z))
        return self._decode(self.params, zp)[:B]


class MAR_VAE(VA_VAE):
    """MAR's f16d16 VAE (no decoder attention; reference tokenizer/marvae.py)."""

    model_type = "marvae"

    def __init__(self, ckpt_path: Optional[str] = None, img_size: int = 256, **kw):
        super().__init__(None, embed_dim=16, ckpt_path=ckpt_path, img_size=img_size, **kw)
