"""SimplifiedVAVAE: scale-factor-aware inference facade for conditional
diffusion on micro-Doppler data.

Parity target: simplified_vavae.py:37-230 — reads ``scale_factor`` from the
checkpoint (default 1.0), ``encode`` multiplies by it, ``decode`` divides and
maps the reconstruction to [0, 1]; weights frozen.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vavae_tpu.tokenizer import VA_VAE


class SimplifiedVAVAE:
    def __init__(
        self,
        ckpt_path: Optional[str] = None,
        config: Optional[str] = None,
        img_size: int = 256,
        scale_factor: Optional[float] = None,
    ):
        self.vae = VA_VAE(config, ckpt_path=ckpt_path, img_size=img_size)
        self.scale_factor = float(
            scale_factor
            if scale_factor is not None
            else self._scale_from_ckpt(ckpt_path)
        )

    @staticmethod
    def _scale_from_ckpt(ckpt_path: Optional[str]) -> float:
        if ckpt_path and str(ckpt_path).endswith((".pt", ".ckpt")):
            try:
                import torch

                sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
                if isinstance(sd, dict):
                    if "scale_factor" in sd:
                        return float(sd["scale_factor"])
                    state = sd.get("state_dict", {})
                    if "scale_factor" in state:
                        return float(np.asarray(state["scale_factor"]))
            except Exception:
                pass
        return 1.0

    def encode(self, images, rng: Optional[jax.Array] = None) -> jax.Array:
        """images NHWC in [-1, 1] → latents × scale_factor."""
        return self.vae.encode_images(images, rng=rng) * self.scale_factor

    def decode(self, z) -> jax.Array:
        """latents → reconstruction mapped to [0, 1]."""
        dec = self.vae.decode(jnp.asarray(z) / self.scale_factor)
        return jnp.clip((dec + 1.0) / 2.0, 0.0, 1.0)

    def decode_to_images(self, z) -> np.ndarray:
        return np.asarray(
            jnp.clip(self.decode(z) * 255.0, 0, 255).astype(jnp.uint8)
        )
