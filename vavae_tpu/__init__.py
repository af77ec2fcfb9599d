"""vavae_tpu — a TPU-native (JAX/XLA/Pallas) latent-diffusion framework.

Re-implements the capabilities of the VA-VAE + LightningDiT stack
(reference: heimaoqqq/VA-VAE) with a TPU-first design:

- models/     flax.linen model definitions (DiT, conv VAE, discriminator, ...)
- ops/        Pallas kernels + XLA compute primitives (attention, fused adaLN)
- transport/  rectified-flow / flow-matching paths, losses and compiled samplers
- parallel/   device mesh, sharding and multihost helpers (replaces DDP/NCCL)
- train/      jitted train steps, EMA, checkpointing
- data/       latent-shard datasets (safetensors), image folders
- eval/       FID / PSNR / SSIM / LPIPS metrics
- apps/       micro-Doppler application layer (finetune, generate+filter, DA)
"""

__version__ = "0.1.0"
