"""VA-VAE training: jitted two-optimizer (AE + discriminator) step with
adaptive GAN/VF weights — the TPU-native replacement for the reference's
Lightning manual-optimization loop (vavae/ldm/models/autoencoder.py:378-406).

Design notes (TPU-first):
  - ONE jit compiles the whole step: VAE forward, LPIPS, discriminator,
    adaptive-weight VJPs, both optimizer updates. The reference runs 2
    fwd/bwd pairs plus 4 separate autograd.grad calls in python.
  - The adaptive weights need ∂nll/∂(dec conv_out), ∂g/∂(dec conv_out),
    ∂nll/∂(enc conv_out), ∂vf/∂(enc conv_out). We take one jax.vjp of
    (nll, g, vf) w.r.t. exactly those two kernels and pull back three
    cotangents; XLA dead-code-eliminates everything not on those paths
    (this matches the pruned graphs torch autograd.grad builds).
  - VAE, discriminator, losses, optimizers in fp32 (the reference trains
    the VAE in fp32: f16d32_vfdinov2.yaml:66); the FROZEN feature nets
    (DINOv2 VF, LPIPS VGG) default to bf16 (``frozen_bf16``) — a memory
    -footprint/bandwidth win on inference-only extractors.
  - Optimizers: Adam(lr, β=(0.5, 0.9)) for AE(+proj) and D, matching
    configure_optimizers (autoencoder.py:423-437).
"""
from __future__ import annotations

import copy
import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from vavae_tpu.models.discriminator import NLayerDiscriminator, hinge_d_loss, vanilla_d_loss
from vavae_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from vavae_tpu.parallel.mesh import data_sharding, donate_state_argnums, replicated
from vavae_tpu.train.vae_loss import VAELossConfig, adaptive_weight, adopt_weight, nll_loss, vf_loss


class VAETrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any        # {'vae': ..., 'proj': ...(optional)}
    disc_params: Any
    disc_batch_stats: Any
    gen_opt: Any
    disc_opt: Any


def _set_kernel(params: dict, path: tuple[str, ...], value) -> dict:
    """Functional deep-set along a key path (shallow-copies the spine)."""
    if len(path) == 1:
        out = dict(params)
        out[path[0]] = value
        return out
    out = dict(params)
    out[path[0]] = _set_kernel(params[path[0]], path[1:], value)
    return out


@dataclasses.dataclass
class VAETrainer:
    vae: AutoencoderKL
    mesh: Mesh
    loss_cfg: VAELossConfig = dataclasses.field(default_factory=VAELossConfig)
    lr: float = 1e-4
    use_vf: bool = True
    vf_dim: int = 1024  # DINOv2/MAE ViT-L feature dim
    # frozen foundation-model feature fn, PARAM-EXPLICIT so the frozen ViT-L
    # weights travel as jit arguments (closing over them would inline ~1.2 GB
    # of constants into the compiled step): (aux_params, images) -> (B,h,w,vf_dim)
    aux_feature_fn: Optional[Callable] = None
    aux_params: Any = None
    # LPIPS fn, same convention: (lpips_params, a, b) -> (B,) distances
    lpips_fn: Optional[Callable] = None
    lpips_params: Any = None
    disc_layers: int = 3
    # run the FROZEN feature nets (DINOv2 VF + LPIPS VGG) in bf16: they are
    # inference-only feature extractors; halving their ~1.7 GB of fp32
    # weights+activations cuts HBM traffic at zero accuracy stake (matmuls
    # already run as single-pass-bf16 MXU ops under JAX's default TPU
    # precision, so this is a bandwidth/footprint win, not a FLOP one). The
    # VAE/discriminator/optimizers stay fp32 (reference trains the VAE fp32,
    # f16d32_vfdinov2.yaml:66). Set False for bit-level fp32 comparisons.
    frozen_bf16: bool = True

    def __post_init__(self):
        self.disc = NLayerDiscriminator(n_layers=self.disc_layers)
        if self.frozen_bf16:
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == jnp.float32
                else x,
                t,
            )
            if self.aux_feature_fn is not None:
                base_aux = self.aux_feature_fn
                self.aux_feature_fn = lambda p, x: base_aux(
                    p, x.astype(jnp.bfloat16)
                ).astype(jnp.float32)
                self.aux_params = cast(self.aux_params)
            if self.lpips_fn is not None:
                base_lpips = self.lpips_fn
                self.lpips_fn = lambda p, a, b: base_lpips(
                    p, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
                ).astype(jnp.float32)
                self.lpips_params = cast(self.lpips_params)
        self.gen_tx = optax.adam(self.lr, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(self.lr, b1=0.5, b2=0.9)
        self._jit_train = None
        self._jit_eval = None
        self._jit_recon = None

    # -- init ------------------------------------------------------------------

    def init_state(self, rng: jax.Array, image_size: int = 256) -> VAETrainState:
        r1, r2, r3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)  # shapes are res-independent
        vae_params = self.vae.init({"params": r1}, x, sample=False)["params"]
        gen_params = {"vae": vae_params}
        if self.use_vf:
            # reverse projection z (embed_dim) -> vf_dim, 1x1 conv, no bias
            # (autoencoder.py:322-324 reverse_proj=True)
            k = jax.nn.initializers.lecun_normal()(
                r2, (1, 1, self.vae.embed_dim, self.vf_dim), jnp.float32
            )
            gen_params["proj"] = {"kernel": k}
        disc_vars = self.disc.init({"params": r3}, jnp.zeros((1, 32, 32, 3)), train=True)
        return VAETrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_vars["params"],
            disc_batch_stats=disc_vars.get("batch_stats", {}),
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init(disc_vars["params"]),
        )

    def replicate(self, state: VAETrainState) -> VAETrainState:
        return jax.device_put(state, replicated(self.mesh))

    # -- core step ---------------------------------------------------------------

    def _forward(self, gen_params, x, noise):
        posterior: DiagonalGaussian = self.vae.apply(
            {"params": gen_params["vae"]}, x, method=AutoencoderKL.encode
        )
        z = posterior.mean + posterior.std * noise
        dec = self.vae.apply(
            {"params": gen_params["vae"]}, z, method=AutoencoderKL.decode
        )
        return dec, posterior, z

    def _proj(self, gen_params, z):
        # 1x1 conv == einsum over channels
        return jnp.einsum("bhwc,cd->bhwd", z, gen_params["proj"]["kernel"][0, 0])

    def _gen_losses(self, gen_params, disc_vars, x, noise, aux, lpips_params):
        """Returns (nll, kl, g_loss, vf, parts) — shared by vjp and total."""
        cfg = self.loss_cfg
        dec, posterior, z = self._forward(gen_params, x, noise)
        p_loss = (
            self.lpips_fn(lpips_params, x, dec) if self.lpips_fn is not None else None
        )
        nll, rec_mean = nll_loss(x, dec, p_loss, cfg)
        kl = jnp.mean(posterior.kl())
        # train=True: the reference's generator phase runs the discriminator
        # in TRAIN mode (Lightning training_step, autoencoder.py:386-388), so
        # g_loss is normalized by the fake batch's own BN statistics (and its
        # gradient flows through them) AND the running stats tick once here —
        # upd0 is chained into the disc phase by _train_step.
        if "batch_stats" in disc_vars:
            logits_fake, upd0 = self.disc.apply(
                disc_vars, dec, train=True, mutable=["batch_stats"]
            )
        else:
            logits_fake, upd0 = self.disc.apply(disc_vars, dec, train=False), {}
        g_loss = -jnp.mean(logits_fake)
        if self.use_vf and aux is not None:
            z_proj = self._proj(gen_params, z)
            vf, vf_dm, vf_cos = vf_loss(z_proj, aux, cfg)
        else:
            vf, vf_dm, vf_cos = jnp.zeros(()), jnp.zeros(()), jnp.zeros(())
        parts = {"rec_loss": rec_mean, "kl_loss": kl, "g_loss": g_loss,
                 "vf_loss": vf, "vf_distmat": vf_dm, "vf_cos": vf_cos, "dec": dec,
                 "bn_gen": upd0.get("batch_stats", {})}
        return nll, kl, g_loss, vf, parts

    def _train_step(
        self, state: VAETrainState, rng: jax.Array, x: jax.Array,
        aux_params, lpips_params,
    ):
        cfg = self.loss_cfg
        noise_rng = jax.random.fold_in(rng, state.step)
        disc_vars = {"params": state.disc_params}
        if state.disc_batch_stats:
            disc_vars["batch_stats"] = state.disc_batch_stats

        aux = (
            self.aux_feature_fn(aux_params, x)
            if (self.use_vf and self.aux_feature_fn)
            else None
        )

        # fixed posterior noise shared by every recomputation this step
        down = 2 ** (len(self.vae.ch_mult) - 1)
        zshape = (x.shape[0], x.shape[1] // down, x.shape[2] // down, self.vae.embed_dim)
        noise = jax.random.normal(noise_rng, zshape, jnp.float32)

        enc_path = ("vae", "encoder", "conv_out", "kernel")
        dec_path = ("vae", "decoder", "conv_out", "kernel")

        def pick(params, path):
            node = params
            for p in path:
                node = node[p]
            return node

        # -- adaptive weights via one vjp over the two last-layer kernels -------
        def subset_losses(enc_k, dec_k):
            p = _set_kernel(state.gen_params, enc_path, enc_k)
            p = _set_kernel(p, dec_path, dec_k)
            nll, _, g, vf, _ = self._gen_losses(p, disc_vars, x, noise, aux, lpips_params)
            return nll, g, vf

        enc_k = pick(state.gen_params, enc_path)
        dec_k = pick(state.gen_params, dec_path)
        _, pullback = jax.vjp(subset_losses, enc_k, dec_k)
        one = jnp.ones(())
        zero = jnp.zeros(())
        g_nll_enc, g_nll_dec = pullback((one, zero, zero))
        _, g_g_dec = pullback((zero, one, zero))
        g_vf_enc, _ = pullback((zero, zero, one))

        if cfg.disc_factor > 0.0:
            d_weight = adaptive_weight(
                jnp.linalg.norm(g_nll_dec), jnp.linalg.norm(g_g_dec),
                cfg.disc_weight, 1e4,
            )
        else:
            d_weight = jnp.zeros(())
        if self.use_vf:
            if cfg.adaptive_vf:
                vf_weight = adaptive_weight(
                    jnp.linalg.norm(g_nll_enc), jnp.linalg.norm(g_vf_enc),
                    cfg.vf_weight, 1e8,
                )
            else:
                vf_weight = jnp.asarray(cfg.vf_weight)
        else:
            vf_weight = jnp.zeros(())

        disc_factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)

        # -- generator update ---------------------------------------------------
        def total_loss(gen_params):
            nll, kl, g, vf, parts = self._gen_losses(
                gen_params, disc_vars, x, noise, aux, lpips_params
            )
            loss = nll + cfg.kl_weight * kl + d_weight * disc_factor * g + vf_weight * vf
            parts.update(total_loss=loss, nll_loss=nll, d_weight=d_weight,
                         vf_weight=vf_weight, disc_factor=disc_factor)
            return loss, parts

        (gen_loss, parts), gen_grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.gen_params
        )
        dec = jax.lax.stop_gradient(parts.pop("dec"))
        bn_gen = jax.lax.stop_gradient(parts.pop("bn_gen"))
        gen_updates, gen_opt = self.gen_tx.update(gen_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        # -- discriminator update ------------------------------------------------
        d_loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss

        def disc_loss_fn(disc_params):
            # BN running stats chain SEQUENTIALLY through the step's three
            # train-mode discriminator forwards, like torch: fake (generator
            # phase, bn_gen) → real → fake. Normalization always uses the
            # current batch's stats, so logits are chain-order independent —
            # only the stored EMA differs (the old code fed both disc-phase
            # forwards the pre-step stats and kept just the fake update,
            # tracking generated images only).
            dvars = {"params": disc_params}
            if state.disc_batch_stats:
                dvars["batch_stats"] = bn_gen
            (logits_real, upd1) = self.disc.apply(
                dvars, x, train=True, mutable=["batch_stats"]
            )
            if state.disc_batch_stats:
                dvars["batch_stats"] = upd1["batch_stats"]
            (logits_fake, upd2) = self.disc.apply(
                dvars, dec, train=True, mutable=["batch_stats"]
            )
            loss = disc_factor * d_loss_fn(logits_real, logits_fake)
            metrics = {
                "disc_loss": loss,
                "logits_real": jnp.mean(logits_real),
                "logits_fake": jnp.mean(logits_fake),
            }
            return loss, (upd2.get("batch_stats", {}), metrics)

        (disc_loss, (bn_stats, d_metrics)), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_params)
        disc_updates, disc_opt = self.disc_tx.update(
            disc_grads, state.disc_opt, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, disc_updates)

        metrics = {**parts, **d_metrics}
        new_state = VAETrainState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            disc_batch_stats=bn_stats if bn_stats else state.disc_batch_stats,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
        )
        return new_state, metrics

    # -- public API -----------------------------------------------------------------

    def train_step(self, state: VAETrainState, rng: jax.Array, images):
        if self._jit_train is None:
            rep = replicated(self.mesh)
            self._jit_train = jax.jit(
                self._train_step,
                in_shardings=(rep, rep, data_sharding(self.mesh, 4), rep, rep),
                out_shardings=(rep, rep),
                donate_argnums=donate_state_argnums(),
            )
        # frozen-model params ride as arguments (NOT closure constants)
        return self._jit_train(
            state, rng, images, self.aux_params or {}, self.lpips_params or {}
        )

    def reconstruct(self, state: VAETrainState, images):
        """Deterministic recon (posterior mean → decode) for image logging
        (the Lightning ImageLogger's log_images path, vavae/main.py:317-431)."""
        if self._jit_recon is None:
            def _recon(state, x):
                posterior = self.vae.apply(
                    {"params": state.gen_params["vae"]}, x, method=AutoencoderKL.encode
                )
                return self.vae.apply(
                    {"params": state.gen_params["vae"]},
                    posterior.mean,
                    method=AutoencoderKL.decode,
                )

            rep = replicated(self.mesh)
            ds4 = data_sharding(self.mesh, 4)
            self._jit_recon = jax.jit(
                _recon, in_shardings=(rep, ds4), out_shardings=ds4
            )
        return self._jit_recon(state, images)

    def eval_step(self, state: VAETrainState, rng: jax.Array, images):
        """Validation metrics (rec_loss for checkpoint selection)."""
        if self._jit_eval is None:
            def _eval(state, rng, x):
                posterior = self.vae.apply(
                    {"params": state.gen_params["vae"]}, x, method=AutoencoderKL.encode
                )
                z = posterior.mean  # mode() for deterministic validation
                dec = self.vae.apply(
                    {"params": state.gen_params["vae"]}, z, method=AutoencoderKL.decode
                )
                rec = jnp.mean(jnp.abs(x - dec))
                kl = jnp.mean(posterior.kl())
                return {"val/rec_loss": rec, "val/kl_loss": kl}

            rep = replicated(self.mesh)
            self._jit_eval = jax.jit(
                _eval,
                in_shardings=(rep, rep, data_sharding(self.mesh, 4)),
                out_shardings=rep,
            )
        return self._jit_eval(state, rng, images)
