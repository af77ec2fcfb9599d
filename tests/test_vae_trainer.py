"""VA-VAE GAN+VF training step: smoke + behavior tests on a tiny model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vavae_tpu.models.vae import AutoencoderKL
from vavae_tpu.parallel.mesh import shard_batch
from vavae_tpu.train.vae_loss import VAELossConfig, vf_loss
from vavae_tpu.train.vae_trainer import VAETrainer


@pytest.fixture(scope="module")
def tiny_trainer(request):
    mesh8 = request.getfixturevalue("mesh8")
    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), resolution=32)

    def aux_fn(aux_params, x):
        # stand-in foundation model (param-explicit signature, like the real
        # DINOv2 via FoundationModel.feature_fn_p): average-pool the image
        # into a (B,h,w,16) feature map
        B, H, W, _ = x.shape
        f = jax.image.resize(x, (B, H // 2, W // 2, 3), "bilinear")
        return jnp.tile(f, (1, 1, 1, 6))[..., :16]

    cfg = VAELossConfig(
        disc_start=2, kl_weight=1e-6, vf_weight=0.1, adaptive_vf=True,
        distmat_margin=0.25, cos_margin=0.5, perceptual_weight=0.0,
    )
    return VAETrainer(
        vae, mesh8, loss_cfg=cfg, lr=1e-4, use_vf=True, vf_dim=16,
        aux_feature_fn=aux_fn, lpips_fn=None, disc_layers=2,
    )


def test_vf_loss_zero_for_identical_features():
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    cfg = VAELossConfig(distmat_margin=0.0, cos_margin=0.0)
    total, dm, cos = vf_loss(z, z, cfg)
    assert float(dm) < 1e-6
    assert float(cos) < 1e-6
    # margins only relax the loss
    cfg2 = VAELossConfig(distmat_margin=0.25, cos_margin=0.5)
    z2 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    t1, _, _ = vf_loss(z, z2, VAELossConfig(distmat_margin=0.0, cos_margin=0.0))
    t2, _, _ = vf_loss(z, z2, cfg2)
    assert float(t2) <= float(t1)


def test_vae_train_step_runs_and_descends(tiny_trainer):
    trainer = tiny_trainer
    rng = jax.random.PRNGKey(0)
    state = trainer.replicate(trainer.init_state(rng))
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.5
    xs = shard_batch(trainer.mesh, x)

    state, m0 = trainer.train_step(state, rng, xs)
    assert int(jax.device_get(state.step)) == 1
    for k in ("total_loss", "rec_loss", "kl_loss", "g_loss", "vf_loss", "disc_loss"):
        assert np.isfinite(float(jax.device_get(m0[k]))), k
    # disc warmup: at step 0 (< disc_start=2) the GAN terms are gated off
    assert float(jax.device_get(m0["disc_factor"])) == 0.0

    losses = [float(jax.device_get(m0["rec_loss"]))]
    for i in range(4):
        state, m = trainer.train_step(state, rng, xs)
        losses.append(float(jax.device_get(m["rec_loss"])))
    # after disc_start the gate opens
    assert float(jax.device_get(m["disc_factor"])) == 1.0
    # reconstruction should improve on a fixed batch
    assert losses[-1] < losses[0]


def test_frozen_bf16_matches_fp32(request):
    """frozen_bf16 (bf16 DINOv2/LPIPS feature nets) changes the losses only
    at bf16 noise level: one train step in each mode, metrics close."""
    mesh8 = request.getfixturevalue("mesh8")
    from vavae_tpu.models.lpips import LPIPS

    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), resolution=32)
    lp = LPIPS()
    lp_vars = lp.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
    )

    def aux_fn(aux_params, x):
        B, H, W, _ = x.shape
        f = jax.image.resize(x, (B, H // 2, W // 2, 3), "bilinear")
        return jnp.tile(f, (1, 1, 1, 6))[..., :16].astype(jnp.float32)

    cfg = VAELossConfig(disc_start=0, vf_weight=0.1, perceptual_weight=1.0)
    metrics = {}
    for mode in (True, False):
        trainer = VAETrainer(
            vae, mesh8, loss_cfg=cfg, use_vf=True, vf_dim=16,
            aux_feature_fn=aux_fn, lpips_fn=lambda v, a, b: lp.apply(v, a, b),
            lpips_params=lp_vars, disc_layers=2, frozen_bf16=mode,
        )
        rng = jax.random.PRNGKey(0)
        state = trainer.replicate(trainer.init_state(rng))
        x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.5
        _, m = trainer.train_step(state, rng, shard_batch(trainer.mesh, x))
        metrics[mode] = {k: float(jax.device_get(v)) for k, v in m.items()}

    for k in ("total_loss", "rec_loss", "vf_loss", "nll_loss"):
        a, b = metrics[True][k], metrics[False][k]
        assert abs(a - b) <= 0.03 * max(abs(b), 1.0), (k, a, b)


def test_bf16_compute_vae_close_to_fp32(request):
    """Opt-in bf16 VAE compute (fp32 params/opt): one step per mode, the
    reconstruction/KL metrics agree to bf16 tolerance and params update."""
    mesh8 = request.getfixturevalue("mesh8")
    cfg = VAELossConfig(disc_start=10, perceptual_weight=0.0)
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.5
    out = {}
    for dt in (jnp.float32, jnp.bfloat16):
        vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), resolution=32, dtype=dt)
        trainer = VAETrainer(vae, mesh8, loss_cfg=cfg, use_vf=False, disc_layers=2)
        rng = jax.random.PRNGKey(0)
        state = trainer.replicate(trainer.init_state(rng))
        p0 = jax.device_get(state.gen_params["vae"]["encoder"]["conv_in"]["kernel"])
        state, m = trainer.train_step(state, rng, shard_batch(trainer.mesh, x))
        p1 = jax.device_get(state.gen_params["vae"]["encoder"]["conv_in"]["kernel"])
        assert p1.dtype == np.float32  # master params stay fp32
        assert np.abs(p1 - p0).max() > 0
        out[dt] = {k: float(jax.device_get(v)) for k, v in m.items()}
    for k in ("rec_loss", "kl_loss", "nll_loss"):
        a, b = out[jnp.bfloat16][k], out[jnp.float32][k]
        assert abs(a - b) <= 0.05 * max(abs(b), 1.0), (k, a, b)


def test_vae_eval_step(tiny_trainer):
    trainer = tiny_trainer
    rng = jax.random.PRNGKey(0)
    state = trainer.replicate(trainer.init_state(rng))
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.5
    m = trainer.eval_step(state, rng, shard_batch(trainer.mesh, x))
    assert np.isfinite(float(jax.device_get(m["val/rec_loss"])))
