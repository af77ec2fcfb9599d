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


def test_disc_bn_stats_chain_real_and_fake(request):
    """The discriminator's BN running stats must see all THREE train-mode
    forwards of a step like torch does — fake (generator phase), real, fake —
    chained sequentially (autoencoder.py:386-406 + contperceptual). Chained
    EMA is linear in the single-step updates, so the step's final stats must
    equal m²·u0 + m·u1 + u2 − (m²+m)·pre where u_i are one-EMA updates from
    the pre-step stats and m=0.9 is the BN momentum. (The old code kept only
    the fake-batch update → stats tracked generated images exclusively.)"""
    mesh8 = request.getfixturevalue("mesh8")
    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), resolution=32)
    cfg = VAELossConfig(disc_start=0, kl_weight=1e-6, perceptual_weight=0.0)
    trainer = VAETrainer(vae, mesh8, loss_cfg=cfg, use_vf=False, disc_layers=2)

    rng = jax.random.PRNGKey(3)
    state = trainer.init_state(rng)
    pre = jax.device_get(state.disc_batch_stats)
    assert jax.tree_util.tree_leaves(pre), "disc has no BN stats to test"

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.5
    )
    # reproduce the step's decode (pre-update gen params, the step's noise)
    noise_rng = jax.random.fold_in(rng, state.step)
    down = 2 ** (len(vae.ch_mult) - 1)
    zshape = (x.shape[0], x.shape[1] // down, x.shape[2] // down, vae.embed_dim)
    noise = jax.random.normal(noise_rng, zshape, jnp.float32)
    dec, _, _ = trainer._forward(state.gen_params, x, noise)

    dvars = {"params": state.disc_params, "batch_stats": state.disc_batch_stats}
    _, u0 = trainer.disc.apply(dvars, dec, train=True, mutable=["batch_stats"])
    _, u1 = trainer.disc.apply(dvars, x, train=True, mutable=["batch_stats"])
    u0 = jax.device_get(u0["batch_stats"])
    u1 = jax.device_get(u1["batch_stats"])

    m = 0.9  # models/discriminator.py BatchNorm momentum
    expected = jax.tree_util.tree_map(
        lambda p, a, b: m * m * a + m * b + a - (m * m + m) * p, pre, u0, u1
    )

    state2, _ = trainer.train_step(
        trainer.replicate(state), rng, shard_batch(trainer.mesh, np.asarray(x))
    )
    got = jax.device_get(state2.disc_batch_stats)
    jax.tree_util.tree_map(
        lambda e, g: np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6),
        expected, got,
    )


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


def test_tiny_foundation_testbed_sizes_projector():
    """The "-tiny" foundation kinds (weight-free smoke testbed) keep the
    patch/grid conventions at dim 64 / depth 2, and the reverse projector
    must follow the foundation's feature dim instead of assuming ViT-L 1024
    (make_aux_feature_fn now returns it)."""
    import jax
    import numpy as np

    from vavae_tpu.models.vit import FoundationModel
    from vavae_tpu.pipelines.train_vavae import make_aux_feature_fn

    fn_p, params, dim = make_aux_feature_fn("dinov2-tiny", allow_random=True)
    assert dim == 64
    feats = fn_p(params, np.zeros((1, 32, 32, 3), np.float32))
    # 224-resize / patch-14 grid, tiny width
    assert feats.shape == (1, 16, 16, 64)

    # tiny kinds never load pretrained weights, even if the env var is set
    import pytest

    with pytest.raises(FileNotFoundError):
        FoundationModel(kind="mae-tiny").load("/etc/hostname")
    with pytest.raises(ValueError):
        FoundationModel(kind="dinov2-nano")

    # projector follows the foundation dim through build_vae_trainer
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.pipelines.train_vavae import build_vae_trainer
    from vavae_tpu.utils.config import Config

    cfg = Config({"model": {"base_learning_rate": 1e-4, "params": {
        "embed_dim": 4, "use_vf": "dinov2-tiny",
        "lossconfig": {"params": {"disc_start": 2}},
        "ddconfig": {"z_channels": 4, "resolution": 32, "ch": 32,
                     "ch_mult": [1, 1], "num_res_blocks": 1,
                     "attn_resolutions": []}}}})
    tr = build_vae_trainer(cfg, make_mesh(), aux_feature_fn=fn_p,
                           aux_params=params, vf_dim=dim)
    state = tr.init_state(jax.random.PRNGKey(0), image_size=32)
    assert state.gen_params["proj"]["kernel"].shape == (1, 1, 4, 64)


def test_reconstruct_matches_eval_decode(mesh8):
    """trainer.reconstruct (ImageLogger feed) is the deterministic
    posterior-mean decode — identical to a direct mode() apply."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.vae import AutoencoderKL
    from vavae_tpu.parallel.mesh import shard_batch
    from vavae_tpu.train.vae_loss import VAELossConfig
    from vavae_tpu.train.vae_trainer import VAETrainer

    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), resolution=32)
    tr = VAETrainer(vae, mesh8, loss_cfg=VAELossConfig(disc_start=0),
                    lr=1e-4, use_vf=False, lpips_fn=None, disc_layers=2)
    state = tr.replicate(tr.init_state(jax.random.PRNGKey(0)))
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.5
    dec = np.asarray(jax.device_get(tr.reconstruct(state, shard_batch(mesh8, x))))
    params = jax.device_get(state.gen_params["vae"])
    post = vae.apply({"params": params}, jnp.asarray(x), method=AutoencoderKL.encode)
    want = np.asarray(vae.apply({"params": params}, post.mode(),
                                method=AutoencoderKL.decode))
    assert dec.shape == x.shape
    # sharded-vs-unsharded reduction order: tiny float drift only
    np.testing.assert_allclose(dec, want, rtol=1e-4, atol=1e-4)
