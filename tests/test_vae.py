import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vavae_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from vavae_tpu.utils.torch_convert import vae_params_from_torch


def test_diagonal_gaussian():
    rng = jax.random.PRNGKey(0)
    moments = jax.random.normal(rng, (2, 4, 4, 8))
    d = DiagonalGaussian.from_moments(moments)
    assert d.mean.shape == (2, 4, 4, 4)
    assert np.allclose(np.asarray(d.mode()), np.asarray(d.mean))
    kl = d.kl()
    assert kl.shape == (2,) and (np.asarray(kl) >= 0).all()
    s = d.sample(rng)
    assert s.shape == d.mean.shape


def test_vae_shapes_small():
    """f16 geometry: 64×64 input → 4×4 latent with 2·embed_dim moments."""
    model = AutoencoderKL(embed_dim=8, ch_mult=(1, 1, 2, 2, 4), resolution=64)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": rng}, x, sample=False)
    post = model.apply(variables, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (1, 4, 4, 8)
    dec = model.apply(variables, post.mode(), method=AutoencoderKL.decode)
    assert dec.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_vae_parity_vs_reference_torch():
    """Bit-level (fp32 tolerance) parity with the reference AutoencoderKL:
    random torch init → convert weights → compare encode moments and decode
    output on a fixed input. Gate #2 of the build plan (SURVEY.md §7)."""
    import importlib.util
    import types

    try:
        import torch

        # autoencoder.py imports torchvision.transforms at module top but the
        # code paths we exercise never touch it — stub it out
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv.transforms = types.ModuleType("torchvision.transforms")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tv.transforms
        spec = importlib.util.spec_from_file_location(
            "ref_autoencoder", "/root/reference/LightningDiT/tokenizer/autoencoder.py"
        )
        ref_ae = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_ae)
        RefVAE = ref_ae.AutoencoderKL
    except Exception:
        pytest.skip("reference tokenizer unavailable")

    torch.manual_seed(0)
    ref = RefVAE(embed_dim=8, ch_mult=(1, 2)).eval()  # 2-level, cheap on CPU
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = vae_params_from_torch(sd, ch_mult=(1, 2), resolution=256)

    ours = AutoencoderKL(embed_dim=8, ch_mult=(1, 2), resolution=256)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)  # NCHW for torch

    with torch.no_grad():
        post_ref = ref.encode(torch.from_numpy(x))
        moments_ref = torch.cat([post_ref.mean, post_ref.logvar], dim=1).numpy()
        dec_ref = ref.decode(post_ref.mode()).numpy()

    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    post_j = ours.apply({"params": params}, x_j, method=AutoencoderKL.encode)
    moments_j = np.concatenate(
        [np.asarray(post_j.mean), np.asarray(post_j.logvar)], axis=-1
    )
    np.testing.assert_allclose(
        moments_j, np.transpose(moments_ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
    )

    dec_j = ours.apply({"params": params}, post_j.mode(), method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.asarray(dec_j), np.transpose(dec_ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
    )


def test_vavae_facade_encode_decode_jit_path():
    """The VA_VAE facade's jitted encode/decode must work end-to-end —
    regression: DiagonalGaussian wasn't a registered pytree, so the jitted
    _encode failed at runtime (unit tests only exercised raw model.apply)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.tokenizer import VA_VAE

    vae = VA_VAE(img_size=32)  # fresh params; latent 2x2x32
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.3
    post = vae.encode_moments(x)
    assert post.mean.shape == (2, 2, 2, 32)
    z = vae.encode_images(x, rng=jax.random.PRNGKey(0))
    assert z.shape == (2, 2, 2, 32)
    imgs = vae.decode_to_images(z)
    assert imgs.shape == (2, 32, 32, 3) and imgs.dtype == np.uint8
    # sampling is stochastic around the mean with the posterior's std
    z2 = vae.encode_images(x, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_vavae_facade_missing_ckpt_raises():
    """A provided-but-nonexistent ckpt_path must raise, not silently fall
    back to random weights (every downstream latent would be garbage)."""
    import pytest

    from vavae_tpu.tokenizer import VA_VAE

    with pytest.raises(FileNotFoundError, match="does not exist"):
        VA_VAE(img_size=32, ckpt_path="/nonexistent/vavae.ckpt")


def test_vavae_facade_null_config_ckpt_does_not_shadow_explicit(tmp_path):
    """A config carrying ``ckpt_path: null`` (every training config does)
    must NOT override an explicitly-passed ckpt_path with None — that
    shadowing made ``extract_features --vae_ckpt`` run on random weights
    (caught by the round-5 e2e rehearsal)."""
    import pytest
    import yaml

    from vavae_tpu.tokenizer import VA_VAE

    cfg = {"ckpt_path": None, "model": {"params": {"embed_dim": 4,
           "ddconfig": {"z_channels": 4, "resolution": 32, "ch": 32,
                        "ch_mult": [1, 1], "num_res_blocks": 1,
                        "attn_resolutions": []}}}}
    cfg_path = tmp_path / "vae.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    # the explicit (nonexistent) ckpt must WIN over the config's null and
    # therefore raise — before the fix this silently used random weights
    with pytest.raises(FileNotFoundError, match="does not exist"):
        VA_VAE(str(cfg_path), img_size=32,
               ckpt_path="/nonexistent/vavae.safetensors")
    # a config that NAMES a ckpt still wins over the argument
    cfg["ckpt_path"] = "/cfg/named.safetensors"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(FileNotFoundError, match="cfg/named"):
        VA_VAE(str(cfg_path), img_size=32, ckpt_path=None)


def test_vavae_facade_mesh_sharded_matches_single(mesh8):
    """Mesh-sharded facade (batch over 8 CPU devices, with remainder padding)
    must equal the single-device facade."""
    import jax
    import numpy as np

    from vavae_tpu.tokenizer import VA_VAE

    single = VA_VAE(img_size=32, seed=3)
    sharded = VA_VAE(img_size=32, seed=3, mesh=mesh8)
    # same fresh params in both (same seed/init path)
    x = np.random.default_rng(0).normal(size=(5, 32, 32, 3)).astype(np.float32) * 0.3
    # B=5 is NOT divisible by 8 — exercises the transparent padding
    m1 = single.encode_moments(x)
    m2 = sharded.encode_moments(x)
    np.testing.assert_allclose(np.asarray(m2.mean), np.asarray(m1.mean), rtol=2e-4, atol=2e-5)
    z = m1.mode()
    d1 = single.decode_to_images(z)
    d2 = sharded.decode_to_images(z)
    np.testing.assert_array_equal(d1.shape, d2.shape)
    assert np.mean(np.abs(d1.astype(int) - d2.astype(int))) < 1.0  # uint8 rounding


def test_encode_bf16_compute_deviation_below_posterior_std():
    """--dtype bf16 extraction support: a bf16-COMPUTE encoder (fp32 params)
    must land its posterior mean well inside the posterior's own sampling
    noise — extraction draws posterior.sample, so a mean deviation far below
    the injected std is statistically invisible to downstream DiT training.
    Mirrors the on-chip gauge in scripts/bench_vae_infer.py."""
    kw = dict(embed_dim=8, ch=32, ch_mult=(1, 1, 2), resolution=32)
    vae32 = AutoencoderKL(dtype=jnp.float32, **kw)
    vae16 = AutoencoderKL(dtype=jnp.bfloat16, **kw)
    rng = jax.random.PRNGKey(0)
    params = vae32.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), sample=False)["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32, -1, 1)
    p32 = vae32.apply({"params": params}, x, method=AutoencoderKL.encode)
    p16 = vae16.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert p16.mean.dtype == jnp.float32  # moments come back fp32
    m32 = np.asarray(p32.mean, np.float32)
    dev = np.asarray(p16.mean, np.float32) - m32
    std32 = np.exp(0.5 * np.asarray(p32.logvar, np.float32))
    rel = np.linalg.norm(dev) / np.linalg.norm(m32)
    ratio = np.sqrt(np.mean(dev**2)) / np.sqrt(np.mean(std32**2))
    assert rel < 0.02, f"bf16 mean rel-L2 {rel:.3%}"
    assert ratio < 0.1, f"bf16 deviation {ratio:.3f}× the posterior's own std"
