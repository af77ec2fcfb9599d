"""Compute-op tests: attention backends, quant matmul, metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vavae_tpu.eval.metrics import psnr, ssim
from vavae_tpu.ops.attention import _xla_attention, dot_product_attention


def _reference_attention(q, k, v):
    """fp64 numpy softmax attention (ground truth)."""
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    scale = q.shape[-1] ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits -= logits.max(axis=-1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", probs, v)


def test_xla_attention_matches_reference(rng):
    q = jax.random.normal(rng, (2, 16, 4, 8))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 4, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (2, 16, 4, 8))
    out = _xla_attention(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_flash_attention_matches_xla():
    if jax.default_backend() != "tpu":
        pytest.skip("pallas TPU kernel needs a TPU")
    from vavae_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    # XL-like geometry: head_dim 72 (non-lane-aligned → padded inside)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 256, 4, 72)), jnp.float32) for _ in range(3)
    )
    out = flash_attention(q, k, v)
    ref = _reference_attention(q, k, v)
    # TPU matmuls are bf16-pass-based at default precision → ~1e-3 tolerance
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=5e-3)


def test_psnr_ssim():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a), data_range=1.0).min()) > 80
    s_same = ssim(jnp.asarray(a), jnp.asarray(a), data_range=1.0)
    np.testing.assert_allclose(np.asarray(s_same), 1.0, atol=1e-5)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    p = psnr(jnp.asarray(a), jnp.asarray(b), data_range=1.0)
    assert 15 < float(p.mean()) < 25  # ~0.1 noise → ≈20 dB
    s = ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0)
    assert 0 < float(s.mean()) < 1


def test_frechet_distance():
    from vavae_tpu.eval.fid import activation_statistics, frechet_distance

    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8)).astype(np.float64)
    mu1, s1 = activation_statistics(a)
    assert frechet_distance(mu1, s1, mu1, s1) < 1e-6
    b = rng.normal(loc=2.0, size=(500, 8)).astype(np.float64)
    mu2, s2 = activation_statistics(b)
    d = frechet_distance(mu1, s1, mu2, s2)
    assert 25 < d < 45  # ≈ ||2·1||² = 32 plus cov noise


import pytest


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="pallas TPU kernel"
)
def test_pallas_attention_matches_xla_on_tpu():
    """Kernel vs XLA attention, with and without fused RoPE (bf16 tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.layers import rotate_half
    from vavae_tpu.models.posembed import rope_2d_freqs
    from vavae_tpu.ops.attention import _xla_attention
    from vavae_tpu.ops.pallas.flash_attention import flash_attention

    B, N, H, D = 4, 256, 16, 72
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, N, H, D), jnp.bfloat16)

    ref = np.asarray(_xla_attention(q, k, v).astype(jnp.float32))
    got = np.asarray(flash_attention(q, k, v).astype(jnp.float32))
    assert np.abs(ref - got).max() < 2e-2

    cos, sin = rope_2d_freqs(D, 16)
    cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)

    def rot(x):
        fc = cos_j[None, :, None, :].astype(x.dtype)
        fs = sin_j[None, :, None, :].astype(x.dtype)
        return x * fc + rotate_half(x) * fs

    ref_r = np.asarray(_xla_attention(rot(q), rot(k), v).astype(jnp.float32))
    got_r = np.asarray(flash_attention(q, k, v, (cos_j, sin_j)).astype(jnp.float32))
    assert np.abs(ref_r - got_r).max() < 2e-2

    # backward runs (exact XLA vjp under the hood)
    g = jax.grad(
        lambda q: jnp.sum(flash_attention(q, k, v, (cos_j, sin_j)).astype(jnp.float32))
    )(q)
    assert np.isfinite(np.asarray(g.astype(jnp.float32))).all()


def test_fused_qkv_attention_fallback_matches_reference():
    """CPU fallback of fused_qkv_attention == slice + generic attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.ops.attention import dot_product_attention
    from vavae_tpu.ops.pallas.flash_attention import fused_qkv_attention

    # N not divisible by 8 → generic path even when a TPU backend is present
    B, N, H, D = 2, 60, 4, 16
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3, H, D), jnp.float32)
    ref = dot_product_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    got = fused_qkv_attention(qkv)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="pallas TPU kernel"
)
def test_fused_qkv_attention_fwd_bwd_on_tpu():
    """Natural-layout kernel (fwd + custom-vjp bwd) vs exact XLA attention,
    with and without in-kernel RoPE, at the XL head dim (72) and at 64."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.layers import rotate_half
    from vavae_tpu.models.posembed import rope_2d_freqs
    from vavae_tpu.ops.attention import _xla_attention
    from vavae_tpu.ops.pallas.flash_attention import fused_qkv_attention

    for D, grid in ((72, 16), (64, 16)):
        B, N, H = 4, grid * grid, 16
        rng = jax.random.PRNGKey(0)
        qkv = jax.random.normal(rng, (B, N, 3, H, D), jnp.bfloat16)
        cos, sin = rope_2d_freqs(D, grid)
        cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)

        def rot(x):
            fc = cos_j[None, :, None, :].astype(x.dtype)
            fs = sin_j[None, :, None, :].astype(x.dtype)
            return x * fc + rotate_half(x) * fs

        def ref_fn(qkv):
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            return _xla_attention(rot(q), rot(k), v)

        ref = np.asarray(ref_fn(qkv).astype(jnp.float32))
        got = np.asarray(fused_qkv_attention(qkv, (cos_j, sin_j)).astype(jnp.float32))
        assert np.abs(ref - got).max() < 2e-2, f"fwd mismatch D={D}"

        # no-rope forward
        ref0 = np.asarray(_xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]).astype(jnp.float32))
        got0 = np.asarray(fused_qkv_attention(qkv).astype(jnp.float32))
        assert np.abs(ref0 - got0).max() < 2e-2

        # backward: Pallas bwd kernel vs exact XLA vjp of the reference
        w = jax.random.normal(jax.random.fold_in(rng, 9), ref.shape, jnp.bfloat16)
        dref = jax.grad(
            lambda qkv: jnp.sum(ref_fn(qkv).astype(jnp.float32) * w.astype(jnp.float32))
        )(qkv)
        dgot = jax.grad(
            lambda qkv: jnp.sum(
                fused_qkv_attention(qkv, (cos_j, sin_j)).astype(jnp.float32)
                * w.astype(jnp.float32)
            )
        )(qkv)
        err = np.abs(np.asarray(dref.astype(jnp.float32)) - np.asarray(dgot.astype(jnp.float32)))
        scale = np.abs(np.asarray(dref.astype(jnp.float32))).max()
        assert err.max() / max(scale, 1e-6) < 3e-2, f"bwd mismatch D={D}: {err.max()/scale}"


def test_fid_pipeline_end_to_end(tmp_path, monkeypatch):
    """fid_given_paths on two folders: identical sets → FID ≈ 0; disjoint
    distributions → FID > 0. Also covers npz packing (ADM arr_0 format).
    Random Inception weights are fine — the invariants hold regardless."""
    import numpy as np
    from PIL import Image

    import os

    from vavae_tpu.eval.fid import create_npz_from_sample_folder, fid_given_paths

    monkeypatch.setenv("VAVAE_FID_ALLOW_RANDOM", "1")
    rng = np.random.default_rng(0)
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(), b.mkdir()
    for i in range(32):
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(img).save(a / f"{i:06d}.png")
        Image.fromarray(img).save(b / f"{i:06d}.png")

    same = fid_given_paths(str(a), str(b))
    assert abs(same) < 1e-6, same  # identical sets -> FID 0

    # shift folder b's distribution hard (constant mid-gray frames)
    for i in range(32):
        img = np.full((32, 32, 3), 128, np.uint8)
        Image.fromarray(img).save(b / f"{i:06d}.png")
    diff = fid_given_paths(str(a), str(b))
    assert diff > 1e-5 and diff > abs(same) * 100, (same, diff)

    npz = create_npz_from_sample_folder(str(a), num=32)

    assert os.path.exists(npz)
    arr = np.load(npz)["arr_0"]
    assert arr.shape == (32, 32, 32, 3) and arr.dtype == np.uint8
    # folder-vs-npz of the same images is also ~0
    assert abs(fid_given_paths(str(a), npz)) < 1e-6


def test_fid_stats_vs_stats_needs_no_inception(tmp_path, monkeypatch):
    """Two precomputed mu/sigma npz files must compare WITHOUT loading the
    Inception weights (the point of --save_stats), and an empty sample
    folder fails with a clear path-naming error, not np.concatenate noise."""
    import numpy as np
    import pytest

    from vavae_tpu.eval.fid import FIDExtractor, fid_given_paths, frechet_distance

    rng = np.random.default_rng(0)
    a = rng.normal(size=(100, 8)).astype(np.float64)
    b = rng.normal(loc=0.5, size=(100, 8)).astype(np.float64)
    stats = {}
    for name, acts in (("a", a), ("b", b)):
        mu, sigma = acts.mean(axis=0), np.cov(acts, rowvar=False)
        np.savez(tmp_path / f"{name}.npz", mu=mu, sigma=sigma)
        stats[name] = (mu, sigma)

    monkeypatch.setenv("VAVAE_FID_WEIGHTS", str(tmp_path / "definitely_missing.pt"))
    got = fid_given_paths(str(tmp_path / "a.npz"), str(tmp_path / "b.npz"))
    want = frechet_distance(*stats["a"], *stats["b"])
    assert got == pytest.approx(want)

    empty = tmp_path / "empty"
    empty.mkdir()
    ex = FIDExtractor.__new__(FIDExtractor)  # no weights: only batch_size used
    ex.batch_size = 4
    from vavae_tpu.eval.fid import compute_statistics_of_path

    with pytest.raises(ValueError, match="empty"):
        compute_statistics_of_path(str(empty), ex)
