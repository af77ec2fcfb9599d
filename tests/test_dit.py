import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vavae_tpu.models.dit import LightningDiT, LightningDiT_models
from vavae_tpu.models.posembed import get_2d_sincos_pos_embed, rope_2d_freqs


@pytest.fixture(scope="module")
def small_dit():
    model = LightningDiT(
        input_size=8,
        patch_size=2,
        in_channels=4,
        hidden_size=64,
        depth=2,
        num_heads=4,
        num_classes=10,
        use_swiglu=True,
        use_rope=True,
        use_rmsnorm=True,
        use_qknorm=True,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 4))
    params = model.init({"params": rng}, x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))[
        "params"
    ]
    return model, params


def test_registry_variants():
    assert len(LightningDiT_models) == 11
    xl = LightningDiT_models["LightningDiT-XL/1"](input_size=16, in_channels=32)
    assert xl.depth == 28 and xl.hidden_size == 1152 and xl.num_heads == 16
    b2 = LightningDiT_models["LightningDiT-B/2"]()
    assert b2.depth == 12 and b2.hidden_size == 768 and b2.patch_size == 2


def test_zero_init_gives_zero_output(small_dit):
    """final layer + adaLN zero-init → output must be exactly 0 at init
    (reference lightningdit.py:366-374)."""
    model, params = small_dit
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = model.apply({"params": params}, x, jnp.array([0.5, 0.2]), jnp.array([1, 2]))
    assert out.shape == (2, 8, 8, 4)
    assert np.allclose(np.asarray(out), 0.0)


def test_forward_shapes_and_determinism(small_dit):
    model, params = small_dit
    # give final layer nonzero weights so the output is informative
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.float32(1.0), params
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([0.5, 0.2])
    y = jnp.array([1, 2])
    o1 = model.apply({"params": params}, x, t, y)
    o2 = model.apply({"params": params}, x, t, y)
    assert o1.shape == (2, 8, 8, 4)
    assert np.allclose(np.asarray(o1), np.asarray(o2))
    assert np.asarray(o1).std() > 0


def test_label_dropout_needs_rng(small_dit):
    model, params = small_dit
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([0.5, 0.2])
    y = jnp.array([1, 2])
    out = model.apply(
        {"params": params},
        x,
        t,
        y,
        train=True,
        rngs={"label_dropout": jax.random.PRNGKey(3)},
    )
    assert out.shape == (2, 8, 8, 4)


def test_force_drop_ids_uses_null_class(small_dit):
    model, params = small_dit
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([0.5, 0.5])
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    # forcing drop on labels [1, 2] must equal passing the null class directly
    o_forced = model.apply(
        {"params": params}, x, t, jnp.array([1, 2]), force_drop_ids=jnp.array([1, 1])
    )
    o_null = model.apply({"params": params}, x, t, jnp.array([10, 10]))
    assert np.allclose(np.asarray(o_forced), np.asarray(o_null))


def test_cfg_forward_cond_uncond_mix(small_dit):
    model, params = small_dit
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    half = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    x = jnp.concatenate([half, half], axis=0)
    t = jnp.full((4,), 0.5)
    y = jnp.array([1, 2, 10, 10])  # cond labels + null class

    out = model.forward_with_cfg(params, x, t, y, cfg_scale=3.0)
    cond = model.apply({"params": params}, half, t[:2], y[:2])
    uncond = model.apply({"params": params}, half, t[:2], y[2:])
    expected = uncond + 3.0 * (cond - uncond)
    assert np.allclose(np.asarray(out[:2]), np.asarray(expected), atol=1e-5)
    assert np.allclose(np.asarray(out[:2]), np.asarray(out[2:]), atol=1e-6)

    # interval gate: below cfg_interval_start the cond output is used
    out_gated = model.forward_with_cfg(
        params, x, t, y, cfg_scale=3.0, cfg_interval=True, cfg_interval_start=0.9
    )
    assert np.allclose(np.asarray(out_gated[:2]), np.asarray(cond), atol=1e-6)


def test_cfg_channels_compat(small_dit):
    """reference quirk: guidance on first 3 channels only (lightningdit.py:430-432)."""
    model, params = small_dit
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    half = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    x = jnp.concatenate([half, half], axis=0)
    t = jnp.full((4,), 0.5)
    y = jnp.array([1, 2, 10, 10])
    out = model.forward_with_cfg(params, x, t, y, cfg_scale=3.0, cfg_channels=3)
    cond = model.apply({"params": params}, half, t[:2], y[:2])
    # channels >= 3 must pass through the *cond-half* ordering untouched
    assert np.allclose(np.asarray(out[:2, ..., 3:]), np.asarray(cond[..., 3:]), atol=1e-6)


def test_scan_matches_loop():
    """scan-over-depth must be numerically identical to the python loop."""
    kw = dict(
        input_size=8, patch_size=2, in_channels=4, hidden_size=64, depth=2,
        num_heads=4, num_classes=10, use_swiglu=True, use_rope=True, use_rmsnorm=True,
    )
    m_scan = LightningDiT(scan_blocks=True, **kw)
    m_loop = LightningDiT(scan_blocks=False, **kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([0.5, 0.2])
    y = jnp.array([1, 2])
    p_scan = m_scan.init({"params": rng}, x, t, y)["params"]
    p_loop = m_loop.init({"params": rng}, x, t, y)["params"]

    # move the scanned (stacked) params into the loop layout
    stacked = p_scan["blocks"]["block"]
    for i in range(kw["depth"]):
        p_loop[f"block_{i}"] = jax.tree_util.tree_map(lambda a, i=i: a[i], stacked)
    for k in ("x_embedder", "t_embedder", "y_embedder", "final_layer"):
        p_loop[k] = p_scan[k]
    p_loop = jax.tree_util.tree_map(lambda a: a + 0.01, p_loop)
    p_scan = jax.tree_util.tree_map(lambda a: a + 0.01, p_scan)

    o_scan = m_scan.apply({"params": p_scan}, x, t, y)
    o_loop = m_loop.apply({"params": p_loop}, x, t, y)
    assert np.allclose(np.asarray(o_scan), np.asarray(o_loop), atol=1e-5)


def test_remat_policies_match_no_remat():
    """use_checkpoint with either remat policy changes memory, not math:
    forward AND gradients identical to the un-remat model."""
    kw = dict(
        input_size=8, patch_size=2, in_channels=4, hidden_size=64, depth=2,
        num_heads=4, num_classes=10, use_swiglu=True, use_rope=True, use_rmsnorm=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([0.5, 0.2])
    y = jnp.array([1, 2])
    base = LightningDiT(use_checkpoint=False, **kw)
    params = base.init({"params": jax.random.PRNGKey(0)}, x, t, y)["params"]
    params = jax.tree_util.tree_map(lambda a: a + 0.01, params)

    def loss(m, p):
        return jnp.sum(jnp.square(m.apply({"params": p}, x, t, y)))

    ref_out = base.apply({"params": params}, x, t, y)
    ref_grad = jax.grad(lambda p: loss(base, p))(params)
    for policy in ("nothing", "dots"):
        m = LightningDiT(use_checkpoint=True, checkpoint_policy=policy, **kw)
        out = m.apply({"params": params}, x, t, y)
        assert np.allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6), policy
        g = jax.grad(lambda p: loss(m, p))(params)
        err = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g, ref_grad
        )
        assert max(jax.tree_util.tree_leaves(err)) < 1e-4, (policy, err)


def test_unpatchify_roundtrip():
    """patchify→unpatchify with identity projection preserves spatial layout."""
    model = LightningDiT(
        input_size=4, patch_size=2, in_channels=3, hidden_size=12, depth=1,
        num_heads=2, num_classes=4,
    )
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    p = model.patch_size
    B, H, W, C = x.shape
    tokens = x.reshape(B, H // p, p, W // p, p, C).transpose(0, 1, 3, 2, 4, 5)
    tokens = tokens.reshape(B, (H // p) * (W // p), p * p * C)
    back = model._unpatchify(tokens)
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_sincos_matches_reference_formula():
    """Independent check of the 2-D sincos table against the published
    formula (sin|cos halves per axis, w-coordinate first)."""
    D, G = 16, 4
    emb = get_2d_sincos_pos_embed(D, G)
    assert emb.shape == (G * G, D)
    # position (row=1, col=2) → flat index 1*G+2
    pos = emb[1 * G + 2]
    # each axis gets D/2 dims: [sin(pos·ω_0..ω_{D/4-1}) | cos(...)]
    omega = 1.0 / 10000 ** (np.arange(D // 4, dtype=np.float64) / (D / 4.0))
    # first D/2 block encodes the column (w) coordinate = 2
    np.testing.assert_allclose(pos[: D // 4], np.sin(2 * omega), rtol=1e-5)
    np.testing.assert_allclose(pos[D // 4 : D // 2], np.cos(2 * omega), rtol=1e-5)
    # second D/2 block encodes the row (h) coordinate = 1
    np.testing.assert_allclose(pos[D // 2 : D // 2 + D // 4], np.sin(1 * omega), rtol=1e-5)


def test_rope_split_layout_matches_interleaved_reference():
    """Our split-half RoPE (TPU-friendly) must produce the same attention
    scores as the reference's interleaved rotation (pos_embed.py:96-135) once
    q,k are permuted by rope_permutation (torch-weight conversion path)."""
    from vavae_tpu.models.layers import rotate_half
    from vavae_tpu.models.posembed import rope_permutation

    D, S = 16, 4
    N = S * S
    rng = np.random.default_rng(0)
    q = rng.normal(size=(N, D)).astype(np.float32)
    k = rng.normal(size=(N, D)).astype(np.float32)

    # reference interleaved tables + rotation, built independently here
    dim = D // 2
    freqs = 1.0 / (10000 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    f = np.repeat(np.outer(np.arange(S, dtype=np.float64), freqs), 2, axis=-1)
    fh = np.broadcast_to(f[:, None, :], (S, S, dim))
    fw = np.broadcast_to(f[None, :, :], (S, S, dim))
    ang = np.concatenate([fh, fw], axis=-1).reshape(N, D)
    cos_i, sin_i = np.cos(ang), np.sin(ang)

    def rot_interleaved(x):
        xr = x.reshape(N, D // 2, 2)
        return np.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(N, D)

    q_ref = q * cos_i + rot_interleaved(q) * sin_i
    k_ref = k * cos_i + rot_interleaved(k) * sin_i
    scores_ref = q_ref @ k_ref.T

    # ours: permute q,k then apply split-half tables
    perm = rope_permutation(D)
    cos_s, sin_s = rope_2d_freqs(D, S)
    qp, kp = q[:, perm], k[:, perm]
    q_ours = qp * cos_s + np.asarray(rotate_half(jnp.asarray(qp))) * sin_s
    k_ours = kp * cos_s + np.asarray(rotate_half(jnp.asarray(kp))) * sin_s
    scores_ours = q_ours @ k_ours.T
    np.testing.assert_allclose(scores_ours, scores_ref, rtol=1e-4, atol=1e-4)


def test_rope_freqs_shape_and_unit_norm():
    cos, sin = rope_2d_freqs(16, 4)
    assert cos.shape == (16, 16) and sin.shape == (16, 16)
    np.testing.assert_allclose(cos**2 + sin**2, 1.0, atol=1e-6)
    # rotation preserves vector norms
    from vavae_tpu.models.layers import rotate_half

    x = np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
    rot = x * cos + np.asarray(rotate_half(jnp.asarray(x))) * sin
    np.testing.assert_allclose(
        np.linalg.norm(rot, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
