"""Checkpoint manager: safetensors round-trip incl. bf16/None/empty leaves,
step-numbered resume selection, legacy msgpack restore."""
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vavae_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def _state():
    return {
        "params": {
            "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            "b16": jnp.linspace(-2, 2, 8, dtype=jnp.bfloat16),
        },
        "opt": {
            "count": jnp.asarray(7, jnp.int32),
            "nothing": None,
            "empty": {},
        },
        "step": jnp.asarray(3, jnp.int32),
    }


def test_safetensors_roundtrip(tmp_path):
    state = _state()
    path = save_checkpoint(str(tmp_path), 3, state)
    assert path.endswith("0000003.safetensors") and os.path.exists(path)

    target = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, target)
    assert restored["opt"]["nothing"] is None
    assert restored["opt"]["empty"] == {}
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"]))
    assert restored["params"]["b16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["b16"].astype(jnp.float32)),
        np.asarray(state["params"]["b16"].astype(jnp.float32)),
    )
    assert int(restored["opt"]["count"]) == 7
    # 0-d leaves keep their TRUE shape (np.ascontiguousarray promotes 0-d to
    # (1,); a (1,)-shaped step crashes jax.random.fold_in on resume)
    assert np.asarray(restored["step"]).shape == ()
    assert np.asarray(restored["opt"]["count"]).shape == ()


def test_restore_fixes_legacy_scalar_shape(tmp_path):
    """Checkpoints written before the 0-d fix stored scalars as (1,);
    restore reshapes them back to the target's shape."""
    from safetensors.numpy import save_file
    import json

    path = str(tmp_path / "0000001.safetensors")
    save_file(
        {"step": np.array([5], np.int32), "w": np.ones((2, 2), np.float32)},
        path,
        metadata={"tree": json.dumps({"none": [], "empty": [], "dtypes": {}})},
    )
    target = {"step": jnp.zeros((), jnp.int32), "w": jnp.zeros((2, 2))}
    restored = restore_checkpoint(path, target)
    assert np.asarray(restored["step"]).shape == ()
    assert int(restored["step"]) == 5


def test_latest_checkpoint_by_step_not_size(tmp_path):
    """Resume must pick the highest STEP (the reference's known quirk picks
    the biggest FILE, train.py:164-179)."""
    small = _state()
    big = {"params": {"w": jnp.zeros((64, 64))}, "opt": {"count": jnp.asarray(0)},
           "step": jnp.asarray(0)}
    p_big_old = save_checkpoint(str(tmp_path), 10, big)      # bigger file, older step
    p_small_new = save_checkpoint(str(tmp_path), 20, small)  # smaller file, newer step
    assert os.path.getsize(p_big_old) > os.path.getsize(p_small_new)
    assert latest_checkpoint(str(tmp_path)) == p_small_new


def test_legacy_msgpack_restore_warns(tmp_path):
    from flax import serialization

    state = {"w": jnp.ones((2, 2))}
    path = str(tmp_path / "0000001.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        restored = restore_checkpoint(path, {"w": jnp.zeros((2, 2))})
    assert any("RoPE" in str(w.message) for w in rec)
    np.testing.assert_array_equal(np.asarray(restored["w"]), 1.0)
    # latest_checkpoint sees both formats
    save_checkpoint(str(tmp_path), 2, state)
    assert latest_checkpoint(str(tmp_path)).endswith("0000002.safetensors")


def test_update_ema_mixed_precision_guard():
    """EMA math runs in f32 (bf16 params fine); a bf16-STORED EMA at decay
    0.9999 would silently never move (increment below bf16 resolution), so
    update_ema rejects it."""
    from vavae_tpu.train.ema import update_ema

    ema = {"w": jnp.ones((4,), jnp.float32)}
    p = {"w": jnp.full((4,), 2.0, jnp.bfloat16)}
    out = update_ema(ema, p, 0.9999)
    assert out["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0 + 1e-4, rtol=1e-5)

    with pytest.raises(ValueError, match="bf16-stored EMA"):
        update_ema({"w": jnp.ones((4,), jnp.bfloat16)}, p, 0.9999)
    # low decay is representable in bf16 — allowed
    out2 = update_ema({"w": jnp.ones((4,), jnp.bfloat16)}, p, 0.9)
    assert float(np.asarray(out2["w"].astype(jnp.float32))[0]) > 1.05


def test_stage_epochs_done_prefers_epoch_json(tmp_path):
    """ADVICE r1: a zero-step epoch re-saves under the same step number, so
    distinct-checkpoint counting undercounts — the explicit epoch.json
    record wins; legacy dirs without it fall back to counting."""
    import json
    import os

    from vavae_tpu.pipelines.train_vavae import stage_epochs_done

    d = str(tmp_path / "stage1")
    os.makedirs(d)
    assert stage_epochs_done(d) == 0
    # legacy: two distinct-step checkpoints, no epoch.json
    open(os.path.join(d, "0000005.safetensors"), "wb").close()
    open(os.path.join(d, "0000010.safetensors"), "wb").close()
    assert stage_epochs_done(d) == 2
    # explicit record wins (e.g. 3 epochs done, one of them zero-step)
    with open(os.path.join(d, "epoch.json"), "w") as f:
        json.dump({"epochs_done": 3}, f)
    assert stage_epochs_done(d) == 3


def test_lenient_restore_shape_checked_finetune_init(tmp_path, capsys):
    """Finetune-init semantics (load_weights_with_shape_check,
    train_dit_s_official.py:525-554): shape-mismatched leaves keep the
    target's fresh init, missing leaves keep the target, extra leaves are
    dropped, matching leaves load; strict mode still fails on the same file."""
    src = {
        "params": {
            "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            # 1000-class label embedder -> 31-class model below
            "y_embed": jnp.ones((1000, 8), jnp.float32),
            "legacy_only": jnp.zeros((2,), jnp.float32),
        },
        "step": jnp.asarray(5, jnp.int32),
    }
    path = save_checkpoint(str(tmp_path), 5, src)

    target = {
        "params": {
            "w": jnp.zeros((3, 4), jnp.float32),
            "y_embed": jnp.full((31, 8), 7.0, jnp.float32),
            "new_head": jnp.full((4,), 3.0, jnp.float32),
        },
        "step": jnp.asarray(0, jnp.int32),
    }
    restored = restore_checkpoint(path, target, lenient=True)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(src["params"]["w"]))
    # mismatched shape -> target init kept
    np.testing.assert_array_equal(np.asarray(restored["params"]["y_embed"]),
                                  np.asarray(target["params"]["y_embed"]))
    # missing in checkpoint -> target init kept
    np.testing.assert_array_equal(np.asarray(restored["params"]["new_head"]),
                                  np.asarray(target["params"]["new_head"]))
    assert int(restored["step"]) == 5
    out = capsys.readouterr().out
    assert "shape mismatch" in out and "loaded 2 leaves, skipped 3" in out

    with pytest.raises(Exception):
        restore_checkpoint(path, target)  # strict stays strict


def test_weight_init_is_weights_only(tmp_path):
    """Pretrained weight_init must copy weights ONLY (reference
    load_weights_with_shape_check + post-load EMA deepcopy): step and
    optimizer state restart fresh — otherwise a finetune from an 80k-step
    checkpoint silently runs zero steps and inherits stale Adam moments."""
    import logging

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.pipelines.train_dit import load_weight_init
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    model = LightningDiT(
        input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
        num_heads=2, num_classes=4, use_swiglu=True, use_rope=True,
        use_rmsnorm=True,
    )
    trainer = DiTTrainer(model, create_transport("Linear", "velocity"),
                         make_mesh(), lr=1e-3)
    old = trainer.init_state(jax.random.PRNGKey(0), (4, 8, 8, 4))
    # simulate a long-trained prior run: bump step, perturb params + moments
    old = old.replace(
        step=jnp.asarray(80_000, jnp.int32),
        params=jax.tree_util.tree_map(lambda p: p + 1.0, old.params),
    )
    path = save_checkpoint(str(tmp_path), 80_000, jax.device_get(old))

    fresh = trainer.init_state(jax.random.PRNGKey(1), (4, 8, 8, 4))
    state = load_weight_init(path, fresh, model, logging.getLogger("t"))

    # weights came from the checkpoint, EMA re-seeded from them
    got = jax.tree_util.tree_leaves(jax.device_get(state.params))
    want = jax.tree_util.tree_leaves(jax.device_get(old.params))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    for g, e in zip(got, jax.tree_util.tree_leaves(jax.device_get(state.ema_params))):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))
    # ...but step and optimizer state are FRESH
    assert int(jax.device_get(state.step)) == 0
    f_opt = jax.tree_util.tree_leaves(jax.device_get(fresh.opt_state))
    s_opt = jax.tree_util.tree_leaves(jax.device_get(state.opt_state))
    for a, b in zip(f_opt, s_opt):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_init_from_bf16_checkpoint_casts_to_fresh_dtypes(tmp_path):
    """weight_init from a bf16-params checkpoint must cast to the fresh
    init's dtypes and seed a FLOAT32 EMA — a bf16 EMA crashes update_ema at
    decay 0.9999 (the 1e-4 increment underflows bf16) on the first step."""
    import logging

    import ml_dtypes

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.pipelines.train_dit import load_weight_init
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    model = LightningDiT(
        input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
        num_heads=2, num_classes=4, use_swiglu=True, use_rope=True,
        use_rmsnorm=True,
    )
    trainer = DiTTrainer(model, create_transport("Linear", "velocity"),
                         make_mesh(), lr=1e-3)
    old = trainer.init_state(jax.random.PRNGKey(0), (4, 8, 8, 4))
    old = old.replace(
        params=jax.tree_util.tree_map(
            lambda p: np.asarray(p, ml_dtypes.bfloat16), jax.device_get(old.params)
        )
    )
    path = save_checkpoint(str(tmp_path), 10, jax.device_get(old))

    fresh = trainer.init_state(jax.random.PRNGKey(1), (4, 8, 8, 4))
    state = load_weight_init(path, fresh, model, logging.getLogger("t"))
    for p, q in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(fresh.params)):
        assert np.asarray(p).dtype == np.asarray(q).dtype  # fresh dtypes
    for e in jax.tree_util.tree_leaves(state.ema_params):
        assert np.asarray(e).dtype == np.float32
    # the first train step (incl. the EMA blend) must run
    state = trainer.replicate(state)
    x = np.zeros((8, 8, 8, 4), np.float32)
    y = np.zeros((8,), np.int32)
    state, m = trainer.train_step(state, jax.random.PRNGKey(2),
                                  trainer.shard_batch((x, y)))
    assert np.isfinite(float(jax.device_get(m["loss"])))
