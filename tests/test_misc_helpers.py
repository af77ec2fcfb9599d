"""Direct tests for the small parity-surface helpers that only had
end-to-end coverage: label noise, dropout schedule, warmup-cosine wrapper
(utils_regularization.py / utils_scheduler.py), LoRA save/load roundtrip
(step11:745), velocity<->score adapter inverse (transport/path.py)."""
import numpy as np

import jax
import jax.numpy as jnp


def test_add_label_noise_rate_and_determinism():
    from vavae_tpu.apps.regularization import add_label_noise

    labels = jnp.zeros((4000,), jnp.int32)
    noisy = add_label_noise(jax.random.PRNGKey(0), labels, num_classes=10,
                            noise_prob=0.25)
    flipped = float((np.asarray(noisy) != 0).mean())
    # flips hit ~noise_prob * (1 - 1/num_classes) (a "flip" can redraw the
    # same class); 0.25 * 0.9 = 0.225
    assert 0.17 < flipped < 0.28
    again = add_label_noise(jax.random.PRNGKey(0), labels, 10, 0.25)
    np.testing.assert_array_equal(np.asarray(noisy), np.asarray(again))
    clean = add_label_noise(jax.random.PRNGKey(0), labels, 10, 0.0)
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(labels))


def test_dropout_schedule_linear_decay():
    from vavae_tpu.apps.regularization import dropout_schedule

    assert dropout_schedule(0, 100) == 0.3
    assert abs(dropout_schedule(50, 100) - 0.2) < 1e-9
    assert dropout_schedule(100, 100) == 0.1
    assert dropout_schedule(1000, 100) == 0.1  # clamped past the end
    assert dropout_schedule(5, 0) == 0.1  # total_steps=0 doesn't divide by 0


def test_warmup_cosine_schedule_shape():
    from vavae_tpu.apps.regularization import warmup_cosine_schedule

    s = warmup_cosine_schedule(1.0, warmup_steps=10, total_steps=100,
                               min_lr=0.1)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1.0) < 1e-6  # peak at warmup end
    assert float(s(55)) < 1.0
    assert abs(float(s(100)) - 0.1) < 1e-6  # decays to min_lr


def test_lora_save_load_roundtrip(tmp_path):
    from vavae_tpu.train.lora import load_lora, save_lora

    lora = {"blk": {"qkv": {"a": jnp.arange(6.0).reshape(2, 3),
                            "b": jnp.ones((3, 2))}}}
    p = str(tmp_path / "lora.msgpack")
    save_lora(p, lora)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, lora)
    back = load_lora(p, zeros)
    for k in ("a", "b"):
        np.testing.assert_array_equal(np.asarray(back["blk"]["qkv"][k]),
                                      np.asarray(lora["blk"]["qkv"][k]))


def test_velocity_score_adapters_are_inverses():
    """velocity_from_score(score_from_velocity(v)) == v away from the
    endpoints, for every coupling path (transport/path.py adapters)."""
    from vavae_tpu.transport.paths import (GVPPath, LinearPath, VPPath,
                                           score_from_velocity,
                                           velocity_from_score)

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    v = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    t = jnp.full((4,), 0.37)
    for path in (LinearPath(), GVPPath(), VPPath()):
        s = score_from_velocity(path, v, x, t)
        v2 = velocity_from_score(path, s, x, t)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v),
                                   rtol=1e-4, atol=1e-5)
