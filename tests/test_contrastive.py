"""Classifier contrastive losses + DomainAdaptiveClassifier parity.

VERDICT r1 gap #4: the reference's improved classifier trains with SupCon
AND global-negative contrastive (improved_classifier_training.py:62-277)
and the calibrated variant has a DomainAdaptiveClassifier architecture
(train_calibrated_classifier.py:78). These tests load the ACTUAL reference
classes (torchvision/timm stubbed) and assert numeric parity with our
vectorized JAX implementations, plus behavior tests (loss ordering on
structured features, memory-bank ring buffer, freeze tiers).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_IMPROVED = "/root/reference/improved_classifier_training.py"
REF_CALIBRATED = "/root/reference/train_calibrated_classifier.py"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import torchvision_stub  # noqa: E402


def _load_ref(name, path):
    torchvision_stub.install()
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_improved():
    if not os.path.exists(REF_IMPROVED):
        pytest.skip("reference tree not mounted")
    return _load_ref("ref_improved_classifier", REF_IMPROVED)


@pytest.fixture(scope="module")
def ref_calibrated():
    if not os.path.exists(REF_CALIBRATED):
        pytest.skip("reference tree not mounted")
    return _load_ref("ref_calibrated_classifier", REF_CALIBRATED)


def test_interuser_contrastive_parity(ref_improved):
    """Our interuser loss == the reference InterUserContrastiveLoss, and
    also == the reference SupConLoss (same formula, as documented)."""
    import torch

    from vavae_tpu.apps.regularization import interuser_contrastive_loss

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(12, 16)).astype(np.float32)
    labels = rng.integers(0, 4, size=(12,)).astype(np.int64)

    tf, tl = torch.from_numpy(feats), torch.from_numpy(labels)
    ref_inter = ref_improved.InterUserContrastiveLoss(temperature=0.07)(tf, tl)
    ref_supcon = ref_improved.SupConLoss(temperature=0.07)(tf, tl)
    ours = float(interuser_contrastive_loss(feats, labels, 0.07))
    np.testing.assert_allclose(ours, float(ref_inter), rtol=1e-5)
    np.testing.assert_allclose(ours, float(ref_supcon), rtol=1e-5)


def test_global_negative_contrastive_parity(ref_improved):
    """Same bank + unique-label batch (sidesteps the reference's
    first-same-class-sample masking bug) ⇒ identical loss value."""
    import torch

    from vavae_tpu.apps.regularization import (
        global_negative_contrastive,
        update_memory_bank,
    )

    num_classes, memory_size, D = 4, 8, 512  # ref hardcodes D=512
    rng = np.random.default_rng(1)
    bank = rng.normal(size=(num_classes, memory_size, D)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=2, keepdims=True)
    feats = rng.normal(size=(4, D)).astype(np.float32)
    labels = np.array([0, 1, 2, 3], np.int64)  # one sample per class

    ref_loss_mod = ref_improved.GlobalNegativeContrastiveLoss(
        num_classes=num_classes, temperature=0.07, margin=0.5,
        memory_size=memory_size,
    )
    with torch.no_grad():
        ref_loss_mod.memory_bank.copy_(torch.from_numpy(bank))
        ref_loss_mod.memory_ptr.zero_()
    ref_val = float(ref_loss_mod(torch.from_numpy(feats), torch.from_numpy(labels)))

    memory = {"bank": bank.copy(), "ptr": np.zeros((num_classes,), np.int32)}
    memory = update_memory_bank(memory, feats, labels)  # ref updates first
    ours = float(global_negative_contrastive(
        feats, labels, memory, temperature=0.07, margin=0.5,
        bank_pos=50, bank_neg=20,
    ))
    np.testing.assert_allclose(ours, ref_val, rtol=1e-5)
    # the ring buffer advanced and holds the batch's normalized features
    assert np.all(np.asarray(memory["ptr"]) == 1)
    want = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(memory["bank"])[labels, 0], want, rtol=1e-5
    )


def test_memory_bank_ring_with_duplicate_labels():
    from vavae_tpu.apps.regularization import init_memory_bank, update_memory_bank
    import jax

    memory = init_memory_bank(jax.random.PRNGKey(0), num_classes=3, dim=4,
                              memory_size=4)
    feats = np.eye(5, 4, dtype=np.float32) + 0.1
    labels = np.array([1, 1, 2, 1, 0], np.int32)
    m2 = update_memory_bank(memory, feats, labels)
    ptr = np.asarray(m2["ptr"])
    assert list(ptr) == [1, 3, 1]
    # duplicates of class 1 landed in consecutive slots, in batch order
    bank = np.asarray(m2["bank"])
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    np.testing.assert_allclose(bank[1, 0], f[0], rtol=1e-5)
    np.testing.assert_allclose(bank[1, 1], f[1], rtol=1e-5)
    np.testing.assert_allclose(bank[1, 2], f[3], rtol=1e-5)


def test_global_negative_orders_separated_vs_mixed():
    """Well-separated class features score lower than identical features."""
    from vavae_tpu.apps.regularization import (
        global_negative_contrastive,
        init_memory_bank,
        update_memory_bank,
    )
    import jax

    C, D = 4, 16
    base = init_memory_bank(jax.random.PRNGKey(0), C, dim=D, memory_size=16)
    labels = np.arange(C, dtype=np.int32)
    # separated: one orthogonal direction per class, bank agrees
    sep = np.eye(C, D, dtype=np.float32) * 5
    m_sep = base
    for _ in range(4):
        m_sep = update_memory_bank(m_sep, sep, labels)
    loss_sep = float(global_negative_contrastive(sep, labels, m_sep))
    # collapsed: every class maps to the same feature
    col = np.tile(np.eye(1, D, dtype=np.float32) * 5, (C, 1))
    m_col = base
    for _ in range(4):
        m_col = update_memory_bank(m_col, col, labels)
    loss_col = float(global_negative_contrastive(col, labels, m_col))
    assert loss_sep < loss_col


def test_domain_adaptive_classifier_parity(ref_calibrated):
    """Full-forward parity of DomainAdaptiveClassifier (backbone + BN heads)
    vs the reference module with converted weights, eval mode."""
    import torch

    from vavae_tpu.models.resnet import (
        DomainAdaptiveClassifier,
        domain_adaptive_params_from_torch,
        feature_similarity,
    )

    torch.manual_seed(0)
    ref = ref_calibrated.DomainAdaptiveClassifier(
        num_classes=5, dropout_rate=0.3, feature_dim=512
    ).eval()
    # randomize BN running stats so scrambled conversions fail loudly
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, b in ref.named_buffers():
            if "running_var" in name:
                b.copy_(torch.empty_like(b).uniform_(0.5, 1.5, generator=g))
            elif "running_mean" in name:
                b.copy_(torch.empty_like(b).normal_(0.0, 0.1, generator=g))
            elif "feature_bank" in name:
                b.copy_(torch.empty_like(b).normal_(0.0, 1.0, generator=g))

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        logits_ref, feats_ref = ref(torch.from_numpy(x))
        sim_ref = ref.compute_feature_similarity(feats_ref).numpy()

    import jax
    import jax.numpy as jnp

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    conv = domain_adaptive_params_from_torch(sd)
    model = DomainAdaptiveClassifier(num_classes=5, feature_dim=512)
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
    )
    logits, feats = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    np.testing.assert_allclose(
        np.asarray(logits), logits_ref.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats), feats_ref.numpy(), rtol=1e-4, atol=1e-4
    )
    sim = np.asarray(feature_similarity(jnp.asarray(conv["feature_bank"]), feats))
    np.testing.assert_allclose(sim, sim_ref, rtol=1e-4, atol=1e-5)


def test_resnet18_backbone_parity():
    """Our ResNet18 vs a torchvision-structured torch resnet18 with
    converted weights (the previously-untested resnet18_params_from_torch)."""
    import torch

    from vavae_tpu.models.resnet import ResNet18, resnet18_params_from_torch

    torch.manual_seed(3)
    ref = torchvision_stub.resnet18().eval()
    g = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for name, b in ref.named_buffers():
            if "running_var" in name:
                b.copy_(torch.empty_like(b).uniform_(0.5, 1.5, generator=g))
            elif "running_mean" in name:
                b.copy_(torch.empty_like(b).normal_(0.0, 0.1, generator=g))
    ref.fc = torch.nn.Linear(512, 7)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(x)).numpy()

    import jax
    import jax.numpy as jnp

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, resnet18_params_from_torch(sd))
    logits = ResNet18(num_classes=7).apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    np.testing.assert_allclose(np.asarray(logits), logits_ref, rtol=1e-4, atol=1e-4)


def test_domain_adaptive_trainer_step(mesh8):
    """domain_adaptive mode: step runs, loss finite, frozen stages frozen,
    heads update, EMA prototype bank moves toward the batch features."""
    import jax

    from vavae_tpu.apps.train_classifier import ClassifierTrainer
    from vavae_tpu.parallel.mesh import shard_batch

    trainer = ClassifierTrainer(num_classes=4, mode="domain_adaptive", mesh=mesh8)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, image_size=32)
    assert np.asarray(state.extras).shape == (4, 512)

    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = (np.arange(8) % 4).astype(np.int32)
    p0 = jax.device_get(state.params)
    state, metrics = trainer.train_step(state, rng, shard_batch(mesh8, (x, y)))
    p1 = jax.device_get(state.params)
    assert np.isfinite(float(metrics["loss"]))
    # frozen: backbone stem; trained: heads + layer4
    stem0 = p0["backbone"]["conv1"]["kernel"]
    stem1 = p1["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(stem0, stem1)
    assert np.abs(p1["cls_fc2"]["kernel"] - p0["cls_fc2"]["kernel"]).max() > 0
    assert np.abs(p1["backbone"]["layer4_0"]["conv1"]["kernel"]
                  - p0["backbone"]["layer4_0"]["conv1"]["kernel"]).max() > 0
    assert np.abs(np.asarray(state.extras)).max() > 0  # bank updated
    # eval + predict paths handle the tuple output
    m = trainer.eval_step(state, shard_batch(mesh8, (x, y)))
    assert np.isfinite(float(m["acc"]))
    probs = np.asarray(trainer.predict_fn(state)(x))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_improved_global_trainer_step(mesh8):
    """improved + contrastive_type=global: memory bank lives in state.extras
    and its pointer advances each step."""
    import jax

    from vavae_tpu.apps.train_classifier import ClassifierTrainer
    from vavae_tpu.parallel.mesh import shard_batch

    trainer = ClassifierTrainer(
        num_classes=4, mode="improved", contrastive_type="global",
        memory_size=16, mesh=mesh8,
    )
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, image_size=32)
    x = np.random.default_rng(1).normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = (np.arange(8) % 4).astype(np.int32)
    state, metrics = trainer.train_step(state, rng, shard_batch(mesh8, (x, y)))
    assert np.isfinite(float(metrics["loss"]))
    assert list(np.asarray(state.extras["ptr"])) == [2, 2, 2, 2]
    state, _ = trainer.train_step(state, rng, shard_batch(mesh8, (x, y)))
    assert list(np.asarray(state.extras["ptr"])) == [4, 4, 4, 4]


def test_classifier_state_extras_checkpoint_roundtrip(tmp_path):
    """extras (bank dict / array / None) survive save→restore, and an
    old-format checkpoint without the field restores with extras=None."""
    import jax
    from flax import struct

    from vavae_tpu.apps.train_classifier import ClassifierState, ClassifierTrainer
    from vavae_tpu.train.checkpoint import restore_checkpoint, save_state_file

    trainer = ClassifierTrainer(
        num_classes=3, mode="improved", contrastive_type="global", memory_size=4
    )
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
    path = str(tmp_path / "clf.safetensors")
    save_state_file(path, state)
    restored = restore_checkpoint(path, trainer.init_state(jax.random.PRNGKey(1), 32))
    np.testing.assert_allclose(
        np.asarray(restored.extras["bank"]), np.asarray(state.extras["bank"])
    )

    class OldClassifierState(struct.PyTreeNode):
        step: jax.Array
        params: dict
        batch_stats: dict
        opt_state: object

    base = ClassifierTrainer(num_classes=3, mode="baseline")
    s = base.init_state(jax.random.PRNGKey(0), image_size=32)
    old = OldClassifierState(s.step, s.params, s.batch_stats, s.opt_state)
    old_path = str(tmp_path / "old.safetensors")
    save_state_file(old_path, old)
    target = base.init_state(jax.random.PRNGKey(1), image_size=32)
    restored = restore_checkpoint(old_path, target)
    assert restored.extras is None
    np.testing.assert_allclose(
        np.asarray(restored.params["fc"]["kernel"]),
        np.asarray(s.params["fc"]["kernel"]),
    )


def test_memory_bank_wrap_is_last_write_wins():
    """A class with more batch samples than memory_size must keep its LAST
    memory_size samples (the reference's sequential loop semantics) —
    vectorized scatter with colliding slots would otherwise be
    order-unspecified."""
    from vavae_tpu.apps.regularization import update_memory_bank

    M, D = 4, 3
    bank0 = np.zeros((2, M, D), np.float32)
    memory = {"bank": bank0, "ptr": np.zeros((2,), np.int32)}
    feats = np.eye(6, D, k=-2, dtype=np.float32) + np.arange(6)[:, None] + 1.0
    labels = np.zeros((6,), np.int32)  # six samples, one class, M=4
    m2 = update_memory_bank(memory, feats, labels)
    bank = np.asarray(m2["bank"])
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    # sequential ring: sample i -> slot i % 4; slots 0,1 overwritten by 4,5
    want = np.stack([f[4], f[5], f[2], f[3]])
    np.testing.assert_allclose(bank[0], want, rtol=1e-6)
    assert int(np.asarray(m2["ptr"])[0]) == 6 % M
