"""Tests for metric analysis, classifier eval, DA additions, quant harness."""
import numpy as np
import pytest

from vavae_tpu.apps.analyze_metrics import (
    SampleMetrics,
    compare_real_vs_generated,
    compute_sample_metrics,
    recommend_thresholds_from_real,
)
from vavae_tpu.apps.classifier_eval import (
    confusion_matrix,
    evaluate_classifier,
    reliability_bins,
)
from vavae_tpu.apps.domain_adaptation import (
    adapted_ensemble_probs,
    lccs_fuse_stats_per_layer,
    paired_t_test,
    smart_select_support,
    strategic_split,
)


def _fake_classifier(n_classes=4, good_conf=0.9):
    def fn(x):
        # label = mean-brightness bucket; confident, mostly correct
        n = len(x)
        m = x.reshape(n, -1).mean(-1)
        lbl = np.clip(((m + 1) / 2 * n_classes).astype(int), 0, n_classes - 1)
        probs = np.full((n, n_classes), (1 - good_conf) / (n_classes - 1), np.float32)
        probs[np.arange(n), lbl] = good_conf
        return probs

    return fn


def test_compute_and_recommend_thresholds():
    rng = np.random.default_rng(0)
    imgs = rng.integers(40, 220, size=(64, 8, 8, 3)).astype(np.uint8)
    # labels consistent with the fake classifier's rule
    m = (imgs.astype(np.float32) / 127.5 - 1.0).reshape(64, -1).mean(-1)
    labels = np.clip(((m + 1) / 2 * 4).astype(int), 0, 3)
    sm = compute_sample_metrics(imgs, labels, _fake_classifier())
    assert sm.confidence.shape == (64,)
    assert sm.summary()["accuracy"] == 1.0

    th = recommend_thresholds_from_real(sm)
    assert 0 < th["min_confidence"] <= 0.9
    assert th["pixel_mean_range"][0] < th["pixel_mean_range"][1]

    report = compare_real_vs_generated(sm, sm)
    assert report["generated_pass_rate"] > 0.8  # same distribution passes


def test_classifier_eval_report():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(80, 8, 8, 3)).astype(np.uint8)
    m = (imgs.astype(np.float32) / 127.5 - 1.0).reshape(80, -1).mean(-1)
    labels = np.clip(((m + 1) / 2 * 4).astype(int), 0, 3)
    rep = evaluate_classifier(_fake_classifier(), imgs, labels, num_classes=4)
    assert rep["accuracy"] == 1.0
    assert rep["top5_accuracy"] == 1.0
    cm = np.asarray(rep["confusion_matrix"])
    assert cm.sum() == 80 and np.trace(cm) == 80
    assert 0 <= rep["reliability"]["ece"] <= 1

    # broken classifier → reliability gap shows up
    def bad(x):
        probs = np.zeros((len(x), 4), np.float32)
        probs[:, 0] = 0.99
        probs[:, 1:] = 0.01 / 3
        return probs

    rep2 = evaluate_classifier(bad, imgs, labels, num_classes=4)
    assert rep2["accuracy"] < 1.0
    assert rep2["reliability"]["ece"] > rep["reliability"]["ece"]


def test_reliability_bins_math():
    conf = np.array([0.95, 0.95, 0.55, 0.55])
    correct = np.array([True, True, False, True])
    r = reliability_bins(conf, correct, bins=10)
    assert sum(r["bin_count"]) == 4
    assert r["ece"] == pytest.approx(0.5 * abs(1.0 - 0.95) + 0.5 * abs(0.5 - 0.55))


def test_strategic_split_disjoint():
    labels = np.repeat(np.arange(4), 10)
    sup, test = strategic_split(labels, support_per_class=3, seed=0)
    assert len(sup) == 12 and len(test) == 28
    assert not set(sup) & set(test)
    # per-class counts
    for c in range(4):
        assert (labels[sup] == c).sum() == 3


def test_smart_select_support_prefers_confident_and_diverse():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(20, 8)).astype(np.float32)
    feats[1] = feats[0]  # duplicate of 0
    labels = np.zeros(20, int)
    probs = np.full((20, 2), 0.5, np.float32)
    probs[0] = probs[1] = [0.99, 0.01]  # 0 and its duplicate are most confident
    sel = smart_select_support(feats, labels, probs, per_class=2, diversity_weight=0.6)
    assert 0 in sel and 1 not in sel  # duplicate rejected for diversity


def test_lccs_per_layer_and_ensemble():
    src = {"bn1": {"mean": np.zeros(2)}, "bn9": {"mean": np.zeros(2)}}
    tgt = {"bn1": {"mean": np.ones(2)}, "bn9": {"mean": np.ones(2)}}
    fused = lccs_fuse_stats_per_layer(src, tgt, {"bn1": 0.8, "bn9": 0.1})
    np.testing.assert_allclose(fused["bn1"]["mean"], 0.8)
    np.testing.assert_allclose(fused["bn9"]["mean"], 0.1)

    p1 = np.array([[0.9, 0.1]], np.float32)
    p2 = np.array([[0.5, 0.5]], np.float32)
    np.testing.assert_allclose(adapted_ensemble_probs([p1, p2]), [[0.7, 0.3]])


def test_paired_t_test():
    a = [0.8, 0.82, 0.78, 0.81, 0.79]
    b = [0.7, 0.71, 0.69, 0.72, 0.70]
    r = paired_t_test(a, b)
    assert r["significant_05"] and r["mean_diff"] > 0
    r2 = paired_t_test(a, a)
    assert not r2["significant_05"] or np.isnan(r2["t_statistic"])


def test_quant_benchmark_harness():
    import jax
    import jax.numpy as jnp

    from vavae_tpu.ops.quant import benchmark_quantization

    params = {
        "fc1": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (32, 64)) * 0.1,
                 "bias": jnp.zeros((64,))},
        "fc2": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (64, 8)) * 0.1,
                 "bias": jnp.zeros((8,))},
    }

    def apply_fn(p, x):
        h = jnp.tanh(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    rep = benchmark_quantization(apply_fn, params, (x,), reps=2)
    assert rep["compression"] > 2.0  # int8+scales vs f32
    assert rep["mean_abs_rel_error"] < 0.05
    assert rep["fp_latency_ms"] > 0


def test_schedulers():
    import numpy as np

    from vavae_tpu.utils.schedulers import cosine_epochs, warmup_cosine, warmup_cosine_cycles

    s = warmup_cosine(lr_max=1.0, warmup_steps=10, total_steps=110, lr_min=0.1)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1.0, abs=1e-6)
    assert float(s(110)) == pytest.approx(0.1, abs=1e-6)
    assert float(s(60)) == pytest.approx(0.55, abs=0.02)  # midway cosine

    c = cosine_epochs(lr=1e-3, t_max=100, eta_min=1e-6)
    assert c(0) == pytest.approx(1e-3)
    assert c(100) == pytest.approx(1e-6)
    assert c(50) == pytest.approx((1e-3 + 1e-6) / 2, rel=1e-3)

    s2 = warmup_cosine_cycles([1.0, 0.5], [0.0, 0.0], [5, 5], [50, 50])
    assert s2(5) == pytest.approx(1.0)
    assert s2(55) == pytest.approx(0.5)
    assert s2(49) < 0.1  # end of first cycle near min


def test_warmup_cosine_cycles_matches_reference_scheduler2():
    """Numeric parity vs the ACTUAL LambdaWarmUpCosineScheduler2
    (vavae/ldm/lr_scheduler.py:36-80), incl. the f_start warmup origin the
    LDM configs rely on (f_start=[1e-6], f_min=f_max=[1.0] must RAMP, not
    sit at 1.0) and the boundary step that belongs to the earlier cycle."""
    import importlib.util
    import os

    ref_path = "/root/reference/LightningDiT/vavae/ldm/lr_scheduler.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_lr_sched", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from vavae_tpu.utils.schedulers import warmup_cosine_cycles

    cases = [
        # (warmups, f_min, f_max, f_start, cycle_lengths)
        ([5, 3], [0.1, 0.0], [1.0, 0.5], [1e-6, 0.2], [40, 30]),
        ([10], [1.0], [1.0], [1e-6], [100]),  # the LDM-config degenerate case
    ]
    for warmups, fmin, fmax, fstart, cycles in cases:
        theirs = ref.LambdaWarmUpCosineScheduler2(
            warm_up_steps=warmups, f_min=fmin, f_max=fmax, f_start=fstart,
            cycle_lengths=cycles,
        )
        ours = warmup_cosine_cycles(fmax, fmin, warmups, cycles, lr_starts=fstart)
        for n in range(0, sum(cycles)):
            assert ours(n) == pytest.approx(theirs(n), abs=1e-12), n
    # the degenerate case must actually warm up
    s = warmup_cosine_cycles([1.0], [1.0], [10], [100], lr_starts=[1e-6])
    assert s(0) == pytest.approx(1e-6)
    assert s(5) == pytest.approx(0.5, abs=0.01)


def test_preemption_guard():
    import os
    import signal

    from vavae_tpu.utils.preemption import PreemptionGuard

    with PreemptionGuard(signals=(signal.SIGUSR1,)) as g:
        assert not g.should_stop
        os.kill(os.getpid(), signal.SIGUSR1)
        import time

        for _ in range(100):
            if g.should_stop:
                break
            time.sleep(0.01)
        assert g.should_stop
    # handler restored after exit
    assert signal.getsignal(signal.SIGUSR1) != g._handler


def test_reliability_verdict_thresholds():
    """Reference verdict bands + warnings
    (test_classifier_on_real_data.py:268-316)."""
    from vavae_tpu.apps.classifier_eval import reliability_verdict

    assert reliability_verdict(0.96, 0.96, [0.96])["verdict"] == "HIGHLY RELIABLE"
    assert reliability_verdict(0.90, 0.92, [0.9])["verdict"] == "RELIABLE"
    assert reliability_verdict(0.75, 0.75, [0.75])["verdict"] == "MODERATELY RELIABLE"
    assert reliability_verdict(0.50, 0.50, [0.5])["verdict"] == "UNRELIABLE"
    # boundary: exactly 0.95 / 0.85 / 0.70 take the higher band
    assert reliability_verdict(0.95, 0.95, [])["verdict"] == "HIGHLY RELIABLE"
    assert reliability_verdict(0.85, 0.85, [])["verdict"] == "RELIABLE"
    assert reliability_verdict(0.70, 0.70, [])["verdict"] == "MODERATELY RELIABLE"
    # warnings: per-user std > 0.2; high-conf acc trailing overall by > 0.1
    v = reliability_verdict(0.9, 0.9, [0.2, 0.9, 0.9, 0.9])
    assert any("biased" in w for w in v["warnings"])
    v = reliability_verdict(0.9, 0.75, [0.9, 0.9])
    assert any("calibration" in w for w in v["warnings"])
    assert reliability_verdict(0.9, 0.85, [0.9, 0.9])["warnings"] == []


def test_classifier_eval_high_conf_and_verdict_fields():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(80, 8, 8, 3)).astype(np.uint8)
    m = (imgs.astype(np.float32) / 127.5 - 1.0).reshape(80, -1).mean(-1)
    labels = np.clip(((m + 1) / 2 * 4).astype(int), 0, 3)
    rep = evaluate_classifier(_fake_classifier(), imgs, labels, num_classes=4)
    assert set(rep) >= {"high_conf_ratio", "high_conf_accuracy",
                        "confidence_std", "reliability_verdict"}
    assert rep["reliability_verdict"]["verdict"] == "HIGHLY RELIABLE"
