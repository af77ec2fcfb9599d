"""Tests: latent-space vis/uniformity metrics, user selection, VAE
validate/export functions."""
import numpy as np
import pytest

from vavae_tpu.apps.select_users import rank_users, select_users, user_classifier_stats
from vavae_tpu.apps.validate_export import latent_statistics, latent_user_discrimination
from vavae_tpu.eval.latent_vis import calculate_uniformity_metrics, sample_latent_pixels


def test_uniformity_metrics_order():
    """Uniform 2-D cloud must score higher entropy / lower Gini than a
    tightly clustered one (latent_vis.py:57-86 semantics)."""
    rng = np.random.default_rng(0)
    uniform = rng.uniform(-1, 1, size=(5000, 2))
    clustered = rng.normal(scale=0.01, size=(5000, 2))
    mu = calculate_uniformity_metrics(uniform)
    mc = calculate_uniformity_metrics(clustered)
    assert mu["entropy"] > mc["entropy"]
    assert mu["gini"] < mc["gini"]
    assert 0 <= mu["normalized_entropy"] <= 1


def test_sample_latent_pixels():
    lat = np.arange(2 * 4 * 4 * 8, dtype=np.float32).reshape(2, 4, 4, 8)
    s = sample_latent_pixels(lat, num_samples=10, seed=0)
    assert s.shape == (10, 8)
    # every sampled row is an actual pixel vector
    flat = lat.reshape(-1, 8)
    for row in s:
        assert (flat == row).all(axis=-1).any()


def test_user_selection_strategies():
    rng = np.random.default_rng(0)
    n_users, per = 8, 20
    labels = np.repeat(np.arange(n_users), per)
    probs = np.full((n_users * per, n_users), 0.01, np.float32)
    # user u classifies with target prob proportional to u
    for u in range(n_users):
        m = labels == u
        probs[m, u] = 0.2 + 0.1 * u
    probs /= probs.sum(-1, keepdims=True)
    stats = user_classifier_stats(probs, labels)
    assert stats[7]["mean_target_prob"] > stats[0]["mean_target_prob"]

    ranked = rank_users(stats)
    assert ranked[0] == 7 and ranked[-1] == 0
    assert select_users(stats, n=2, strategy="best") == [7, 6]
    assert select_users(stats, n=2, strategy="worst") == [1, 0]
    spread = select_users(stats, n=3, strategy="spread")
    assert spread[0] == 7 and spread[-1] == 0 and len(spread) == 3
    # min_accuracy filter
    strict = select_users(stats, n=8, strategy="best", min_accuracy=1.1)
    assert strict == []


def test_latent_discrimination_and_stats():
    rng = np.random.default_rng(0)
    z_a = rng.normal(loc=+3, size=(20, 2, 2, 4)).astype(np.float32)
    z_b = rng.normal(loc=-3, size=(20, 2, 2, 4)).astype(np.float32)
    latents = np.concatenate([z_a, z_b])
    labels = np.array([0] * 20 + [1] * 20)
    d = latent_user_discrimination(latents, labels)
    assert d["nearest_centroid_acc"] == 1.0
    assert d["between_within_ratio"] > 1.0

    # stats in the reference's (1, C, 1, 1) layout
    st = latent_statistics(latents)
    assert st["mean"].shape == (1, 4, 1, 1)
    np.testing.assert_allclose(
        st["mean"].reshape(-1), latents.mean(axis=(0, 1, 2)), rtol=1e-5
    )
