"""Autotune-sampler CLI (round-5 verdict item 3): the measure-on-YOUR-model
doctrine as an executable recommendation.

Covers: the gauge subset runs against a real checkpoint through the real
CLI entry, the noise floor is measured and drives the adaptive-tol
candidates, the recommendation block round-trips into pipelines.sample's
config keys, and the budget gate actually gates (an impossible budget must
fall back to exact euler).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_dit_setup(tmp_path_factory):
    """A tiny DiT config + saved train-state checkpoint (no training —
    autotune gauges whatever field the checkpoint holds)."""
    w = tmp_path_factory.mktemp("autotune")
    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.checkpoint import save_checkpoint
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport
    from vavae_tpu.utils.config import Config

    cfg = {
        "ckpt_path": None,
        "data": {"image_size": 32, "num_classes": 2, "latent_norm": False,
                 "latent_multiplier": 1.0},
        "vae": {"downsample_ratio": 16},
        "model": {"model_type": "LightningDiT-S/2", "use_swiglu": True,
                  "use_rope": True, "use_rmsnorm": True, "in_chans": 8,
                  "use_checkpoint": False},
        "transport": {"path_type": "Linear", "prediction": "velocity"},
        "sample": {"mode": "ODE", "sampling_method": "euler",
                   "num_sampling_steps": 8, "cfg_scale": 3.0,
                   "cfg_interval_start": 0.11, "timestep_shift": 0.2},
    }
    model = create_dit(Config(cfg["model"]), 2, 2)
    trainer = DiTTrainer(model, create_transport("Linear", "velocity"),
                         make_mesh(devices=jax.devices()[:1]))
    state = trainer.init_state(jax.random.PRNGKey(0), (2, 2, 2, 8))
    ckpt_dir = str(w / "ckpts")
    save_checkpoint(ckpt_dir, 1, state)
    cfg_path = str(w / "dit.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path, os.path.join(ckpt_dir, "0000001.safetensors"), w


def test_autotune_smoke_recommends_and_roundtrips(tiny_dit_setup):
    from vavae_tpu.apps.autotune_sampler import main

    cfg_path, ckpt, w = tiny_dit_setup
    out = str(w / "evidence.json")
    overlay = str(w / "overlay.yaml")
    rc = main(["--config", cfg_path, "--ckpt", ckpt, "--smoke",
               "--budget", "0.5", "--batch", "4", "--n", "4",
               "--out", out, "--emit_yaml", overlay])
    assert rc == 0
    doc = json.load(open(out))
    # every ladder method measured, with the three evidence columns
    assert len(doc["methods"]) >= 5
    for rec in doc["methods"].values():
        assert np.isfinite(rec["cost"]) and rec["cost"] > 0
        assert np.isfinite(rec["rel_l2_p99"])
        assert np.isfinite(rec["latent_fid"])
    # the noise floor was measured and drove the adaptive candidates
    assert "noise_floor" in doc
    vcacheA_labels = [k for k in doc["methods"] if k.startswith("vcacheA")]
    assert vcacheA_labels
    if doc["noise_floor"]:
        tol = doc["methods"][vcacheA_labels[0]]["rec"]["tol"]
        assert tol >= doc["noise_floor"], (
            "adaptive tol candidate below the measured floor — the "
            "saturation finding says that knob position is dead")
    # the recommendation block carries the production settings through
    block = doc["recommendation"]["sample_block"]
    assert block["cfg_scale"] == 3.0
    assert block["timestep_shift"] == 0.2

    # the emitted overlay must be consumable by the REAL sampling pipeline
    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import build_sample_fn, load_dit_params
    from vavae_tpu.utils.config import load_config

    merged = load_config(cfg_path, overlay)
    assert merged.sample.sampling_method in ("euler", "heun")
    model = create_dit(merged.model, 2, merged.data.num_classes)
    params = load_dit_params(merged, model, ckpt)
    fn = build_sample_fn(merged, model, params)
    s = fn(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    assert s.shape == (2, 2, 2, 8)
    assert np.isfinite(np.asarray(s)).all()


def test_autotune_impossible_budget_falls_back_to_exact(tiny_dit_setup):
    from vavae_tpu.apps.autotune_sampler import main

    cfg_path, ckpt, w = tiny_dit_setup
    out = str(w / "evidence_strict.json")
    # an unsatisfiable budget (deviation is >= 0 by construction; on a
    # near-constant field methods can hit EXACTLY 0.0, so a tiny positive
    # budget would not gate) -> must recommend exact euler
    rc = main(["--config", cfg_path, "--ckpt", ckpt, "--smoke",
               "--budget", "-1", "--batch", "4", "--n", "4",
               "--out", out])
    assert rc == 0
    doc = json.load(open(out))
    block = doc["recommendation"]["sample_block"]
    assert doc["recommendation"]["winner"].startswith("euler_")
    assert block["multistep_order"] == 1
    assert block["velocity_cache_interval"] == 1
    assert not block["velocity_cache_adaptive"]
    assert block["num_sampling_steps"] == 16  # the smoke exact reference


def test_autotune_gates_accel_on_production_path(tiny_dit_setup, tmp_path):
    """A config whose production sampler never takes the split-CFG euler
    path (cfg_interval_start 0) must only be offered euler step-count
    candidates — pipelines.sample would silently ignore every other knob
    (sample.py:130-146), so recommending one would emit an inert config."""
    import yaml

    from vavae_tpu.apps.autotune_sampler import main

    cfg_path, ckpt, w = tiny_dit_setup
    cfg = yaml.safe_load(open(cfg_path))
    cfg["sample"]["cfg_interval_start"] = 0.0
    gated = tmp_path / "dit_nostart.yaml"
    gated.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "evidence_gated.json")
    rc = main(["--config", str(gated), "--ckpt", ckpt, "--smoke",
               "--budget", "0.5", "--batch", "4", "--n", "4", "--out", out])
    assert rc == 0
    doc = json.load(open(out))
    assert doc["accel_exercised_by_production_path"] is False
    assert all(k.startswith("euler_") for k in doc["methods"]), doc["methods"]
    block = doc["recommendation"]["sample_block"]
    assert block["multistep_order"] == 1
    assert block["velocity_cache_interval"] == 1


def test_autotune_requires_checkpoint(tiny_dit_setup):
    import pytest

    from vavae_tpu.apps.autotune_sampler import main

    cfg_path, _, _ = tiny_dit_setup
    with pytest.raises(SystemExit, match="trained checkpoint"):
        main(["--config", cfg_path, "--smoke"])


def test_adaptive_stats_expose_noise_floor():
    """return_stats now surfaces the controller's calibrated floor (the
    autotune CLI's tol candidates are placed relative to it)."""
    from vavae_tpu.transport import Sampler, create_transport

    sampler = Sampler(create_transport("Linear", "velocity"))
    fn = sampler.sample_ode_cfg(
        num_steps=16, cache_adaptive=True, cache_tol=1e-6,
        cache_max_interval=4, cfg_interval_start=0.11, return_stats=True,
    )
    B, shape = 2, (2, 2, 2, 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape)

    def cond(x, t):
        return jnp.sin(3.0 * t)[:, None, None, None] * (1.0 + 0.1 * x)

    def cfgf(x, t):
        return jnp.sin(3.0 * t)[:, None, None, None] * (1.0 + 0.1 * x)

    out, stats = fn(x, cond, cfgf)
    assert out.shape == shape
    assert "noise_floor" in stats
    floor = float(np.asarray(stats["noise_floor"]))
    # tol 1e-6 forces dense evaluation -> calibration completes: finite,
    # and ~0 on this noise-free analytic field
    assert np.isfinite(floor) and floor >= 0
    assert int(stats["cfg_evals"]) > 0
