"""Minimum end-to-end slice (SURVEY.md §7 gate 5): synthetic latent shards →
ImgLatentDataset (stats, normalization, flips) → DiT training steps on the
mesh → CFG sampling — all tiny shapes."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from vavae_tpu.data.latent_dataset import ImgLatentDataset
from vavae_tpu.models.dit import LightningDiT
from vavae_tpu.train.dit_trainer import DiTTrainer
from vavae_tpu.transport import Sampler, create_transport


@pytest.fixture(scope="module")
def latent_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("latents")
    rng = np.random.default_rng(0)
    for shard in range(2):
        n = 16
        save_file(
            {
                "latents": (rng.normal(size=(n, 4, 8, 8)) * 3 + 1).astype(np.float32),
                "latents_flip": (rng.normal(size=(n, 4, 8, 8)) * 3 + 1).astype(np.float32),
                "labels": rng.integers(0, 4, size=(n,)).astype(np.int64),
            },
            str(d / f"latents_rank00_shard{shard:03d}.safetensors"),
        )
    return str(d)


def test_latent_dataset(latent_dir):
    ds = ImgLatentDataset(latent_dir, latent_norm=True)
    assert len(ds) == 32
    lat, label = ds[0]
    assert lat.shape == (8, 8, 4)  # NHWC single
    assert 0 <= int(label) < 4
    # stats cache created
    assert os.path.exists(os.path.join(latent_dir, "latents_stats.safetensors"))
    mean, std = ds.latent_stats
    assert mean.shape == (1, 4, 1, 1) and std.shape == (1, 4, 1, 1)
    # normalized data is ~N(0,1) per channel
    batch, labels = next(ds.batches(32, seed=1))
    assert batch.shape == (32, 8, 8, 4) and labels.shape == (32,)
    assert abs(float(batch.mean())) < 0.3
    assert 0.6 < float(batch.std()) < 1.4


def test_train_then_sample(latent_dir, mesh8):
    ds = ImgLatentDataset(latent_dir, latent_norm=True)
    model = LightningDiT(
        input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
        num_heads=2, num_classes=4, class_dropout_prob=0.1,
        use_swiglu=True, use_rope=True, use_rmsnorm=True,
    )
    transport = create_transport("Linear", "velocity", use_cosine_loss=True, use_lognorm=True)
    trainer = DiTTrainer(model, transport, mesh8, lr=1e-3, max_grad_norm=1.0,
                         ema_decay=0.99)
    rng = jax.random.PRNGKey(0)
    state = trainer.replicate(trainer.init_state(rng, (16, 8, 8, 4)))

    it = ds.batches(16, seed=0)
    losses = []
    for _ in range(6):
        batch = trainer.shard_batch(next(it))
        state, metrics = trainer.train_step(state, rng, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert int(jax.device_get(state.step)) == 6
    assert all(np.isfinite(l) for l in losses)
    # EMA params differ from raw params after updates but stay close
    p = jax.device_get(state.params)
    e = jax.device_get(state.ema_params)
    diffs = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(), p, e)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    # CFG sampling with the EMA weights
    sampler = Sampler(transport)
    sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=8,
                                   timestep_shift=0.3)
    B = 4
    labels = jnp.arange(B, dtype=jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 4))
    z_in = jnp.concatenate([z, z])
    y_in = jnp.concatenate([labels, jnp.full((B,), 4, jnp.int32)])

    ema = state.ema_params

    def model_fn(x, t):
        return model.forward_with_cfg(ema, x, t, y_in, cfg_scale=4.0,
                                      cfg_interval=True, cfg_interval_start=0.11)

    out = jax.jit(lambda z: sample_fn(z, model_fn))(z_in)
    assert out.shape == (2 * B, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_sampling_matches_single_device(latent_dir, mesh8):
    """build_sample_fn with a mesh must produce the same latents as without
    (GSPMD DP over 8 CPU devices; params replicated, batch sharded)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import build_sample_fn
    from vavae_tpu.utils.config import Config

    cfg = Config({
        "data": {"image_size": 32, "num_classes": 4, "latent_norm": False,
                 "latent_multiplier": 1.0},
        "vae": {"downsample_ratio": 16},
        "model": {"model_type": "LightningDiT-S/2", "use_swiglu": True,
                  "use_rope": True, "use_rmsnorm": True, "in_chans": 32},
        "sample": {"mode": "ODE", "sampling_method": "euler",
                   "num_sampling_steps": 4, "cfg_scale": 3.0,
                   "cfg_interval_start": 0.11, "timestep_shift": 0.3},
        "transport": {"path_type": "Linear", "prediction": "velocity"},
    })
    model = create_dit(cfg.model, 2, 4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 2, 32)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )["params"]

    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    rng = jax.random.PRNGKey(7)
    single = np.asarray(build_sample_fn(cfg, model, params)(rng, labels))
    sharded_fn = build_sample_fn(cfg, model, params, mesh=mesh8)
    sharded = sharded_fn(rng, labels)
    assert not sharded.sharding.is_fully_replicated  # actually distributed
    np.testing.assert_allclose(np.asarray(sharded), single, rtol=2e-4, atol=2e-5)


def test_sharded_multistep_sampling_matches_single_device(mesh8):
    """The Adams-Bashforth CFG path (sample.multistep_order=3) under GSPMD DP
    over 8 CPU devices must equal the single-device result — the AB scan
    carries velocity-history state per sample, which must shard cleanly with
    the batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import build_sample_fn
    from vavae_tpu.utils.config import Config

    cfg = Config({
        "data": {"image_size": 32, "num_classes": 4, "latent_norm": False,
                 "latent_multiplier": 1.0},
        "vae": {"downsample_ratio": 16},
        "model": {"model_type": "LightningDiT-S/2", "use_swiglu": True,
                  "use_rope": True, "use_rmsnorm": True, "in_chans": 32},
        "sample": {"mode": "ODE", "sampling_method": "euler",
                   "num_sampling_steps": 6, "cfg_scale": 3.0,
                   "cfg_interval_start": 0.11, "timestep_shift": 0.3,
                   "multistep_order": 3},
        "transport": {"path_type": "Linear", "prediction": "velocity"},
    })
    model = create_dit(cfg.model, 2, 4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 2, 32)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )["params"]

    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    rng = jax.random.PRNGKey(7)
    single = np.asarray(build_sample_fn(cfg, model, params)(rng, labels))
    sharded = build_sample_fn(cfg, model, params, mesh=mesh8)(rng, labels)
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(sharded), single, rtol=2e-4, atol=2e-5)


def test_sharded_heun_dopri5_sampling_matches_single_device(mesh8):
    """heun and dopri5 through the SPLIT-CFG pipeline path (round-3
    sampling_method plumbing in build_sample_fn) under GSPMD DP over 8 CPU
    devices must equal the single-device result. dopri5 is the interesting
    one: its while_loop error-norm is a global RMS over the whole batch, so
    the sharded program inserts collectives — and every shard must agree on
    the accept/reject sequence."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import build_sample_fn
    from vavae_tpu.utils.config import Config

    base = {
        "data": {"image_size": 32, "num_classes": 4, "latent_norm": False,
                 "latent_multiplier": 1.0},
        "vae": {"downsample_ratio": 16},
        "model": {"model_type": "LightningDiT-S/2", "use_swiglu": True,
                  "use_rope": True, "use_rmsnorm": True, "in_chans": 32},
        "transport": {"path_type": "Linear", "prediction": "velocity"},
    }
    model = create_dit(Config(base).model, 2, 4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 2, 32)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )["params"]
    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    rng = jax.random.PRNGKey(7)

    for sample_cfg in (
        {"mode": "ODE", "sampling_method": "heun", "num_sampling_steps": 5,
         "cfg_scale": 3.0, "cfg_interval_start": 0.11, "timestep_shift": 0.3},
        {"mode": "ODE", "sampling_method": "dopri5", "rtol": 1e-3,
         "atol": 1e-6, "cfg_scale": 3.0, "cfg_interval_start": 0.11},
    ):
        cfg = Config(dict(base, sample=sample_cfg))
        single = np.asarray(build_sample_fn(cfg, model, params)(rng, labels))
        assert np.isfinite(single).all()
        sharded = build_sample_fn(cfg, model, params, mesh=mesh8)(rng, labels)
        assert not sharded.sharding.is_fully_replicated
        np.testing.assert_allclose(np.asarray(sharded), single,
                                   rtol=2e-4, atol=2e-5)


def test_do_sample_refuses_missing_latent_stats(tmp_path):
    """latent_norm: true with a missing latents dir must fail fast — the old
    silent latent_stats=None skip decoded wrongly-scaled samples after hours
    of chip time (garbage golden FID)."""
    from vavae_tpu.pipelines.sample import do_sample
    from vavae_tpu.utils.config import Config

    cfg = Config({
        "data": {"data_path": str(tmp_path / "never_extracted"),
                 "latent_norm": True, "image_size": 32, "num_classes": 2},
        "model": {"model_type": "LightningDiT-S/2", "in_chans": 32},
        "sample": {"mode": "ODE"},
    })
    with pytest.raises(FileNotFoundError, match="latent_norm"):
        do_sample(cfg)


@pytest.mark.slow
def test_vavae_sigterm_preemption_checkpoints_midepoch(tmp_path):
    """SIGTERM during VAE training saves a mid-epoch checkpoint and exits
    cleanly (the DiT loop's preemption guard, now on the VAE loop too).
    epoch.json stays behind the interrupted epoch so resume re-runs it on
    the saved weights."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time

    import numpy as np
    import yaml
    from PIL import Image

    data = tmp_path / "data" / "c0"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(16):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype("uint8")).save(
            data / f"{i}.png"
        )
    cfg = {"ckpt_path": None, "model": {"base_learning_rate": 1e-4, "params": {
        "monitor": "val/rec_loss", "embed_dim": 4,
        "lossconfig": {"params": {"disc_start": 2}},
        "ddconfig": {"double_z": True, "z_channels": 4, "resolution": 32,
                     "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": [1, 1],
                     "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0}}}}
    cfg_path = tmp_path / "vae.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    env = dict(os.environ)
    env["VAVAE_PLATFORM"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = ":".join(filter(None, [env.get("PYTHONPATH"), repo]))
    out = tmp_path / "out"
    log = open(tmp_path / "run.log", "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "vavae_tpu.pipelines.train_vavae",
         "--base", str(cfg_path), "--data_path", str(tmp_path / "data"),
         "--output_dir", str(out), "--batch_size", "8", "--stages", "single",
         "train.max_epochs=500", "train.log_images_every=0"],
        stdout=log, stderr=subprocess.STDOUT, env=env,
    )
    try:
        # wait until training is demonstrably underway (first epoch ckpt)
        deadline = time.time() + 300
        stage_dir = out / "stage1"
        while time.time() < deadline:
            if stage_dir.is_dir() and any(
                p.suffix == ".safetensors" for p in stage_dir.iterdir()
            ):
                break
            if proc.poll() is not None:
                raise AssertionError(open(tmp_path / "run.log").read()[-2000:])
            time.sleep(1.0)
        else:
            raise AssertionError("training never produced a checkpoint")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
        log.close()
    text = open(tmp_path / "run.log").read()
    assert rc == 0, text[-2000:]
    assert "preempted at step" in text, text[-2000:]
    # epoch.json lags the interrupted epoch (<= epochs actually completed)
    done = json.load(open(stage_dir / "epoch.json"))["epochs_done"]
    assert done < 500


def test_run_stages_chains_best_val_checkpoint(tmp_path):
    """A completed stage chains its BEST-val checkpoint into the next stage,
    not the final epoch (reference step4 train_stage:560-620) — previously
    the best/ dir was written but never read back."""
    import json

    import jax
    import numpy as np
    import yaml

    from vavae_tpu.pipelines.train_vavae import build_vae_trainer, run_stages
    from vavae_tpu.train import checkpoint as ckpt_lib
    from vavae_tpu.utils.config import Config
    from vavae_tpu.parallel.mesh import make_mesh

    cfg = Config({"model": {"base_learning_rate": 1e-4, "params": {
        "embed_dim": 4,
        "lossconfig": {"params": {"disc_start": 10_000}},
        "ddconfig": {"z_channels": 4, "resolution": 32, "ch": 32,
                     "ch_mult": [1, 1], "num_res_blocks": 1,
                     "attn_resolutions": []}}}})

    # fabricate a COMPLETED stage 1 whose best/ checkpoint differs from its
    # latest: the chain must restore the best one
    out = tmp_path / "out"
    stage1 = out / "stage1"
    best = stage1 / "best"
    trainer = build_vae_trainer(cfg, make_mesh())
    s_latest = jax.device_get(trainer.init_state(jax.random.PRNGKey(1)))
    s_best = jax.device_get(trainer.init_state(jax.random.PRNGKey(2)))
    ckpt_lib.save_checkpoint(str(stage1), 20, s_latest)
    ckpt_lib.save_checkpoint(str(best), 10, s_best)
    stage1.mkdir(exist_ok=True)
    json.dump({"epochs_done": 1}, open(stage1 / "epoch.json", "w"))
    json.dump({"val": 0.1, "step": 10}, open(best / "metric.json", "w"))

    state = run_stages(
        cfg, dataset=None, stages=[{"epochs": 1}], output_dir=str(out),
        batch_size=4,
    )
    got = jax.device_get(state.gen_params)
    want = s_best.gen_params
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_adaptive_vcache_sampling_matches_single_device(mesh8):
    """The round-4 adaptive velocity cache through the pipeline path
    (sample.velocity_cache_adaptive) under GSPMD DP over 8 CPU devices must
    equal the single-device result. The controller's evaluate-vs-forecast
    decision is a batch-GLOBAL scalar (fp32 RMS over the whole batch), so
    the sharded scan inserts collectives and every shard must take the same
    eval schedule."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.pipelines.sample import build_sample_fn
    from vavae_tpu.utils.config import Config

    cfg = Config({
        "data": {"image_size": 32, "num_classes": 4, "latent_norm": False,
                 "latent_multiplier": 1.0},
        "vae": {"downsample_ratio": 16},
        "model": {"model_type": "LightningDiT-S/2", "use_swiglu": True,
                  "use_rope": True, "use_rmsnorm": True, "in_chans": 32},
        "sample": {"mode": "ODE", "sampling_method": "euler",
                   "num_sampling_steps": 10, "cfg_scale": 3.0,
                   "cfg_interval_start": 0.11, "timestep_shift": 0.3,
                   "velocity_cache_adaptive": True,
                   "velocity_cache_tol": 0.05,
                   "velocity_cache_max_interval": 4},
        "transport": {"path_type": "Linear", "prediction": "velocity"},
    })
    model = create_dit(cfg.model, 2, 4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 2, 32)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )["params"]
    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    rng = jax.random.PRNGKey(7)
    single = np.asarray(build_sample_fn(cfg, model, params)(rng, labels))
    assert np.isfinite(single).all()
    sharded = build_sample_fn(cfg, model, params, mesh=mesh8)(rng, labels)
    assert not sharded.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(sharded), single, rtol=2e-4, atol=2e-5)
