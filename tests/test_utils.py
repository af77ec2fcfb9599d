"""Tests for the small utility subsystems: metrics logger, image grid,
profiling timers, PNG fallback path."""
import json
import os

import numpy as np


def test_metrics_logger_jsonl_and_tb(tmp_path):
    from vavae_tpu.utils.metrics_logger import MetricsLogger

    log = MetricsLogger(str(tmp_path), enabled=True)
    log.log_text("config", "hello")
    log.log_scalars(10, {"train/loss": 1.5, "train/steps_per_sec": 2.0})
    log.log_scalars(20, {"train/loss": 1.2})
    log.close()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["step"] for l in lines] == [10, 20]
    assert lines[0]["train/loss"] == 1.5
    # disabled logger writes nothing
    log2 = MetricsLogger(str(tmp_path / "off"), enabled=False)
    log2.log_scalars(1, {"x": 1.0})
    log2.close()
    assert not os.path.exists(tmp_path / "off" / "metrics.jsonl")


def test_image_grid(tmp_path):
    from PIL import Image

    from vavae_tpu.utils.image_grid import save_image_grid

    imgs = np.random.default_rng(0).integers(0, 255, size=(6, 8, 8, 3), dtype=np.uint8)
    path = save_image_grid(imgs, str(tmp_path / "grid.png"), cols=3)
    arr = np.asarray(Image.open(path))
    assert arr.shape[0] == 2 * 8 and arr.shape[1] == 3 * 8  # 2 rows x 3 cols


def test_step_timer_and_memory_stats():
    import jax

    from vavae_tpu.utils.profiling import StepTimer, device_memory_stats

    t = StepTimer()
    for _ in range(5):
        t.step()
    assert t.rate() > 0
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_png_writer_pil_fallback(tmp_path, monkeypatch):
    import vavae_tpu.utils.png_native as pn

    monkeypatch.setattr(pn, "_load", lambda: None)
    assert not pn.available()
    imgs = np.random.default_rng(0).integers(0, 255, size=(2, 8, 8, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(2)]
    pn.write_pngs(imgs, paths)  # routes through PIL
    from PIL import Image

    back = np.asarray(Image.open(paths[0]).convert("RGB"))
    np.testing.assert_array_equal(back, imgs[0])


def test_window_tracer_env_driven(tmp_path, monkeypatch):
    """VAVAE_PROFILE captures an xprof trace of the configured step window
    (start past the settle steps, stop after n, close() ends a cut-short
    window); unset env is a strict no-op."""
    import jax
    import jax.numpy as jnp

    from vavae_tpu.utils.profiling import WindowTracer

    # no-op when unset
    monkeypatch.delenv("VAVAE_PROFILE", raising=False)
    t = WindowTracer()
    t.step(1)
    t.close()

    out = tmp_path / "trace"
    monkeypatch.setenv("VAVAE_PROFILE", str(out))
    monkeypatch.setenv("VAVAE_PROFILE_AT", "2")
    monkeypatch.setenv("VAVAE_PROFILE_STEPS", "2")
    t = WindowTracer()
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8,))
    for i in range(1, 6):  # window [2, 4): starts at 2, stops at 4
        x = f(x)
        t.step(i, sync_on=x)
    assert not t._active
    t.close()
    traced = list(out.rglob("*"))
    assert any(p.is_file() for p in traced), "no trace artifacts written"

    # a window cut short by loop exit is closed by close()
    out2 = tmp_path / "trace2"
    monkeypatch.setenv("VAVAE_PROFILE", str(out2))
    monkeypatch.setenv("VAVAE_PROFILE_AT", "1")
    monkeypatch.setenv("VAVAE_PROFILE_STEPS", "100")
    t2 = WindowTracer()
    t2.step(1, sync_on=f(x))
    assert t2._active
    t2.close()
    assert not t2._active
    assert any(p.is_file() for p in out2.rglob("*"))


def test_jax_cache_dir_is_host_fingerprinted():
    """The persistent compile cache stores host machine code (CPU AOT
    executables); the repo's cache dir persists across machines, so a
    foreign entry loads only with SIGILL-risk warnings. setup() must key
    the directory by a stable per-host CPU-feature fingerprint."""
    import jax

    from vavae_tpu.utils import jax_cache

    fp = jax_cache.host_fingerprint()
    assert fp and "/" not in fp
    assert fp == jax_cache.host_fingerprint()  # stable within a host
    # conftest imported jax_cache at session start -> config reflects setup()
    assert jax.config.jax_compilation_cache_dir.rstrip("/").endswith(fp)
