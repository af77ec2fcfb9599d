"""CLI surfaces for the standalone tools: the FID tool (reference
tools/calculate_fid.py + tools/save_npz.py) and the INT8 quantization app
(reference step9_quantize_dit_xl.py)."""
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


def _make_folder(path, n=16, seed=0, const=None):
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = (
            np.full((32, 32, 3), const, np.uint8)
            if const is not None
            else rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        )
        Image.fromarray(img).save(path / f"{i:06d}.png")


def test_fid_cli(tmp_path, monkeypatch, capsys):
    from vavae_tpu.eval.fid import main

    monkeypatch.setenv("VAVAE_FID_ALLOW_RANDOM", "1")
    a, b = tmp_path / "a", tmp_path / "b"
    _make_folder(a, seed=0)
    _make_folder(b, const=128)

    # two-folder FID
    monkeypatch.setattr(sys, "argv", ["fid", str(a), str(b), "--batch_size", "8"])
    main()
    out = capsys.readouterr().out
    assert out.startswith("FID:") and float(out.split()[1]) > 1e-5

    # precomputed-stats flow: stats(a) vs folder a -> ~0
    stats = tmp_path / "stats.npz"
    monkeypatch.setattr(
        sys, "argv", ["fid", str(a), "--save_stats", str(stats), "--batch_size", "8"]
    )
    main()
    capsys.readouterr()
    with np.load(stats) as f:
        assert f["mu"].shape == (2048,) and f["sigma"].shape == (2048, 2048)
    monkeypatch.setattr(sys, "argv", ["fid", str(a), str(stats), "--batch_size", "8"])
    main()
    assert abs(float(capsys.readouterr().out.split()[1])) < 1e-4

    # npz packer
    npz = tmp_path / "packed.npz"
    monkeypatch.setattr(
        sys, "argv", ["fid", str(a), "--save_npz", str(npz), "--num", "16"]
    )
    main()
    capsys.readouterr()
    arr = np.load(npz)["arr_0"]
    assert arr.shape == (16, 32, 32, 3) and arr.dtype == np.uint8


@pytest.mark.filterwarnings("ignore::UserWarning")
def test_quantize_dit_cli(tmp_path, monkeypatch, capsys):
    """Random-init DiT-S quantize: compression ~4x on the targeted kernels,
    small forward deviation, int8 checkpoint written, sample check runs."""
    from vavae_tpu.apps.quantize_dit import main

    cfg = tmp_path / "dit.yaml"
    cfg.write_text(
        "data: {image_size: 32, num_classes: 4}\n"
        "vae: {downsample_ratio: 16}\n"
        "model: {model_type: LightningDiT-S/2, use_swiglu: true,\n"
        "  use_rope: true, use_rmsnorm: true, in_chans: 4}\n"
        "sample: {mode: ODE, sampling_method: euler, num_sampling_steps: 4,\n"
        "  cfg_scale: 4.0, cfg_interval_start: 0.11, timestep_shift: 0.3}\n"
        "transport: {path_type: Linear, prediction: velocity}\n"
        "train: {global_seed: 0}\n"
    )
    # A plain random init has an EXACTLY-zero output (adaLN-Zero final layer),
    # which makes every quality metric degenerately 0 — perturb all leaves and
    # save a real TrainState checkpoint so the CLI's --ckpt load path and the
    # quality numbers are both exercised for real.
    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.dit import create_dit
    from vavae_tpu.ops.quant import dequantize_params, quantize_params
    from vavae_tpu.train.checkpoint import restore_checkpoint, save_state_file
    from vavae_tpu.train.dit_trainer import TrainState
    from vavae_tpu.utils.config import load_config

    c = load_config(str(cfg))
    model = create_dit(c.model, 2, 4)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 2, 4)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    fp_ckpt = tmp_path / "fp.safetensors"
    save_state_file(
        str(fp_ckpt),
        TrainState(step=np.zeros((), np.int32), params=params,
                   ema_params=params, opt_state=None),
    )

    out_ckpt = tmp_path / "int8.safetensors"
    report_path = tmp_path / "report.json"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "quantize_dit", "--config", str(cfg), "--ckpt", str(fp_ckpt),
            "--batch_size", "2", "--reps", "1", "--sample_check", "2",
            "--out", str(out_ckpt), "--report", str(report_path),
        ],
    )
    main()
    report = json.loads(report_path.read_text())
    assert report["compression"] > 2.0  # most params live in targeted Dense
    assert report["int8_size_mb"] < report["fp_size_mb"]
    # a scrambled/identity conversion would read exactly 0 or blow past 10%
    assert 0.0 < report["mean_abs_rel_error"] < 0.1
    assert 0.0 < report["sample_latent_rel_l2"] < 0.2
    assert os.path.exists(out_ckpt)

    # the int8 checkpoint restores through the documented recipe
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 2, 2, 4)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
        )["params"]
    )
    target, _ = quantize_params(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    )
    restored = restore_checkpoint(str(out_ckpt), target)
    deq = dequantize_params(restored)
    out = model.apply(
        {"params": deq},
        jnp.zeros((1, 2, 2, 4)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_top_level_dispatcher():
    """python -m vavae_tpu lists every command; unknown commands exit 2; a
    known command dispatches to the module CLI (its argparse --help)."""
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "-m", "vavae_tpu"],
                       capture_output=True, text=True)
    assert "train_dit" in r.stdout and "domain_adaptation" in r.stdout
    assert r.returncode == 1  # bare invocation: print list, nonzero

    r = subprocess.run([sys.executable, "-m", "vavae_tpu", "--help"],
                       capture_output=True, text=True)
    assert r.returncode == 0

    r = subprocess.run([sys.executable, "-m", "vavae_tpu", "nope"],
                       capture_output=True, text=True)
    assert r.returncode == 2

    from vavae_tpu.__main__ import COMMANDS
    import importlib

    for mod, _ in COMMANDS.values():  # every target importable + has main
        assert hasattr(importlib.import_module(mod), "main"), mod
