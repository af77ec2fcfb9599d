"""Preflight doctor: validate a training/sampling config before burning
chip time.

Parity targets:
  - test_config_validation.py:17-376 (latent-size arithmetic, DiT build +
    forward on the configured latent shape, dataset sample shape/label
    range, config consistency incl. patch divisibility)
  - step4_inference.py:14-73,206-236 (environment/file checks, output
    verification: demo PNGs exist and decode)

Run:  python -m vavae_tpu.apps.preflight --config configs/xxx.yaml
      [--verify_outputs DIR] [--skip_forward]
Prints one line per check (ok / warn / FAIL) and exits 1 if any check
FAILed. Warnings (missing optional artifacts) do not fail the preflight —
they name the step that produces the artifact, like the reference does.
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List, Tuple

Check = Tuple[str, str, str]  # (status, name, detail); status: ok|warn|FAIL


def check_config_consistency(cfg) -> List[Check]:
    """Latent-size arithmetic + patch divisibility
    (test_config_validation.py:241-296)."""
    out: List[Check] = []
    image_size = cfg.data.image_size
    downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
    if image_size % downsample:
        out.append(("FAIL", "latent-size",
                    f"image_size {image_size} not divisible by "
                    f"downsample_ratio {downsample}"))
        return out
    latent = image_size // downsample
    out.append(("ok", "latent-size",
                f"{image_size}/{downsample} -> {latent}x{latent} latents"))

    model_type = cfg.model.get("model_type", "")
    patch = None
    if "/" in model_type:
        try:
            patch = int(model_type.rsplit("/", 1)[1])
        except ValueError:
            pass
    if patch is None:
        out.append(("warn", "patch-size",
                    f"cannot parse patch size from model_type "
                    f"{model_type!r}"))
    elif latent % patch:
        out.append(("FAIL", "patch-size",
                    f"latent {latent} not divisible by patch {patch}"))
    else:
        n = (latent // patch) ** 2
        out.append(("ok", "patch-size", f"patch {patch} -> {n} tokens"))

    num_classes = cfg.data.get("num_classes", 0)
    if num_classes and num_classes > 0:
        out.append(("ok", "num-classes", f"{num_classes}"))
    else:
        out.append(("FAIL", "num-classes", f"invalid: {num_classes!r}"))
    return out


def check_model_forward(cfg, skip_forward: bool = False) -> List[Check]:
    """Build the configured DiT and run one forward on the configured
    latent shape; the velocity field must come back the same shape
    (test_config_validation.py:42-180)."""
    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.dit import create_dit

    out: List[Check] = []
    downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
    latent = cfg.data.image_size // downsample
    try:
        model = create_dit(cfg.model, latent, cfg.data.num_classes)
    except Exception as e:  # noqa: BLE001 - report, don't crash the doctor
        out.append(("FAIL", "model-build", f"{type(e).__name__}: {e}"))
        return out
    out.append(("ok", "model-build",
                f"{cfg.model.get('model_type')} input_size={latent} "
                f"in_channels={model.in_channels}"))
    if skip_forward:
        out.append(("warn", "model-forward", "skipped (--skip_forward)"))
        return out
    try:
        x = jnp.zeros((2, latent, latent, model.in_channels), jnp.float32)
        t = jnp.zeros((2,), jnp.float32)
        y = jnp.zeros((2,), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, x, t, y)["params"]
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        v = model.apply({"params": params}, x, t, y)
        if v.shape != x.shape:
            out.append(("FAIL", "model-forward",
                        f"output {v.shape} != input {x.shape}"))
        else:
            out.append(("ok", "model-forward",
                        f"{v.shape} velocity field, {n_params:,} params"))
    except Exception as e:  # noqa: BLE001
        out.append(("FAIL", "model-forward", f"{type(e).__name__}: {e}"))
    return out


def check_dataset(cfg) -> List[Check]:
    """Latent dataset loads, sample shape matches the model input, labels
    are in range (test_config_validation.py:182-239)."""
    out: List[Check] = []
    data_path = cfg.data.get("data_path")
    if not data_path or not os.path.exists(str(data_path)):
        out.append(("warn", "dataset",
                    f"data_path not found: {data_path!r} — run "
                    "pipelines.extract_features first"))
        return out
    try:
        from vavae_tpu.data.latent_dataset import ImgLatentDataset

        ds = ImgLatentDataset(
            str(data_path),
            latent_norm=cfg.data.get("latent_norm", False),
            latent_multiplier=cfg.data.get("latent_multiplier", 1.0),
        )
        if len(ds) == 0:
            out.append(("FAIL", "dataset", "dataset is empty"))
            return out
        feat, label = ds[0]
        downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
        latent = cfg.data.image_size // downsample
        # same default as create_dit (models/dit.py) so the dataset check
        # can never contradict a passing model-forward check
        in_chans = cfg.model.get("in_chans", 4)
        expected = (latent, latent, in_chans)  # NHWC here (ref checks CHW)
        if tuple(feat.shape) != expected:
            out.append(("FAIL", "dataset-shape",
                        f"sample {tuple(feat.shape)} != expected {expected}"))
        else:
            out.append(("ok", "dataset",
                        f"{len(ds)} samples of {expected}"))
        num_classes = cfg.data.num_classes
        lab = int(getattr(label, "item", lambda: label)())
        if not 0 <= lab < num_classes:
            out.append(("FAIL", "dataset-labels",
                        f"label {lab} outside [0, {num_classes})"))
        else:
            out.append(("ok", "dataset-labels", f"first label {lab}"))
    except Exception as e:  # noqa: BLE001
        out.append(("FAIL", "dataset", f"{type(e).__name__}: {e}"))
    return out


def check_weights(cfg) -> List[Check]:
    """Checkpoint/weight files named by the config exist and have sane
    headers (step4_inference.py:39-73; test_config_validation.py:17-40)."""
    out: List[Check] = []
    candidates = {
        "train.weight_init": cfg.get("train", {}).get("weight_init"),
        "train.ckpt": cfg.get("train", {}).get("ckpt"),
        "ckpt_path": cfg.get("ckpt_path"),
        "vae.ckpt_path": cfg.get("vae", {}).get("ckpt_path"),
        "$VAVAE_VAE_WEIGHTS": os.environ.get("VAVAE_VAE_WEIGHTS"),
    }
    seen = False
    for key, path in candidates.items():
        if not path:
            continue
        seen = True
        path = str(path)
        if not os.path.exists(path):
            out.append(("warn", f"weights[{key}]", f"not found: {path}"))
            continue
        size_mb = os.path.getsize(path) / 1e6
        detail = f"{path} ({size_mb:.1f} MB)"
        if path.endswith(".safetensors"):
            try:
                from safetensors import safe_open

                with safe_open(path, framework="numpy") as f:
                    n = len(list(f.keys()))
                detail += f", {n} tensors"
            except Exception as e:  # noqa: BLE001
                out.append(("FAIL", f"weights[{key}]",
                            f"unreadable safetensors {path}: {e}"))
                continue
        out.append(("ok", f"weights[{key}]", detail))
    if not seen:
        out.append(("warn", "weights",
                    "no checkpoint keys in config (fresh init)"))
    return out


def check_outputs(out_dir: str) -> List[Check]:
    """Generated-output verification (step4_inference.py:206-236): PNGs
    exist, decode, and are not trivially blank."""
    out: List[Check] = []
    if not os.path.isdir(out_dir):
        out.append(("FAIL", "outputs", f"not a directory: {out_dir}"))
        return out
    pngs = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(out_dir)
        for f in fs
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not pngs:
        out.append(("FAIL", "outputs", f"no images under {out_dir}"))
        return out
    import numpy as np
    from PIL import Image

    bad, blank = [], []
    for p in pngs:
        try:
            with Image.open(p) as im:
                arr = np.asarray(im.convert("RGB"))
            if arr.std() < 1e-3:
                blank.append(p)
        except Exception:  # noqa: BLE001
            bad.append(p)
    if bad:
        out.append(("FAIL", "outputs", f"{len(bad)} undecodable: {bad[:3]}"))
    elif blank:
        out.append(("warn", "outputs",
                    f"{len(pngs)} images but {len(blank)} look blank "
                    f"(std≈0): {blank[:3]}"))
    else:
        out.append(("ok", "outputs", f"{len(pngs)} images decode"))
    return out


def run_preflight(cfg, verify_outputs: str | None = None,
                  skip_forward: bool = False) -> List[Check]:
    checks = check_config_consistency(cfg)
    if not any(s == "FAIL" for s, _, _ in checks):
        checks += check_model_forward(cfg, skip_forward=skip_forward)
    checks += check_dataset(cfg)
    checks += check_weights(cfg)
    if verify_outputs:
        checks += check_outputs(verify_outputs)
    return checks


def main() -> None:
    import vavae_tpu.utils.jax_cache  # noqa: F401
    from vavae_tpu.utils.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--verify_outputs", default=None,
                    help="also verify generated images under this dir")
    ap.add_argument("--skip_forward", action="store_true",
                    help="skip the model forward smoke (no compile)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = load_config(args.config, overrides=args.overrides)
    checks = run_preflight(cfg, args.verify_outputs, args.skip_forward)
    width = max(len(n) for _, n, _ in checks)
    for status, name, detail in checks:
        print(f"[{status:>4}] {name:<{width}}  {detail}")
    fails = [n for s, n, _ in checks if s == "FAIL"]
    if fails:
        print(f"preflight FAILED: {', '.join(fails)}")
        sys.exit(1)
    print("preflight passed")


if __name__ == "__main__":
    main()
