"""Golden-number orchestrator (docs/GOLDEN_NUMBERS.md).

Chains the three runs that reproduce the reference's headline numbers —
tokenizer rFID/PSNR/LPIPS/SSIM, latent extraction, FID-50k sampling —
once the released artifacts exist locally (this image has no egress).

Artifacts via env:
  VAVAE_GN_VAE_CKPT       vavae-imagenet256-f16d32-dinov2.pt
  VAVAE_GN_DIT_CKPT       lightningdit-xl-imagenet256-{64,800}ep.pt
  VAVAE_GN_IMAGENET_VAL   ImageNet val dir (synset folders)
  VAVAE_GN_IMAGENET_TRAIN ImageNet train dir (optional; extraction)
  VAVAE_GN_FID_NPZ        VIRTUAL_imagenet256_labeled.npz
  VAVAE_FID_WEIGHTS       pt_inception-2015-12-05 weights
  VAVAE_LPIPS_WEIGHTS     taming vgg.pth (lin heads; full dumps also work)
  VAVAE_VGG16_WEIGHTS     torchvision vgg16 state dict (needed with the
                          genuine vgg.pth, which has no conv backbone)

`--check` validates the layout and converter loadability without chip
time; `--config` picks the reproduction config (default 800ep cfg).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED = {
    "VAVAE_GN_VAE_CKPT": "VA-VAE f16d32 checkpoint (.pt/.ckpt)",
    "VAVAE_GN_DIT_CKPT": "LightningDiT-XL checkpoint (.pt)",
    "VAVAE_GN_IMAGENET_VAL": "ImageNet val dir",
    "VAVAE_GN_FID_NPZ": "ADM reference npz",
    "VAVAE_FID_WEIGHTS": "pytorch-fid Inception weights",
    "VAVAE_LPIPS_WEIGHTS": "taming vgg.pth",
}


def check() -> bool:
    ok = True
    for var, what in REQUIRED.items():
        path = os.environ.get(var)
        if not path or not os.path.exists(path):
            print(f"MISSING {var} ({what}): {path!r}")
            ok = False
        else:
            print(f"ok      {var} -> {path}")
    if not ok:
        return False
    # converter loadability (host-side, no chip): the parity-tested
    # converters must accept the real checkpoints' key layout
    import torch

    from vavae_tpu.eval.inception import inception_params_from_torch
    from vavae_tpu.models.lpips import lpips_params_from_torch

    sd = torch.load(os.environ["VAVAE_FID_WEIGHTS"], map_location="cpu",
                    weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    inception_params_from_torch({k: v.numpy() for k, v in sd.items()})
    print("ok      FID Inception checkpoint converts")
    sd = torch.load(os.environ["VAVAE_LPIPS_WEIGHTS"], map_location="cpu",
                    weights_only=False)
    vgg_sd = None
    vgg16_path = os.environ.get("VAVAE_VGG16_WEIGHTS")
    if vgg16_path and os.path.exists(vgg16_path):
        vgg_sd = torch.load(vgg16_path, map_location="cpu", weights_only=False)
        if hasattr(vgg_sd, "state_dict"):
            vgg_sd = vgg_sd.state_dict()
        vgg_sd = {k: v.numpy() for k, v in vgg_sd.items()}
    # the genuine vgg.pth has only the lin heads; the torchvision vgg16
    # state dict (VAVAE_VGG16_WEIGHTS, optional for full-module dumps)
    # supplies the conv backbone
    lpips_params_from_torch({k: v.numpy() for k, v in sd.items()}, vgg_sd)
    print("ok      LPIPS checkpoint converts")
    # acceleration-gauge artifact set (round-4): the day real weights land,
    # one --check run validates everything needed to reproduce BOTH the
    # reference table AND the sampler-acceleration gauge on them
    gauge_ckpt = os.environ.get("VAVAE_BENCH_VAE_CKPT")
    if gauge_ckpt:
        if not os.path.exists(gauge_ckpt):
            print(f"MISSING VAVAE_BENCH_VAE_CKPT (image-space gauge decoder): "
                  f"{gauge_ckpt!r}")
            return False
        print(f"ok      VAVAE_BENCH_VAE_CKPT -> {gauge_ckpt}")
    else:
        print("note    VAVAE_BENCH_VAE_CKPT unset — the sampler gauge will "
              "skip its image-space (decoded) columns; the REAL VA-VAE ckpt "
              "(VAVAE_GN_VAE_CKPT) works there too")
    import glob
    import json as _json

    gauge_jsons = sorted(
        glob.glob(os.path.join(REPO, "docs/bench/sampler_quality_*.json"))
        + glob.glob(os.path.join(REPO, "docs/bench/multistep_matrix*.json")))
    for p in gauge_jsons:
        try:
            doc = _json.load(open(p))
        except Exception as e:  # a corrupt committed gauge is a CI failure
            print(f"BAD     gauge json {p}: {e}")
            return False
        n = len(doc.get("methods", doc.get("points", [])))
        print(f"ok      gauge json {os.path.relpath(p, REPO)} ({n} entries)")
    # round-5: the committed whole-workflow record must stay well-formed —
    # every stage present with finite wall time, the sha stamped
    e2e_path = os.path.join(REPO, "docs/bench/onchip/e2e_workflow.json")
    if os.path.exists(e2e_path):
        try:
            doc = _json.load(open(e2e_path))
            stages = doc["stages"]
            for st in ("dataset", "train_vavae", "extract_features",
                       "train_dit", "sample", "evaluate_tokenizer",
                       "gauge_fid"):
                assert st in stages, f"stage {st} missing"
                import math as _math

                w = stages[st]["wall_s"]
                assert _math.isfinite(w) and w >= 0
            assert doc.get("sha"), "e2e record is not sha-stamped"
        except Exception as e:
            print(f"BAD     e2e workflow record {e2e_path}: {e}")
            return False
        print(f"ok      e2e workflow record ({len(doc['stages'])} stages, "
              f"sha {doc['sha'][:9]}, {doc.get('total_wall_s')} s)")
    else:
        print("note    docs/bench/onchip/e2e_workflow.json absent — run "
              "scripts/e2e_onchip.py on the chip to create the "
              "whole-workflow record")
    print("all artifacts present — run without --check to execute")
    return True


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument(
        "--config",
        default="vavae_tpu/configs/reproductions/lightningdit_xl_vavae_f16d32_800ep_cfg.yaml",
    )
    ap.add_argument("--latents", default="output/golden/latents")
    ap.add_argument("--workdir", default="output/golden",
                    help="tokenizer-eval PNG dump + metrics json land here; "
                    "the PNG dump is REQUIRED for rFID (evaluate_tokenizer "
                    "only computes rFID between dumped ref/dec folders)")
    ap.add_argument("--skip_tokenizer", action="store_true")
    ap.add_argument("--skip_extraction", action="store_true")
    ap.add_argument("--skip_sampling", action="store_true",
                    help="stop after tokenizer/extraction (rFID rehearsals)")
    ap.add_argument("--skip_gauge", action="store_true",
                    help="skip the sampler-acceleration gauge on the real "
                         "model (bench_sampler_quality --config)")
    # rehearsal knobs: the CI runbook test drives the real legs at tiny
    # scale (tests/test_golden_numbers.py) so the runbook can't bit-rot
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--tokenizer_config", default=None,
                    help="tokenizer yaml (ddconfig honored); default = the "
                    "f16d32 production architecture")
    args = ap.parse_args()

    if not check():
        sys.exit(1)
    if args.check:
        return

    env = os.environ
    py = sys.executable
    if not args.skip_tokenizer:
        cmd = [py, "-m", "vavae_tpu.pipelines.evaluate_tokenizer",
               "--vae_ckpt", env["VAVAE_GN_VAE_CKPT"],
               "--data_path", env["VAVAE_GN_IMAGENET_VAL"],
               "--image_size", str(args.image_size),
               "--output_path", os.path.join(args.workdir, "tokenizer"),
               "--metrics_json", os.path.join(args.workdir, "tokenizer_metrics.json")]
        if args.tokenizer_config:
            cmd += ["--config", args.tokenizer_config]
        if args.max_images:
            cmd += ["--max_images", str(args.max_images)]
        run(cmd)
    if not args.skip_extraction and env.get("VAVAE_GN_IMAGENET_TRAIN"):
        cmd = [py, "-m", "vavae_tpu.pipelines.extract_features",
               "--data_path", env["VAVAE_GN_IMAGENET_TRAIN"],
               "--output_path", args.latents,
               "--vae_ckpt", env["VAVAE_GN_VAE_CKPT"],
               "--image_size", str(args.image_size)]
        if args.tokenizer_config:
            cmd += ["--config", args.tokenizer_config]
        run(cmd)
    if args.skip_sampling:
        return
    # fail fast: the 800ep config has latent_norm: true, and do_sample
    # silently skips the un-normalization stats when the latents dir is
    # missing — that would burn hours of chip time on wrongly-scaled
    # samples and report a garbage FID
    if not os.path.isdir(args.latents):
        sys.exit(
            f"latents dir not found: {args.latents} — the sampling config "
            "needs its latent stats for de-normalization. Run the "
            "extraction step first (set VAVAE_GN_IMAGENET_TRAIN and drop "
            "--skip_extraction), or pass --latents at an existing dump."
        )
    run([py, "-m", "vavae_tpu.pipelines.sample",
         "--config", args.config,
         f"ckpt_path={env['VAVAE_GN_DIT_CKPT']}",
         f"vae.ckpt_path={env['VAVAE_GN_VAE_CKPT']}",
         f"data.data_path={args.latents}",
         f"data.fid_reference_file={env['VAVAE_GN_FID_NPZ']}"])
    if not args.skip_gauge:
        # acceleration gauge on the REAL model (round-4): every method
        # (euler-N/AB3/vcache/adaptive-vcache/heun/dopri5) ranked against
        # the real checkpoint's exact euler-250 output, image-space columns
        # decoded through the REAL VA-VAE — one command, both tables
        genv = dict(env)
        genv.setdefault("VAVAE_BENCH_VAE_CKPT", env["VAVAE_GN_VAE_CKPT"])
        cmd = [py, os.path.join(REPO, "scripts", "bench_sampler_quality.py"),
               "--config", args.config, "--ckpt", env["VAVAE_GN_DIT_CKPT"],
               "--out", os.path.join(args.workdir, "sampler_gauge.json")]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=REPO, env=genv)


if __name__ == "__main__":
    main()
