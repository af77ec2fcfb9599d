"""One-command whole-workflow record (round-5 verdict item 2).

The reference's culture is whole-pipeline production runs: train
(LightningDiT/train.py:192-268) -> extract (extract_features.py:83-152) ->
sample+FID (inference.py:200-296) -> tokenizer eval
(evaluate_tokenizer.py:38-167). This repo's on-chip evidence was piecewise
(benches, gauges, the pytest suite); this script chains the REAL CLIs on
the chip at small-but-not-toy scale and emits ONE metrics JSON:

  0. procedural class-structured dataset (8 classes, 256x256)
  1. VA-VAE GAN training   pipelines.train_vavae   (f16d32, >=2k steps,
     GAN on, VF via the weight-free dinov2-tiny testbed)
     + export the generator as a VA_VAE-loadable params file — this ALSO
     upgrades the battery's 300-step gauge decoder (verdict weak #2)
  2. latent extraction     pipelines.extract_features  (trained VAE)
  3. DiT-S/2 training      pipelines.train_dit     (2k steps on those latents)
  4. production sampling   pipelines.sample        (euler-250 CFG, PNGs
     decoded through the trained VAE)
  5. tokenizer eval        pipelines.evaluate_tokenizer (--metrics_json)
  6. gauge FID             decoded samples vs real val images, 4x4-pooled
     seeded-projection Frechet (no released Inception weights in this
     zero-egress image — same gauge family as bench_sampler_quality)

Usage:
  python scripts/e2e_onchip.py                  # TPU, ~30-60 min
  python scripts/e2e_onchip.py --smoke          # CPU-chain tiny drive
  python scripts/e2e_onchip.py --workdir DIR --out docs/bench/onchip/e2e_workflow.json

Every stage is a subprocess of the real CLI, individually timed; stage
logs land in <workdir>/logs. The JSON records per-stage wall, metrics,
command lines, and the git sha (round-5 verdict item 7: records must be
bit-attributable to commits).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_dataset(root: str, n_classes: int, per_class_train: int,
                 per_class_val: int, size: int) -> None:
    """Procedural CLASS-STRUCTURED images: each class is a distinct
    arrangement of Gaussian blobs + a class-specific spatial frequency —
    learnable structure for both the VAE (smooth fields) and the
    class-conditional DiT (classes are visually distinct)."""
    import numpy as np
    from PIL import Image

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for split, per_class in (("train", per_class_train), ("val", per_class_val)):
        for c in range(n_classes):
            d = os.path.join(root, split, f"c{c}")
            os.makedirs(d, exist_ok=True)
            rng = np.random.default_rng(1000 * c + (0 if split == "train" else 1))
            # class identity: blob grid layout + stripe frequency/phase
            k = 2 + c % 4
            freq = 2 + c
            for i in range(per_class):
                img = 0.35 * np.sin(
                    2 * np.pi * freq * (xx * np.cos(c) + yy * np.sin(c))
                )[..., None] * np.ones(3, np.float32)
                for bx in range(k):
                    for by in range(k):
                        cx = (bx + 0.5) / k + rng.normal(0, 0.03)
                        cy = (by + 0.5) / k + rng.normal(0, 0.03)
                        s = 0.5 / k * (1 + 0.2 * rng.normal())
                        amp = rng.uniform(-1, 1, 3)
                        g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                                     / (2 * s * s)))
                        img += g[..., None] * amp
                arr = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))


def run_stage(name: str, cmd: list, logdir: str, doc: dict,
              timeout: int = 7200) -> str:
    """Run one CLI stage, tee output to a log, record wall time."""
    print(f"=== e2e stage: {name} ===\n$ {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    log = os.path.join(logdir, f"{name}.log")
    with open(log, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, timeout=timeout)
    wall = time.perf_counter() - t0
    tail = open(log).read()[-1500:]
    if p.returncode != 0:
        print(tail, flush=True)
        raise RuntimeError(f"stage {name} failed rc={p.returncode} ({log})")
    doc["stages"][name] = {"wall_s": round(wall, 1), "cmd": " ".join(cmd),
                           "metrics": {}}
    print(f"=== {name}: ok in {wall:.1f}s ===", flush=True)
    return tail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=None,
                    help="metrics JSON (default docs/bench/onchip/"
                         "e2e_workflow.json; --smoke defaults to workdir)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU drive (sizes shrink, VAVAE_PLATFORM=cpu)")
    ap.add_argument("--export_gauge", default=None,
                    help="also copy the trained VAE params here (the "
                         "battery's VAVAE_BENCH_VAE_CKPT gauge decoder)")
    args = ap.parse_args()

    smoke = args.smoke
    W = args.workdir or ("/tmp/vavae_e2e_smoke" if smoke else "/tmp/vavae_e2e")
    logdir = os.path.join(W, "logs")
    os.makedirs(logdir, exist_ok=True)
    out_json = args.out or (
        os.path.join(W, "e2e_workflow.json") if smoke
        else os.path.join(REPO, "docs/bench/onchip/e2e_workflow.json"))

    env = dict(os.environ)
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "/root/.axon_site")
                         + ":" + REPO)
    if smoke:
        env["VAVAE_PLATFORM"] = "cpu"
    os.environ.update(env)
    py = sys.executable

    # sizes
    if smoke:
        n_classes, per_train, per_val, img = 2, 8, 4, 32
        vae_epochs, dit_steps, fid_num, sample_steps = 1, 5, 4, 4
        vae_batch, dit_batch, sample_batch = 4, 4, 2
    else:
        # epoch structure sized for this VM's ~12 MB/s disk: the trainer
        # checkpoints PER EPOCH (~1.2 GB VAE train state ≈ 100 s/write), so
        # the same 2048 steps run as 4 long epochs over a 4096-image
        # dataset instead of 32 short ones (32 writes strangled the first
        # attempt before step 100)
        n_classes, per_train, per_val, img = 8, 512, 16, 256
        vae_epochs, dit_steps, fid_num, sample_steps = 4, 2000, 256, 250
        vae_batch, dit_batch, sample_batch = 8, 32, 32

    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, cwd=REPO).stdout.strip()
    dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                                capture_output=True, text=True,
                                cwd=REPO).stdout.strip())
    doc = {"sha": sha, "tree_dirty": dirty, "smoke": smoke, "workdir": W,
           "sizes": {"n_classes": n_classes, "train_per_class": per_train,
                     "val_per_class": per_val, "image_size": img,
                     "vae_epochs": vae_epochs, "dit_steps": dit_steps,
                     "sample_steps": sample_steps, "fid_num": fid_num},
           "stages": {}}
    t_all = time.perf_counter()

    def dump_partial():
        # a tunnel drop mid-run must not discard the completed stages'
        # metrics (the first e2e attempt died mid-run): always persist
        # whatever was collected (CLAUDE.md partial-JSON pattern)
        doc["total_wall_s"] = round(time.perf_counter() - t_all, 1)
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(doc, f, indent=2)

    try:
        _run_stages(args, doc, dump_partial, W, logdir, os.path.join(W, "data"),
                    smoke, img, n_classes, per_train, per_val, vae_epochs,
                    dit_steps, fid_num, sample_steps, vae_batch, dit_batch,
                    sample_batch, py)
    finally:
        dump_partial()
    print(json.dumps({"e2e": "ok", "total_wall_s": doc["total_wall_s"],
                      "gauge_fid": doc["stages"].get("gauge_fid", {}).get(
                          "metrics", {}).get("gauge_fid_vs_real"),
                      "out": out_json}), flush=True)
    return 0


def _run_stages(args, doc, dump_partial, W, logdir, data, smoke, img,
                n_classes, per_train, per_val, vae_epochs, dit_steps,
                fid_num, sample_steps, vae_batch, dit_batch, sample_batch,
                py):

    # -- 0. dataset -------------------------------------------------------
    t0 = time.perf_counter()
    data = os.path.join(W, "data")
    if not os.path.isdir(os.path.join(data, "train")):
        make_dataset(data, n_classes, per_train, per_val, img)
    doc["stages"]["dataset"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "metrics": {"train_images": n_classes * per_train,
                    "val_images": n_classes * per_val}}

    # -- 1. VA-VAE training ----------------------------------------------
    import yaml

    if smoke:
        vae_cfg = {"ckpt_path": None, "model": {
            "base_learning_rate": 1e-4, "params": {
                "monitor": "val/rec_loss", "embed_dim": 4,
                "lossconfig": {"params": {"disc_start": 2,
                                          "kl_weight": 1e-6,
                                          "disc_weight": 0.5}},
                "ddconfig": {"double_z": True, "z_channels": 4,
                             "resolution": img, "in_channels": 3,
                             "out_ch": 3, "ch": 32, "ch_mult": [1, 1],
                             "num_res_blocks": 1, "attn_resolutions": [],
                             "dropout": 0.0}}}}
        emb_dim = 4
    else:
        # the PRODUCTION f16d32 architecture; VF via the weight-free tiny
        # testbed (no DINOv2 ViT-L weights in this image), GAN on early
        vae_cfg = yaml.safe_load(open(os.path.join(
            REPO, "vavae_tpu/configs/vavae_f16d32.yaml")))
        vae_cfg["model"]["params"]["use_vf"] = "dinov2-tiny"
        vae_cfg["model"]["params"]["lossconfig"]["params"]["disc_start"] = 500
        emb_dim = vae_cfg["model"]["params"]["embed_dim"]
    vae_cfg_path = os.path.join(W, "vae.yaml")
    yaml.safe_dump(vae_cfg, open(vae_cfg_path, "w"))

    vae_out = os.path.join(W, "vae_out")
    run_stage("train_vavae", [
        py, "-m", "vavae_tpu.pipelines.train_vavae",
        "--base", vae_cfg_path,
        "--data_path", os.path.join(data, "train"),
        "--val_path", os.path.join(data, "val"),
        "--output_dir", vae_out, "--batch_size", str(vae_batch),
        "--stages", "single", "--allow_random_foundation",
        f"train.max_epochs={vae_epochs}",
    ], logdir, doc)
    # best-val metric from the monitor file
    import glob

    best = sorted(glob.glob(os.path.join(vae_out, "**", "best", "metric.json"),
                            recursive=True))
    if best:
        doc["stages"]["train_vavae"]["metrics"] = json.load(open(best[-1]))

    # convert the final train state -> VA_VAE-loadable generator params
    t0 = time.perf_counter()
    ckpts = sorted(glob.glob(os.path.join(vae_out, "**", "*.safetensors"),
                             recursive=True))
    assert ckpts, f"no VAE checkpoints under {vae_out}"
    vae_params_path = os.path.join(W, "vae_trained_params.safetensors")
    conv = subprocess.run([py, "-c", f"""
import sys
sys.path.insert(0, {REPO!r})
import vavae_tpu.utils.jax_cache
from vavae_tpu.tokenizer import VA_VAE
from vavae_tpu.train.checkpoint import restore_checkpoint, save_state_file
tok = VA_VAE({vae_cfg_path!r}, ckpt_path=None, img_size={img})
target = {{"gen_params": {{"vae": tok.params}}}}
restored = restore_checkpoint({ckpts[-1]!r}, target, lenient=True)
save_state_file({vae_params_path!r}, restored["gen_params"]["vae"])
print("converted", {ckpts[-1]!r})
"""], capture_output=True, text=True, cwd=REPO)
    assert conv.returncode == 0, conv.stderr[-2000:]
    doc["stages"]["export_vae_params"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "metrics": {"from_ckpt": ckpts[-1]}}
    if args.export_gauge:
        import shutil

        shutil.copy(vae_params_path, args.export_gauge)
        doc["stages"]["export_vae_params"]["metrics"]["gauge_copy"] = (
            args.export_gauge)

    # -- 2. latent extraction --------------------------------------------
    lat = os.path.join(W, "latents")
    run_stage("extract_features", [
        py, "-m", "vavae_tpu.pipelines.extract_features",
        "--config", vae_cfg_path, "--vae_ckpt", vae_params_path,
        "--data_path", os.path.join(data, "train"),
        "--output_path", lat, "--image_size", str(img),
        "--batch_size", str(max(vae_batch, 8)),
    ], logdir, doc)

    # -- 3. DiT training --------------------------------------------------
    dit_cfg = {
        "ckpt_path": None,
        "data": {"data_path": lat, "valid_path": None, "image_size": img,
                 "num_classes": n_classes, "latent_norm": True,
                 "latent_multiplier": 1.0},
        # latent geometry follows the VAE architecture: downsample =
        # 2^(len(ch_mult)-1)  (f16d32: 16; the tiny smoke VAE: 2)
        "vae": {"model_name": "vavae_f16d32",
                "downsample_ratio": 2 ** (len(
                    vae_cfg["model"]["params"]["ddconfig"]["ch_mult"]) - 1),
                "config": vae_cfg_path, "ckpt_path": vae_params_path},
        "model": {"model_type": "LightningDiT-S/2", "use_qknorm": False,
                  "use_swiglu": True, "use_rope": True, "use_rmsnorm": True,
                  "in_chans": emb_dim,
                  "use_checkpoint": False, "class_dropout_prob": 0.1},
        "train": {"max_steps": dit_steps, "global_batch_size": dit_batch,
                  "global_seed": 0, "output_dir": os.path.join(W, "dit_out"),
                  "exp_name": "e2e", "log_every": max(dit_steps // 10, 1),
                  "ckpt_every": dit_steps, "resume": False,
                  "ema_decay": 0.995},
        "optimizer": {"lr": 2e-4, "beta2": 0.95, "max_grad_norm": 1.0,
                      "weight_decay": 0.0},
        "transport": {"path_type": "Linear", "prediction": "velocity",
                      "loss_weight": None, "sample_eps": None,
                      "train_eps": None, "use_lognorm": True,
                      "use_cosine_loss": True, "partitial_train": None,
                      "partial_ratio": 1.0, "shift_lg": False},
        "sample": {"mode": "ODE", "sampling_method": "euler",
                   "atol": 1e-6, "rtol": 1e-3, "reverse": False,
                   "likelihood": False,
                   "num_sampling_steps": sample_steps,
                   "cfg_scale": 4.0, "per_proc_batch_size": sample_batch,
                   "cfg_interval_start": 0.11, "timestep_shift": 0.3,
                   "fid_num": fid_num},
    }
    dit_cfg_path = os.path.join(W, "dit.yaml")
    yaml.safe_dump(dit_cfg, open(dit_cfg_path, "w"))

    tail = run_stage("train_dit", [
        py, "-m", "vavae_tpu.pipelines.train_dit", "--config", dit_cfg_path,
    ], logdir, doc)
    import re as _re

    losses = _re.findall(r"Train Loss: ([0-9.]+)", tail)
    rates = _re.findall(r"Steps/Sec: ([0-9.]+)", tail)
    doc["stages"]["train_dit"]["metrics"] = {
        "final_train_loss": float(losses[-1]) if losses else None,
        "steps_per_sec": float(rates[-1]) if rates else None}

    # -- 4. production-config CFG sampling -------------------------------
    dit_ckpt = os.path.join(W, "dit_out", "e2e", "checkpoints",
                            f"{dit_steps:07d}.safetensors")
    assert os.path.exists(dit_ckpt), dit_ckpt
    sample_dir = os.path.join(W, "samples")
    run_stage("sample", [
        py, "-m", "vavae_tpu.pipelines.sample", "--config", dit_cfg_path,
        f"ckpt_path={dit_ckpt}", f"sample_folder={sample_dir}",
    ], logdir, doc)
    pngs = glob.glob(os.path.join(sample_dir, "*.png"))
    doc["stages"]["sample"]["metrics"] = {
        "images": len(pngs),
        "samples_per_sec_incl_compile": round(
            len(pngs) / doc["stages"]["sample"]["wall_s"], 3)}
    assert len(pngs) >= fid_num, (len(pngs), fid_num)

    # -- 5. tokenizer eval ------------------------------------------------
    tok_json = os.path.join(W, "tokenizer_eval.json")
    run_stage("evaluate_tokenizer", [
        py, "-m", "vavae_tpu.pipelines.evaluate_tokenizer",
        "--config", vae_cfg_path, "--vae_ckpt", vae_params_path,
        "--data_path", os.path.join(data, "val"),
        "--image_size", str(img), "--metrics_json", tok_json,
    ], logdir, doc)
    doc["stages"]["evaluate_tokenizer"]["metrics"] = json.load(open(tok_json))

    # -- 6. gauge FID: decoded samples vs real val images -----------------
    t0 = time.perf_counter()
    import numpy as np
    from PIL import Image

    from vavae_tpu.eval.fid import activation_statistics, frechet_distance

    def load_folder(folder, limit):
        files = sorted(glob.glob(os.path.join(folder, "**", "*.png"),
                                 recursive=True))[:limit]
        return np.stack([
            np.asarray(Image.open(f).convert("RGB").resize((img, img)),
                       dtype=np.float32) / 127.5 - 1.0
            for f in files])

    n_fid = min(fid_num, n_classes * per_val)
    real = load_folder(os.path.join(data, "val"), n_fid)
    fake = load_folder(sample_dir, n_fid)
    P = 4
    D = (img // P) * (img // P) * 3
    proj = (np.random.default_rng(43).normal(size=(D, 192)).astype(np.float32)
            / np.sqrt(D))

    def feats(x):
        B, H, Wd, C = x.shape
        pooled = x.reshape(B, H // P, P, Wd // P, P, C).mean((2, 4))
        return pooled.reshape(B, -1) @ proj

    mu_r, s_r = activation_statistics(feats(real))
    mu_f, s_f = activation_statistics(feats(fake))
    gauge_fid = float(frechet_distance(mu_r, s_r, mu_f, s_f))
    # sanity anchor: real-vs-real split distance (the gauge's own floor).
    # INTERLEAVED split, not sorted halves: the file list sorts by class
    # dir, so real[:h] vs real[h:] would compare disjoint CLASS SETS of a
    # dataset built to make classes distinct — an inflated floor that
    # measured between-class separation, not estimator noise (caught by
    # the round-5 self-review; the first committed record carried it)
    mu_a, s_a = activation_statistics(feats(real[0::2]))
    mu_b, s_b = activation_statistics(feats(real[1::2]))
    floor_fid = float(frechet_distance(mu_a, s_a, mu_b, s_b))
    doc["stages"]["gauge_fid"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "metrics": {"gauge_fid_vs_real": gauge_fid,
                    "real_split_floor": floor_fid, "n": int(n_fid),
                    "note": "4x4-pooled seeded-projection Frechet (no "
                            "released Inception weights in this image); "
                            "floor is an interleaved real/real split"}}
    dump_partial()


if __name__ == "__main__":
    sys.exit(main())
