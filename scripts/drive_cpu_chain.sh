#!/usr/bin/env bash
# End-to-end CPU smoke drive of every pipeline + app CLI on tiny synthetic
# data (~10 min). Exercises the REAL entry points, not test doubles — the
# fastest way to catch wiring regressions (.claude/skills/verify/SKILL.md).
#
# Usage: bash scripts/drive_cpu_chain.sh [workdir]
set -euo pipefail
export VAVAE_PLATFORM=cpu   # JAX_PLATFORMS is ignored in axon envs (CLAUDE.md)

W=${1:-$(mktemp -d /tmp/vavae_drive.XXXX)}
R=$(cd "$(dirname "$0")/.." && pwd)
cd "$R"
echo "workdir: $W"

# 0) tiny dataset: 2 classes x 10 PNGs
python - "$W" <<'EOF'
import sys, os
from PIL import Image
import numpy as np
w = sys.argv[1]
rng = np.random.default_rng(0)
for c in (0, 1):
    os.makedirs(f"{w}/data/c{c}", exist_ok=True)
    os.makedirs(f"{w}/data_users/ID_{c + 1}", exist_ok=True)  # 1-based user dirs
    for i in range(10):
        img = (rng.random((40, 40, 3)) * 255).astype("uint8")
        Image.fromarray(img).save(f"{w}/data/c{c}/{i}.png")
        Image.fromarray(img).save(f"{w}/data_users/ID_{c + 1}/{i}.png")
print("dataset ok")
EOF

# tiny configs
python - "$W" <<'EOF'
import sys, yaml
w = sys.argv[1]
vae = {"ckpt_path": None, "model": {"base_learning_rate": 1e-4, "params": {
    "monitor": "val/rec_loss", "embed_dim": 4,
    "lossconfig": {"params": {"disc_start": 2, "kl_weight": 1e-6, "disc_weight": 0.5}},
    "ddconfig": {"double_z": True, "z_channels": 4, "resolution": 32, "in_channels": 3,
                 "out_ch": 3, "ch": 32, "ch_mult": [1, 1], "num_res_blocks": 1,
                 "attn_resolutions": [], "dropout": 0.0}}}}
yaml.safe_dump(vae, open(f"{w}/tiny_vae.yaml", "w"))
# VF-alignment variant: tiny foundation testbed (dinov2-tiny, dim 64) so the
# projector + alignment path runs without a ViT-L forward or weights
import copy
vae_vf = copy.deepcopy(vae)
vae_vf["model"]["params"]["use_vf"] = "dinov2-tiny"
vae_vf["model"]["params"]["lossconfig"]["params"].update(
    {"vf_weight": 0.1, "adaptive_vf": True})
yaml.safe_dump(vae_vf, open(f"{w}/tiny_vae_vf.yaml", "w"))
dit = {"ckpt_path": None,
       "data": {"data_path": f"{w}/lat", "valid_path": None, "image_size": 32,
                "num_classes": 2, "latent_norm": True, "latent_multiplier": 1.0},
       "vae": {"model_name": "vavae_f16d32", "downsample_ratio": 16},
       "model": {"model_type": "LightningDiT-S/2", "use_qknorm": False,
                 "use_swiglu": True, "use_rope": True, "use_rmsnorm": True,
                 "wo_shift": False, "in_chans": 32, "use_checkpoint": False,
                 "class_dropout_prob": 0.05},
       "train": {"max_steps": 5, "global_batch_size": 4, "global_seed": 0,
                 "output_dir": f"{w}/out", "exp_name": "tiny", "log_every": 1,
                 "ckpt_every": 5, "resume": False, "ema_decay": 0.999},
       "optimizer": {"lr": 1e-4, "beta2": 0.99, "max_grad_norm": 1.0, "weight_decay": 0.01},
       "transport": {"path_type": "Linear", "prediction": "velocity", "loss_weight": None,
                     "sample_eps": None, "train_eps": None, "use_lognorm": True,
                     "use_cosine_loss": True, "partitial_train": None,
                     "partial_ratio": 1.0, "shift_lg": False},
       "sample": {"mode": "ODE", "sampling_method": "euler", "atol": 1e-6, "rtol": 1e-3,
                  "reverse": False, "likelihood": False, "num_sampling_steps": 4,
                  "cfg_scale": 4.0, "per_proc_batch_size": 2,
                  "cfg_interval_start": 0.11, "timestep_shift": 0.1}}
yaml.safe_dump(dit, open(f"{w}/tiny_dit.yaml", "w"))
print("configs ok")
EOF

run() { echo "=== $1 ==="; shift; "$@"; }

run "extract_features" python -m vavae_tpu.pipelines.extract_features \
  --data_path "$W/data" --output_path "$W/lat" --image_size 32 --batch_size 4
run "train_dit" python -m vavae_tpu.pipelines.train_dit --config "$W/tiny_dit.yaml"
run "sample --demo" python -m vavae_tpu.pipelines.sample --config "$W/tiny_dit.yaml" \
  --demo ckpt_path="$W/out/tiny/checkpoints/0000005.safetensors" demo_labels='[0,1]'

# Adams-Bashforth exact-solver path through the top-level dispatcher
run "sample --demo ab3 (python -m vavae_tpu)" python -m vavae_tpu sample \
  --config "$W/tiny_dit.yaml" --demo \
  ckpt_path="$W/out/tiny/checkpoints/0000005.safetensors" demo_labels='[0,1]' \
  sample.multistep_order=3 sample.num_sampling_steps=6
# round-3 split-CFG integrators (history-free RK2 / adaptive RK45)
run "sample --demo heun" python -m vavae_tpu.pipelines.sample \
  --config "$W/tiny_dit.yaml" --demo \
  ckpt_path="$W/out/tiny/checkpoints/0000005.safetensors" demo_labels='[0,1]' \
  sample.sampling_method=heun sample.num_sampling_steps=4
run "sample --demo dopri5 (split CFG)" python -m vavae_tpu.pipelines.sample \
  --config "$W/tiny_dit.yaml" --demo \
  ckpt_path="$W/out/tiny/checkpoints/0000005.safetensors" demo_labels='[0,1]' \
  sample.sampling_method=dopri5 sample.rtol=0.01
# round-5: the whole-workflow e2e driver (VAE train -> extract -> DiT train
# -> production sampling -> tokenizer eval -> gauge FID, one metrics JSON)
run "e2e_onchip --smoke" python scripts/e2e_onchip.py --smoke \
  --workdir "$W/e2e" --out "$W/e2e/e2e_workflow.json"
test -s "$W/e2e/e2e_workflow.json"

# round-5: the autotune CLI — measure the acceleration ladder on the tiny
# trained model and emit a recommended sample: block (+ overlay yaml)
run "autotune_sampler --smoke" python -m vavae_tpu.apps.autotune_sampler \
  --config "$W/tiny_dit.yaml" \
  --ckpt "$W/out/tiny/checkpoints/0000005.safetensors" \
  --smoke --budget 0.05 --out "$W/autotune.json" \
  --emit_yaml "$W/autotune_overlay.yaml"
test -s "$W/autotune.json" && test -s "$W/autotune_overlay.yaml"

# bench runbooks: --smoke keeps the acceleration-gauge scripts executable
# (the same bit-rot protection the golden-numbers runbook test gives)
run "bench_sampler_quality --smoke" \
  python scripts/bench_sampler_quality.py --smoke --out "$W/squality.json"
run "bench_multistep_matrix --smoke" python scripts/bench_multistep_matrix.py \
  --smoke --points 10:2:0 --out "$W/smatrix.json"
run "evaluate_tokenizer" python -m vavae_tpu.pipelines.evaluate_tokenizer \
  --data_path "$W/data" --image_size 32 --max_images 8
run "train_vavae (1 epoch)" python -m vavae_tpu.pipelines.train_vavae \
  --base "$W/tiny_vae.yaml" --data_path "$W/data" --val_path "$W/data" \
  --output_dir "$W/vae_out" --batch_size 4 --stages single train.max_epochs=1 \
  train.log_images_every=2
test -f "$W/vae_out/stage1/images/inputs_0000002.png"  # ImageLogger grids
run "train_vavae (resume to 2)" python -m vavae_tpu.pipelines.train_vavae \
  --base "$W/tiny_vae.yaml" --data_path "$W/data" --val_path "$W/data" \
  --output_dir "$W/vae_out" --batch_size 4 --stages single train.max_epochs=2

run "prepare_dataset_split" python -m vavae_tpu.apps.prepare_dataset_split \
  --data_root "$W/data" --output "$W/split.json"
run "train_classifier" python -m vavae_tpu.apps.train_classifier \
  --split_file "$W/split.json" --mode baseline --epochs 1 --batch_size 4 \
  --num_classes 2 --image_size 32 --out "$W/clf.safetensors"
run "classifier_eval" python -m vavae_tpu.apps.classifier_eval \
  --classifier_ckpt "$W/clf.safetensors" --split_file "$W/split.json" \
  --num_classes 2 --image_size 32
run "generate_and_filter" python -m vavae_tpu.apps.generate_and_filter \
  --config "$W/tiny_dit.yaml" --classifier_ckpt "$W/clf.safetensors" \
  --save_dir "$W/genfilter" --users 0 --target 2 --confidence 0.0 --batch_size 2 \
  ckpt_path="$W/out/tiny/checkpoints/0000005.safetensors"
run "analyze_metrics" python -m vavae_tpu.apps.analyze_metrics \
  --classifier_ckpt "$W/clf.safetensors" --split_file "$W/split.json" \
  --num_classes 2 --image_size 32 --generated_dir "$W/genfilter"
run "generation_evaluator" python -m vavae_tpu.apps.generation_evaluator \
  --classifier_ckpt "$W/clf.safetensors" --generated_dir "$W/genfilter" \
  --split_file "$W/split.json" --num_classes 2 --image_size 32
run "select_users" python -m vavae_tpu.apps.select_users \
  --classifier_ckpt "$W/clf.safetensors" --split_file "$W/split.json" \
  --num_classes 2 --image_size 32 --n 1
run "validate_export" python -m vavae_tpu.apps.validate_export \
  --split_file "$W/split.json" --num_users 2 --image_size 32 \
  --export_encoder "$W/encoder.msgpack" \
  --train_ckpt "$W/vae_out/stage1/0000005.safetensors"

# VF-PRESENT path: train with the tiny random foundation so the checkpoint
# carries gen_params/proj, then the alignment check actually computes
run "train_vavae (VF on, tiny foundation)" python -m vavae_tpu.pipelines.train_vavae \
  --base "$W/tiny_vae_vf.yaml" --data_path "$W/data" --val_path "$W/data" \
  --output_dir "$W/vae_vf_out" --batch_size 4 --stages single \
  --allow_random_foundation train.max_epochs=1
run "validate_export (VF alignment computed)" python -m vavae_tpu.apps.validate_export \
  --split_file "$W/split.json" --num_users 2 --image_size 32 \
  --train_ckpt "$W/vae_vf_out/stage1/0000005.safetensors" \
  --train_config "$W/tiny_vae_vf.yaml" \
  --vf_kind dinov2-tiny --allow_random_foundation
run "lora_finetune" python -m vavae_tpu.apps.lora_finetune \
  --config "$W/tiny_dit.yaml" --base_ckpt "$W/out/tiny/checkpoints/0000005.safetensors" \
  --rank 2 --alpha 4 --steps 3 --batch_size 4 --out_dir "$W/lora" --export_merged
run "iterative_finetune" python -m vavae_tpu.apps.iterative_finetune \
  --config "$W/tiny_dit.yaml" --classifier_ckpt "$W/clf.safetensors" \
  --iterations 1 --steps_per_iteration 2 --samples_per_user 2 --confidence 0.0 \
  --batch_size 4 --out_dir "$W/iter" \
  ckpt_path="$W/out/tiny/checkpoints/0000005.safetensors"
run "domain_adaptation" python -m vavae_tpu.apps.domain_adaptation \
  --classifier_ckpt "$W/clf.safetensors" --target_split_file "$W/split.json" \
  --split train --num_classes 2 --image_size 32 --support_per_class 4 \
  --support_selection balanced
# round-2 surfaces: the full reference method grid (sampled) + ensembles,
# and the domain-adaptive classifier with global-negative contrastive
run "domain_adaptation (reference grid + ensemble)" \
  python -m vavae_tpu.apps.domain_adaptation \
  --classifier_ckpt "$W/clf.safetensors" --target_split_file "$W/split.json" \
  --split train --num_classes 2 --image_size 32 --support_per_class 2 \
  --reference_grid --limit 3 --ensemble confidence_weighted
# pinned single-combo evaluation + NCC supplement sweep
run "domain_adaptation (--combo + --ncc)" \
  python -m vavae_tpu.apps.domain_adaptation \
  --classifier_ckpt "$W/clf.safetensors" --target_split_file "$W/split.json" \
  --split train --num_classes 2 --image_size 32 --support_per_class 2 \
  --combo '{"lccs_alpha": 0.3}' --ncc
run "train_classifier (domain_adaptive)" python -m vavae_tpu.apps.train_classifier \
  --split_file "$W/split.json" --mode domain_adaptive --epochs 1 --batch_size 4 \
  --num_classes 2 --image_size 32 --out "$W/clf_da.safetensors"
run "train_classifier (improved+global)" python -m vavae_tpu.apps.train_classifier \
  --split_file "$W/split.json" --mode improved --contrastive_type global \
  --epochs 1 --batch_size 4 --num_classes 2 --image_size 32 \
  --out "$W/clf_glob.safetensors"

run "preflight doctor" python -m vavae_tpu.apps.preflight \
  --config "$W/tiny_dit.yaml" --verify_outputs "$W/out"
run "mixed-domain classifier (real+generated dirs)" \
  python -m vavae_tpu.apps.train_classifier \
  --real_dir "$W/data_users" --generated_dir "$W/genfilter" --use_generated \
  --epochs 1 --batch_size 4 --num_classes 2 --image_size 32 \
  --out "$W/clf_mixed.safetensors"

run "export_torch (dit -> reference .pt)" python -m vavae_tpu.apps.export_torch \
  --kind dit --config "$W/tiny_dit.yaml" \
  --ckpt "$W/out/tiny/checkpoints/0000005.safetensors" --out "$W/dit_export.pt"
run "export_torch (vae -> reference .ckpt)" python -m vavae_tpu.apps.export_torch \
  --kind vae --ckpt "$(ls "$W"/vae_out/stage1/0*.safetensors | tail -1)" \
  --out "$W/vae_export.ckpt"

echo "ALL DRIVES PASSED ($W)"
