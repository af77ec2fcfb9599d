"""Top-level CLI index: ``python -m vavae_tpu [command] [args...]``.

The reference scatters its entry points across ~40 root-level scripts and
shell launchers; here every surface is a module CLI. This dispatcher makes
them discoverable from one place — ``python -m vavae_tpu`` lists everything,
``python -m vavae_tpu sample --demo ...`` ≡ ``python -m
vavae_tpu.pipelines.sample --demo ...``. docs/MIGRATION.md maps each
reference script to its command here.
"""
from __future__ import annotations

import importlib
import sys

# command -> (module, one-line description)
COMMANDS = {
    # pipelines (the reference's run_*.sh / Lightning launchers)
    "extract_features": ("vavae_tpu.pipelines.extract_features",
                         "images -> latent safetensors shards + stats"),
    "train_dit": ("vavae_tpu.pipelines.train_dit",
                  "train/finetune LightningDiT on latent shards"),
    "sample": ("vavae_tpu.pipelines.sample",
               "CFG sampling / FID-50k PNGs / --demo grids"),
    "evaluate_tokenizer": ("vavae_tpu.pipelines.evaluate_tokenizer",
                           "tokenizer rFID/PSNR/LPIPS/SSIM"),
    "train_vavae": ("vavae_tpu.pipelines.train_vavae",
                    "VA-VAE GAN+VF training (staged recipes)"),
    # tools
    "fid": ("vavae_tpu.eval.fid", "FID between two paths; stats/npz packers"),
    # micro-Doppler application layer
    "prepare_dataset_split": ("vavae_tpu.apps.prepare_dataset_split",
                              "per-user 8:2 split JSON"),
    "convert_latents": ("vavae_tpu.apps.convert_latents",
                        "legacy .pt latent dumps -> official shards"),
    "train_classifier": ("vavae_tpu.apps.train_classifier",
                         "user classifier (baseline/improved/calibrated/domain_adaptive)"),
    "classifier_eval": ("vavae_tpu.apps.classifier_eval",
                        "classifier reliability verdict on real data"),
    "generate_and_filter": ("vavae_tpu.apps.generate_and_filter",
                            "rejection-sampling loop with quality gates"),
    "generation_evaluator": ("vavae_tpu.apps.generation_evaluator",
                             "identity/diversity/coverage composite"),
    "analyze_metrics": ("vavae_tpu.apps.analyze_metrics",
                        "filtering-metric distributions + thresholds"),
    "select_users": ("vavae_tpu.apps.select_users",
                     "pick users by classifier stats"),
    "iterative_finetune": ("vavae_tpu.apps.iterative_finetune",
                           "generate -> filter -> re-train loop"),
    "lora_finetune": ("vavae_tpu.apps.lora_finetune",
                      "LoRA adapters on a frozen DiT"),
    "quantize_dit": ("vavae_tpu.apps.quantize_dit",
                     "INT8 post-training quantization harness"),
    "autotune_sampler": ("vavae_tpu.apps.autotune_sampler",
                         "measure accelerations on YOUR model, recommend a "
                         "sample: block"),
    "validate_export": ("vavae_tpu.apps.validate_export",
                        "VAE recon/VF/discrimination report + encoder export"),
    "domain_adaptation": ("vavae_tpu.apps.domain_adaptation",
                          "LCCS/PNC/NCC adaptation + grid search"),
    "preflight": ("vavae_tpu.apps.preflight",
                  "config doctor: shapes, weights, datasets, outputs"),
    "export_torch": ("vavae_tpu.apps.export_torch",
                     "export checkpoints BACK to the reference's torch formats"),
}


def main() -> int:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help", "help"):
        width = max(map(len, COMMANDS))
        print("usage: python -m vavae_tpu <command> [args...]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:<{width}}  {desc}")
        print("\n`python -m vavae_tpu <command> --help` for per-command flags;"
              "\ndocs/MIGRATION.md maps each reference script to a command.")
        return 0 if argv else 1
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r} — run `python -m vavae_tpu` for the "
              f"list", file=sys.stderr)
        return 2
    module = importlib.import_module(COMMANDS[cmd][0])
    sys.argv = [f"python -m {COMMANDS[cmd][0]}"] + argv[1:]
    ret = module.main()
    return int(ret) if ret is not None else 0


if __name__ == "__main__":
    sys.exit(main())
