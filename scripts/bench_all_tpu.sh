#!/usr/bin/env bash
# On-chip measurement battery: run once per round on the real TPU to refresh
# every number BASELINE.md cites. Each point runs in a FRESH python process
# (CLAUDE.md rule: never time in a process that already built big jits).
#
# Usage: bash scripts/bench_all_tpu.sh [outdir]   (default docs/bench/onchip)
# Safe under tunnel flakiness: each step is independently timeout-bounded and
# failures don't stop the battery; rerun to fill gaps.
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
OUT=${1:-"$R/docs/bench/onchip"}
mkdir -p "$OUT"
cd "$R"
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}$R"
START_SHA=$(git -C "$R" rev-parse --short HEAD 2>/dev/null || echo unknown)
rm -f "$OUT/battery_complete"  # stale stamp would claim a finished battery

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  # a log without a result line is a FAILED step, not a record — committing
  # one round-2 log with only probe-failure lines misled the verdict.
  # (round-3 lesson: the regex must know EVERY step's output format — it
  # mis-filed a successful bench_fwd run; 'fwd=' and ' ms' now covered)
  if ! grep -qE '"metric"|"n_points"|rel_l2|latent_fid|img/s|ms/step|fwd=|[0-9] ms\b' "$OUT/$name.log"; then
    mv "$OUT/$name.log" "$OUT/$name.FAILED.log"
    echo "rc=$rc NO RESULT LINE — kept as $OUT/$name.FAILED.log"
    return 1
  fi
  echo "rc=$rc (log: $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | grep -v cpu_aot_loader || true
}

# 1. headline: euler-250 reference-identical default (bench.py embeds the
#    euler-250 baseline field itself); AB3-100 recorded as the quantified
#    exact-solver acceleration point
step headline_default 4800 python bench.py
step headline_ab3_100 2400 python bench.py 8 1 3 100

# 1b. resolve the trained-VAE gauge ckpt FIRST: the sampler-quality gauges
#     below read $VAVAE_BENCH_VAE_CKPT for their image-space (decoded)
#     columns, and the bf16 deviation gauge needs a TRAINED posterior.
#     NB: the ckpt goes to output/ (gitignored), NOT the docs tree — round
#     3's battery wrote a 279 MB safetensors into docs/bench/onchip and the
#     end-of-round `git add -A` committed it.
CKPT_DIR="$R/output"
mkdir -p "$CKPT_DIR"
if [ -z "${VAVAE_BENCH_VAE_CKPT:-}" ]; then
  if [ -f "$CKPT_DIR/vae_gauge_ckpt.safetensors" ]; then
    VAVAE_BENCH_VAE_CKPT="$CKPT_DIR/vae_gauge_ckpt.safetensors"
    echo "reusing existing gauge ckpt $VAVAE_BENCH_VAE_CKPT"
  else
    step train_vae_gauge 3600 python scripts/train_vae_gauge_ckpt.py 300 \
      "$CKPT_DIR/vae_gauge_ckpt.safetensors" \
      && VAVAE_BENCH_VAE_CKPT="$CKPT_DIR/vae_gauge_ckpt.safetensors"
  fi
fi
export VAVAE_BENCH_VAE_CKPT

# 2. multistep error sweep + throughput on-chip (updates the BASELINE table)
step multistep_sweep 5400 python scripts/bench_multistep.py --sweep auto

# 2b. testbed MATRIX points on-chip (accuracy-claim robustness: different
#     seeds/configs than round 2's single testbed) + the rankable quality
#     gauge (latent-FID + per-sample deviation, >=1k samples).
#     --force: re-run the 3 points to pick up the round-3 heun/dopri5/cost
#     columns (deterministic seeds reproduce the old errors bit-identically)
step multistep_matrix 10800 python scripts/bench_multistep_matrix.py \
  --points 1200:2:1,2400:6.7:0,600:10:2 --append --force \
  --out "$R/docs/bench/multistep_matrix_tpu.json"
step sampler_quality 7200 python scripts/bench_sampler_quality.py
# the STIFF regime (the matrix's hardest field): heun/dopri5 were added
# exactly for this point — does a history-free higher-order method beat
# euler-250 on cost where AB3 failed?
step sampler_quality_cfg67 10800 python scripts/bench_sampler_quality.py \
  --cfg_scale 6.7 --train_steps 2400

# 3. VAE inference: fp32 + bf16 throughput, bf16 posterior-deviation gauge.
#    The bf16 gauge needs a TRAINED posterior (random logvar is O(1) and
#    understates the ratio) — train the production f16d32 arch briefly on
#    procedural images unless a real checkpoint is supplied via
#    $VAVAE_BENCH_VAE_CKPT.
step vae_infer_fp32 1800 python scripts/bench_vae_infer.py 8
step vae_infer_bf16 1800 python scripts/bench_vae_infer.py 8 bf16 ${VAVAE_BENCH_VAE_CKPT:-}

# 3b. adaptive-cache wall-clock sanity on XL/1 (random field — the trained-
#     field eval counts/quality come from the gauges above)
step headline_vcacheA 2400 python bench.py 8 vcacheA

# 4. XL/1 train step: bf16 baseline, amortized-EMA A/B
step train_step_bf16 2400 python scripts/bench_train_step.py 16 --bf16
step train_step_bf16_ema4 2400 python scripts/bench_train_step.py 16 --bf16 --ema_every 4
step train_step_fp32_mu16 2400 python scripts/bench_train_step.py 16 --mu_bf16

# 4b. train-step ATTRIBUTION (round-4 verdict item 5): fwd / loss-fwd /
#     fwd+bwd / opt / EMA / full, one fresh process per part
step train_attrib 7200 python scripts/bench_train_attrib.py --all 16

# 5. forward-only MFU reference point
step fwd_b32 1800 python scripts/bench_fwd.py 32

# completion stamp: rounds 2 AND 3 both ended with the snapshot landing
# mid-battery and the logs unreconciled. The stamp records what ran; with
# VAVAE_BATTERY_AUTOCOMMIT=1 the battery commits its own output so the
# end-of-round snapshot contains the battery it cites by construction.
{
  echo "start_sha=$START_SHA"
  echo "end_sha=$(git -C "$R" rev-parse --short HEAD 2>/dev/null || echo unknown)"
  echo "end_time=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
} > "$OUT/battery_complete"
echo "battery done → $OUT"
if [ "${VAVAE_BATTERY_AUTOCOMMIT:-0}" = "1" ]; then
  git -C "$R" add docs/bench \
    && git -C "$R" commit -q -m "on-chip battery @ $START_SHA (autocommitted on completion)" \
    && echo "battery output committed"
fi
