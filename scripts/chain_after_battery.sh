#!/usr/bin/env bash
# Round-4 chain: wait for the battery's completion stamp, then run the full
# TPU-inclusive pytest suite at HEAD (VERDICT item 3 — the committed record
# must postdate every sampler change). Serializes chip use: never runs while
# the battery is still writing (CLAUDE.md: don't contend the chip/1-core host).
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
STAMP="$R/docs/bench/onchip/battery_complete"
cd "$R"
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}$R"

echo "waiting for $STAMP ..."
while [ ! -f "$STAMP" ]; do sleep 120; done
echo "battery stamp seen: $(cat "$STAMP" | tr '\n' ' ')"

# probe the tunnel before an 1.5h suite (battery may have ended on a dead one)
for i in $(seq 1 60); do
  if timeout 180 python -c "import vavae_tpu.utils.jax_cache, jax; jax.devices()" >/dev/null 2>&1; then
    break
  fi
  echo "tunnel down, probe $i; sleeping 120s"; sleep 120
done

SHA=$(git rev-parse --short HEAD)
LOG="$R/docs/bench/onchip/pytest_tpu.log"
{
  echo "HEAD=$SHA  start=$(date -u +%Y-%m-%dT%H:%M:%SZ)  (TPU-inclusive full suite)"
  timeout 10800 python -m pytest tests/ -p no:warnings 2>&1 | tail -n 40
  echo "end=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
} > "$LOG.tmp"
mv "$LOG.tmp" "$LOG"
echo "pytest done → $LOG"
grep -E "passed|failed" "$LOG" | tail -2
