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
TUNNEL_OK=0
for i in $(seq 1 60); do
  if timeout 180 python -c "import vavae_tpu.utils.jax_cache, jax; jax.devices()" >/dev/null 2>&1; then
    TUNNEL_OK=1; break
  fi
  echo "tunnel down, probe $i; sleeping 120s"; sleep 120
done
if [ "$TUNNEL_OK" != 1 ]; then
  echo "tunnel never answered after 60 probes (~5h) — refusing to run the TPU suite against a dead backend" >&2
  exit 1
fi

SHA=$(git rev-parse --short HEAD)
LOG="$R/docs/bench/onchip/pytest_tpu.log"
{
  echo "HEAD=$SHA  start=$(date -u +%Y-%m-%dT%H:%M:%SZ)  (TPU-inclusive full suite)"
  timeout 10800 python -m pytest tests/ -p no:warnings 2>&1 | tail -n 40
  echo "end=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
} > "$LOG.tmp"
# only replace the committed record when the run actually produced a summary
# (a dead tunnel yields a hung/garbage tail — keep the old log in that case)
if grep -qE "[0-9]+ (passed|failed)" "$LOG.tmp"; then
  mv "$LOG.tmp" "$LOG"
else
  echo "pytest produced no pass/fail summary — keeping previous $LOG (tmp left at $LOG.tmp)" >&2
  exit 1
fi
echo "pytest done → $LOG"
grep -E "passed|failed" "$LOG" | tail -2
