#!/usr/bin/env bash
# TPU tunnel watcher: probe every 2 min with a killable subprocess; when the
# backend answers, chain the full on-chip battery then the TPU-inclusive
# pytest. Survives the tunnel's multi-hour dead periods (CLAUDE.md pattern).
#
# The probe asserts the resolved backend is NOT cpu: launched from a fresh
# shell without /root/.axon_site on PYTHONPATH, jax silently resolves to CPU
# and the "battery" would overwrite docs/bench/onchip with CPU-proxy numbers
# (round-2 advisor finding). The axon site dir is appended explicitly so the
# reboot-survival case works from any shell.
#
# Usage: nohup bash scripts/tpu_watch.sh >/tmp/tpuwatch.log 2>&1 &
#        echo $! > /tmp/tpuwatch.pid
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
cd "$R"
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site:$R"

probe() {
  timeout 90 python -c "
import vavae_tpu.utils.jax_cache  # platform resolution before any jax import
import jax, numpy as np, jax.numpy as jnp
assert jax.default_backend() != 'cpu', (
    'backend resolved to CPU — axon plugin missing from PYTHONPATH; '
    'refusing to report ALIVE (the battery would record CPU-proxy numbers)')
x = jnp.ones((64, 64))
assert float(np.asarray(x @ x)[0, 0]) == 64.0
print('ALIVE', jax.devices())
" >/tmp/tpu_probe_last.log 2>&1
}

echo "[watch] start $(date -Is)"
while true; do
  if probe; then
    echo "[watch] TPU ALIVE $(date -Is) — launching battery"
    bash scripts/bench_all_tpu.sh >/tmp/bench_battery.log 2>&1
    echo "[watch] battery rc=$? $(date -Is) — launching TPU pytest (no -x: full enumeration)"
    timeout 7200 python -m pytest tests/ -p no:warnings >/tmp/pytest_tpu.log 2>&1
    echo "[watch] pytest rc=$? $(date -Is) — done"
    break
  fi
  echo "[watch] dead $(date -Is)"
  sleep 120
done
