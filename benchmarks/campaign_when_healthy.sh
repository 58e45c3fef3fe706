#!/bin/bash
# Retry the TPU health probe until the tunnel recovers, then run the full
# measurement campaign. Wedged-tunnel failure mode (BENCH_NOTES.md): the
# axon PJRT init hangs waiting for a pool grant when a previous client
# died holding it; probes hang at jax.devices() (before first compute).
# Strategy: LONG probes (1800s) so a server-side lease expiry can hand the
# grant to the WAITING client, short sleeps between; one client at a time.
#
#   bash benchmarks/campaign_when_healthy.sh [results_dir]
set -u
cd "$(dirname "$0")/.."
RES="$(readlink -f "${1:-benchmarks/results}")"
mkdir -p "$RES"
WLOG="$RES/tunnel_watch.log"
echo "=== watcher(v2, long-probe) start $(date -u)" | tee -a "$WLOG"
PROBE_OUT="$RES/tunnel_probe_last.txt"
for attempt in $(seq 1 18); do
  echo "--- probe attempt $attempt $(date -u +%H:%M:%S)" | tee -a "$WLOG"
  timeout 1800 python -u -c "
import jax, jax.numpy as jnp
print('DEVICES:', jax.devices(), flush=True)
print('HEALTH_OK', float(jnp.sum(jnp.ones((8,128)))), flush=True)
" > "$PROBE_OUT" 2>&1
  rc=$?
  cat "$PROBE_OUT" >> "$WLOG"
  # health = THIS probe's output only (the append-mode log keeps old
  # HEALTH_OK lines across invocations)
  if grep -q HEALTH_OK "$PROBE_OUT"; then
    echo "--- tunnel healthy at $(date -u +%H:%M:%S), launching campaign" | tee -a "$WLOG"
    bash benchmarks/r3_campaign.sh "$RES"
    crc=$?
    echo "=== campaign wrapper done rc=$crc $(date -u)" | tee -a "$WLOG"
    exit $crc
  fi
  echo "--- probe rc=$rc (unhealthy), sleeping 60s" | tee -a "$WLOG"
  sleep 60
done
echo "=== watcher giving up after 18 attempts $(date -u)" | tee -a "$WLOG"
exit 1
