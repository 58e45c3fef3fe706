#!/bin/bash
# Retry the TPU health probe until the tunnel recovers, then run the full
# measurement campaign. Designed for the wedged-tunnel failure mode
# documented in BENCH_NOTES.md: killed clients stall the FIRST device op
# of subsequent processes for minutes-to-indefinitely, so we probe with a
# long timeout, ONE client at a time, and sleep between attempts to let
# the tunnel drain.
#
#   bash benchmarks/campaign_when_healthy.sh [results_dir]
set -u
cd "$(dirname "$0")/.."
RES="$(readlink -f "${1:-benchmarks/results}")"
mkdir -p "$RES"
WLOG="$RES/tunnel_watch.log"
echo "=== watcher start $(date -u)" | tee -a "$WLOG"
for attempt in $(seq 1 40); do
  echo "--- probe attempt $attempt $(date -u +%H:%M:%S)" | tee -a "$WLOG"
  timeout 580 python -u -c "
import jax, jax.numpy as jnp
print('DEVICES:', jax.devices(), flush=True)
print('HEALTH_OK', float(jnp.sum(jnp.ones((8,128)))), flush=True)
" >> "$WLOG" 2>&1
  rc=$?
  if grep -q HEALTH_OK "$WLOG"; then
    echo "--- tunnel healthy at $(date -u +%H:%M:%S), launching campaign" | tee -a "$WLOG"
    bash benchmarks/r3_campaign.sh "$RES"
    echo "=== campaign wrapper done $(date -u)" | tee -a "$WLOG"
    exit 0
  fi
  echo "--- probe rc=$rc (unhealthy), sleeping 300s" | tee -a "$WLOG"
  sleep 300
done
echo "=== watcher giving up after 40 attempts $(date -u)" | tee -a "$WLOG"
exit 1
