#!/bin/bash
# v3 watcher/supervisor: outlives bounded watcher attempts. Optionally
# waits for an existing watcher (pid in $2) to finish, then probes the
# TPU tunnel indefinitely — ONE long-lived client at a time (a server-side
# lease expiry hands the pool grant to the WAITING client; see
# BENCH_NOTES.md tunnel discipline) — and launches the measurement
# campaign on recovery. If the campaign aborts at its own health gate
# (tunnel re-wedged between probe and stage 00), resumes probing instead
# of giving up.
#
#   bash benchmarks/campaign_watch_forever.sh [results_dir] [old_watcher_pid]
set -u
cd "$(dirname "$0")/.."
RES="$(readlink -f "${1:-benchmarks/results}")"
mkdir -p "$RES"
WLOG="$RES/tunnel_watch.log"
PROBE_OUT="$RES/tunnel_probe_last.txt"
OLDPID="${2:-}"

if [ -n "$OLDPID" ]; then
  while kill -0 "$OLDPID" 2>/dev/null; do sleep 60; done
fi
if grep -q "campaign wrapper done rc=0\|v3 campaign done rc=0" "$WLOG" 2>/dev/null; then
  echo "=== v3: campaign already completed, nothing to do" | tee -a "$WLOG"
  exit 0
fi

echo "=== watcher(v3, forever) start $(date -u)" | tee -a "$WLOG"
n=0
while true; do
  n=$((n + 1))
  echo "--- v3 probe $n $(date -u +%H:%M:%S)" | tee -a "$WLOG"
  timeout 1800 python -u -c "
import jax, jax.numpy as jnp
print('DEVICES:', jax.devices(), flush=True)
print('HEALTH_OK', float(jnp.sum(jnp.ones((8,128)))), flush=True)
" > "$PROBE_OUT" 2>&1
  rc=$?
  if grep -q HEALTH_OK "$PROBE_OUT"; then
    echo "--- v3: tunnel healthy at $(date -u +%H:%M:%S), launching campaign" | tee -a "$WLOG"
    bash benchmarks/r3_campaign.sh "$RES"
    crc=$?
    echo "=== v3 campaign done rc=$crc $(date -u)" | tee -a "$WLOG"
    [ "$crc" -eq 0 ] && exit 0
    # non-zero: campaign's stage-00 gate failed (re-wedge) — keep probing
  else
    tail -1 "$PROBE_OUT" >> "$WLOG"
    echo "--- v3 probe rc=$rc (unhealthy), sleeping 120s" | tee -a "$WLOG"
  fi
  sleep 120
done
