#!/bin/bash
# Round-3 TPU measurement campaign: run every pending A/B sequentially,
# ONE device process at a time (the tunneled backend wedges under
# concurrent clients), each stage logged and failure-tolerant so a flaky
# tunnel loses one stage, not the campaign.
#
#   bash benchmarks/r3_campaign.sh [results_dir]
#
# Stages:
#   00 health probe (absorbs the post-wedge first-contact stall)
#   01 bench.py baseline (v4 kernel, current defaults)
#   02 bench.py ARMNET_ARM1H_LAYOUT=fmajor          (1h fields-major A/B)
#   03 bench.py ARMNET_SCATTER=v5                   (transposed-output A/B)
#   04 bench.py fmajor + v5 combined
#   05 tablegrad_prep_bench kernel_flat v4 vs v5
#   06 mh_breakdown (old-layout stages + fields-major pipeline stages)
#   07 recipes --only mh+gc_arm (fields-major restructure step-level win)
#   08 recipes a1.7 default vs ARMNET_ENTMAX_SOLVER=fastpow
#   09 full recipes table with winning defaults -> recipes_r4.json
#   10 full recipes table --bf16 -> recipes_r4_bf16.json
# After the campaign: read the log, pick winners, flip defaults, update
# BENCH_NOTES.md / README.md, re-run bench.py once for the final headline.

set -u
cd "$(dirname "$0")/.."
RES="$(readlink -f "${1:-benchmarks/results}")"
mkdir -p "$RES"
LOG="$RES/r3_campaign.log"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$to" env ${ENV_EXTRA[@]+"${ENV_EXTRA[@]}"} "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
  return 0
}

# Single host core: a TPU client stalls badly when a CPU-parity sweep is
# hogging it (BENCH_NOTES tunnel discipline). If a zoo_parity sweep is
# running, let it drain first (bounded 4 h) rather than contend.
for i in $(seq 1 240); do
  # anchored to the sweep's entrypoint / exp names: a bare "zoo_parity_cpu"
  # would also match a tail/jq of the RESULTS json and stall 4h for nothing
  pgrep -f "zoo_parity_cpu\.py|exp_name zoopar_" >/dev/null || break
  [ "$i" -eq 1 ] && echo "=== waiting for CPU parity sweep to drain $(date -u)" | tee -a "$LOG"
  sleep 60
done

ENV_EXTRA=()
stage 00_probe 600 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print('health', float(jnp.sum(jnp.ones((8,128)))))"
grep -q "health" "$LOG" || { echo "TPU unreachable — abort" | tee -a "$LOG"; exit 1; }

stage 01_base 1500 python bench.py
ENV_EXTRA=(ARMNET_ARM1H_LAYOUT=fmajor)
stage 02_fmajor 900 python bench.py
ENV_EXTRA=(ARMNET_SCATTER=v5)
stage 03_v5 900 python bench.py
ENV_EXTRA=(ARMNET_ARM1H_LAYOUT=fmajor ARMNET_SCATTER=v5)
stage 04_fmajor_v5 900 python bench.py

ENV_EXTRA=()
stage 05a_tg_v4 900 python -u benchmarks/tablegrad_prep_bench.py kernel_flat
ENV_EXTRA=(ARMNET_SCATTER=v5)
stage 05b_tg_v5 900 python -u benchmarks/tablegrad_prep_bench.py kernel_flat

# v5's transposed output removes the padded-write tax that set the r1/r2
# BUCKET=2048/CHUNK=256 optimum — with cheap writes, fewer/larger grid
# steps should win. Sweep the grid under v5 only.
for bc in 4096:256 8192:256 4096:512 8192:512 2048:512 4096:1024 8192:1024; do
  ENV_EXTRA=(ARMNET_SCATTER=v5 ARMNET_SCATTER_BUCKET=${bc%:*} ARMNET_SCATTER_CHUNK=${bc#*:})
  stage "05c_v5_sweep_${bc%:*}_${bc#*:}" 900 python -u benchmarks/tablegrad_prep_bench.py kernel_flat
done

# v6: G buckets per program, overlapped chunk-0 DMAs — attacks per-bucket
# DMA latency directly (FLOPs unchanged vs v5 at the same BUCKET/CHUNK)
for gv in 4 8 16; do
  ENV_EXTRA=(ARMNET_SCATTER=v6 ARMNET_SCATTER_G=$gv)
  stage "05d_v6_g${gv}" 900 python -u benchmarks/tablegrad_prep_bench.py kernel_flat
done
ENV_EXTRA=(ARMNET_SCATTER=v6)
stage 05e_v6_step 900 python bench.py

ENV_EXTRA=()
stage 06_mh_breakdown 1800 python -u benchmarks/mh_breakdown.py

# honest BEFORE for the fields-major restructure: the old [B,K,O,F] layout
# under the varying-ids protocol only exists at 59b4f4e (protocol fix
# landed, restructure not yet) — run its recipes from a detached worktree
if [ ! -d /tmp/r3_before ]; then
  git worktree add --detach /tmp/r3_before 59b4f4e >> "$LOG" 2>&1 || true
fi
if [ -d /tmp/r3_before ]; then
  ( cd /tmp/r3_before && stage 07pre_mh_old_layout 1200 python -u benchmarks/recipes.py --only armnet_mh_criteo_a2.0,gc_arm_criteo_a2.0 )
fi

stage 07_mh_recipes 1200 python -u benchmarks/recipes.py --only armnet_mh_criteo_a2.0,gc_arm_criteo_a2.0

stage 08a_a17_newton 900 python -u benchmarks/recipes.py --only armnet_1h_criteo_a1.7
ENV_EXTRA=(ARMNET_ENTMAX_SOLVER=fastpow)
stage 08b_a17_fastpow 900 python -u benchmarks/recipes.py --only armnet_1h_criteo_a1.7
# budget sweep (VERDICT r4 #7): the (12,4) default was budgeted
# analytically, not swept like r2's (8,6) Newton budget. Accuracy per
# budget is established on CPU (benchmarks/fastpow_accuracy.py); this
# sweeps the TPU throughput so the smallest-exact budget can be adopted.
for fp in 8:2 10:3 12:4 14:5; do
  ENV_EXTRA=(ARMNET_ENTMAX_SOLVER=fastpow ARMNET_ENTMAX_FAST=${fp%:*} ARMNET_ENTMAX_POLISH=${fp#*:})
  stage "08c_fastpow_${fp%:*}_${fp#*:}" 900 python -u benchmarks/recipes.py --only armnet_1h_criteo_a1.7
done

ENV_EXTRA=(ARMNET_PREFETCH_THREAD=0)
stage 11a_train_noprefetch 1200 python -u train.py --model armnet_1h --alpha 2.0 --h 128 --lr 0.001 --epoch 3 --exp_name camp_noprefetch
ENV_EXTRA=(ARMNET_PREFETCH_THREAD=1)
stage 11b_train_prefetch 1200 python -u train.py --model armnet_1h --alpha 2.0 --h 128 --lr 0.001 --epoch 3 --exp_name camp_prefetch

# bf16 AUC delta (VERDICT r4 #5): identical recipe to the r2 3-seed f32
# run (0.9474+-0.0004 valid / 0.9438+-0.0009 test) with --bf16
ENV_EXTRA=()
stage 12_bf16_3seed 3600 python -u train.py --model armnet_1h --alpha 2.0 \
  --h 128 --nemb 10 --lr 0.001 --batch_size 4096 --epoch 50 --patience 3 \
  --seed 2025 --repeat 3 --bf16 --exp_name frappe_r4_bf16_3seed

ENV_EXTRA=()
echo "=== campaign phase 1 done $(date -u) — inspect $LOG, flip defaults, then re-run 09/10" | tee -a "$LOG"

# Fallback 09/10: run the full recipes table with CURRENT defaults so the
# round always has a recipes_r3 artifact even if nobody is around to pick
# winners; a post-flip re-run overwrites these.
stage 09_recipes_full 3600 python -u benchmarks/recipes.py
stage 10_recipes_bf16 3600 python -u benchmarks/recipes.py --bf16
# the two FULL tables are the last two recipe_throughput_table lines in
# the log (stages 07/08 emit --only subset tables earlier)
python - "$LOG" "$RES" <<'PYEOF' || true
import json, sys
# route by the table's own flags: full (non-subset) tables only, split on
# bf16 — earlier --only subset tables (07/08/08c) must never be promoted
# to the full-table artifacts, and a failed stage 09 must not shift the
# bf16 table into the default-table slot
for line in open(sys.argv[1], errors="replace"):
    line = line.strip()
    if not (line.startswith("{") and "recipe_throughput_table" in line):
        continue
    obj = json.loads(line)
    if obj.get("subset", len(obj.get("rows", [])) < 4):
        continue
    name = "recipes_r4_bf16.json" if obj.get("bf16") else "recipes_r4.json"
    path = sys.argv[2] + "/" + name      # later (post-flip) runs overwrite
    json.dump(obj, open(path, "w"), indent=1)
    print("wrote", path, len(obj.get("rows", [])), "rows")
PYEOF
echo "=== campaign ALL done $(date -u)" | tee -a "$LOG"
