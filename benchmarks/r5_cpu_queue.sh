#!/bin/bash
# Round-5 CPU work queue (VERDICT r4 items #4, #5, #7) — run AFTER the TPU
# campaign drains (single host core: concurrent CPU work corrupts campaign
# timing). Stages are failure-tolerant and individually logged.
#
#   bash benchmarks/r5_cpu_queue.sh [results_dir]

set -u
cd "$(dirname "$0")/.."
RES="$(readlink -f "${1:-benchmarks/results/r5}")"
mkdir -p "$RES"
LOG="$RES/cpu_queue.log"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$to" env JAX_PLATFORMS=cpu "$@" >> "$LOG" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
  return 0
}

# 1. full test suite (includes the new trajectory-parity tests)
stage 01_pytest 3600 python -m pytest tests/ -x -q

# 2. multi-seed closure for the five open zoo-parity gaps (VERDICT #4):
#    afm -0.031, lr -0.022, afn -0.015, sa_glu -0.011, cin +0.013 were all
#    single-seed (2025); add seeds 1 and 42 on both sides
for s in 1 42; do
  stage "02_zoo_seed${s}" 14400 python -u benchmarks/zoo_parity_cpu.py \
    --epochs 20 --seed "$s" --models afm,lr,afn,sa_glu,cin --timeout 2400
done

# 4. uci_diabetes — the one reference recipe family never exercised
#    (VERDICT #5): DB_armnet geometry (/root/reference/run.sh:22, stale
#    --nlayer flag corrected to --mlp_nlayer), bundled tr/va/te, F=43
for s in 2025 1 42; do
  stage "04_diabetes_s${s}" 14400 python -u benchmarks/zoo_parity_cpu.py \
    --epochs 15 --seed "$s" --models armnet --dataset uci_diabetes \
    --timeout 7200 \
    --flags "--mlp_nlayer 1 --h 1 --nattn_head 32 --alpha 1.7 --lr 0.003 --batch_size 1024 --nfield 43 --nfeat 369"
done

# 5. scaling refresh at current HEAD (r1 artifact predates the r3/r4 loader
#    and sharded-VJP changes) — honest caveat re-attached by the wrapper
stage 05_scaling 7200 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -u benchmarks/scaling.py --max_devices 8 --batch_per_device 256 \
  --nfeat 200000

# 6. psum-vs-a2a relative step time on the virtual mesh (data:4,model:2,
#    row-sharded tables): the only exchange A/B possible without real chips
for ex in psum a2a; do
  stage "06_exchange_${ex}" 7200 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -u benchmarks/scaling.py --max_devices 8 --batch_per_device 256 \
    --nfeat 200000 --shard_embedding --embedding_exchange "$ex"
done

# 7 (LAST: can eat hours). the gat reference row never completed at the 900 s timeout; give the
#    torch side room (its CPU attention stack is the slow part)
stage 03_gat 14400 python -u benchmarks/zoo_parity_cpu.py \
  --epochs 20 --seed 2025 --models gat --timeout 7200

echo "=== cpu queue done $(date -u)" | tee -a "$LOG"
