#!/bin/bash
# r5 post-masked-BN parity regeneration queue: every "ours" number in
# zoo_parity_cpu.json predates the BN pad-pollution fix (d2c7d94); this
# re-runs the full table so the committed artifact reflects the shipped
# framework. Stages ordered cheapest-evidence-first; the log is the
# artifact, committed after each stage by the babysitter.
set -u
cd /root/repo
LOG=benchmarks/results/r5/requeue.log
run() {
  echo "=== [$1] $(date -u +%H:%M:%S) ${*:2}" >> "$LOG"
  timeout 21000 "${@:2}" >> "$LOG" 2>&1
  echo "=== [$1] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
# multi-seed rows for the previously-gapped models (afn runs separately first)
run 01_gapset_s1   python -u benchmarks/zoo_parity_cpu.py --epochs 20 --seed 1    --models afm,sa_glu,cin --timeout 7200
run 01_gapset_s42  python -u benchmarks/zoo_parity_cpu.py --epochs 20 --seed 42   --models afm,sa_glu,cin --timeout 7200
run 01_gapset_s2025 python -u benchmarks/zoo_parity_cpu.py --epochs 20 --seed 2025 --models afm,lr,sa_glu,cin --timeout 7200
# full zoo refresh at the canonical seed (BN-bearing models all shift)
run 02_zoo_s2025   python -u benchmarks/zoo_parity_cpu.py --epochs 20 --seed 2025 --models fm,dnn,wd,ipnn,kpnn,nfm,dfm,dcn,dcn+,xdfm,hofm,gcn --timeout 7200
# uci_diabetes armnet 3 seeds (batch 1024 padding geometry)
for s in 2025 1 42; do
  run 03_diab_s$s python -u benchmarks/zoo_parity_cpu.py --epochs 15 --seed $s --models armnet --dataset uci_diabetes --timeout 7200 --flags "--mlp_nlayer 1 --h 1 --nattn_head 32 --alpha 1.7 --lr 0.003 --batch_size 1024 --nfield 43 --nfeat 369"
done
echo "=== requeue done $(date -u)" >> "$LOG"
