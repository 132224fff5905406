#!/usr/bin/env bash
# Round-3 serialized TPU queue (run AFTER the 25k UQ job frees the chip):
# case1_rev basin attacks, robertson sparse-table rerun, adjoint
# comparison, final bench warm-up. Each step logs to runs/ and failures
# don't block the rest.
set -u
cd "$(dirname "$0")/.."

echo "=== [1/5] case1_rev restart sweep (nr=4, 16 restarts) ==="
timeout 4200 python scripts/case1_rev_restarts.py \
  --nr 4 --restarts 16 --stages 1e-3:15000,3e-4:15000 \
  2>&1 | tee runs/c1r_restarts.log | tail -5

echo "=== [2/5] case1_rev reaction-merging pass ==="
timeout 2400 python scripts/case1_rev_merge.py runs/case1_rev/p_best.npy \
  --stages 3e-4:10000,1e-4:10000 \
  2>&1 | tee runs/c1r_merge.log | tail -5

echo "=== [3/5] robertson sparse-table prune + long fine-tune ==="
timeout 2400 python scripts/robertson_prune.py \
  runs/robertson_long/p_seed7_r3_final.npy 7 '' 20000 3e-4 \
  2>&1 | tee runs/rob_prune.log | tail -3

echo "=== [4/5] continuous-adjoint vs remat-scan comparison ==="
timeout 1800 python scripts/adjoint_compare.py \
  2>&1 | tee runs/adjoint_compare.log | tail -6

echo "=== [5/5] bench warm-up (caches compiles for the driver) ==="
timeout 3000 python bench.py 2>&1 | tail -2

echo "CHAIN DONE"
