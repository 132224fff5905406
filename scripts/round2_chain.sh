#!/bin/bash
# Round-2 serialized TPU job chain (single-core host + one chip: jobs must
# not overlap). Waits for the in-flight cathode_uq long run, then runs the
# remaining artifact runs back to back. Logs to /tmp/chain_*.log.
set -u
cd /root/repo

if [ -f /tmp/uq_long.pid ]; then
  UQ_PID=$(cat /tmp/uq_long.pid)
  echo "waiting for cathode_uq (pid $UQ_PID)..."
  while kill -0 "$UQ_PID" 2>/dev/null; do sleep 60; done
  echo "cathode_uq done at $(date)"
fi

echo "=== robertson long (f32 staged + f64 LM) $(date) ==="
ROBERTSON_DTYPE=float32 ROBERTSON_STAGES="5e-3:30000,1e-3:20000,2e-4:15000" \
  timeout 10800 python scripts/run_robertson_long.py > /tmp/chain_robertson.log 2>&1
echo "robertson rc=$? $(date)"

echo "=== GRN long $(date) ==="
GRN_EPOCHS=200000 GRN_DECAY_STEPS=30000 GRN_OUT=runs/grn \
  timeout 7200 python scripts/run_grn.py > /tmp/chain_grn.log 2>&1
echo "grn rc=$? $(date)"
timeout 1200 python scripts/grn_recovery.py runs/grn/p_best.npy runs/grn \
  >> /tmp/chain_grn.log 2>&1
echo "grn recovery rc=$? $(date)"

echo "=== robertson f32 experiment $(date) ==="
timeout 3600 python scripts/robertson_f32_experiment.py > /tmp/chain_f32.log 2>&1
echo "f32 rc=$? $(date)"

echo "=== case1_rev staged $(date) ==="
timeout 7200 python scripts/run_case1_rev_long.py > /tmp/chain_c1r.log 2>&1
echo "case1_rev rc=$? $(date)"

echo "=== bench $(date) ==="
timeout 3600 python bench.py > /tmp/chain_bench.log 2>&1
echo "bench rc=$? $(date)"
echo "CHAIN COMPLETE $(date)"
