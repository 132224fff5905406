#!/usr/bin/env bash
# CPU fallback for the reference-scale 25k SVGD UQ run (VERDICT r3 item 5).
#
# Round-4 discovery: one SVGD iteration costs ~0.3-0.5 s on the CPU host
# (bench.py svgd_iter_ms fallback), so the full 25k-iteration run fits in
# a few hours WITHOUT the TPU tunnel — the posterior is a quality claim,
# not a perf claim, so the platform doesn't matter scientifically.
#
# Coordination with scripts/tpu_recovery_chain.sh: both write the SAME
# resumable output dir (runs/cathode_uq_25k, snapshots every 2500 iters).
# A sidecar watcher kills this CPU run the moment the recovery chain
# starts (marker /tmp/tpu_recovery_started), before the chain's own UQ
# phase begins (the chain runs bench first, minutes of slack); the chain
# then continues from the latest snapshot on the TPU via --resume.
set -uo pipefail
cd "$(dirname "$0")/.."

ITERS="${1:-25000}"
OUT="runs/cathode_uq_25k"

# PYTHONPATH must NOT carry /root/.axon_site for CPU runs: its
# sitecustomize registers the axon PJRT plugin, whose discovery blocks
# on the (dead) tunnel regardless of JAX_PLATFORMS/CRNN_TPU_PLATFORM.
env -u PYTHONPATH JAX_PLATFORMS=cpu CRNN_TPU_PLATFORM=cpu python -m crnn_tpu.cases.cathode_uq \
  --iters "$ITERS" --particles 100 \
  --solver rosenbrock23 --chunk 10 --resume \
  --data-dir /root/reference/Cathode_NCM333_UQ/exp_data \
  --p-opt runs/cathode/real-4s8r-01/p_opt.npy \
  --decay-epochs 500 --checkpoint-every 1000 --maxiters 256 \
  --out "$OUT" &
# --maxiters 256: the loss solve is a FIXED-length scan (unroll="scan"),
# so the default 512-step budget pays 2.4x the ~217 adaptive steps the
# real-data curves need; 256 is documented maxiters-converged
# (cathode_uq.py --maxiters help) and halves the per-iteration cost.
UQ_PID=$!
echo "$UQ_PID" > /tmp/uq25k_cpu.pid

while kill -0 "$UQ_PID" 2>/dev/null; do
  if [ -f /tmp/tpu_recovery_started ]; then
    echo "TPU recovery chain started — yielding the UQ run to the TPU"
    kill "$UQ_PID" 2>/dev/null
    wait "$UQ_PID" 2>/dev/null
    exit 0
  fi
  sleep 30
done
wait "$UQ_PID"
rc=$?
[ $rc -eq 0 ] && env -u PYTHONPATH JAX_PLATFORMS=cpu CRNN_TPU_PLATFORM=cpu python scripts/uq_summary.py "$OUT/cathode_uq" || true
exit $rc
