#!/usr/bin/env bash
# Auto-run when the TPU tunnel recovers mid-round (launched by the
# /tmp/tpu_watch.sh probe loop on its first UP observation).
#
# The round-3 outage cost the round its entire perf record; round 4's
# tunnel was down from the start. This chain makes a mid-round recovery
# self-serving: (1) warm the compile cache + capture a bench record
# immediately (so even if the tunnel dies again we have a same-round TPU
# number), then (2) spend the remaining budget on the 25k-iteration SVGD
# UQ run (VERDICT r3 item 5), which checkpoints every 2500 iters and
# resumes via --resume.
#
# CUTOFF_EPOCH: absolute unix time after which no new work starts and
# running work is killed — keeps the TPU free for the driver's round-end
# capture (docs/ROUND_END_CHECKLIST.md step 5).
set -uo pipefail
cd "$(dirname "$0")/.."

CUTOFF_EPOCH="${1:?usage: tpu_recovery_chain.sh <cutoff-unix-epoch>}"
LOCK=/tmp/tpu_recovery.lock
exec 9>"$LOCK"
flock -n 9 || { echo "chain already running"; exit 0; }
echo "chain start $(date)" >> /tmp/tpu_recovery.log

left() { echo $(( CUTOFF_EPOCH - $(date +%s) )); }

# 1. bench warm-up + capture (cheap, highest evidentiary value)
if [ "$(left)" -gt 600 ]; then
  timeout "$(( $(left) < 2400 ? $(left) : 2400 ))" \
    python bench.py > /tmp/bench_tpu_recovery.log 2>&1
  echo "bench rc=$? $(date)" >> /tmp/tpu_recovery.log
fi

# 2. 25k UQ (resumable; snapshots every 2500 iters)
if [ "$(left)" -gt 900 ]; then
  timeout "$(left)" bash scripts/run_uq_25k.sh \
    > /tmp/uq25k_recovery.log 2>&1
  echo "uq rc=$? $(date)" >> /tmp/tpu_recovery.log
fi

echo "chain done $(date)" >> /tmp/tpu_recovery.log
