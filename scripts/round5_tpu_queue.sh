#!/bin/bash
# Round-5 TPU job queue: serialize the single chip.
#
# The robertson two-phase hunt (rob-hunt256) owns the TPU first; once its
# manifest entry clears, run the GRN attraction-measure hunt, then the
# yeast LM polish. Each job gets its own hard timeout so a slow stage
# cannot eat the round-end capture window (docs/ROUND_END_CHECKLIST.md).
set -uo pipefail
cd "$(dirname "$0")/.."

# The robertson chain frees the TPU when its f32 phase ends (phase 2 is
# pinned to the CPU host) — the slice artifact marks that moment, long
# before the manifest tag clears.
SIG=runs/robertson_long/seed_p_f64polish_top16_seed21.npy
echo "[queue] waiting for the robertson f32 phase to free the TPU ($SIG)..."
while [ ! -f "$SIG" ] && grep -q "rob-hunt256" runs/JOBS.manifest 2>/dev/null; do
  sleep 60
done
echo "[queue] TPU free at $(date -u +%H:%M:%S)Z"

echo "[queue] === GRN 256-restart hunt ==="
timeout --kill-after=60 9000 \
  python scripts/grn_restarts.py --restarts 256 \
    --stages 1e-3:5000,3e-4:3000,1e-4:2000 --base-seed 31 \
    --census-top 16 --out runs/grn_hunt
echo "[queue] grn hunt rc=$? at $(date -u +%H:%M:%S)Z"

echo "[queue] === yeast LM polish ==="
timeout --kill-after=60 5400 \
  python scripts/yeast_lm.py --iters 100
echo "[queue] yeast lm rc=$? at $(date -u +%H:%M:%S)Z"
echo "[queue] done"
