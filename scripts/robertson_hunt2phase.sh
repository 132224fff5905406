#!/bin/bash
# Two-phase TPU-scale Robertson basin hunt (round-5 VERDICT item 4).
#
# Phase 1: R=256 restarts vmapped in float32 on the TPU (~170 ms/epoch for
#          the whole population) — basin SELECTION tolerates the f32 loss
#          floor (~1.4e-2, runs/robertson_long/f32_experiment.md).
# Phase 2: top-K champions re-entered in float64 for the depth stages +
#          LM polish — basin DEPTH does not tolerate f32.
#
# Reference protocol being out-scaled: robertson/ReadMe.md:15-36 ships ONE
# published table; our previous hunts used 16 serial-era restarts. This is
# the vmapped 256-restart sweep the round-4 VERDICT demanded.
set -euo pipefail
cd "$(dirname "$0")/.."

R=${R:-256}
SEED=${SEED:-21}
TOPK=${TOPK:-16}
OUT=runs/robertson_long
TAG1=f32hunt_r${R}_seed${SEED}
TAG2=f64polish_top${TOPK}_seed${SEED}

echo "=== phase 1: ${R}-restart f32 hunt ==="
python scripts/robertson_restarts.py --restarts "$R" --dtype float32 \
  --stages 5e-3:4000,1e-3:4000,3e-4:2000 --base-seed "$SEED" \
  --lm-top 0 --tag "$TAG1"

echo "=== slice top-${TOPK} ==="
python - "$OUT" "$TAG1" "$TAG2" "$TOPK" <<'EOF'
import sys
import numpy as np
out, tag1, tag2, k = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
p = np.load(f"{out}/restart_p_{tag1}.npy")
v = np.load(f"{out}/restart_val_{tag1}.npy")
order = np.argsort(v)[:k]
np.save(f"{out}/seed_p_{tag2}.npy", p[order])
# basin histogram input: full population val spectrum
np.save(f"{out}/hunt_val_spectrum_{tag1}.npy", np.sort(v))
print("top vals:", np.sort(v)[:k])
EOF

echo "=== phase 2: top-${TOPK} f64 depth + LM (CPU host) ==="
# f64 runs on the host: the axon tunnel's emulated f64 degraded into an
# indefinite block mid-round-5 (runtime.f64_device_ok docstring) — depth
# polish must not gamble the chain on it. The f32 phase keeps the TPU.
CRNN_TPU_PLATFORM=cpu python scripts/robertson_restarts.py --dtype float64 \
  --init-from "$OUT/seed_p_${TAG2}.npy" \
  --stages 3e-4:2000,1e-4:2000 --base-seed "$SEED" \
  --lm-top 3 --lm-iters 150 --tag "$TAG2"
echo "=== hunt chain done ==="
