#!/usr/bin/env bash
# Reference-scale SVGD UQ run (VERDICT round-2 item 8): 100 particles x
# 25000 iterations on the REAL UNCERT replicate curves, reference
# annealing cadence 0.95/500 (UQ config.yaml:27-33), warm-started from the
# measured-data deterministic optimum. Writes runs/cathode_uq_25k/.
set -euo pipefail
cd "$(dirname "$0")/.."

ITERS="${1:-25000}"
OUT="runs/cathode_uq_25k"

# Solver: rosenbrock23, not the default trbdf2 — the reference-scale run
# is 25k iterations and TRBDF2 costs ~1.6 s/iter on the tunneled TPU
# (11h, unrunnable in-round) vs ~0.4 s/iter for Rosenbrock23 at matched
# likelihood; the TRBDF2-vs-Rosenbrock23 posterior consistency check is
# recorded in runs/cathode_uq/posterior_summary.md (round 2).
# --chunk 10: fuse 10 iterations per dispatch — the tunneled TPU pays
# ~1 s dispatch latency per host round-trip, which dominated the unfused
# loop at this scale. NOT --chunk 100: the tunneled worker reproducibly
# crashes on single device programs of ~40 s device time (3/3 attempts,
# round 3); ~10 s programs run fine. --resume: restart from the periodic
# snapshot after any crash/kill (snapshots every 2500 iters).
python -m crnn_tpu.cases.cathode_uq \
  --iters "$ITERS" --particles 100 \
  --solver rosenbrock23 --chunk 10 --resume \
  --data-dir /root/reference/Cathode_NCM333_UQ/exp_data \
  --p-opt runs/cathode/real-4s8r-01/p_opt.npy \
  --decay-epochs 500 --maxiters 256 \
  --out "$OUT"
# --maxiters 256: the loss solve is a fixed-length scan, so the default
# 512-step budget pays 2.4x the ~217 adaptive steps the real curves
# need; 256 is documented maxiters-converged (halved cost, CPU-measured
# 0.64 -> 1.6 it/s; same effect on device time over the tunnel).

python scripts/uq_summary.py "$OUT/cathode_uq" || true
