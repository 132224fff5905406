#!/usr/bin/env bash
# One-command reproduction of the round artifacts:
#   scripts/ci.sh               -> test suite + multichip dryrun + bench
#   scripts/ci.sh --quick       -> test suite only
#   scripts/ci.sh --bench-only  -> bench with up to 3 full retries
#                                  (round-end recovery after a TPU outage;
#                                  see docs/ROUND_END_CHECKLIST.md)
# The test suite and the dryrun run on a virtual CPU mesh (no TPU needed);
# bench.py runs on whatever jax.devices() provides (TPU when available).
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--bench-only" ]]; then
  for attempt in 1 2 3; do
    echo "== bench (attempt $attempt) =="
    if python bench.py; then exit 0; fi
    echo "bench attempt $attempt failed" >&2
    sleep 120
  done
  exit 1
fi

echo "== pytest (virtual 8-device CPU mesh) =="
python -m pytest tests/ -x -q

if [[ "${1:-}" == "--quick" ]]; then exit 0; fi

echo "== multichip dryrun (8 virtual devices) =="
python - <<'EOF'
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
EOF

echo "== bench =="
python bench.py
