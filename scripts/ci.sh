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

# Refuse to bench while any manifest job is alive (VERDICT r4 item 3): a
# live trainer on the single-core host / tunneled TPU makes every timing
# contended garbage. Jobs register via scripts/manifest_run.sh.
guard_manifest() {
  [ -f runs/JOBS.manifest ] || return 0
  while read -r pid cutoff tag; do
    if [ -n "${pid:-}" ] && [ -e "/proc/$pid" ]; then
      echo "REFUSING to bench: manifest job '$tag' (pid $pid) is alive" \
           "(cutoff $(date -u -d "@$cutoff" +%H:%M:%SZ 2>/dev/null || echo "$cutoff"))." >&2
      echo "Wait for it, or kill \$pid and retry." >&2
      return 1
    fi
  done < runs/JOBS.manifest
}

if [[ "${1:-}" == "--bench-only" ]]; then
  guard_manifest || exit 2
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
guard_manifest || exit 2
python bench.py
