#!/usr/bin/env bash
# Job manifest + hard-deadline launcher (VERDICT r4 item 3).
#
# Round 4's 25k UQ job overlapped the driver's bench capture because the
# recovery chain's CUTOFF was not strictly before the capture window and
# nothing mechanically stopped bench from starting on a contended host.
# This wrapper closes both holes:
#   1. every long job launched through it gets a HARD absolute deadline
#      (timeout kills the whole process group at cutoff, SIGKILL 60 s later);
#   2. pid + cutoff + tag are recorded in runs/JOBS.manifest while the job
#      lives; scripts/ci.sh refuses to start bench while any manifest pid is
#      alive, and bench.py itself flags contention in its output.
#
# usage: manifest_run.sh <cutoff-unix-epoch> <tag> <logfile> -- cmd args...
set -uo pipefail
cd "$(dirname "$0")/.."

CUTOFF="$1"; TAG="$2"; LOG="$3"; shift 3
[ "${1:-}" = "--" ] && shift
MANIFEST="runs/JOBS.manifest"
mkdir -p runs

NOW=$(date +%s)
LEFT=$(( CUTOFF - NOW ))
if [ "$LEFT" -le 0 ]; then
  echo "manifest_run[$TAG]: cutoff $CUTOFF already passed (now $NOW)" >&2
  exit 1
fi

# timeout --foreground is NOT wanted here: we background the child and
# record its pid. --kill-after guarantees the slot frees even if the job
# ignores SIGTERM.
timeout --kill-after=60 "$LEFT" "$@" > "$LOG" 2>&1 &
PID=$!
echo "$PID $CUTOFF $TAG" >> "$MANIFEST"
echo "manifest_run[$TAG]: pid=$PID cutoff=$(date -u -d "@$CUTOFF" +%H:%M:%S)Z (${LEFT}s) log=$LOG"

wait "$PID"; rc=$?
# NB: grep -v exits 1 when nothing remains (job was the only manifest
# entry) — must still install the now-empty manifest, so no `&&` here.
grep -v "^$PID " "$MANIFEST" > "$MANIFEST.tmp" 2>/dev/null
mv "$MANIFEST.tmp" "$MANIFEST"
echo "manifest_run[$TAG]: pid=$PID exited rc=$rc at $(date -u +%H:%M:%S)Z"
exit $rc
