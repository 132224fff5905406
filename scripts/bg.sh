#!/bin/bash
# usage: bg.sh <name> <python-script> [args...]
# Launch a long-running job detached; log -> runs/<name>.log, pid -> runs/<name>.pid
NAME="$1"; shift
cd /root/repo
mkdir -p runs
PYTHONPATH="/root/repo:${PYTHONPATH}" setsid nohup python "$@" > "runs/${NAME}.log" 2>&1 < /dev/null &
PID=$!
echo "$PID" > "runs/${NAME}.pid"
echo "launched ${NAME} pid ${PID}"
