#!/bin/bash
# Run the N-vs-4N scaling pair only when the (shared) host is quiet, so the
# efficiency number measures the engine, not external tenants.
# Usage: scripts/run_scaling_when_idle.sh [replicate] [max_load] [out_file]
set -u
REP="${1:-400}"
MAX_LOAD="${2:-4.0}"
OUT="${3:-/tmp/scaling_pair.json}"

wait_idle() {
  for i in $(seq 1 120); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $L < $MAX_LOAD else 0)")
    [ "$ok" = "1" ] && return 0
    sleep 30
  done
  echo "host never went idle (last load $L)" >&2
  return 1
}

: > "$OUT"
for C in 8 32; do
  wait_idle || exit 1
  python scripts/scaling.py "$C" "$REP" 2>/dev/null | tail -1 >> "$OUT"
done
cat "$OUT"
