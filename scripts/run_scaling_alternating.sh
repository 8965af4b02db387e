#!/bin/bash
# VERDICT r5 item 1: recapture the 2->8-core scaling pair on a QUIET window.
# Hardened protocol: require loadavg < MAX_LOAD immediately before EVERY leg,
# alternate 2c/8c back-to-back within the same window (so both sides of each
# ratio share whatever contamination remains), run PAIRS pairs, and record
# every leg (not only the fastest). Usage:
#   scripts/run_scaling_alternating.sh [replicate] [max_load] [pairs] [out]
set -u
REP="${1:-1600}"
MAX_LOAD="${2:-1.0}"
PAIRS="${3:-3}"
OUT="${4:-/tmp/scaling_alternating.jsonl}"

wait_idle() {
  for i in $(seq 1 240); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $L < $MAX_LOAD else 0)")
    [ "$ok" = "1" ] && return 0
    sleep 30
  done
  echo "host never went idle (last load $L)" >&2
  return 1
}

: > "$OUT"
for p in $(seq 1 "$PAIRS"); do
  for C in 2 8; do
    wait_idle || exit 1
    echo "pair $p leg ${C}c (load $(cut -d' ' -f1 /proc/loadavg))" >&2
    python scripts/scaling.py "$C" "$REP" 2>/dev/null | tail -1 >> "$OUT"
  done
done
cat "$OUT"
python3 - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
by = {}
for r in rows:
    by.setdefault(r["cpus"], []).append(r["pages_per_sec"])
print("legs:", {k: sorted(v) for k, v in by.items()})
pairs = list(zip(by.get(2, []), by.get(8, [])))
for i, (a, b) in enumerate(pairs):
    print(f"pair {i+1}: eff = {b / (4 * a):.3f}")
if by.get(2) and by.get(8):
    print(f"best-leg eff = {max(by[8]) / (4 * max(by[2])):.3f}")
EOF
