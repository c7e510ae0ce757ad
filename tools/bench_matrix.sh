#!/bin/bash
# Re-measure every BASELINE workload (the round-N config matrix table in
# ARCHITECTURE.md / README.md). Writes one JSON line per config to
# $OUT (default bench_matrix.jsonl) plus a human log next to it.
# Each line wraps bench.py's own supervised JSON (retries + timeouts
# inside bench.py handle tunnel flakes).
cd "$(dirname "$0")/.."
OUT=${OUT:-bench_matrix.jsonl}
LOG=${OUT%.jsonl}.log
: > "$OUT"; : > "$LOG"
run() {
  name="$1"; shift
  echo "=== $name ===" >> "$LOG"
  start=$(date +%s)
  line=$(timeout 3000 python bench.py "$@" 2>>"$LOG")
  end=$(date +%s)
  echo "{\"config\": \"$name\", \"elapsed_s\": $((end-start)), \"result\": $line}" >> "$OUT"
  echo "$name done in $((end-start))s: $line" | tee -a "$LOG"
}
run gi --frames 16
run primary-shadow --config primary-shadow --frames 16
run hash-reference --config hash-reference --frames 8
run gi-4k --config gi-4k --frames 8
run flythrough --config flythrough --frames 8
run stress --config stress --frames 8
