#!/bin/bash
# Round-17 isolated octave: each heavy family measured alone (isolated
# discipline — SCALE.md r15/r16) at x32 and x128, runs=3, CPUS=8.
set -uo pipefail
OUT="${1:-/tmp/octave_r17.jsonl}"
: > "$OUT"
FAMS="q_ngram_jaccard_pairs q_dup_ngram_spans q_dedup_clusters q_dedup_spans q_minhash_neardup q_expectations"
for MULT in 32 128; do
  for Q in $FAMS; do
    echo "=== $Q x$MULT $(date -u +%H:%M:%S) ===" >> "$OUT"
    timeout 3000 scripts/bench_iso.sh "$Q" "$MULT" 8 3 2>/dev/null \
      | grep -F '"queries"' >> "$OUT" || echo "FAILED $Q x$MULT" >> "$OUT"
  done
done
echo "OCTAVE_DONE" >> "$OUT"
