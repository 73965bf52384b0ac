#!/bin/bash
# Round-5b scaling-gate campaign: same estimator and pre-registered
# control-clean filter as r5, re-measured AFTER the dependency-tiered
# fan-out landed (commit ac30e9f) — the kept→slim window no longer
# serializes in front of the sink jobs, which is a code-side change to
# the very quantity the gate measures. Chunks of 2 interleaved scaling
# rounds alternate with one min-of-3 e2e invocation so e2e samples land
# across hours. Outputs persist under BENCH/r5b_raw/ and each chunk is
# snapshot-committed (scoped to that directory) so a VM wipe or session
# kill cannot destroy evidence. Touch BENCH/r5b_raw/stop to end after
# the current chunk.
set -u
cd /root/repo
RAW=BENCH/r5b_raw
mkdir -p "$RAW"
for chunk in 1 2 3 4 5 6 7 8; do
  python bench.py --scaling --rounds 2 --no-md \
    >> "$RAW/scaling_rounds.out" 2>> "$RAW/scaling_rounds.log"
  echo "scaling chunk $chunk done $(date -u +%H:%M:%S)" >> "$RAW/status"
  python bench.py --pipeline-only --repeats 3 \
    >> "$RAW/e2e_dist.jsonl" 2>> "$RAW/e2e_dist.err"
  echo "e2e run $chunk done $(date -u +%H:%M:%S)" >> "$RAW/status"
  git add "$RAW" && git commit -q \
    -m "Campaign r5b snapshot: chunk $chunk" -- "$RAW" || true
  [ -f "$RAW/stop" ] && break
done
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> "$RAW/status"
