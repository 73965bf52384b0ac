#!/bin/bash
# Round-5 scaling-gate campaign (VERDICT r4 #3) interleaved with e2e
# distribution runs (VERDICT r4 #5). Chunks of 2 interleaved scaling
# rounds alternate with one bench.py --pipeline-only invocation so the
# e2e samples land in different hours of the session without contending
# with the scaling legs. Outputs persist under BENCH/r5_raw/ (a VM wipe
# of /tmp destroyed the first attempt). Touch BENCH/r5_raw/stop to end
# after the current chunk.
set -u
cd /root/repo
RAW=BENCH/r5_raw
mkdir -p "$RAW"
for chunk in 1 2 3 4 5 6 7 8; do
  python bench.py --scaling --rounds 2 --no-md \
    >> "$RAW/scaling_rounds.out" 2>> "$RAW/scaling_rounds.log"
  echo "scaling chunk $chunk done $(date -u +%H:%M:%S)" >> "$RAW/status"
  python bench.py --pipeline-only --repeats 3 \
    >> "$RAW/e2e_dist.jsonl" 2>> "$RAW/e2e_dist.err"
  echo "e2e run $chunk done $(date -u +%H:%M:%S)" >> "$RAW/status"
  [ -f "$RAW/stop" ] && break
done
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> "$RAW/status"
