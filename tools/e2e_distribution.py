#!/usr/bin/env python
"""Assemble BENCH/e2e_distribution_r5.json (VERDICT r4 #5) from N
independent `bench.py --pipeline-only` stdout JSONs collected across
different hours of the session. Each input already carries min-of-3 +
spread; the artifact records every raw run so the steady-state e2e wall
can be stated next to the steal-inflated tail instead of as an
unverifiable claim.

Each input may be a single-run JSON or a .jsonl with one JSON object per
invocation (the campaign appends runs to one file so a VM wipe cannot
destroy earlier samples).

Usage: python tools/e2e_distribution.py out.json RUN_JSON [RUN_JSON ...]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in paths:
        with open(p) as f:
            text = f.read().strip()
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            runs.append({
                "pipeline_seconds": d["pipeline_seconds"],
                "pipeline_rows_per_sec": d["pipeline_rows_per_sec"],
                "runs_sec": d.get("pipeline_runs_sec", []),
                "spread_sec": d.get("pipeline_spread_sec"),
                "cpus": d.get("cpus"),
                "rows": d.get("pipeline_rows"),
            })
    all_raw = sorted(t for r in runs for t in r["runs_sec"])
    mins = sorted(r["pipeline_seconds"] for r in runs)
    report = {
        "invocations": len(runs),
        "timed_runs_total": len(all_raw),
        "per_invocation_min_sec": mins,
        "all_timed_runs_sec": all_raw,
        "steady_state_sec": mins[0],
        "median_of_mins_sec": round(statistics.median(mins), 3),
        "tail_sec": all_raw[-1] if all_raw else None,
        "runs": runs,
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "invocations": len(runs),
        "steady_state_sec": report["steady_state_sec"],
        "median_of_mins_sec": report["median_of_mins_sec"],
        "tail_sec": report["tail_sec"],
    }))


if __name__ == "__main__":
    main()
