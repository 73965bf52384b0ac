#!/usr/bin/env python
"""Optimization-round measurement harness (bench.py is FROZEN; this file
carries the extra evidence: per-query noop-sink isolation per guide 1.4,
arbitrary sf dirs incl. the sf1like stand-in, and .explain("formatted")
capture for plans/r06/).

Usage:
  python bench_extra.py [--sf-dir DIR] [--cpus N] [--repeats K]
                        [--plans OUTDIR --tag before|after] [query ...]

Prints one JSON line {"queries": {name: min_sec}, "queries_runs": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "specific_process", "nongrouped_count", "grouped_tuples", "first_last",
    "field_content", "severity_enrich", "important_events", "line_range",
    "context_segments", "window_rollup", "priority_summary",
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_lsh_md5",
    "dedup_simhash", "dedup_simhash_md5",
    "dedup_embedding_lsh", "dedup_cluster", "ann_topk_cosine", "ann_ivf_topk",
    "lang_id", "quality_score", "token_count", "doc_fingerprint", "media_meta",
    "pack_sequences", "contamination_check", "stratified_sample",
    "pii_redact", "repetition_score",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<tag>.txt explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from radar_log_parser_spark.session import get_spark

    names = args.queries or DEFAULT_QUERIES
    queries = entry.queries()
    spark = get_spark(
        app="bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    timings: dict[str, float] = {}
    runs_all: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"{name} warm")
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        timings[name] = min(runs)
        runs_all[name] = runs
        print(json.dumps({"q": name, "min": min(runs), "runs": runs}),
              file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "sf_dir": args.sf_dir, "cpus": args.cpus,
        "queries": timings, "queries_runs": runs_all,
        "value": round(sum(timings.values()), 3),
    }))


if __name__ == "__main__":
    main()
