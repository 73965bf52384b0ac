#!/usr/bin/env python
"""Phase-level profiler for the scaling gate (VERDICT r1 #1).

Runs the pipeline-only bench path at a given core count with per-phase
wall timings, printed as one JSON line. Run at 8 and 32 in fresh JVMs
(subprocesses) and diff the phases.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cpus: int, n_rows: int, mode: str) -> None:
    from radar_log_parser_spark.codec import Vocab
    from radar_log_parser_spark.config import load_config
    from radar_log_parser_spark.functions.parse import parse_stage
    from radar_log_parser_spark.operators import aggregates as agg
    from radar_log_parser_spark.operators import routing
    from radar_log_parser_spark.session import get_spark

    fx_dir = os.path.join(REPO, ".bench_cache", f"logs_{n_rows}_v2")
    if not os.path.exists(fx_dir):
        fx_dir = os.path.join(REPO, ".bench_cache", f"logs_{n_rows}")
    spark = get_spark(
        app="profile-scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "4m",
        },
    )
    cfg = load_config(os.path.join(fx_dir, "bench_config.yaml"))
    vocab = Vocab.load(os.path.join(fx_dir, "vocab.json"))
    logs = os.path.join(fx_dir, "logs.parquet")

    # warm python workers on every core
    parse_stage(spark.read.parquet(logs).sample(0.05, seed=1), cfg, vocab) \
        .write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}

    def phase(name):
        class _P:
            def __enter__(self):
                self.t0 = time.monotonic()
            def __exit__(self, *a):
                t[name] = round(time.monotonic() - self.t0, 2)
        return _P()

    raw = spark.read.parquet(logs)
    parsed = parse_stage(raw, cfg, vocab)
    print("input partitions:", raw.rdd.getNumPartitions(), file=sys.stderr)

    if mode == "parse_only":
        with phase("parse_noop"):
            parsed.write.format("noop").mode("overwrite").save()
        print(json.dumps({"cpus": cpus, "rows": n_rows, "mode": mode, **t}))
        spark.stop()
        return

    with phase("parse_lc"):
        if mode == "pq":
            ppath = os.path.join("/tmp", f"_prof_parsed_{cpus}")
            parsed.write.mode("overwrite").parquet(ppath)
            parsed = spark.read.parquet(ppath)
        else:
            parsed = parsed.localCheckpoint(eager=True)

    with phase("kept"):
        kept_src = routing.kept_processes(parsed)
        kept = spark.createDataFrame(kept_src.collect(), kept_src.schema)
    ipmap = routing.issue_process_map(spark, cfg)

    scope = routing.scoped_direct(parsed, kept, ipmap, cfg)
    with phase("slim_lc"):
        if mode == "pq":
            # no materialization: every consumer re-derives the scope from
            # the parquet parsed stage with column pruning
            scope_slim = scope.drop("tokens", "n_tok")
        else:
            scope_slim = scope.drop("tokens", "n_tok").localCheckpoint(eager=True)

    from concurrent.futures import ThreadPoolExecutor

    sinks = {
        "specific_issues": routing.specific_issues(parsed, kept),
        "other_routed": routing.other_routed(scope),
        "grouped_routed": routing.grouped_routed(scope),
        "events": routing.events_sink(parsed),
        "severity": routing.severity_sink(parsed),
    }
    with phase("sink_writes"):
        with ThreadPoolExecutor(max_workers=6) as pool:
            futs = [
                pool.submit(df.write.format("noop").mode("overwrite").save)
                for df in sinks.values()
            ]
            futs.append(pool.submit(
                agg.grouped_counts(routing.grouped_matches(scope_slim)).collect))
            for f in futs:
                f.result()

    with phase("summary"):
        summary = agg.summary_frame(
            spark, cfg, parsed.select("source").distinct(),
            agg.summary_aggregate(cfg, scope_slim),
        )
        summary.write.format("noop").mode("overwrite").save()

    t["total"] = round(sum(v for k, v in t.items()), 2)
    print(json.dumps({"cpus": cpus, "rows": n_rows, "mode": mode, **t}))
    spark.stop()


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--mode", default="lc", choices=["lc", "pq", "parse_only"])
    args = ap.parse_args()
    main(args.cpus, args.rows, args.mode)
