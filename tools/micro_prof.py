#!/usr/bin/env python
"""Micro-profile each sub-plan of the pipeline at one core count."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cpus: int, n_rows: int) -> None:
    from radar_log_parser_spark.codec import Vocab
    from radar_log_parser_spark.config import load_config
    from radar_log_parser_spark.functions.parse import parse_stage
    from radar_log_parser_spark.operators import aggregates as agg
    from radar_log_parser_spark.operators import routing
    from radar_log_parser_spark.session import get_spark

    fx_dir = os.path.join(REPO, ".bench_cache", f"logs_{n_rows}_v2")
    spark = get_spark(
        app="micro-prof",
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
    parse_stage(spark.read.parquet(logs).sample(0.05, seed=1), cfg, vocab) \
        .write.format("noop").mode("overwrite").save()

    t = {}

    def tm(name, fn):
        t0 = time.monotonic()
        r = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(f"{name}: {t[name]}s -> {r}", file=sys.stderr)

    ppath = os.path.join("/tmp", f"_prof_parsed_{cpus}")
    if not os.path.exists(os.path.join(ppath, "_SUCCESS")):
        parse_stage(spark.read.parquet(logs), cfg, vocab).write.mode("overwrite").parquet(ppath)
    parsed = spark.read.parquet(ppath)

    tm("scan_count", lambda: parsed.count())
    tm("scan_two_cols", lambda: parsed.select("source", "procs").write.format("noop").mode("overwrite").save())
    tm("kept", lambda: routing.kept_processes(parsed).collect().__len__())
    kept_src = routing.kept_processes(parsed)
    kept = spark.createDataFrame(kept_src.collect(), kept_src.schema)
    ipmap = routing.issue_process_map(spark, cfg)
    scope = routing.scoped_direct(parsed, kept, ipmap, cfg)
    tm("scope_noop", lambda: scope.write.format("noop").mode("overwrite").save())
    slim = scope.drop("tokens", "n_tok")
    tm("slim_noop", lambda: slim.write.format("noop").mode("overwrite").save())
    tm("other_matches_count", lambda: routing.other_matches(slim).count())
    tm("grouped_matches_count", lambda: routing.grouped_matches(slim).count())
    tm("fields_collect", lambda: len(agg.field_contents(cfg, slim).collect()))
    tm("other_aggs", lambda: len(agg.other_issue_aggs(routing.other_matches(slim)).collect()))
    tm("g_totals", lambda: len(agg.grouped_totals(routing.grouped_matches(slim)).collect()))
    tm("grouped_counts", lambda: len(agg.grouped_counts(routing.grouped_matches(slim)).collect()))
    tm("events_sink", lambda: routing.events_sink(parsed).write.format("noop").mode("overwrite").save())
    tm("severity_sink", lambda: routing.severity_sink(parsed).write.format("noop").mode("overwrite").save())
    tm("specific_sink", lambda: routing.specific_issues(parsed, kept).write.format("noop").mode("overwrite").save())
    tm("other_routed_sink", lambda: routing.other_routed(scope).write.format("noop").mode("overwrite").save())
    tm("grouped_routed_sink", lambda: routing.grouped_routed(scope).write.format("noop").mode("overwrite").save())
    print(json.dumps({"cpus": cpus, **t}))
    spark.stop()


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--rows", type=int, default=8_000_000)
    a = ap.parse_args()
    main(a.cpus, a.rows)
