#!/usr/bin/env python
"""Decompose the fused summary job's wall time at one core count.

The r5b scaling campaign shows the fan-out window (slim materialization +
fused summary) scaling ~2.0-2.8x from 4 to 16 cores while the parse pass
scales at the host's own CPU ceiling (3.9-4.0x in the control-clean round).
This probe isolates WHERE the summary job's time goes so the fix targets
the real component:

  slim_build      scope -> slim projection -> eager serialized localCheckpoint
  subjects_scan   the union/explode pass over slim (no aggregation)
  sum_full        summary_aggregate as shipped (13 guarded regexp_extract_all
                  pairs + first/last + totals)
  sum_nofields    the same aggregation with ZERO field pairs -- isolates the
                  field-extraction regex cost from the agg machinery
  sum_fields_only two_level_hit_agg with the pairs but none of the summary's
                  extra aggregates

Each leg is timed twice (min reported); run this under different --cpus in
fresh processes and compare per-leg ratios. The parsed stage is read from a
shared parquet scratch (built once, --prep) so the probe never re-parses.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/tmp/_prof_parsed_shared"


def get_session(cpus: int):
    from radar_log_parser_spark.session import get_spark

    return get_spark(
        app="profile-summary",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "4m",
        },
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--rows", type=int, default=32_000_000)
    ap.add_argument("--prep", action="store_true", help="(re)build the parsed scratch then exit")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from radar_log_parser_spark.codec import Vocab
    from radar_log_parser_spark.config import load_config
    from radar_log_parser_spark.functions.parse import parse_stage
    from radar_log_parser_spark.operators import aggregates as agg
    from radar_log_parser_spark.operators import routing

    fx_dir = os.path.join(REPO, ".bench_cache", f"logs_{args.rows}_v2")
    cfg = load_config(os.path.join(fx_dir, "bench_config.yaml"))

    if args.prep:
        spark = get_session(32)
        vocab = Vocab.load(os.path.join(fx_dir, "vocab.json"))
        parse_stage(
            spark.read.parquet(os.path.join(fx_dir, "logs.parquet")), cfg, vocab
        ).write.mode("overwrite").parquet(SCRATCH)
        spark.stop()
        print(json.dumps({"prep": True, "rows": args.rows}))
        return

    spark = get_session(args.cpus)
    parsed = spark.read.parquet(SCRATCH)

    t: dict[str, float] = {}

    def tm(name: str, fn, reps: int | None = None) -> None:
        best = None
        for _ in range(reps or args.reps):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        t[name] = round(best, 2)
        print(f"  {name}: {t[name]}s", file=sys.stderr)

    kept_src = routing.kept_processes(parsed)
    kept = spark.createDataFrame(kept_src.collect(), kept_src.schema)
    ipmap = routing.issue_process_map(spark, cfg)
    scope = routing.scoped_direct(parsed, kept, ipmap, cfg)
    from pyspark.sql import functions as F

    from radar_log_parser_spark.functions.schema import fld_cols

    scope_slim_lazy = scope.select(
        "source", "issue", "proc_rank", "grouped", "line_no",
        F.when(
            F.col("grouped") & (F.size(F.coalesce(F.col("grp_arr"), F.array())) > 0),
            F.col("text"),
        ).alias("text"),
        F.size(F.coalesce(F.col("match_arr"), F.array())).alias("n_ng"),
        F.try_element_at("match_arr", F.lit(1)).alias("first_m"),
        F.try_element_at("match_arr", F.lit(-1)).alias("last_m"),
        "grp_arr",
        *fld_cols(cfg),
    )

    from pyspark import StorageLevel

    slim_holder = []

    def build_slim():
        s = scope_slim_lazy.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
        slim_holder.append(s)

    tm("slim_build", build_slim, reps=1)
    slim = slim_holder[-1]

    tm("slim_scan", lambda: slim.write.format("noop").mode("overwrite").save())
    tm("sum_full", lambda: agg.summary_frame(
        spark, cfg, parsed.select("source").distinct(), agg.summary_aggregate(cfg, slim)
    ).collect())

    real_pairs = agg._summary_pairs(cfg)
    agg._summary_pairs = lambda _cfg: []
    try:
        tm("sum_nofields", lambda: agg.summary_frame(
            spark, cfg, parsed.select("source").distinct(), agg.summary_aggregate(cfg, slim)
        ).collect())
    finally:
        agg._summary_pairs = lambda _cfg, _p=real_pairs: _p

    tm("sum_fields_only", lambda: agg.line_grain_hit_agg(slim, real_pairs).collect())

    print(json.dumps({"cpus": args.cpus, "rows": args.rows, "pairs": len(real_pairs), **t}))
    spark.stop()


if __name__ == "__main__":
    main()
