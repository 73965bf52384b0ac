"""SparkSession factory with scale-oriented defaults.

local[N] is the sandbox stand-in for a multi-executor cluster; every setting
here is chosen to behave identically on a real cluster (AQE, Arrow batching,
shuffle-partition sizing) — see BASELINE.md scaling gate.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "radar_log_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    n_threads = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else cpus
    shuffle_partitions = shuffle_partitions or max(2 * n_threads, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # pre-size the heap: lazy growth under G1 causes multi-x run-to-run
        # variance on batch workloads (measured 17s..46s for one job)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '48g')}",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # collect_list/collect_set aggregations run in
        # ObjectHashAggregateExec, whose default in-memory key budget
        # (fallbackThreshold=128 distinct keys per task) silently degrades
        # the whole aggregation to SORT-based once crossed — the fused
        # summary's level-1 grain (issue × proc_rank × line_bucket) sits
        # right at that boundary, so tasks flip between hash and full-sort
        # plans run-to-run. The per-key buffers here are bounded (a few
        # joined strings per pair), so a generous key budget is safe and
        # keeps the agg hash-based at any corpus size (keys/task stays
        # O(issues × buckets/task), independent of total rows).
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
