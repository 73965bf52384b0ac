"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis) as
(spark, sf_dir) → DataFrame callables; `oracle_sql()` carries the DuckDB
oracle for each SQL-expressible one. Implementations live in
`radar_log_parser_spark.operators.*`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from radar_log_parser_spark.operators import logquery  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the priority-ordered issue summary (the reference's report
    table, O1+A8) over sf0.001."""
    return logquery.q_priority_summary(spark, "/root/testdata/sf0.001")


def _specs() -> list:
    specs = list(logquery.SPECS)
    from radar_log_parser_spark.operators import (
        dedup,
        llmprep,
        media,
        similarity,
        textops,
    )

    specs += (
        dedup.SPECS + similarity.SPECS + textops.SPECS + media.SPECS
        + llmprep.SPECS
    )
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in _specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.sql for s in _specs() if s.sql is not None}
