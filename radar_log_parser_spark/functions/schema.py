"""Parsed-stage schema, derived from the config at plan-compile time.

The schema is config-static (SURVEY.md §1.3): one flat array column per
issue instead of a map column — map columns cost ~3× in columnar cache /
parquet encode and defeat column pruning, while per-issue columns let every
downstream consumer read only what it needs.

  ngrp__<issue>  array<string>   all match substrings on the line (F3)
  grp__<issue>   array<string>   first-match capture groups g1..gN (F4)
  sev_levels / sev_counts        parallel arrays (F8; one entry per level
                                 that matched — extract-mode platforms emit
                                 at most one)
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

from radar_log_parser_spark.config import ConfigSpec


def ngrp_issue_names(cfg: ConfigSpec) -> list[str]:
    return sorted(n for n, s in cfg.issues.items() if not s.grouped and s.regex)


def grp_issue_names(cfg: ConfigSpec) -> list[str]:
    return sorted(n for n, s in cfg.issues.items() if s.grouped and s.grouping)


def ngrp_col(name: str) -> str:
    return f"ngrp__{name}"


def grp_col(name: str) -> str:
    return f"grp__{name}"


def parsed_schema(cfg: ConfigSpec) -> T.StructType:
    fields = [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("procs", T.ArrayType(T.StringType()), False),
        T.StructField("events", T.ArrayType(T.StringType()), False),
        T.StructField("sev_levels", T.ArrayType(T.StringType()), False),
        T.StructField("sev_counts", T.ArrayType(T.IntegerType()), False),
    ]
    for n in ngrp_issue_names(cfg):
        fields.append(T.StructField(ngrp_col(n), T.ArrayType(T.StringType()), False))
    for n in grp_issue_names(cfg):
        fields.append(T.StructField(grp_col(n), T.ArrayType(T.StringType()), False))
    return T.StructType(fields)


def parsed_arrow_schema(cfg: ConfigSpec) -> pa.Schema:
    fields = [
        pa.field("doc_id", pa.string()),
        pa.field("source", pa.string()),
        pa.field("line_no", pa.int64()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("procs", pa.list_(pa.string())),
        pa.field("events", pa.list_(pa.string())),
        pa.field("sev_levels", pa.list_(pa.string())),
        pa.field("sev_counts", pa.list_(pa.int32())),
    ]
    for n in ngrp_issue_names(cfg):
        fields.append(pa.field(ngrp_col(n), pa.list_(pa.string())))
    for n in grp_issue_names(cfg):
        fields.append(pa.field(grp_col(n), pa.list_(pa.string())))
    return pa.schema(fields)
