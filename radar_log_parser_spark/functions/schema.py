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
  fld<k>__…      struct<n,j>     per-line field-pattern hits for summary
                                 pair k (A4/F5): n = hit count, j = hits
                                 joined "\n" in scan order; NULL when the
                                 line has no hits for that pair. Extracted
                                 AT PARSE TIME (r5): the summary previously
                                 re-ran every field regex per scoped SUBJECT
                                 row inside the fan-out window — the worst-
                                 scaling, most DRAM-exposed stage — and a
                                 line under two kept processes was extracted
                                 once per copy. Line-grain extraction in the
                                 embarrassingly-parallel parse pass runs each
                                 regex ONCE per line and ships only the
                                 (sparse) hits downstream.
"""

from __future__ import annotations

import re

import pyarrow as pa
from pyspark.sql import types as T

from radar_log_parser_spark.config import ConfigSpec, summary_pairs


def ngrp_issue_names(cfg: ConfigSpec) -> list[str]:
    return sorted(n for n, s in cfg.issues.items() if not s.grouped and s.regex)


def grp_issue_names(cfg: ConfigSpec) -> list[str]:
    return sorted(n for n, s in cfg.issues.items() if s.grouped and s.grouping)


def ngrp_col(name: str) -> str:
    return f"ngrp__{name}"


def grp_col(name: str) -> str:
    return f"grp__{name}"


def fld_col(k: int, iname: str, fname: str) -> str:
    """Column name for summary pair k — index-keyed (the canonical link is
    the position in config.summary_pairs), issue/field appended sanitized
    for debuggability."""
    suffix = re.sub(r"[^0-9A-Za-z_]", "_", f"{iname}__{fname}")
    return f"fld{k}__{suffix}"


def fld_cols(cfg: ConfigSpec) -> list[str]:
    return [fld_col(k, i, f) for k, (i, f, _p) in enumerate(summary_pairs(cfg))]


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
    hit = T.StructType(
        [T.StructField("n", T.IntegerType(), False), T.StructField("j", T.StringType(), False)]
    )
    for c in fld_cols(cfg):
        fields.append(T.StructField(c, hit, True))
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
    hit = pa.struct([pa.field("n", pa.int32(), False), pa.field("j", pa.string(), False)])
    for c in fld_cols(cfg):
        fields.append(pa.field(c, hit, True))
    return pa.schema(fields)
