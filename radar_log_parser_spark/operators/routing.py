"""Routing: parsed rows → per-category sink DataFrames (fan-out).

One parsed DataFrame feeds several filtered writes (reference: the single
``FullDetails`` result object rendered as separate report views,
analyzeLog.go:61-66 / report.html:53-97):

  specific_issues — per-process sub-logs            (F1, quirk Q1)
  other_routed    — non-grouped issue match rows    (F3)
  grouped_routed  — grouped issue match rows        (F4)
  events          — important-event lines           (F9, quirks Q6/Q7)
  severity        — per-line severity classification (F8, quirk Q8)

Scale notes: the issue→process mapping and the Q1 keep-set are config-sized
and per-(source,process) — both broadcast; the only shuffles in this module
are the tiny keep-rule count and the events text-group (see events_sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_log_parser_spark.config import ConfigSpec

ORD_COLS = ("proc_rank", "line_no", "match_pos")


def kept_processes(parsed: DataFrame) -> DataFrame:
    """Q1 keep rule: a process exists only if its pattern matched >1 line in
    that source's log (reference: `len(proc_content) > 1`, analyzeLog.go:137).
    Output (source, process, n_lines) — config-sized, broadcastable."""
    return (
        parsed.select("source", F.explode("procs").alias("process"))
        .groupBy("source", "process")
        .count()
        .filter(F.col("count") > 1)
        .withColumnRenamed("count", "n_lines")
    )


def specific_issues(parsed: DataFrame, kept: DataFrame) -> DataFrame:
    """Per-process sub-log rows (reference: setSpecProcessLogs result map,
    analyzeLog.go:125-146). Tokens are carried through untouched — this is
    where per-row token-array equality vs the source is anchored."""
    exploded = parsed.select(
        "source", F.explode("procs").alias("process"),
        "doc_id", "line_no", "tokens", "n_tok", "text",
    )
    return exploded.join(
        F.broadcast(kept.select("source", "process")), ["source", "process"], "inner"
    )


def issue_process_map(spark: SparkSession, cfg: ConfigSpec) -> DataFrame:
    """Broadcast dimension: (issue, process, proc_rank, grouped).

    proc_rank = position of the process within the issue's process list
    sorted ascending — quirk Q3 pins the reference's nondeterministic Go
    map-order block concatenation (analyzeLog.go:158) to name order; it
    drives every first/last-match ordering."""
    rows = []
    for iname in sorted(cfg.issues):
        spec = cfg.issues[iname]
        for rank, proc in enumerate(sorted(spec.specific_process)):
            rows.append((iname, proc, rank, spec.grouped))
    return spark.createDataFrame(rows, "issue string, process string, proc_rank int, grouped boolean")


def scoped_direct(
    parsed: DataFrame, kept: DataFrame, ipmap: DataFrame, cfg: ConfigSpec
) -> DataFrame:
    """F2 issue scoping with Q2 semantics: an issue's search space is the
    concatenation of its kept processes' sub-logs and NOTHING else
    (reference: analyzeLog.go:156-178; the local re-scan cache there is dead
    code — see SURVEY.md quirk Q2). Computed straight from the parsed stage:
    explode procs → Q1 keep-rule broadcast join → issue→process broadcast
    join. No wide shuffle anywhere.

    The per-issue match columns collapse to two narrow arrays here (a
    config-sized CASE, codegen'd), so the scope frame's width no longer
    depends on the config — cheap to checkpoint/cache."""
    from radar_log_parser_spark.config import summary_pairs
    from radar_log_parser_spark.functions.schema import (
        fld_col,
        grp_col,
        grp_issue_names,
        ngrp_col,
        ngrp_issue_names,
    )

    pairs = summary_pairs(cfg)
    fcols = [fld_col(k, i, f) for k, (i, f, _p) in enumerate(pairs)]
    keep_cols = ["source", "doc_id", "line_no", "tokens", "n_tok", "text"]
    exploded = parsed.select(
        *keep_cols,
        F.explode("procs").alias("process"),
        *[F.col(ngrp_col(n)) for n in ngrp_issue_names(cfg)],
        *[F.col(grp_col(n)) for n in grp_issue_names(cfg)],
        *fcols,
    )
    kept_rows = exploded.join(
        F.broadcast(kept.select("source", "process")), ["source", "process"], "inner"
    )
    scope = kept_rows.join(F.broadcast(ipmap), "process", "inner")

    def case_over(names, col_of):
        expr = F.lit(None).cast("array<string>")
        for n in names:
            expr = F.when(F.col("issue") == n, F.col(col_of(n))).otherwise(expr)
        return expr

    return scope.select(
        "source", "process", "issue", "proc_rank", "grouped",
        "doc_id", "line_no", "tokens", "n_tok", "text",
        case_over(ngrp_issue_names(cfg), ngrp_col).alias("match_arr"),
        case_over(grp_issue_names(cfg), grp_col).alias("grp_arr"),
        # per-line parse-time field hits, nulled on rows of other issues:
        # pair k is only meaningful where row.issue owns it (and the parse-
        # side eligibility mask may be wider than this row's process)
        *[
            F.when(F.col("issue") == iname, F.col(c)).alias(c)
            for c, (iname, _f, _p) in zip(fcols, pairs)
        ],
    )


def other_routed(scope: DataFrame) -> DataFrame:
    """F3 non-grouped routed rows: one row per match substring, duplicates
    preserved (the reference counts duplicates, analyzeLog.go:271-278; the
    dedup SET is a separate aggregate). Ordering key (proc_rank, line_no,
    match_pos) reproduces issueContent scan order."""
    return (
        scope.filter(~F.col("grouped"))
        .select(
            "source", "issue", "process", "proc_rank", "doc_id", "line_no",
            "tokens", "text",
            F.posexplode("match_arr").alias("match_pos", "match"),
        )
    )


def grouped_routed(scope: DataFrame, cfg: ConfigSpec | None = None) -> DataFrame:
    """F4 grouped routed rows: first grouping match per line; group 1 is the
    key, groups 2.. the detail tuple (reference: fillGroupDetails,
    analyzeLog.go:233-257; the ≥2-capture-group gate is enforced at parse
    time and by config validation).

    With `cfg`, every NAMED capture group across the grouped issues is also
    projected as a typed `g_<Name>` column (F10 — the reference renders
    named groups as report columns, analyzeLog.go:201-203 /
    details.html:101-108); a row of a different issue holds null. The
    statically-known names come from IssueSpec.group_names()."""
    rows = scope.filter(F.col("grouped") & (F.size("grp_arr") > 0))
    named_cols = []
    if cfg is not None:
        merged: dict[str, object] = {}
        for iname in sorted(cfg.issues):
            spec = cfg.issues[iname]
            if not spec.grouped:
                continue
            names = spec.group_names()
            for gi in range(1, len(names)):
                nm = names[gi]
                if not nm:
                    continue
                e = F.when(
                    F.col("issue") == F.lit(iname), F.element_at("grp_arr", gi)
                )
                # at most one issue's when() fires per row, so a shared name
                # across issues coalesces safely
                merged[nm] = e if nm not in merged else F.coalesce(merged[nm], e)
        named_cols = [v.alias(f"g_{k}") for k, v in sorted(merged.items())]
    return rows.select(
        "source", "issue", "process", "proc_rank", "doc_id", "line_no",
        "tokens", "text",
        F.element_at("grp_arr", 1).alias("group_key"),
        F.expr("slice(grp_arr, 2, size(grp_arr) - 1)").alias("details"),
        *named_cols,
    )


def other_matches(scope: DataFrame) -> DataFrame:
    """Aggregation-width F3 rows: `other_routed` minus the row-payload
    columns (tokens/text/doc_id). The aggregates only key on these, so the
    pipeline computes them from a SLIM scoped frame — materializing the fat
    exploded frame just to aggregate it was the measured scale-killer."""
    return scope.filter(~F.col("grouped")).select(
        "source", "issue", "proc_rank", "line_no",
        F.posexplode("match_arr").alias("match_pos", "match"),
    )


def grouped_matches(scope: DataFrame) -> DataFrame:
    """Aggregation-width F4 rows (text kept: grouped_totals needs the last
    matching line for the summary's Timestamp/LogLevel extracts)."""
    return scope.filter(F.col("grouped") & (F.size("grp_arr") > 0)).select(
        "source", "issue", "proc_rank", "line_no", "text",
        F.element_at("grp_arr", 1).alias("group_key"),
        F.expr("slice(grp_arr, 2, size(grp_arr) - 1)").alias("details"),
    )


def events_sink(parsed: DataFrame) -> DataFrame:
    """F9 important events with quirk Q7: the reference resolves each match
    string through a text→line-number map where the LAST occurrence wins
    (details.go:158-161), and one event per line via map overwrite
    (details.go:177 — collision resolved here as max event name).

    Lines with identical text match identical events, so grouping by
    (source, text) and taking the max line_no reproduces the map exactly.
    The text-group shuffle is bounded by the number of DISTINCT matching
    texts, not the input size."""
    hits = parsed.filter(F.size("events") > 0)
    return (
        hits.groupBy("source", "text")
        .agg(
            F.max("line_no").alias("line_no"),
            F.max_by("doc_id", "line_no").alias("doc_id"),
            F.max_by("tokens", "line_no").alias("tokens"),
            F.max(F.array_max("events")).alias("event"),
        )
        .select("source", "line_no", "event", "doc_id", "tokens", "text")
    )


def severity_sink(parsed: DataFrame) -> DataFrame:
    """F8 per-line severity rows (reference: GetLogLeveldetails,
    details.go:187-194). n_matches > 1 only on the degenerate Ios
    bare-letter path (quirk Q8)."""
    return parsed.select(
        "source", "doc_id", "line_no",
        F.explode(F.arrays_zip("sev_levels", "sev_counts")).alias("s"),
    ).select(
        "source", "doc_id", "line_no",
        F.col("s.sev_levels").alias("level"),
        F.col("s.sev_counts").alias("n_matches"),
    )
