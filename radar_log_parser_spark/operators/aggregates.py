"""Aggregations A1-A8 and the summary sink.

Every first/last semantic is an explicit ``min_by``/``max_by`` over the
ordering key (proc_rank, line_no, match_pos) — the distributed equivalent of
the reference's implicit string-scan order (SURVEY.md §2.4). Spark performs
partial (map-side) aggregation for all of these automatically, so skewed
sources do not concentrate pre-aggregation rows on one reducer.

Field contents (A4/F5) are computed distributed: per-row
``regexp_extract_all`` (JVM, codegen) → sum of counts + order-preserving
collect. This equals the reference's findall-over-joined-content
(getFieldContent, analyzeLog.go:305-313) because field patterns cannot match
across line boundaries (config lint guarantees the RE2 subset; `.`/char
classes do not cross `\n`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_log_parser_spark.config import ConfigSpec

def _ord():
    """Scan-order key: reproduces the reference's issueContent string order
    (process blocks name-asc per Q3, lines by ordinal, matches left-to-right)."""
    return F.struct("proc_rank", "line_no", "match_pos")


def _line_ord():
    return F.struct("proc_rank", "line_no")


def other_issue_aggs(other_routed: DataFrame) -> DataFrame:
    """A1 + A5 for non-grouped issues: Number counts ALL matches including
    duplicates (analyzeLog.go:271-278); LogLevel comes from the FIRST match
    substring (go:285), Timestamp from the LAST (go:299)."""
    return other_routed.groupBy("source", "issue").agg(
        F.count("*").alias("number"),
        F.min_by("match", _ord()).alias("first_match"),
        F.max_by("match", _ord()).alias("last_match"),
        F.count_distinct("match").alias("n_distinct"),
    )


def other_issue_match_sets(other_routed: DataFrame) -> DataFrame:
    """A6 dedup set — the reference's NonGroupedIssues map[string]bool
    (analyzeLog.go:272-276)."""
    return other_routed.select("source", "issue", "match").dropDuplicates()


def grouped_counts(grouped_routed: DataFrame) -> DataFrame:
    """A2 distinct-tuple counts per group key (fillGroupDetails,
    analyzeLog.go:240-257; tuple equality via reflect.DeepEqual → exact
    array equality here)."""
    return grouped_routed.groupBy("source", "issue", "group_key", "details").agg(
        F.count("*").alias("count")
    )


def grouped_totals(grouped_routed: DataFrame) -> DataFrame:
    """A3 issue total = sum of tuple counts = matched-line count
    (analyzeLog.go:258-264), plus the LAST matching line for the grouped
    Timestamp/LogLevel extracts (last_matches, analyzeLog.go:204-221)."""
    return grouped_routed.groupBy("source", "issue").agg(
        F.count("*").alias("number"),
        F.max_by("text", _line_ord()).alias("last_line"),
    )


def field_contents(
    cfg: ConfigSpec,
    other_routed: DataFrame,
    scope: DataFrame,
) -> DataFrame:
    """A4/F5 per-issue field extraction → (source, issue, field, n, joined).

    Quirk Q10 asymmetry (replicated exactly): non-grouped fields scan the
    JOINED MATCH STRINGS (analyzeLog.go:279,289-297); grouped fields scan the
    FULL scoped content — every scoped line, matching or not
    (analyzeLog.go:222-231).
    """
    parts: list[DataFrame] = []
    for iname in sorted(cfg.issues):
        spec = cfg.issues[iname]
        fields = dict(cfg.general.other_fields)
        fields.update(spec.additional_fields)
        if not fields:
            continue
        if spec.grouped:
            base = scope.filter(F.col("issue") == iname).select(
                "source", "issue", "proc_rank", "line_no",
                F.lit(0).alias("match_pos"), F.col("text").alias("subject"),
            )
        else:
            base = other_routed.filter(F.col("issue") == iname).select(
                "source", "issue", "proc_rank", "line_no", "match_pos",
                F.col("match").alias("subject"),
            )
        for fname in sorted(fields):
            pat = fields[fname]
            per_row = base.select(
                "source", "issue", "proc_rank", "line_no", "match_pos",
                F.regexp_extract_all("subject", F.lit(pat), 0).alias("hits"),
            )
            # Two-level ordered aggregation: a single collect_list+sort per
            # (source, issue) would funnel every match through ONE reducer
            # (measured: the serial tail that killed N→4N scaling). Level 1
            # buckets by (proc_rank, line_no div B) — consistent with the
            # scan order — and builds per-bucket strings in parallel; level
            # 2 merges the few bucket strings in order.
            bucket = F.floor(F.col("line_no") / F.lit(65536)).alias("line_bucket")
            lvl1 = (
                per_row.withColumn("line_bucket", bucket)
                .groupBy("source", "issue", "proc_rank", "line_bucket")
                .agg(
                    F.sum(F.size("hits")).alias("n_part"),
                    F.array_join(
                        F.flatten(
                            F.transform(
                                F.array_sort(
                                    F.collect_list(F.struct("line_no", "match_pos", "hits"))
                                ),
                                lambda s: s["hits"],
                            )
                        ),
                        "\n",
                    ).alias("joined_part"),
                )
                .filter(F.col("n_part") > 0)
            )
            agg = lvl1.groupBy("source", "issue").agg(
                F.sum("n_part").alias("n"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("proc_rank", "line_bucket", "joined_part")
                            )
                        ),
                        lambda s: s["joined_part"],
                    ),
                    "\n",
                ).alias("joined"),
            )
            parts.append(agg.select(
                "source", "issue", F.lit(fname).alias("field"), "n", "joined"
            ))
    if not parts:
        return None  # type: ignore[return-value]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assemble_summary(
    spark: SparkSession,
    cfg: ConfigSpec,
    sources: list[str],
    other_aggs_rows: list,
    grouped_totals_rows: list,
    field_rows: list,
) -> DataFrame:
    """Final summary sink (A8): one row per (source, issue) with the
    reference's report-table columns, ordered by priority desc then issue
    asc (sortIssue, analyzeLog.go:102-111 + quirk Q4 tiebreak).

    Driver-side assembly is bounded by #sources × #issues (config-sized);
    the inputs are already-aggregated tiny frames. The Timestamp/LogLevel
    extracts run here in Python `re` — the exact engine the oracle and the
    reference (RE2 subset) define them in."""
    ts_rgx = re.compile(cfg.general.timestamp) if cfg.general.timestamp else None
    lvl_rgx = re.compile(cfg.general.log_level) if cfg.general.log_level else None

    other = {(r["source"], r["issue"]): r for r in other_aggs_rows}
    grouped = {(r["source"], r["issue"]): r for r in grouped_totals_rows}
    fields: dict[tuple[str, str], dict[str, str]] = {}
    for r in field_rows:
        fields.setdefault((r["source"], r["issue"]), {})[r["field"]] = (
            f"{r['n']} :  {r['joined']}"  # two spaces — analyzeLog.go:311
        )

    rows = []
    for source in sorted(sources):
        for iname in sorted(cfg.issues):
            spec = cfg.issues[iname]
            key = (source, iname)
            number = 0
            timestamp = ""
            log_level = ""
            fmap: dict[str, str] = {}
            if spec.grouped:
                g = grouped.get(key)
                number = g["number"] if g else 0
                last_line = g["last_line"] if g else ""
                if ts_rgx is not None:
                    m = ts_rgx.search(last_line)
                    if m:
                        timestamp = m.group(0)
                if lvl_rgx is not None:
                    m = lvl_rgx.search(last_line)
                    if m and m.lastindex:
                        log_level = m.group(1)
                # grouped fields are set even with zero matches
                # (analyzeLog.go:222-231 runs unconditionally)
                fnames = sorted(set(cfg.general.other_fields) | set(spec.additional_fields))
                fmap = {f: fields.get(key, {}).get(f, "0 :  ") for f in fnames}
            else:
                o = other.get(key)
                if o:
                    number = o["number"]
                    if lvl_rgx is not None:
                        m = lvl_rgx.search(o["first_match"])
                        if m and m.lastindex:
                            log_level = m.group(1)
                    if ts_rgx is not None:
                        m = ts_rgx.search(o["last_match"])
                        if m:
                            timestamp = m.group(0)
                    # a field with zero hits still renders "0 :  " when the
                    # issue itself matched (getFieldContent on no matches)
                    fnames = sorted(
                        set(cfg.general.other_fields) | set(spec.additional_fields)
                    )
                    fmap = {
                        f: fields.get(key, {}).get(f, "0 :  ") for f in fnames
                    }
                # non-grouped fields only exist when matches exist
                # (analyzeLog.go:280-303)
            rows.append(
                (
                    source,
                    iname,
                    int(cfg.priority.get(iname, 0)),
                    int(number),
                    timestamp,
                    log_level,
                    fmap,
                )
            )
    df = spark.createDataFrame(
        rows,
        "source string, issue string, priority int, number long, "
        "timestamp string, log_level string, fields map<string,string>",
    )
    return df.orderBy("source", F.desc("priority"), F.asc("issue"))
