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
    (process blocks name-asc per Q3, lines by ordinal, matches left-to-right).

    Packed into ONE BIGINT — min_by/max_by over a struct key drops the
    aggregate into interpreted struct ordering (measured ~5× slower).
    Bounds: proc_rank < 2^10 processes/issue, line_no < 2^33 lines/file,
    match_pos < 2^20 matches/line; ConfigSpec.validate() rejects issues
    with >1023 processes (config.py, the ">= 1024 processes" lint), and
    the reference's own input cap (10 MiB uploads) keeps files far under
    2^33 lines."""
    return (
        F.col("proc_rank").cast("long") * F.lit(1 << 53)
        + F.col("line_no") * F.lit(1 << 20)
        + F.col("match_pos")
    )


def _line_ord():
    return F.col("proc_rank").cast("long") * F.lit(1 << 53) + F.col("line_no") * F.lit(1 << 20)


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


def field_subjects(scope: DataFrame) -> DataFrame:
    """The per-row field-scan subjects, built in ONE pass over the scoped
    frame. Quirk Q10 asymmetry (replicated exactly): non-grouped fields scan
    the MATCH SUBSTRINGS (analyzeLog.go:279,289-297, one subject per match);
    grouped fields scan the FULL scoped content — every scoped line,
    matching or not (analyzeLog.go:222-231)."""
    # two plain codegen'd branches + union — building the subjects with a
    # single when(grouped, array(struct…))/transform/explode expression
    # dropped the plan into interpreted higher-order evaluation (measured
    # 4× slower than two passes over the scope)
    g = scope.filter(F.col("grouped")).select(
        "source", "issue", "proc_rank", "line_no",
        F.lit(0).alias("match_pos"), F.col("text").alias("subject"),
    )
    ng = scope.filter(~F.col("grouped")).select(
        "source", "issue", "proc_rank", "line_no",
        F.posexplode("match_arr").alias("match_pos", "subject"),
    )
    return g.unionByName(ng)


def field_contents(cfg: ConfigSpec, scope: DataFrame) -> DataFrame:
    """A4/F5 per-issue field extraction → (source, issue, field, n, joined).

    SINGLE PASS over the scoped frame for EVERY (issue, field) pair: one
    plan per pair (the previous design) re-scanned the materialized scope
    once per pair — 13 passes on the bench config, the dominant wall-time
    at 8M rows and a guaranteed scale-killer at 100 TB. Here each pair is a
    `when(issue == …)` guarded regexp_extract_all column (codegen evaluates
    only the owning issue's extracts per row), aggregated in one two-level
    shuffle and unpivoted with `stack`.

    Two-level ordered aggregation: a single collect_list+sort per
    (source, issue) would funnel every match through ONE reducer. Level 1
    buckets by (proc_rank, line_no div 65536) — consistent with the scan
    order — and builds per-bucket strings in parallel; level 2 merges the
    few bucket strings in order.
    """
    pairs: list[tuple[str, str, str]] = []  # (issue, field, pattern)
    for iname in sorted(cfg.issues):
        spec = cfg.issues[iname]
        fields = dict(cfg.general.other_fields)
        fields.update(spec.additional_fields)
        for fname in sorted(fields):
            pairs.append((iname, fname, fields[fname]))
    if not pairs:
        return None  # type: ignore[return-value]

    subj = field_subjects(scope)
    per_row = subj.select(
        "source", "issue", "proc_rank", "line_no", "match_pos",
        *[
            F.when(
                F.col("issue") == iname,
                F.regexp_extract_all("subject", F.lit(pat), 0),
            ).alias(f"h{k}")
            for k, (iname, _f, pat) in enumerate(pairs)
        ],
    )
    bucket = F.floor(F.col("line_no") / F.lit(65536)).alias("line_bucket")
    # scalar packed sort key: sorting structs that CONTAIN the hit arrays
    # forces an interpreted ordering over nested types (measured: the lvl1
    # sort dominated the whole pipeline). (line_no, match_pos) packs into
    # one BIGINT — match_pos < 2^20 matches/line, line_no < 2^43 — and the
    # per-row hits pre-join to a single string, so the sorted structs are
    # (bigint, string): binary-comparable, codegen'd.
    row_ord = (F.col("line_no") * F.lit(1 << 20) + F.col("match_pos")).alias("ord")
    aggs1 = []
    for k in range(len(pairs)):
        h = F.col(f"h{k}")
        # coalesce the null rows (non-owning issues) to 0 explicitly: under
        # ANSI (Spark 4 default) size(NULL) is NULL and sum skips it, but on
        # a legacy-mode 3.x cluster size(NULL) = -1 would silently subtract
        # one per non-owning row — don't depend on the ANSI default
        aggs1.append(F.sum(F.coalesce(F.size(h), F.lit(0))).alias(f"n{k}"))
        # collect_list skips the null produced by the un-otherwise'd when()
        # on rows of a different issue / zero-hit rows, so only owning,
        # matching rows enter the sort buffer
        aggs1.append(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.size(h) > 0,
                                F.struct(
                                    F.col("ord"),
                                    F.array_join(h, "\n").alias("s"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["s"],
                ),
                "\n",
            ).alias(f"j{k}")
        )
    lvl1 = per_row.withColumn("ord", row_ord).groupBy(
        "source", "issue", "proc_rank", bucket
    ).agg(*aggs1)

    aggs2 = []
    for k in range(len(pairs)):
        aggs2.append(F.sum(F.col(f"n{k}")).alias(f"N{k}"))
        # zero-hit buckets must not contribute empty lines to the join
        aggs2.append(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col(f"n{k}") > 0,
                                F.struct(
                                    "proc_rank", "line_bucket",
                                    F.col(f"j{k}").alias("jp"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["jp"],
                ),
                "\n",
            ).alias(f"J{k}")
        )
    lvl2 = lvl1.groupBy("source", "issue").agg(*aggs2)

    stack_args = ", ".join(
        f"'{fname}', N{k}, J{k}" for k, (_i, fname, _p) in enumerate(pairs)
    )
    return (
        lvl2.select(
            "source", "issue",
            F.expr(f"stack({len(pairs)}, {stack_args}) as (field, n, joined)"),
        )
        # null n = pair belongs to a different issue; 0 = issue scoped but the
        # field never hit (the reference renders those as "0 :  " downstream)
        .filter(F.col("n") > 0)
    )


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
    # driver-side assembly is only safe while #sources × #issues is
    # config-sized — fail loudly instead of OOMing the driver if a corpus
    # ever carries an unbounded source set into this path
    if len(sources) * max(len(cfg.issues), 1) > 1_000_000:
        raise ValueError(
            f"summary assembly is driver-side and bounded: "
            f"{len(sources)} sources x {len(cfg.issues)} issues > 1e6 rows; "
            f"shard the source set or aggregate the summary distributed"
        )
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
