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

from radar_log_parser_spark.config import ConfigSpec, summary_pairs

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
    substring (go:285), Timestamp from the LAST (go:299).

    Standalone operator form (property-tested); the pipeline's summary path
    computes the same quantities inside the fused summary_aggregate."""
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
    Timestamp/LogLevel extracts (last_matches, analyzeLog.go:204-221).
    Standalone form; the pipeline summary uses summary_aggregate."""
    return grouped_routed.groupBy("source", "issue").agg(
        F.count("*").alias("number"),
        F.max_by("text", _line_ord()).alias("last_line"),
    )


def with_field_hits(cfg: ConfigSpec, scope: DataFrame) -> DataFrame:
    """JVM twin of the PARSE-TIME per-line field extraction
    (functions/fieldex.py): derives the fld{k} struct<n,j> columns at line
    grain with `regexp_extract_all`. The pipeline gets these columns free
    from parse_stage; this twin serves callers holding a scope frame built
    without them (tests, ad-hoc frames) and doubles as the
    parity-testable JVM expression of the extraction semantics. Quirk Q10
    preserved: grouped pairs scan the row's full `text` (every scoped
    line, matching or not); non-grouped pairs scan each MATCH SUBSTRING
    in order, zero-hit substrings contributing nothing."""
    from radar_log_parser_spark.functions.schema import fld_col

    cols = []
    for k, (iname, fname, pat) in enumerate(summary_pairs(cfg)):
        if cfg.issues[iname].grouped:
            hits = F.when(
                F.col("grouped") & (F.col("issue") == iname),
                F.regexp_extract_all("text", F.lit(pat), 0),
            )
        else:
            # flatten preserves (match_pos, hit) order — identical to the
            # per-subject join since "\n" separates both levels
            hits = F.when(
                ~F.col("grouped") & (F.col("issue") == iname),
                F.flatten(
                    F.transform(
                        "match_arr",
                        lambda m: F.regexp_extract_all(m, F.lit(pat), 0),
                    )
                ),
            )
        cols.append(
            F.when(
                F.size(hits) > 0,
                F.struct(
                    F.size(hits).cast("int").alias("n"),
                    F.array_join(hits, "\n").alias("j"),
                ),
            ).alias(fld_col(k, iname, fname))
        )
    return scope.select("*", *cols)


def line_grain_hit_agg(
    rows: DataFrame,
    pairs: list[tuple[str, str, str]],
    extra_row_cols: tuple = (),
    extra_aggs1: tuple = (),
    extra_aggs2: tuple = (),
) -> DataFrame:
    """THE shared two-level ordered field aggregation, at LINE GRAIN over
    parse-time hit columns (r5: this replaced a subject-grain version that
    re-ran every field regex per scoped subject row INSIDE the fan-out
    window — measured 75-85% of the fused summary job's wall at 32M rows,
    in the worst-scaling, most DRAM-exposed stage; see functions/fieldex).
    Input `rows` is a slim-scope-grain frame (source, issue, proc_rank,
    line_no) carrying the fld{k} struct<n,j> columns; output is one row
    per (source, issue) with N{k} (hit count) and J{k} (scan-ordered
    newline-joined hits) per (issue, field) pair, plus the caller's extra
    lvl2 aggregates.

    Two-level ordered aggregation: a single collect_list+sort per
    (source, issue) would funnel every match through ONE reducer. Level 1
    buckets by (proc_rank, line_no div 65536) — consistent with the scan
    order — and builds per-bucket strings in parallel; level 2 merges the
    few bucket strings in order.

    Scalar packed sort key: sorting structs that CONTAIN nested data drops
    the sort into interpreted ordering (measured: it dominated the whole
    pipeline). The per-line hits are ALREADY one pre-joined string from
    the parse pass, so the sorted structs are (bigint, string):
    binary-comparable, codegen'd. A line under two kept processes of one
    issue appears once per (proc_rank) copy with distinct packed ords —
    the reference renders it once per process block (quirk Q3 order).
    """
    from radar_log_parser_spark.functions.schema import fld_col

    row_ord = _line_ord().alias("ord")
    bucket = F.floor(F.col("line_no") / F.lit(65536)).alias("line_bucket")
    per_row = rows.select(
        "source", "issue", "proc_rank",
        *extra_row_cols,
        row_ord, bucket,
        *[
            F.col(fld_col(k, iname, fname)).alias(f"h{k}")
            for k, (iname, fname, _p) in enumerate(pairs)
        ],
    )

    aggs1 = list(extra_aggs1)
    for k in range(len(pairs)):
        h = F.col(f"h{k}")
        # h is null on rows of other issues and on zero-hit lines (the
        # parse extraction only materializes n > 0); coalesce to 0 so the
        # count never depends on null-skipping sum semantics
        aggs1.append(F.sum(F.coalesce(h["n"], F.lit(0))).alias(f"n{k}"))
        # collect_list skips nulls, so only owning, matching lines enter
        # the sort buffer
        aggs1.append(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                h.isNotNull(),
                                F.struct(F.col("ord"), h["j"].alias("s")),
                            )
                        )
                    ),
                    lambda s: s["s"],
                ),
                "\n",
            ).alias(f"j{k}")
        )
    lvl1 = per_row.groupBy("source", "issue", "proc_rank", "line_bucket").agg(*aggs1)

    aggs2 = list(extra_aggs2)
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
    return lvl1.groupBy("source", "issue").agg(*aggs2)


def field_contents(cfg: ConfigSpec, scope: DataFrame) -> DataFrame:
    """A4/F5 per-issue field extraction → (source, issue, field, n, joined).
    Standalone form: the shared line-grain builder (`line_grain_hit_agg`,
    also the engine of the fused pipeline summary) unpivoted with `stack`.
    Accepts a scope with or without the parse-time fld columns (the JVM
    twin derives them when absent)."""
    pairs = _summary_pairs(cfg)
    if not pairs:
        return None  # type: ignore[return-value]

    from radar_log_parser_spark.functions.schema import fld_cols

    if fld_cols(cfg)[0] not in scope.columns:
        scope = with_field_hits(cfg, scope)
    lvl2 = line_grain_hit_agg(scope, pairs)

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


# canonical (issue, field, pattern) catalog — see config.summary_pairs
_summary_pairs = summary_pairs


def summary_aggregate(cfg: ConfigSpec, scope_slim: DataFrame) -> DataFrame:
    """ONE two-level aggregation producing EVERYTHING the summary needs per
    (source, issue): the non-grouped totals + first/last match (A1/A5), the
    grouped totals + last matching line (A3), and every field's count +
    ordered joined content (A4/F5) — in a SINGLE pass over the slim scope.

    r3 ran four scans over the materialized slim blocks; at 32M rows the
    summary job was the fan-out straggler and scaled worst 4→16 cores
    (memory-bandwidth-bound re-reads). r4 fused them into one grouped
    aggregation. r5: the aggregation runs at LINE GRAIN over PARSE-TIME
    hit columns (functions/fieldex.py) — no subject explode/union, no
    regex, and no full-text traffic left in this job; the field machinery
    lives in the shared `line_grain_hit_agg` builder (also the engine of
    the standalone `field_contents`).

    first/last selections merge across the two levels by carrying the
    packed scan-order key next to each partial min_by/max_by: the key is
    unique per slim row within (source, issue), so lvl2's
    min_by(partial_value, partial_key) reproduces the global selection.
    Non-grouped first/last are line-local projections (match_arr is in
    scan order, so the issue's first match is element 1 of the minimal
    line's array and the last is element -1 of the maximal line's).
    """
    pairs = _summary_pairs(cfg)
    from radar_log_parser_spark.functions.schema import fld_cols

    if pairs and fld_cols(cfg)[0] not in scope_slim.columns:
        scope_slim = with_field_hits(cfg, scope_slim)

    if "n_ng" in scope_slim.columns:
        # pipeline slim scope: match_arr already reduced to the three
        # line-local scalars the aggregation needs (pipeline.py) — the
        # materialized blocks never carry the substrings
        n_ng = F.col("n_ng")
        first_m, last_m = F.col("first_m"), F.col("last_m")
    else:
        n_ng = F.size(F.coalesce(F.col("match_arr"), F.array()))
        # try_: ANSI element_at throws on the empty arrays of non-matching
        # lines (the values are only consumed where ng_ord is non-null,
        # but the projection evaluates every row)
        first_m = F.try_element_at("match_arr", F.lit(1))
        last_m = F.try_element_at("match_arr", F.lit(-1))
    is_match = F.size(F.coalesce(F.col("grp_arr"), F.array())) > 0
    ng_ord = F.when(~F.col("grouped") & (n_ng > 0), _line_ord())
    g_ord = F.when(F.col("grouped") & is_match, _line_ord())

    return line_grain_hit_agg(
        scope_slim,
        pairs,
        extra_row_cols=(
            n_ng.alias("n_ng"),
            F.col("grouped"),
            first_m.alias("first_m"),
            last_m.alias("last_m"),
            F.col("text"),
            ng_ord.alias("ng_ord"),
            g_ord.alias("g_ord"),
        ),
        extra_aggs1=(
            F.sum(F.when(~F.col("grouped"), F.col("n_ng")).otherwise(0)).alias("o_num1"),
            F.min("ng_ord").alias("o_ford1"),
            F.min_by("first_m", "ng_ord").alias("o_first1"),
            F.max("ng_ord").alias("o_lord1"),
            F.max_by("last_m", "ng_ord").alias("o_last1"),
            F.sum(F.when(F.col("g_ord").isNotNull(), 1).otherwise(0)).alias("g_num1"),
            F.max("g_ord").alias("g_lord1"),
            F.max_by("text", "g_ord").alias("g_last1"),
        ),
        extra_aggs2=(
            F.sum("o_num1").alias("o_number"),
            F.min_by("o_first1", "o_ford1").alias("first_match"),
            F.max_by("o_last1", "o_lord1").alias("last_match"),
            F.sum("g_num1").alias("g_number"),
            F.max_by("g_last1", "g_lord1").alias("last_line"),
        ),
    )


def summary_frame(
    spark: SparkSession,
    cfg: ConfigSpec,
    sources_df: DataFrame,
    combined_df: DataFrame,
) -> DataFrame:
    """Final summary sink (A8): one row per (source, issue) with the
    reference's report-table columns, ordered by priority desc then issue
    asc (sortIssue, analyzeLog.go:102-111 + quirk Q4 tiebreak).

    FULLY DISTRIBUTED (r3) and now SINGLE-JOIN (r4): `combined_df` (one
    fused two-level aggregation, see summary_aggregate) left-joins the
    static (source × issue) base once; the per-issue field MAP is a
    config-static `map_from_entries` CASE over the combined row's own
    columns — no per-field explode, no fmap re-aggregation, no stack
    (r3 assembled the same result through three joins + a groupBy).
    Timestamp/LogLevel extracts run as JVM `regexp_extract`; the config
    lint pins every engine (Go/RE2, Java, Python-ASCII, DuckDB) to the
    RE2-subset ASCII semantics, so the extracts agree with the Python
    oracle on any content (ADVICE r3: \\d/\\w/\\b are ASCII everywhere
    now). Content never touches the driver unless the caller collects."""
    pairs = _summary_pairs(cfg)
    issues_rows = [
        (iname, cfg.issues[iname].grouped, int(cfg.priority.get(iname, 0)))
        for iname in sorted(cfg.issues)
    ]
    issues_dim = spark.createDataFrame(
        issues_rows, "issue string, grouped boolean, priority int"
    )
    base = sources_df.select("source").crossJoin(F.broadcast(issues_dim))

    ts = cfg.general.timestamp
    lvl = cfg.general.log_level
    lvl_has_group = bool(lvl) and re.compile(lvl).groups >= 1

    def ts_of(col):
        # Python re.search().group(0) == regexp_extract(…, 0) (find semantics,
        # "" on no match) for the RE2 subset the config lint enforces
        return F.regexp_extract(col, ts, 0) if ts else F.lit("")

    def lvl_of(col):
        # the reference takes group(1) and skips group-less patterns
        # (m.lastindex check) — mirror that statically
        return F.regexp_extract(col, lvl, 1) if lvl_has_group else F.lit("")

    j = base.join(combined_df, ["source", "issue"], "left")

    empty_map = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )

    # per-issue field map, built from the combined row's own N_k/J_k columns
    # ("<n> :  <joined>" cells with "0 :  " defaults — analyzeLog.go:311);
    # a missing combined row (issue never scoped) leaves N_k null → every
    # cell defaults, matching the reference's unconditional grouped-field
    # scan over empty content
    def cell(k: int):
        return F.when(
            F.coalesce(F.col(f"N{k}"), F.lit(0)) > 0,
            F.concat(F.col(f"N{k}").cast("string"), F.lit(" :  "), F.col(f"J{k}")),
        ).otherwise(F.lit("0 :  "))

    fields_expr = empty_map
    for iname in sorted(cfg.issues):
        ks = [k for k, (inm, _f, _p) in enumerate(pairs) if inm == iname]
        if not ks:
            continue
        m = F.map_from_entries(
            F.array(*[
                F.struct(
                    F.lit(pairs[k][1]).alias("key"), cell(k).alias("value")
                )
                for k in ks
            ])
        )
        fields_expr = F.when(F.col("issue") == iname, m).otherwise(fields_expr)

    has_other = F.coalesce(F.col("o_number"), F.lit(0)) > 0
    number = (
        F.when(F.col("grouped"), F.coalesce("g_number", F.lit(0)))
        .otherwise(F.coalesce("o_number", F.lit(0)))
        .cast("long")
    )
    # grouped: Timestamp/LogLevel from the LAST matching line; non-grouped:
    # LogLevel from the FIRST match substring, Timestamp from the LAST
    # (analyzeLog.go:285,299); "" when the issue never matched
    timestamp = F.when(
        F.col("grouped"),
        F.when(F.col("last_line").isNotNull(), ts_of(F.col("last_line"))).otherwise(F.lit("")),
    ).otherwise(F.when(has_other, ts_of(F.col("last_match"))).otherwise(F.lit("")))
    log_level = F.when(
        F.col("grouped"),
        F.when(F.col("last_line").isNotNull(), lvl_of(F.col("last_line"))).otherwise(F.lit("")),
    ).otherwise(F.when(has_other, lvl_of(F.col("first_match"))).otherwise(F.lit("")))
    # grouped fields exist even with zero matches (analyzeLog.go:222-231
    # runs unconditionally); non-grouped fields only when matches exist
    # (analyzeLog.go:280-303)
    fields_col = F.when(F.col("grouped"), fields_expr).otherwise(
        F.when(has_other, fields_expr).otherwise(empty_map)
    )
    return j.select(
        "source",
        "issue",
        F.col("priority").cast("int").alias("priority"),
        number.alias("number"),
        timestamp.alias("timestamp"),
        log_level.alias("log_level"),
        fields_col.alias("fields"),
    ).orderBy("source", F.desc("priority"), F.asc("issue"))
