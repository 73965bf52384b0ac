"""Round-2 regression tests: high-ordinal line_no parity, F10 typed
capture-group columns, vocab-content checkpoint invalidation, the Iceberg
write path gate, and the compiled-config cache under id reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _has_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_line_no_beyond_1m_parity(spark, cfg, vocab):
    """Ordinals past 10^6 overflow the {line:06d} format to 7 digits; both
    parse impls must read the FULL trailing number (the Arrow path used to
    keep only the last 6 digits — silent corruption of every order-
    sensitive aggregate exactly at target scale)."""
    from radar_log_parser_spark.functions.parse import parse_stage

    line = "06-15 14:23:07.123 1234 5678 E CameraService: Connection timeout after 3000 ms code=17"
    toks = vocab.encode(line)
    ordinals = [0, 999_999, 1_000_000, 12_345_678]
    rows = [
        (f"my-android-bucket-{i:06d}", toks, len(toks), "my-android-bucket")
        for i in ordinals
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    for impl in ("arrow", "pandas"):
        got = sorted(
            r["line_no"] for r in parse_stage(df, cfg, vocab, impl=impl).collect()
        )
        assert got == sorted(ordinals), impl


def test_grouped_sink_typed_group_columns(pipeline_result, cfg):
    """F10: every named capture group of a grouped issue appears as a typed
    g_<Name> column in the grouped sink (reference renders named groups as
    report columns, analyzeLog.go:201-203 / details.html:101-108)."""
    sink = pipeline_result.sinks["grouped_routed"]
    expected = set()
    for spec in cfg.issues.values():
        if spec.grouped:
            expected |= {f"g_{n}" for n in spec.group_names() if n}
    assert expected, "fixture config should have named groups"
    assert expected <= set(sink.columns)

    # value parity: group 1 == group_key, groups 2.. == details positions
    for iname, spec in cfg.issues.items():
        if not spec.grouped:
            continue
        names = spec.group_names()
        rows = sink.filter(F.col("issue") == iname).limit(20).collect()
        for r in rows:
            seq = [r["group_key"], *r["details"]]
            for gi in range(1, len(names)):
                if names[gi]:
                    assert r[f"g_{names[gi]}"] == seq[gi - 1]


def test_vocab_content_change_invalidates_checkpoint(spark, cfg, vocab, fx, tmp_path):
    """A vocab of identical SIZE but different content must not resume:
    decoded text changes everywhere (the fingerprint used to hash only
    len(vocab))."""
    from radar_log_parser_spark.codec import Vocab
    from radar_log_parser_spark.plans.pipeline import Pipeline

    work = str(tmp_path / "ckpt_vocab")
    Pipeline(spark, cfg, vocab, fx.logs_path, work_dir=work, checkpoint=True).run()

    toks = list(vocab.id_to_token)
    toks[0], toks[1] = toks[1], toks[0]  # same size, different content
    vocab2 = Vocab({t: i for i, t in enumerate(toks)}, tuple(toks))
    r2 = Pipeline(
        spark, cfg, vocab2, fx.logs_path, work_dir=work, checkpoint=True
    ).run()
    assert all(not m.resumed for m in r2.metrics)


def test_iceberg_gate_fails_fast_without_jar(spark, tmp_path):
    """fmt='iceberg' without the runtime jar must raise at construction —
    never silently write parquet."""
    from radar_log_parser_spark.plans.pipeline import Checkpointer

    if _has_iceberg(spark):
        pytest.skip("iceberg jar present — gate test not applicable")
    with pytest.raises(RuntimeError, match="iceberg"):
        Checkpointer(spark, str(tmp_path / "ice"), fmt="iceberg")


def test_iceberg_write_path(spark, cfg, vocab, fx, tmp_path):
    """With the runtime jar on the classpath the full pipeline checkpoints
    through Iceberg tables (bucket(N, doc_id) partitioning) and resumes."""
    if not _has_iceberg(spark):
        pytest.skip("iceberg-spark runtime jar not on classpath in this sandbox")
    from radar_log_parser_spark.plans.pipeline import Pipeline

    work = str(tmp_path / "ice_ckpt")
    p1 = Pipeline(
        spark, cfg, vocab, fx.logs_path, work_dir=work, checkpoint=True,
        fmt="iceberg",
    )
    r1 = p1.run()
    assert all(not m.resumed for m in r1.metrics)
    assert spark.read.table("rlps_ckpt.stages.parsed").count() > 0
    r2 = Pipeline(
        spark, cfg, vocab, fx.logs_path, work_dir=work, checkpoint=True,
        fmt="iceberg",
    ).run()
    assert any(m.resumed for m in r2.metrics)


def test_salted_repartition_balances_hot_source(spark):
    """One source holding 90% of rows must not serialize a stage write:
    after salted repartition the max/mean rows per non-empty partition
    stays < 4× (north rule: salted repartition for source-skewed shards)."""
    from radar_log_parser_spark.plans.pipeline import salted_repartition

    n = 40_000
    df = spark.range(n).select(
        F.concat(F.lit("src-"), F.col("id").cast("string")).alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("cold"), F.col("id") % 7)).alias("source"),
    )
    plain = df.repartition(16, F.col("source"))
    salted = salted_repartition(df, "source", 16)

    def partition_rows(d):
        return [
            r["cnt"]
            for r in d.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").agg(F.count("*").alias("cnt")).collect()
        ]

    plain_rows = partition_rows(plain)
    assert max(plain_rows) > 0.8 * n  # the skew exists without salting
    salted_rows = partition_rows(salted)
    mean = sum(salted_rows) / len(salted_rows)
    assert max(salted_rows) < 4 * mean
    assert sum(salted_rows) == n  # no rows lost


def test_compiled_cache_keyed_by_identity(cfg):
    """The per-worker compiled-config cache must not serve a stale entry
    when a different config lands on a reused id() address."""
    import dataclasses

    from radar_log_parser_spark.functions import parse_arrow

    cc1 = parse_arrow.compiled(cfg)
    cfg2 = dataclasses.replace(cfg, important_events={"X": "xyzzy"})
    # force the same-address scenario artificially: poison the cache slot
    parse_arrow._COMPILED[id(cfg2)] = (cfg, cc1)
    cc2 = parse_arrow.compiled(cfg2)
    assert cc2 is not cc1
    assert dict(cc2.events) == {"X": "xyzzy"}
