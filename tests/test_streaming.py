"""Streaming ingest parity: the same parse plan over a file stream yields
the same severity rollup as the batch path; the stream checkpoint makes a
second AvailableNow run a no-op (offsets carried across restarts)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_available_now_matches_batch(spark, cfg, vocab, fx, tmp_path):
    import shutil

    from radar_log_parser_spark.functions.parse import parse_stage
    from radar_log_parser_spark.streaming.ingest import run_available_now

    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    shutil.copy(fx.logs_path, stream_dir / "part-00000.parquet")

    got = run_available_now(
        spark, str(stream_dir), cfg, vocab,
        checkpoint_dir=str(tmp_path / "ckpt"), query_name="sev_test",
    )
    stream_rows = sorted(
        (r["source"], r["level"], r["n_matches"]) for r in got.collect()
    )

    parsed = parse_stage(spark.read.parquet(fx.logs_path), cfg, vocab)
    batch = (
        parsed.select(
            "source", F.explode(F.arrays_zip("sev_levels", "sev_counts")).alias("s")
        )
        .select("source", F.col("s.sev_levels").alias("level"), F.col("s.sev_counts").alias("n"))
        .groupBy("source", "level")
        .agg(F.sum("n").alias("n_matches"))
    )
    batch_rows = sorted(
        (r["source"], r["level"], r["n_matches"]) for r in batch.collect()
    )
    assert stream_rows == batch_rows
