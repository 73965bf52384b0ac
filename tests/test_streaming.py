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


def test_windowed_stream_matches_batch_finalized(spark, tmp_path):
    """Watermarked tumbling-window rollup over the events stream: append
    mode must emit exactly the FINALIZED windows (window end ≤ final
    watermark = max event time - 30 min), each with values identical to the
    batch q_window_rollup operator; windows still open at end-of-input are
    withheld — the lateness contract, not a loss."""
    import shutil

    from pyspark.sql import functions as F

    from radar_log_parser_spark.operators.logquery import q_window_rollup
    from radar_log_parser_spark.streaming.ingest import run_windowed_available_now

    sf_dir = "/root/testdata/sf0.001"
    stream_dir = tmp_path / "events_in"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-00000.parquet")

    got = run_windowed_available_now(
        spark, str(stream_dir), checkpoint_dir=str(tmp_path / "wckpt"),
        query_name="win_test",
    )
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
        for r in got.collect()
    }

    batch = q_window_rollup(spark, sf_dir).collect()
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
        for r in batch
    }
    max_ts = spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        F.max("ts")
    ).collect()[0][0]

    import datetime

    finalized = {
        k: v
        for k, v in batch_rows.items()
        if k[0] + datetime.timedelta(hours=1)
        <= max_ts - datetime.timedelta(minutes=30)
    }
    assert finalized, "fixture must contain at least one finalized window"
    assert stream_rows == finalized
