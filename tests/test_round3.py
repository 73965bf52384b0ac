"""Round-3 additions: config lints (process-count bound, important-event
auto-anchoring), the driver-side summary scale guard, and the md5-family
MinHash+LSH variant (the cross-engine oracle-checkable scale path)."""

from __future__ import annotations

import pytest

from radar_log_parser_spark.config import ConfigError, parse_config

SF_DIR = "/root/testdata/sf0.001"


def test_lint_rejects_1024_processes():
    """aggregates._ord packs proc_rank into 10 bits — an issue with >=1024
    processes must fail at config load, not as ARITHMETIC_OVERFLOW
    mid-aggregate (ADVICE r2)."""
    raw = {
        "Issues": {
            "X": {
                "specific_process": {f"p{i}": f"p{i}" for i in range(1024)},
            }
        }
    }
    with pytest.raises(ConfigError, match="1023"):
        parse_config(raw)
    raw["Issues"]["X"]["specific_process"] = {
        f"p{i}": f"p{i}" for i in range(1023)
    }
    parse_config(raw)  # exactly 1023 is fine


def test_important_events_auto_anchor():
    """Unanchored ImportantEvents patterns are upstream-valid (they just
    report line 0 there); we auto-wrap to full-line form instead of
    rejecting (ADVICE r2 compat item), with a warning."""
    with pytest.warns(UserWarning, match="auto-wrapping"):
        cfg = parse_config({"ImportantEvents": {"E": r"boot failure"}})
    assert cfg.important_events["E"] == r"(?m)^.*(?:boot failure).*$"
    # already-anchored patterns pass through untouched, no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cfg = parse_config({"ImportantEvents": {"E": r"(?m)^boot.*$"}})
    assert cfg.important_events["E"] == r"(?m)^boot.*$"


def test_summary_assembly_guard(spark):
    """Driver-side summary assembly must fail loudly past the documented
    sources x issues bound instead of OOMing the driver."""
    from radar_log_parser_spark.operators.aggregates import assemble_summary

    cfg = parse_config(
        {"Issues": {f"i{k}": {"specific_process": {"p": "p"}} for k in range(100)}}
    )
    with pytest.raises(ValueError, match="1e6"):
        assemble_summary(
            spark, cfg, [f"s{j}" for j in range(20_000)], [], [], []
        )


def test_lsh_md5_equals_exact_pairs(spark):
    """The md5-hash-family LSH (full cross-engine oracle) must return the
    same verified pair set as the exact Jaccard baseline at threshold 0.6 —
    same property the murmur3 production path satisfies."""
    from radar_log_parser_spark.operators import dedup

    exact = {
        (r["a_id"], r["b_id"])
        for r in dedup.q_dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    md5lsh = {
        (r["a_id"], r["b_id"])
        for r in dedup.q_dedup_minhash_lsh_md5(spark, SF_DIR).collect()
    }
    assert exact
    assert md5lsh == exact
