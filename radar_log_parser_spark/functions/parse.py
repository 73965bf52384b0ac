"""Stage 1 — decode + match-all-patterns in ONE vectorized Arrow pass.

This is THE core performance idea (SURVEY.md §4): the reference rescans the
full log once per configured pattern (reference: analyzeLog.go:136,
details.go:173, mitigated only by goroutines); we evaluate the entire
compiled config against each Arrow batch in a single ``mapInPandas`` pass,
so the 100 TB input is read and decoded exactly once, embarrassingly
parallel, no shuffle.

Everything downstream of this stage is pure DataFrame API (joins, groupBys,
min_by/max_by) — no per-row Python (BASELINE.json input_hint).

Output row = input row + derived columns:
  line_no   global ordinal within source, parsed from doc_id
  text      decoded line
  procs     SpecificProcess names whose pattern matches the line   (F1)
  events    ImportantEvents names whose pattern matches the line   (F9)
  ngrp      non-grouped issue → all match substrings, in order     (F3)
  grp       grouped issue → [key, detail...] of first match        (F4)
  sev       severity level → match count within the line           (F8)

Severity is platform(=source)-dependent (reference: details.go:13-19), so
the batch is sub-grouped by source for that column only.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radar_log_parser_spark.codec import Vocab
from radar_log_parser_spark.config import (
    LOG_LEVELS,
    ConfigSpec,
    severity_pattern,
)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("procs", T.ArrayType(T.StringType()), False),
        T.StructField("events", T.ArrayType(T.StringType()), False),
        T.StructField("ngrp", T.MapType(T.StringType(), T.ArrayType(T.StringType())), False),
        T.StructField("grp", T.MapType(T.StringType(), T.ArrayType(T.StringType())), False),
        T.StructField("sev", T.MapType(T.StringType(), T.IntegerType()), False),
    ]
)


class CompiledConfig:
    """All config patterns compiled once per executor process."""

    def __init__(self, cfg: ConfigSpec):
        self.procs = {name: re.compile(rgx) for name, rgx in cfg.specific_process.items()}
        self.events = {name: re.compile(rgx) for name, rgx in cfg.important_events.items()}
        self.ngrp = {
            name: re.compile(spec.regex)
            for name, spec in cfg.issues.items()
            if not spec.grouped and spec.regex
        }
        self.grp = {
            name: re.compile(spec.grouping)
            for name, spec in cfg.issues.items()
            if spec.grouped and spec.grouping
        }
        self.sev = {
            platform: {
                level: re.compile(severity_pattern(platform, level))
                for level in LOG_LEVELS[platform]
            }
            for platform in LOG_LEVELS
        }


_COMPILED: dict[int, CompiledConfig] = {}


def _compiled(cfg: ConfigSpec) -> CompiledConfig:
    key = id(cfg)
    cc = _COMPILED.get(key)
    if cc is None:
        cc = CompiledConfig(cfg)
        _COMPILED[key] = cc
    return cc


def _decode_batch(tokens: pd.Series, vocab_arr: np.ndarray) -> pd.Series:
    """Vectorized decode: np fancy-index per row + C-level join."""
    out = np.empty(len(tokens), dtype=object)
    join = " ".join
    for i, arr in enumerate(tokens.values):
        out[i] = join(vocab_arr[np.asarray(arr, dtype=np.int64)])
    return pd.Series(out, index=tokens.index)


def _match_batch(pdf: pd.DataFrame, cfg: ConfigSpec, vocab_arr: np.ndarray) -> pd.DataFrame:
    cc = _compiled(cfg)
    text = _decode_batch(pdf["tokens"], vocab_arr)
    st = text.str  # pandas vectorized str accessor (C loop over Python re)

    def names_arrays(compiled: dict[str, re.Pattern]) -> list[list[str]]:
        cols = {name: st.contains(rgx, regex=True).to_numpy() for name, rgx in compiled.items()}
        out: list[list[str]] = [[] for _ in range(len(text))]
        for name in sorted(cols):
            hits = cols[name]
            for i in np.flatnonzero(hits):
                out[i].append(name)
        return out

    procs = names_arrays(cc.procs)
    events = names_arrays(cc.events)

    ngrp: list[dict[str, list[str]]] = [{} for _ in range(len(text))]
    for iname, rgx in sorted(cc.ngrp.items()):
        found = st.findall(rgx)
        for i, lst in enumerate(found.values):
            if lst:
                # findall with groups returns tuples; reference wants the
                # FULL match string (FindAllString). Re-run finditer only on
                # hit rows when the pattern has groups.
                if rgx.groups:
                    ngrp[i][iname] = [m.group(0) for m in rgx.finditer(text.values[i])]
                else:
                    ngrp[i][iname] = list(lst)

    grp: list[dict[str, list[str]]] = [{} for _ in range(len(text))]
    for iname, rgx in sorted(cc.grp.items()):
        if rgx.groups < 2:  # can never satisfy the >2-submatch gate (go:238)
            continue
        ext = st.extract(rgx, expand=True)  # first match, one col per group
        hit = ext.notna().any(axis=1).to_numpy()
        vals = ext.to_numpy(dtype=object)
        for i in np.flatnonzero(hit):
            row = vals[i]
            grp[i][iname] = ["" if v is None or v != v else str(v) for v in row]

    sev: list[dict[str, int]] = [{} for _ in range(len(text))]
    src = pdf["source"].to_numpy()
    for platform in np.unique(src):
        tables = cc.sev.get(platform)
        if not tables:
            continue
        idx = np.flatnonzero(src == platform)
        sub = text.iloc[idx]
        for level, rgx in tables.items():
            counts = sub.str.count(rgx).to_numpy()
            for j, n in zip(idx, counts):
                if n:
                    sev[j][level] = int(n)

    line_no = (
        pdf["doc_id"].str.rsplit("-", n=1).str[-1].astype(np.int64)
    )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "line_no": line_no,
            "tokens": pdf["tokens"],
            "n_tok": pdf["n_tok"],
            "text": text,
            "procs": procs,
            "events": events,
            "ngrp": ngrp,
            "grp": grp,
            "sev": sev,
        }
    )


def parse_stage(df: DataFrame, cfg: ConfigSpec, vocab: Vocab, impl: str = "arrow") -> DataFrame:
    """input table (doc_id, tokens, n_tok, source) → PARSED_SCHEMA.

    impl="arrow" (default): mapInArrow with RE2 C++ kernels — the hot path
    (see functions/parse_arrow.py; RE2 is also the reference's Go regexp
    engine, so dialect parity is exact).
    impl="pandas": the pandas/Python-re implementation (portability
    fallback and A/B baseline for bench).

    The vocabulary ships to executors once as a Spark broadcast
    (SURVEY.md §7: decode must not join against a vocab table).
    """
    sc = df.sparkSession.sparkContext
    if impl == "arrow":
        import pyarrow as pa

        from radar_log_parser_spark.functions.parse_arrow import match_batch_arrow

        vocab_pa_b = sc.broadcast(list(vocab.id_to_token))

        def run_arrow(batches):
            varr = pa.array(vocab_pa_b.value, pa.string())
            for batch in batches:
                if batch.num_rows:
                    yield match_batch_arrow(batch, cfg, varr)

        return df.mapInArrow(run_arrow, schema=PARSED_SCHEMA)

    vocab_b = sc.broadcast(np.array(vocab.id_to_token, dtype=object))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = vocab_b.value
        for pdf in batches:
            if len(pdf):
                yield _match_batch(pdf, cfg, arr)

    return df.mapInPandas(run, schema=PARSED_SCHEMA)


def grouped_detail_struct(issue_grp_col: Any, n_groups: int):
    """Split the grp array [key, d1, d2, ...] into (group_key, details)."""
    key = F.element_at(issue_grp_col, 1)
    details = F.slice(issue_grp_col, 2, n_groups - 1) if n_groups > 1 else F.array()
    return key, details
