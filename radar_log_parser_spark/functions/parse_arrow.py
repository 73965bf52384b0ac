"""Arrow-native parse/match batch: the hot path of stage 1.

All heavy work runs in Arrow C++ kernels backed by RE2 — the SAME regex
engine as the reference's Go ``regexp`` (golden dialect parity for free):

  decode     list_flatten → take(vocab) → binary_join        (zero Python)
  match      match_substring_regex / count_substring_regex    (RE2)
  extract    extract_regex (first match, named groups,        (RE2)
             non-participating group → "" like Go)

Python touches only HIT rows (building the per-row match lists) — on real
logs a few percent of rows — so per-row Python cost scales with matches,
not input size. Output is the flat per-issue-column schema of
functions/schema.py (no map columns: 3× cheaper to materialize and prune).
The pandas implementation in parse.py is the portability fallback.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from radar_log_parser_spark.config import (
    LOG_LEVELS,
    LOG_LEVELS_MAP,
    LOG_LEVELS_RGX,
    ConfigSpec,
    severity_pattern,
)
from radar_log_parser_spark.functions.fieldex import extract_field_columns, field_plan
from radar_log_parser_spark.functions.schema import parsed_arrow_schema


class ArrowCompiledConfig:
    """Pattern strings for RE2 kernels + Python-compiled fallbacks for the
    hit-row detail work. Built once per executor process."""

    def __init__(self, cfg: ConfigSpec):
        self.procs = sorted(cfg.specific_process.items())
        self.events = sorted(cfg.important_events.items())
        # Python fallbacks compile with re.ASCII so the hit-row detail work
        # agrees with the RE2 kernels that selected the hits: RE2 (and Go,
        # Java, DuckDB) treat \d/\w/\b as ASCII-only; Python's Unicode
        # default would extract MORE matches than RE2 flagged on non-ASCII
        # content (ADVICE r3)
        self.ngrp = sorted(
            (n, s.regex, re.compile(s.regex, re.ASCII))
            for n, s in cfg.issues.items()
            if not s.grouped and s.regex
        )
        self.grp = []
        for n, s in sorted(cfg.issues.items()):
            if not s.grouped or not s.grouping:
                continue
            c = re.compile(s.grouping, re.ASCII)
            # pyarrow extract_regex needs every group named; Go SubexpNames
            # allows unnamed → those fall back to Python re on hit rows only
            all_named = len(c.groupindex) == c.groups
            self.grp.append((n, s.grouping, c, all_named))
        self.sev: dict[str, dict] = {}
        for platform, levels in LOG_LEVELS.items():
            rgx = LOG_LEVELS_RGX[platform]
            letters = {LOG_LEVELS_MAP[platform][lv]: lv for lv in levels}
            if rgx["start"] == "" and rgx["end"] == "":
                # bare-letter platform (quirk Q8): literal char counts
                self.sev[platform] = {"mode": "count", "letters": letters}
            else:
                combined = (
                    rgx["start"] + "(?P<lvl>[" + "".join(sorted(letters)) + "])" + rgx["end"]
                )
                self.sev[platform] = {
                    "mode": "extract",
                    "pattern": combined,
                    "letters": letters,
                    "per_level": {lv: severity_pattern(platform, lv) for lv in levels},
                }


# keyed by id(cfg) but the entry RETAINS cfg: without the reference, a GC'd
# config's address could be reused by a different config on a long-lived
# worker, silently serving stale compiled patterns
_COMPILED: dict[int, tuple[ConfigSpec, ArrowCompiledConfig]] = {}


def compiled(cfg: ConfigSpec) -> ArrowCompiledConfig:
    ent = _COMPILED.get(id(cfg))
    if ent is None or ent[0] is not cfg:
        ent = (cfg, ArrowCompiledConfig(cfg))
        _COMPILED[id(cfg)] = ent
    return ent[1]


def decode_tokens(tokens: pa.Array, vocab_pa: pa.Array) -> pa.Array:
    """list<int32> → string, entirely in Arrow C++."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    lengths = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    flat = pc.list_flatten(tokens)
    words = pc.take(vocab_pa, flat)
    lists = pa.ListArray.from_arrays(pa.array(offsets), words)
    return pc.binary_join(lists, " ")


def _name_masks(text: pa.Array, patterns) -> dict[str, np.ndarray]:
    return {
        name: pc.match_substring_regex(text, pat).to_numpy(zero_copy_only=False)
        for name, pat in patterns
    }


def _lists_from_masks(masks: dict[str, np.ndarray], patterns, n: int) -> pa.Array:
    out: list[list[str]] = [[] for _ in range(n)]
    for name, _pat in patterns:
        for i in np.flatnonzero(masks[name]):
            out[i].append(name)
    return pa.array(out, pa.list_(pa.string()))


def _name_lists(text: pa.Array, patterns, n: int) -> pa.Array:
    return _lists_from_masks(_name_masks(text, patterns), patterns, n)


def _list_array(counts: np.ndarray, values: list, value_type) -> pa.Array:
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, value_type))


def match_batch_arrow(batch: pa.RecordBatch, cfg: ConfigSpec, vocab_pa: pa.Array) -> pa.RecordBatch:
    cc = compiled(cfg)
    n = batch.num_rows
    doc_id = batch.column(batch.schema.get_field_index("doc_id"))
    source = batch.column(batch.schema.get_field_index("source"))
    tokens = batch.column(batch.schema.get_field_index("tokens"))
    n_tok = batch.column(batch.schema.get_field_index("n_tok"))

    text = decode_tokens(tokens, vocab_pa)
    # digits after the LAST '-' (ingest writes {line:06d}, which grows past 6
    # digits beyond 1M lines/file — a fixed {6} here silently truncated the
    # ordinal and corrupted every order-sensitive aggregate; parity with the
    # pandas path's rsplit("-", 1))
    line_no = pc.extract_regex(doc_id, r"-(?P<ln>\d+)$").field(0).cast(pa.int64())

    txt_np: np.ndarray | None = None  # materialized lazily, only if hits exist

    def texts() -> np.ndarray:
        nonlocal txt_np
        if txt_np is None:
            txt_np = text.to_numpy(zero_copy_only=False)
        return txt_np

    # proc hit masks are retained: the per-line field extraction below
    # reuses them as eligibility prefilters for grouped-issue pairs
    proc_masks = _name_masks(text, cc.procs)
    cols: list[pa.Array] = [
        doc_id, source, line_no, tokens, n_tok, text,
        _lists_from_masks(proc_masks, cc.procs, n),
        _name_lists(text, cc.events, n),
    ]

    # severity, platform(=source)-dependent → parallel (levels, counts)
    sev_counts = np.zeros(n, dtype=np.int64)
    sev_vals: list[list] = [[] for _ in range(n)]  # (level, count) per row
    src_np = source.to_numpy(zero_copy_only=False)
    for platform in sorted({p for p in np.unique(src_np) if p in cc.sev}):
        conf = cc.sev[platform]
        on_plat = src_np == platform
        if conf["mode"] == "extract":
            ext = pc.extract_regex(text, conf["pattern"])
            valid = ext.is_valid().to_numpy(zero_copy_only=False)
            letters = ext.field(0).to_numpy(zero_copy_only=False)
            lmap = conf["letters"]
            for i in np.flatnonzero(valid & on_plat):
                sev_vals[i].append((lmap[letters[i]], 1))
                sev_counts[i] += 1
        else:
            for letter, lv in sorted(conf["letters"].items()):
                counts = pc.count_substring(text, letter).to_numpy(zero_copy_only=False)
                for i in np.flatnonzero((counts > 0) & on_plat):
                    sev_vals[i].append((lv, int(counts[i])))
                    sev_counts[i] += 1
    flat_levels = [lv for row in sev_vals for lv, _ in row]
    flat_counts = [c for row in sev_vals for _, c in row]
    cols.append(_list_array(sev_counts, flat_levels, pa.string()))
    cols.append(_list_array(sev_counts, flat_counts, pa.int32()))

    # non-grouped issues: RE2 prefilter; Python finditer on hit rows only
    # (FindAllString semantics: ALL match substrings per row, in order).
    # counts+values retained per issue: the field extraction below scans
    # these exact substrings as its non-grouped subjects
    ngrp_matches: dict[str, tuple[np.ndarray, list[str]]] = {}
    for iname, pat, crgx in cc.ngrp:
        counts = np.zeros(n, dtype=np.int64)
        values: list[str] = []
        hits = pc.match_substring_regex(text, pat).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(hits)
        if len(idx):
            tn = texts()
            for i in idx:
                ms = [m.group(0) for m in crgx.finditer(tn[i])]
                counts[i] = len(ms)
                values.extend(ms)
        ngrp_matches[iname] = (counts, values)
        cols.append(_list_array(counts, values, pa.string()))

    # grouped issues: first-match capture tuple per row (Go
    # FindStringSubmatch); Arrow extract_regex when all groups are named
    for iname, pat, crgx, all_named in cc.grp:
        counts = np.zeros(n, dtype=np.int64)
        values: list[str] = []
        if all_named:
            ext = pc.extract_regex(text, pat)
            valid = ext.is_valid().to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(valid)
            if len(idx):
                fields = [
                    ext.field(g).to_numpy(zero_copy_only=False)
                    for g in range(crgx.groups)
                ]
                counts[idx] = crgx.groups
                for i in idx:
                    values.extend(f[i] for f in fields)
        else:
            hits = pc.match_substring_regex(text, pat).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(hits)
            if len(idx):
                tn = texts()
                for i in idx:
                    m = crgx.search(tn[i])
                    if m is None:
                        continue
                    counts[i] = crgx.groups
                    values.extend(g if g is not None else "" for g in m.groups())
        cols.append(_list_array(counts, values, pa.string()))

    # per-line field hits (A4/F5) — extracted HERE, in the embarrassingly-
    # parallel pass, instead of per scoped subject row inside the fan-out
    # window (see functions/fieldex.py for the rationale and semantics)
    cols.extend(
        extract_field_columns(field_plan(cfg), n, text, texts, proc_masks, ngrp_matches)
    )

    return pa.RecordBatch.from_arrays(cols, schema=parsed_arrow_schema(cfg))
