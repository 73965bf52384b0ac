#!/usr/bin/env python
"""Single-process profile of the Arrow parse kernel (no Spark).

Builds one Arrow batch from the bench fixture pool and cProfiles
match_batch_arrow over it, so the per-row Python loops (severity lists,
name lists, field extraction) are attributable line-by-line without any
cluster noise. Run on an otherwise-idle box; this is a RELATIVE profile
(shares of parse wall), not a throughput claim.
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyarrow as pa

from radar_log_parser_spark.codec import Vocab
from radar_log_parser_spark.config import load_config
from radar_log_parser_spark.functions.parse_arrow import match_batch_arrow
from radar_log_parser_spark.sources.fixtures import (
    BENCH_CONFIG_YAML,
    generate_corpus,
    corpus_to_table,
)

N_POOL = 20_000
REPEAT = 10  # profile over ~200k rows


def main() -> None:
    corpus = generate_corpus(n_rows=N_POOL, seed=3)
    all_lines = [ln for lines in corpus.values() for ln in lines]
    vocab = Vocab.build(all_lines)
    table = corpus_to_table(corpus, vocab)
    batch = table.combine_chunks().to_batches()[0]
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(BENCH_CONFIG_YAML)
    cfg = load_config(f.name)
    vocab_pa = pa.array(list(vocab.id_to_token), pa.string())

    match_batch_arrow(batch, cfg, vocab_pa)  # warm compile caches

    t0 = time.monotonic()
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(REPEAT):
        match_batch_arrow(batch, cfg, vocab_pa)
    pr.disable()
    wall = time.monotonic() - t0
    rows = batch.num_rows * REPEAT
    print(f"rows={rows} wall={wall:.2f}s rows/s={rows / wall:,.0f}")
    stats = pstats.Stats(pr)
    stats.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
