"""Generate an sf1.0-LIKE measurement fixture under .bench_cache/sf1like.

The driver's round-end bench escalated to a driver-generated sf=1.0 dir
(BENCH_r05.json: documents ~10x sf0.1, events ~10x, embeddings ~10x) that
we cannot read back. For optimization we need a local stand-in at that
scale, statistically similar to the sf0.1 tables we DO have:

- documents: 50,000 rows; text = sf0.1 pool row (i % 5000), with ~20% of
  words swapped (seeded RNG, corpus vocabulary) for non-first copies so
  exact-dup groups stay rare but shingle/near-dup structure survives.
- embeddings: 20,000 rows; vector = sf0.1 vector (i % 2000) + N(0, 0.05)
  per-dim noise (seeded) — keeps the cluster/near-dup structure that
  drives LSH bucket skew.
- events: 1,000,000 rows; sf0.1 tiled 10x with offset ids and shifted ts.

Files are written as ONE row group each, mirroring the driver layout
(sf0.1 files are single-row-group), so scan parallelism pathologies
reproduce. MEASUREMENT ONLY — never used by bench.py or the oracle gate.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".bench_cache", "sf1like")


def gen_documents(mult: int = 10) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    n = len(texts)
    vocab = sorted({w for s in texts[:2000] for w in s.split(" ")})
    rng = random.Random(0xF1BE)
    out_text, out_lang, out_src = [], [], []
    for i in range(n * mult):
        b = i % n
        s = texts[b]
        if i >= n:  # mutate copies so exact dups stay rare
            ws = s.split(" ")
            k = max(1, len(ws) // 5)
            for _ in range(k):
                ws[rng.randrange(len(ws))] = vocab[rng.randrange(len(vocab))]
            s = " ".join(ws)
        out_text.append(s)
        out_lang.append(langs[b])
        out_src.append(sources[b])
    tbl = pa.table({
        "doc_id": pa.array(range(n * mult), pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array([len(s) for s in out_text], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet", row_group_size=len(tbl))


def gen_embeddings(mult: int = 10) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = t.column("label").to_pylist()
    n, d = emb.shape
    rng = np.random.default_rng(0xE1BE)
    tiled = np.tile(emb, (mult, 1))
    noise = rng.normal(0.0, 0.05, size=tiled.shape).astype(np.float32)
    noise[:n] = 0.0  # first copy exact
    tiled = tiled + noise
    tbl = pa.table({
        "vec_id": pa.array(range(n * mult), pa.int64()),
        "embedding": pa.array(tiled.tolist(), pa.list_(pa.float32())),
        "label": pa.array(labels * mult, pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet", row_group_size=len(tbl))


def gen_events(mult: int = 10) -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    ids = np.asarray(t.column("event_id"))
    ts = t.column("ts")
    parts = []
    for k in range(mult):
        parts.append(pa.table({
            "event_id": pa.array(ids + k * n, pa.int64()),
            "ts": ts,
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "value": t.column("value"),
            "props": t.column("props"),
        }))
    tbl = pa.concat_tables(parts)
    pq.write_table(tbl, f"{OUT}/events.parquet", row_group_size=tbl.num_rows)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    marker = os.path.join(OUT, "_COMPLETE")
    if os.path.exists(marker) and "--force" not in sys.argv:
        print(f"exists: {OUT}")
        return
    gen_documents()
    gen_embeddings()
    gen_events()
    with open(marker, "w") as f:
        f.write("v1")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
