"""Raw-log ingestion: .txt / .gz log files → the tokenized input table.

Covers the reference's source operators (SURVEY.md §2.1): S1 text source,
S2 gzip source (Spark reads .gz text natively — non-splittable, one task
per gz file, exactly like the reference's streaming gunzip at
extractFiles.go:103-115), S3 format gate (.txt/.gz only,
extractFiles.go:100-102).

A user of the reference uploads a raw log + picks a bucket(=platform);
here: `ingest_text_logs(spark, path, source=...)` produces the
(doc_id, tokens, n_tok, source) table the engine runs on, plus the vocab.

Line ordinals: the reference's line number is the line's position in the
file (strings.Split order). Spark's text source yields rows in file order
within each file; zipWithIndex over (one file at a time) preserves it.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from radar_log_parser_spark.codec import Vocab

_ALLOWED_EXT = (".txt", ".gz")


def _format_gate(path: str) -> None:
    ext = os.path.splitext(path)[1]
    if ext not in _ALLOWED_EXT:
        # reference: "Invalid Format" (extractFiles.go:101)
        raise ValueError(f"Invalid Format: {path!r} — only .txt and .gz accepted")


# Log-token vocabularies are template-bounded (format strings × small value
# alphabets), but open-domain text is NOT — refuse to collect an unbounded
# set to the driver instead of silently OOM-ing at scale.
MAX_VOCAB = 5_000_000


def build_vocab(lines_df: DataFrame) -> Vocab:
    """Corpus vocabulary: sorted distinct whitespace tokens (+ chars).
    One distinct-aggregation pass; guarded by a distinct-count so the
    driver collect fails LOUDLY if the corpus isn't vocabulary-bounded."""
    distinct = lines_df.select(F.explode(F.split("value", " ")).alias("w")).distinct()
    n = distinct.count()
    if n > MAX_VOCAB:
        raise ValueError(
            f"corpus has {n:,} distinct tokens (> {MAX_VOCAB:,}): not a "
            "template-bounded log vocabulary — supply a pre-built vocab "
            "(e.g. a trained tokenizer's) instead of collecting one"
        )
    words = [r["w"] for r in distinct.collect()]
    chars = sorted({c for w in words for c in w})
    all_tokens = sorted(set(words) | set(chars))
    return Vocab({t: i for i, t in enumerate(all_tokens)}, tuple(all_tokens))


def ingest_text_logs(
    spark: SparkSession,
    path: str,
    source: str,
    vocab: Vocab | None = None,
    file_no: int = 0,
) -> tuple[DataFrame, Vocab]:
    """One log file (.txt or .gz) → input-table rows for `source`.

    Returns (df, vocab) where df has exactly the input_hint schema and
    doc_id encodes the file-order line ordinal."""
    _format_gate(path)
    lines = spark.read.text(path)
    if vocab is None:
        vocab = build_vocab(lines)

    vocab_b = spark.sparkContext.broadcast(vocab.token_to_id)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
            T.StructField("n_tok", T.IntegerType(), False),
            T.StructField("source", T.StringType(), False),
        ]
    )

    # file-order ordinal (the reference's strings.Split index)
    rdd = lines.rdd.map(lambda r: r["value"]).zipWithIndex()
    ordered = spark.createDataFrame(rdd, "value string, line_no long")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t2i = vocab_b.value

        def enc(text: str) -> list[int]:
            out: list[int] = []
            for w in text.split(" "):
                tid = t2i.get(w)
                if tid is not None:
                    out.append(tid)
                    continue
                # char fallback — but FAIL FAST on a char the vocab lacks:
                # silently dropping it would mangle the decoded text and
                # defeat downstream regex matching (codec round-trip claim)
                try:
                    out.extend(t2i[c] for c in w)
                except KeyError as e:
                    raise ValueError(
                        f"token {w!r} contains char {e.args[0]!r} absent "
                        "from the supplied vocab — extend the vocab or "
                        "rebuild it from this corpus (vocab reuse across "
                        "unrelated files is not round-trippable)"
                    ) from None
            return out

        for pdf in batches:
            if not len(pdf):
                continue
            toks = [enc(v) for v in pdf["value"].values]
            yield pd.DataFrame(
                {
                    "doc_id": [
                        f"{source}-{file_no:04d}-{int(n):06d}" for n in pdf["line_no"].values
                    ],
                    "tokens": toks,
                    "n_tok": [len(t) for t in toks],
                    "source": source,
                }
            )

    return ordered.mapInPandas(encode, schema=out_schema), vocab
