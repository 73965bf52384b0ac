"""Deduplication operators for a large-scale training-data pipeline:
exact, n-gram Jaccard (exact baseline), MinHash+LSH (scale path), SimHash,
and embedding-cosine near-dup.

Scale design: the exact pairwise queries are CORRECTNESS BASELINES (oracle-
checkable, O(n²) — run at small sf only); the production path at 10^12 rows
is MinHash+LSH (shingle → minhash signature → band → bucket join →
candidate verify), which shuffles only O(n·bands) rows and verifies only
bucket-colliding candidates. All hashing is JVM-side and deterministic
(murmur3 `F.hash` / `F.xxhash64`) — no per-row Python anywhere, SimHash
included (explode + codegen'd bit-vote aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_log_parser_spark.operators.logquery import QuerySpec, _docs

JACCARD_NUM = 6  # threshold 0.6 as integer ratio (no float hash risk)
JACCARD_DEN = 10
MINHASH_PERMS = 32
LSH_BANDS = 8  # 8 bands × 4 rows
COSINE_THRESHOLD = 0.45


def shingles_col(text_col: str = "text"):
    """Distinct 3-word shingles of a document — identical construction to
    the DuckDB oracle (split on single space, windows of 3, dedup)."""
    ws = F.split(F.col(text_col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ws, i + 1),
                F.element_at(ws, i + 2),
                F.element_at(ws, i + 3),
            ),
        )
    )


_SHINGLE_SQL = (
    "list_distinct(list_transform(range(1, len(string_split(text,' '))-1), "
    "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] "
    "|| ' ' || string_split(text,' ')[i+2]))"
)


# --- exact dedup: hash-groupBy on content -----------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: every doc mapped to the keeper (min doc_id) of its
    identical-text group, with the group size. One hash-partitioned groupBy;
    at 10^12 rows this is the standard first pass (group on a content hash,
    not the text, to keep shuffle rows narrow — semantics identical)."""
    docs = _docs(spark, sf_dir)
    groups = docs.groupBy("text").agg(
        F.min("doc_id").cast("long").alias("keeper_id"),
        F.count("*").cast("long").alias("group_size"),
    )
    return (
        docs.join(groups, "text", "inner")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "keeper_id",
            "group_size",
            (F.col("doc_id") != F.col("keeper_id")).alias("is_duplicate"),
        )
    )


Q_DEDUP_EXACT_SQL = """
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, g.keeper_id, g.group_size,
       d.doc_id <> g.keeper_id AS is_duplicate
FROM documents d JOIN (
  SELECT text, CAST(min(doc_id) AS BIGINT) AS keeper_id, CAST(count(*) AS BIGINT) AS group_size
  FROM documents GROUP BY text
) g USING (text)
"""


# --- n-gram Jaccard: exact pairwise baseline --------------------------------
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs at threshold 0.6, expressed as
    integer intersection/union sizes (i*10 >= 6*u). O(n²) baseline — the
    oracle for the LSH scale path below."""
    docs = _docs(spark, sf_dir).filter(F.size(F.split("text", " ")) >= 3)
    sh = docs.select(F.col("doc_id").cast("long").alias("doc_id"), shingles_col().alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    uni = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        pairs.select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            inter.cast("long").alias("inter"),
            uni.cast("long").alias("uni"),
        )
        .filter(F.col("inter") * JACCARD_DEN >= JACCARD_NUM * F.col("uni"))
    )


Q_DEDUP_NGRAM_JACCARD_SQL = f"""
WITH docs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_SHINGLE_SQL} AS sh
  FROM documents WHERE len(string_split(text,' ')) >= 3
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * {JACCARD_DEN}
      >= {JACCARD_NUM} * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
"""


# --- MinHash + LSH: the scale path ------------------------------------------
def minhash_signatures(sh: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, sh array) → (doc_id, sig array<int>). One explode + one
    groupBy; the hash family is murmur3 seeded by the permutation index —
    all JVM-side."""
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    aggs = [
        F.min(F.hash("shingle", F.lit(i))).alias(f"h{i}") for i in range(perms)
    ]
    wide = exploded.groupBy("doc_id").agg(*aggs)
    return wide.select("doc_id", F.array(*[f"h{i}" for i in range(perms)]).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Band the signature, bucket-join within (band_idx, band_hash).
    The shuffle is O(n·bands); only colliding candidates are verified."""
    rows_per_band = MINHASH_PERMS // bands
    band_entries = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.hash(*[
                    F.element_at("sig", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ])
                for b in range(bands)
            ])
        ).alias("band_idx", "band_hash"),
    )
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .dropDuplicates()
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: candidates from band-bucket collisions,
    verified by exact shingle Jaccard — same output contract as the exact
    baseline (rows-only driver check; pytest asserts equality with the
    exact pairs at this threshold)."""
    docs = _docs(spark, sf_dir).filter(F.size(F.split("text", " ")) >= 3)
    sh = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), shingles_col().alias("sh")
    ).persist()
    sigs = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sigs)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    verified = cand.join(a, "a_id").join(b, "b_id")
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    uni = F.size("a_sh") + F.size("b_sh") - inter
    return verified.select(
        "a_id", "b_id",
        inter.cast("long").alias("inter"),
        uni.cast("long").alias("uni"),
    ).filter(F.col("inter") * JACCARD_DEN >= JACCARD_NUM * F.col("uni"))


# --- SimHash -----------------------------------------------------------------
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """63-bit SimHash fingerprints (doc_id, simhash), computed ENTIRELY
    JVM-side: explode distinct 3-word shingles → `xxhash64` per shingle →
    per-bit ±1 majority vote as 63 codegen'd sum aggregates → reassemble
    the winning bits. No Python anywhere (the previous per-row
    hashlib.blake2b loop violated the no-per-row-Python contract and was
    the plan's only Python hot path). Shuffle rows are (doc_id, 63 longs)
    after map-side partial aggregation — narrow and skew-free.

    Near-dup candidates are low-Hamming pairs; pytest verifies planted
    near-dups land within Hamming ≤ 12 while random pairs stay far."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    sh = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", F.explode(shingles_col()).alias("shingle")
    )
    h = F.xxhash64("shingle")
    votes = sh.select(
        "doc_id",
        *[
            F.when(h.bitwiseAND(F.lit(1 << b).cast("long")) != 0, 1)
            .otherwise(-1)
            .alias(f"b{b}")
            for b in range(63)
        ],
    )
    per_doc = votes.groupBy("doc_id").agg(
        *[F.sum(f"b{b}").alias(f"v{b}") for b in range(63)]
    )
    sim = per_doc.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for b in range(63)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    # docs with <3 words carry fingerprint 0 (no shingles to vote)
    return docs.select("doc_id").join(sim, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")
    )


# --- embedding-cosine near-dup ----------------------------------------------
def _norm_col(col):
    return F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.45), exact pairwise over the
    normalized vectors. Scale path: LSH-bucket by random hyperplane signs or
    IVF-block (see similarity.py); this exact form is the oracle baseline."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        _norm_col(F.col("embedding")).alias("nrm"),
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= COSINE_THRESHOLD)
    )


Q_DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH emb AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
             p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))) / (a.nrm*b.nrm), 6) AS cos
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))) / (a.nrm*b.nrm), 6) >= {COSINE_THRESHOLD}
"""


SPECS: list[QuerySpec] = [
    QuerySpec("dedup_exact", "exact dedup via hash-groupBy",
              q_dedup_exact, Q_DEDUP_EXACT_SQL),
    QuerySpec("dedup_ngram_jaccard", "3-gram Jaccard exact pair baseline",
              q_dedup_ngram_jaccard, Q_DEDUP_NGRAM_JACCARD_SQL),
    QuerySpec("dedup_minhash_lsh", "MinHash+LSH scale path (rows-only)",
              q_dedup_minhash_lsh, None),
    QuerySpec("dedup_simhash", "SimHash fingerprints (rows-only)",
              q_dedup_simhash, None),
    QuerySpec("dedup_embedding_cosine", "embedding cosine near-dup pairs",
              q_dedup_embedding_cosine, Q_DEDUP_EMBEDDING_COSINE_SQL),
]
