"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k (exact baseline) and an IVF-partitioned variant
(the scale path: route each query to a few centroid cells instead of
scanning all 10^12 vectors).

Vector math stays JVM-side: `F.zip_with` dot products folded with
`F.aggregate` — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from radar_log_parser_spark.operators.dedup import _dot, _norm_col
from radar_log_parser_spark.operators.logquery import QuerySpec, _read_par

TOP_K = 5
N_QUERIES = 8  # vec_id < 8 are the query set
IVF_K = 64  # FIXED centroid count — the broadcast is O(K), never O(n)
IVF_PROBES = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # layout-adaptive fan-out BEFORE the per-vector math: the dot/norm
    # folds are per-row expensive, and a low-row-group source would run
    # them on one scan task (see logquery._read_par)
    return _read_par(spark, f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        _norm_col(F.col("embedding")).alias("nrm"),
    )


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) query set against the
    full vector table, rank per query by cosine desc with vec_id tiebreak.
    Output is integral (query_id, rank, neighbor_id) — no float columns."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"), "embedding", "nrm"
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))
    scored = (
        cand.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id")
    )


Q_ANN_TOPK_SQL = f"""
WITH emb AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.embedding, c.embedding),
           p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))) / (q.nrm*c.nrm) AS cos
  FROM emb q JOIN emb c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def _seed_hash(col):
    """Deterministic uniform sample key, computable bit-identically in
    DuckDB (`('0x'||substr(md5(vec_id::VARCHAR),1,15))::BIGINT`) — the same
    cross-engine md5 family as the dedup operators, which is what gives the
    IVF query a full oracle row (r3: rows-only)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def ivf_centroids(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """K deterministic centroid seeds: the k vectors with the smallest
    md5-hash of vec_id — a uniform hash-sample whose size is FIXED at k no
    matter the table size (the previous every-Nth-vector seeding made the
    centroid set O(n): an unbounded broadcast and an n×n/N assignment
    join). orderBy+limit compiles to TakeOrderedAndProject: one scan with
    per-partition top-k, k rows to the driver."""
    # this window ranks exactly k (=64) rows — bounded by the limit(k)
    # above, never by table size. The partition key pmod(vec_id, 1) is
    # constant-valued but NOT constant-foldable, so WindowExec sees a real
    # partition spec instead of warning about an undefined one (r3's
    # partitionBy(lit(0)) was folded away — verified; the warning stayed)
    return (
        emb.orderBy(_seed_hash(F.col("vec_id")), F.asc("vec_id"))
        .limit(k)
        .select(
            F.row_number()
            .over(
                W.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
                    _seed_hash(F.col("vec_id")), F.asc("vec_id")
                )
            )
            .cast("long")
            .alias("cell"),
            F.col("embedding").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    )


def ivf_assignments(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine) via a
    broadcast join + max_by argmax — no window, so no sort shuffle: the
    n×K scored rows collapse to one row per vector in the map-side partial
    aggregation (scored rows for a vector never leave its partition). At
    scale the output is written partitioned by cell so probes touch only
    matching files.

    Reference form (kept as the correctness twin for pytest): the
    production query uses `_ivf_assign_factory` — the interpreted n×K
    `_dot` folds with the embedding payload riding every scored row were
    the dominant cost of the IVF query (2.2 s of its 1.6-2.2 s wall at
    the 20k-vector scale; guide §4.2)."""
    cos = _dot(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm"))
    scored = emb.join(F.broadcast(centroids)).select(
        "vec_id", "embedding", "nrm", "cell", cos.alias("cos")
    )
    return scored.groupBy("vec_id").agg(
        # argmax by cosine, deterministic min-cell tiebreak
        F.max_by("cell", F.struct(F.col("cos"), (-F.col("cell")).alias("nc"))).alias("cell"),
        F.first("embedding").alias("embedding"),
        F.first("nrm").alias("nrm"),
    )


def _ivf_assign_factory(cent_bc):
    """Vectorized nearest-centroid assignment (mapInArrow, guide §4.2):
    one kernel call scores a whole batch against the K-row broadcast
    centroid matrix and emits (vec_id, cell, embedding, nrm) — the
    embedding column passes through the kernel untouched (original
    float32 values), so no re-attach join is needed downstream.

    Bit-identity with `ivf_assignments` (same argument as the dedup
    kernels): the batch-vs-centroid dots accumulate
    `acc + E[:, i] ⊗ C[:, i]` dimension by dimension — the exact
    left-fold order of `_dot`'s F.aggregate — the vector norms fold the
    same way as `_norm_col` before one correctly-rounded sqrt, and the
    centroid norms are the COLLECTED c_nrm doubles the JVM fold already
    computed. The argmax tiebreak is preserved exactly: `max_by(cell,
    struct(cos, -cell))` picks max cos then MIN cell among exact-double
    ties; the centroid columns are ordered by cell ascending, and
    np.argmax returns the FIRST maximal column — the same min-cell
    winner (ties only occur on bit-equal cosines, which both sides
    compute identically)."""
    def _assign(it):
        import numpy as np
        import pyarrow as pa

        cells, C, cn = cent_bc.value  # cell-ascending; C: (K, d) float64
        for batch in it:
            vid = batch.column("vec_id")
            n = len(vid)
            E = (
                batch.column("embedding")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, C.shape[1])
                .astype(np.float64)
            )
            en = np.zeros(n, dtype=np.float64)
            acc = np.zeros((n, C.shape[0]), dtype=np.float64)
            for i in range(C.shape[1]):
                en = en + E[:, i] * E[:, i]
                acc = acc + np.multiply.outer(E[:, i], C[:, i])
            en = np.sqrt(en)
            cos = acc / np.multiply.outer(en, cn)
            best = cos.argmax(axis=1)  # first max ⟺ min cell on ties
            yield pa.RecordBatch.from_arrays(
                [vid, pa.array(cells[best]), batch.column("embedding"),
                 pa.array(en)],
                ["vec_id", "cell", "embedding", "nrm"],
            )
    return _assign


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (scale path): K hash-sampled centroid seeds, assign
    vectors to cells, probe the IVF_PROBES nearest cells per query, rank
    within probed candidates. Full DuckDB oracle (the md5 seed family and
    left-fold dot products are bit-identical cross-engine); pytest
    additionally measures recall vs the exact top-k."""
    emb = _emb(spark, sf_dir)
    centroids = ivf_centroids(emb)
    # assignment via the vectorized kernel (see _ivf_assign_factory): the
    # K-row centroid table is collected once (cell-ascending — kernel
    # argmax tiebreak relies on this order) and broadcast; the n×K
    # scoring never exists as Spark rows. `ivf_assignments` is the
    # retained JVM twin pytest pins the kernel against.
    import numpy as np

    crows = centroids.orderBy("cell").toArrow()
    cells = crows.column("cell").to_numpy(zero_copy_only=False)
    dim = len(crows.column("c_emb")[0])
    C = (
        crows.column("c_emb")
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(len(cells), dim)
        .astype(np.float64)
    )
    cn = crows.column("c_nrm").to_numpy(zero_copy_only=False)
    cent_bc = spark.sparkContext.broadcast((cells, C, cn))
    assigned = _read_par(spark, f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    ).mapInArrow(
        _ivf_assign_factory(cent_bc),
        "vec_id long, cell long, embedding array<float>, nrm double",
    )

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    qcos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    qw = W.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cell"))
    probed = (
        queries.join(F.broadcast(centroids))
        .select("query_id", "q_emb", "q_nrm", "cell", qcos.alias("qcos"))
        .withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= IVF_PROBES)
        .drop("rn", "qcos")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))
    cand = probed.join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        ))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id")
    )


_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))"
)
_SEED_SQL = "('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT"

Q_ANN_IVF_SQL = f"""
WITH emb AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
cent AS (
  SELECT row_number() OVER (ORDER BY {_SEED_SQL}, vec_id) AS cell,
         embedding AS c_emb, nrm AS c_nrm
  FROM emb ORDER BY {_SEED_SQL}, vec_id LIMIT {IVF_K}
),
scored AS (
  SELECT e.vec_id, e.embedding, e.nrm, c.cell,
         {_DOT_SQL.format(a='e.embedding', b='c.c_emb')} / (e.nrm * c.c_nrm) AS cos
  FROM emb e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, embedding, nrm, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
  FROM emb WHERE vec_id < {N_QUERIES}
),
probed AS (
  SELECT query_id, q_emb, q_nrm, cell FROM (
    SELECT q.query_id, q.q_emb, q.q_nrm, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             {_DOT_SQL.format(a='q.q_emb', b='c.c_emb')} / (q.q_nrm * c.c_nrm) DESC,
             c.cell ASC) AS rn
    FROM queries q CROSS JOIN cent c
  ) WHERE rn <= {IVF_PROBES}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_DOT_SQL.format(a='p.q_emb', b='a.embedding')} / (p.q_nrm * a.nrm) AS cos
  FROM probed p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {TOP_K}
"""

SPECS: list[QuerySpec] = [
    QuerySpec("ann_topk_cosine", "brute-force cosine top-k baseline",
              q_ann_topk_cosine, Q_ANN_TOPK_SQL),
    QuerySpec("ann_ivf_topk", "IVF-partitioned top-k scale path "
              "(cross-engine md5 seeds, full oracle)",
              q_ann_ivf_topk, Q_ANN_IVF_SQL),
]
