"""Text-analysis operators for a training-data pipeline: language ID
(keyword n-gram heuristic), quality scoring, token counting (whitespace +
BPE-ish regex), and document fingerprinting (rolling polynomial hash).

All integral outputs; all expressions JVM-side (regexp_extract_all /
aggregate folds) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_log_parser_spark.operators.logquery import QuerySpec, _docs_par

# keyword lists per language for the n-gram scoring heuristic (deterministic
# plumbing — the corpus vocabulary is synthetic, so the lists are arbitrary
# but fixed; argmax with fixed-order tiebreak en > de > es > fr)
LANG_KEYWORDS = {
    "en": r"\b(?:the|a|fast|order)\b",
    "de": r"\b(?:group|window|stream)\b",
    "es": r"\b(?:data|table|vector)\b",
    "fr": r"\b(?:merge|join|filter)\b",
}
STOPWORDS = r"\b(?:the|a)\b"
BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9 ]"
FP_MOD = 1000003
FP_MULT = 31


def _score(rx: str):
    return F.size(F.regexp_extract_all("text", F.lit(rx), 0))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: per-language keyword-hit scores, argmax with a fixed
    tiebreak order. Compared against the table's labeled lang column."""
    docs = _docs_par(spark, sf_dir)
    s = {lg: _score(rx) for lg, rx in LANG_KEYWORDS.items()}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("agrees_label"),
    )


Q_LANG_ID_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, pred_lang, pred_lang = lang AS agrees_label
FROM (
  SELECT doc_id, lang,
    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_es >= s_fr THEN 'es'
         ELSE 'fr' END AS pred_lang
  FROM (
    SELECT doc_id, lang,
      len(regexp_extract_all(text, '\\b(?:the|a|fast|order)\\b')) AS s_en,
      len(regexp_extract_all(text, '\\b(?:group|window|stream)\\b')) AS s_de,
      len(regexp_extract_all(text, '\\b(?:data|table|vector)\\b')) AS s_es,
      len(regexp_extract_all(text, '\\b(?:merge|join|filter)\\b')) AS s_fr
    FROM documents
  )
)
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / mean-word-length metrics,
    all integral (basis points and milli-units via integer division) so the
    value hash is exact across engines."""
    docs = _docs_par(spark, sf_dir)
    ws = F.split("text", " ")
    n_words = F.size(ws)
    n_chars = F.length("text")
    n_stop = _score(STOPWORDS)
    stop_bp = (n_stop * 10000).cast("long") / n_words.cast("long")
    mean_wl_milli = ((n_chars - (n_words - 1)) * 1000).cast("long") / n_words.cast("long")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_stop.cast("long").alias("n_stop"),
        F.floor(stop_bp).cast("long").alias("stop_bp"),
        F.floor(mean_wl_milli).cast("long").alias("mean_wl_milli"),
        ((n_words >= 10) & (n_stop * 10 <= n_words * 3)).alias("passes_quality"),
    )


Q_QUALITY_SCORE_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_stop AS BIGINT) AS n_stop,
       CAST((n_stop * 10000) // n_words AS BIGINT) AS stop_bp,
       CAST(((n_chars - (n_words - 1)) * 1000) // n_words AS BIGINT) AS mean_wl_milli,
       n_words >= 10 AND n_stop * 10 <= n_words * 3 AS passes_quality
FROM (
  SELECT doc_id, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words,
         len(regexp_extract_all(text, '\\b(?:the|a)\\b')) AS n_stop
  FROM documents
)
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language: whitespace tokens and a BPE-ish regex
    tokenization, aggregated — the budget accounting every training-data
    pipeline needs."""
    docs = _docs_par(spark, sf_dir)
    return (
        docs.select(
            "lang",
            F.size(F.split("text", " ")).alias("n_ws"),
            F.size(F.regexp_extract_all("text", F.lit(BPE_ISH), 0)).alias("n_bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_ws").cast("long").alias("ws_tokens"),
            F.sum("n_bpe").cast("long").alias("bpe_tokens"),
        )
    )


Q_TOKEN_COUNT_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens
FROM documents GROUP BY lang
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling polynomial hash over the word sequence
    (acc = (acc*31 + ascii(w)*7 + len(w)) mod 1000003), folded left-to-right
    with identical integer arithmetic in both engines."""
    docs = _docs_par(spark, sf_dir)
    ws = F.split("text", " ")
    wordvals = F.transform(ws, lambda w: (F.ascii(w) * 7 + F.length(w)).cast("long"))
    fp = F.aggregate(
        wordvals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MULT + x) % FP_MOD,
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        fp.alias("fingerprint"),
    )


Q_DOC_FINGERPRINT_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          w -> CAST(ascii(w)*7 + length(w) AS BIGINT))),
         (acc, x) -> (acc * {FP_MULT} + x) % {FP_MOD}
       ) AS fingerprint
FROM documents
"""


SPECS: list[QuerySpec] = [
    QuerySpec("lang_id", "keyword-heuristic language ID", q_lang_id, Q_LANG_ID_SQL),
    QuerySpec("quality_score", "integral quality metrics", q_quality_score, Q_QUALITY_SCORE_SQL),
    QuerySpec("token_count", "whitespace + BPE-ish token accounting", q_token_count, Q_TOKEN_COUNT_SQL),
    QuerySpec("doc_fingerprint", "rolling-hash fingerprint", q_doc_fingerprint, Q_DOC_FINGERPRINT_SQL),
]
