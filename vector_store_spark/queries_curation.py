"""Curation-pipeline registry entries: the end-to-end pretraining-data pass
(exact dedup → quality gate → language ID) over the documents table, with the
whole pipeline re-derived in oracle SQL.

Like dedup_exact, the corpus is unioned with a simulated re-ingestion (every
7th doc with shifted ids) so the dedup stage has real work to do. Aggregates
are integers or min/max of per-row rounded doubles — both order-insensitive,
so Spark/DuckDB agree bit-exactly regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.operators.curation import curate
from vector_store_spark.queries_text import _PRED, _SCORES, _STOP_LIST, _TOKS_KEEP_STOP
from vector_store_spark.registry import ROUND, load, register

_KEPT_CTES = f"""
WITH all_docs AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, source, text FROM documents WHERE doc_id % 7 = 0
),
uniq AS (
  SELECT doc_id, source, text FROM (
    SELECT *, min(doc_id) OVER (
      PARTITION BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
    ) AS keep_id
    FROM all_docs
  ) WHERE doc_id = keep_id
),
t AS (
  SELECT doc_id, source, text, {_TOKS_KEEP_STOP} AS toks,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM uniq
), f AS (
  SELECT doc_id, source, text, n_chars,
    CAST(len(toks) AS DOUBLE) AS n_tokens,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) / n_chars ELSE 0.0 END AS alpha_ratio,
    CASE WHEN n_chars > 0 THEN (n_chars - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) / n_chars ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> list_contains([{_STOP_LIST}], t))) AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
    CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS uniq_token_ratio
  FROM t
), s AS (
  SELECT doc_id, source, text, n_tokens,
    round(greatest(least(
      0.3 * least(n_tokens / 50.0, 1.0) + 0.25 * alpha_ratio
      + 0.2 * least(stopword_ratio * 4.0, 1.0) + 0.25 * uniq_token_ratio
      - 0.5 * punct_ratio, 1.0), 0.0), {ROUND}) AS quality_score
  FROM f
), kept AS (
  SELECT * FROM s WHERE n_tokens >= 20 AND n_tokens <= 1000 AND quality_score >= 0.5
), lng AS (
  SELECT doc_id, {_SCORES} FROM kept
), pred AS (
  SELECT doc_id, {_PRED} AS pred_lang FROM lng
)
"""


def _curated(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    reingested = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(200000)
    )
    return curate(
        docs.unionByName(reingested), "doc_id", "text",
        extra_cols=("source",), min_tokens=20, max_tokens=1000, min_quality=0.5,
    )


@register(
    "curation_summary",
    _KEPT_CTES + f"""
SELECT p.pred_lang, k.source, count(*) AS n_docs,
       CAST(sum(CAST(k.n_tokens AS BIGINT)) AS BIGINT) AS sum_tokens,
       round(min(k.quality_score), {ROUND}) AS min_quality,
       round(max(k.quality_score), {ROUND}) AS max_quality
FROM kept k JOIN pred p USING (doc_id)
GROUP BY p.pred_lang, k.source
""",
    "End-to-end curation pass: dedup -> quality gate -> language ID, per-(lang, source) stats",
)
def curation_summary(spark, sf_dir):
    cur = _curated(spark, sf_dir)
    return cur.groupBy("pred_lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
        F.round(F.min("quality_score"), ROUND).alias("min_quality"),
        F.round(F.max("quality_score"), ROUND).alias("max_quality"),
    )


@register(
    "curation_kept_topk",
    _KEPT_CTES + """
SELECT k.doc_id, k.source, p.pred_lang, k.quality_score,
       CAST(k.n_tokens AS BIGINT) AS n_tokens
FROM kept k JOIN pred p USING (doc_id)
ORDER BY k.quality_score DESC, k.doc_id
LIMIT 50
""",
    "Highest-quality kept documents (deterministic order: score desc, id asc)",
)
def curation_kept_topk(spark, sf_dir):
    cur = _curated(spark, sf_dir)
    return (
        cur.select(
            "doc_id", "source", "pred_lang", "quality_score",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy(F.desc("quality_score"), "doc_id")
        .limit(50)
    )
