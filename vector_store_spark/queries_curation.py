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
from vector_store_spark.operators.textstats import quality_score_int_expr
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
    {quality_score_int_expr(intdiv="//")} AS quality_score
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


from vector_store_spark.queries_text import quality_score_sql  # noqa: E402


@register(
    "curation_quantile_gate",
    # per-language median-quality gate: keep docs at or above their OWN
    # language's median quality. The oracle computes the threshold the
    # straightforward way (rank window over the corpus); the engine computes
    # the same value from a (lang, score) HISTOGRAM with a histogram-sized
    # cumulative window — identical by construction (tie order within a
    # score cannot move the score at a rank), corpus-window-free at scale.
    f"""
WITH q AS ({quality_score_sql()}),
j AS (SELECT d.doc_id, d.lang, q.q FROM documents d JOIN q USING (doc_id)),
r AS (
  SELECT lang, q,
         row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM j
),
thr AS (SELECT lang, q AS median_q FROM r WHERE rn = (n + 1) // 2)
SELECT j.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN j.q >= t.median_q THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       t.median_q
FROM j JOIN thr t USING (lang)
GROUP BY j.lang, t.median_q
""",
    "Per-language quality-quantile gate: keep docs >= their language's "
    "median text_quality score; threshold from a histogram cumulative "
    "(no corpus-wide rank window), gate as a broadcast threshold join",
)
def curation_quantile_gate(spark, sf_dir):
    from vector_store_spark.operators.curation import quantile_thresholds
    from vector_store_spark.operators.textstats import quality_features

    docs = load(spark, sf_dir, "documents")
    # per-doc quality ⋈ per-doc lang is fact-fact on doc_id: shuffle-hash
    scored = quality_features(docs, "doc_id", "text").select(
        "doc_id", F.round("quality_score", ROUND).alias("q")
    ).join(docs.select("doc_id", "lang").hint("SHUFFLE_HASH"), "doc_id")
    thr = quantile_thresholds(scored, "lang", "q")  # (lang, n_docs, threshold)
    gated = scored.join(
        F.broadcast(thr.select("lang", F.col("threshold").alias("median_q"))),
        "lang",
    )
    return gated.groupBy("lang", "median_q").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("q") >= F.col("median_q"), 1).otherwise(0))
        .cast("long").alias("n_kept"),
    ).select("lang", "n_docs", "n_kept", "median_q")


def _ingest_internal_plan(spark, sf_dir):
    """Internal-plan probe: the entry eager-localizes (source-count-sized
    collect so the PERMISSIVE-scan cache is released per call) — expose the
    parse/quarantine/rollup pipeline lazily for the suite-wide plan bans."""
    import os
    import tempfile

    from vector_store_spark.sources.ingest import read_jsonl_quarantine

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    js = docs.select(
        F.to_json(F.struct("doc_id", "text", "source")).alias("line"),
        "doc_id",
    )
    dirty = js.select(
        F.when(
            F.col("doc_id") % 13 == 0,
            F.expr("substring(line, 1, length(line) - 5)"),
        ).otherwise(F.col("line")).alias("value")
    )
    root = tempfile.mkdtemp(prefix="ingest_probe_")
    src = os.path.join(root, "corpus")
    dirty.write.mode("overwrite").text(src)
    parsed, quarantined, handle = read_jsonl_quarantine(
        spark, src, "doc_id bigint, text string, source string"
    )
    per_source = parsed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.length("text")).cast("long").alias("chars"),
    )
    qrow = quarantined.agg(
        F.lit("_quarantined").alias("source"),
        F.count("*").cast("long").alias("n_rows"),
        F.lit(-1).cast("long").alias("chars"),
    )
    result = per_source.unionByName(qrow)
    # the probe only captures the plan; release the scan cache immediately
    handle.unpersist()
    return result


@register(
    "ingest_jsonl_quarantine",
    # the fixture plants a deterministic defect: every 13th doc's JSON line
    # is truncated by 5 bytes (always severing the closing quote/brace).
    # PERMISSIVE parsing must keep exactly the well-formed rows and
    # quarantine exactly the planted ones — the oracle re-derives both
    # populations from the doc-id arithmetic.
    """
SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(length(text)) AS BIGINT) AS chars
FROM documents WHERE doc_id % 13 <> 0 GROUP BY source
UNION ALL
SELECT '_quarantined', CAST(count(*) AS BIGINT), CAST(-1 AS BIGINT)
FROM documents WHERE doc_id % 13 = 0
""",
    "Raw-corpus ingestion gate: schema-enforced JSONL read in PERMISSIVE "
    "mode — malformed lines land intact in a quarantine fork (replayable "
    "audit trail) instead of failing the job (FAILFAST) or vanishing "
    "(DROPMALFORMED); per-source parsed volume + quarantine count",
    internal_plan_fn=_ingest_internal_plan,
)
def ingest_jsonl_quarantine(spark, sf_dir):
    import os
    import tempfile

    from vector_store_spark.sources.ingest import read_jsonl_quarantine

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    js = docs.select(
        F.to_json(F.struct("doc_id", "text", "source")).alias("line"),
        "doc_id",
    )
    dirty = js.select(
        F.when(
            F.col("doc_id") % 13 == 0,
            F.expr("substring(line, 1, length(line) - 5)"),
        ).otherwise(F.col("line")).alias("value")
    )
    root = tempfile.mkdtemp(prefix="ingest_jsonl_")
    src = os.path.join(root, "corpus")
    dirty.write.mode("overwrite").text(src)

    parsed, quarantined, handle = read_jsonl_quarantine(
        spark, src, "doc_id bigint, text string, source string"
    )
    per_source = parsed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.length("text")).cast("long").alias("chars"),
    )
    qrow = quarantined.agg(
        F.lit("_quarantined").alias("source"),
        F.count("*").cast("long").alias("n_rows"),
        F.lit(-1).cast("long").alias("chars"),
    )
    result = per_source.unionByName(qrow)
    # source-count-sized: materialize eagerly so the PERMISSIVE-scan cache can
    # be released HERE instead of leaking one entry per call (bench reps call
    # this repeatedly, each against a fresh temp dir)
    rows = result.collect()
    handle.unpersist()
    return spark.createDataFrame(rows, result.schema)
