"""Data-mixing registry entries: deterministic hash sampling and per-language
token-budget selection over the curated corpus — the selection step that turns
a curated pool into a training mix, oracle-gated end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.operators.sampling import hash_bucket_sql, hash_sample, token_budget_take
from vector_store_spark.queries_curation import _KEPT_CTES, _curated
from vector_store_spark.registry import load, register

_RATE = 250  # permille
_BUDGET = 25_000  # tokens per language


@register(
    "mix_hash_sample",
    f"""
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {hash_bucket_sql("doc_id")} < {_RATE}
GROUP BY source
""",
    "Deterministic ~25% Bernoulli sample (multiplicative hash on id): "
    "reproducible under any partitioning, pure narrow filter",
)
def mix_hash_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        hash_sample(docs, "doc_id", _RATE)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


@register(
    "mix_token_budget",
    _KEPT_CTES + f""", j AS (
  SELECT k.doc_id, k.n_tokens, k.quality_score, p.pred_lang
  FROM kept k JOIN pred p USING (doc_id)
), r AS (
  SELECT *, CAST(sum(CAST(n_tokens AS BIGINT)) OVER (
    PARTITION BY pred_lang ORDER BY quality_score DESC, doc_id
    ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS running_total
  FROM j
)
SELECT pred_lang, count(*) AS n_docs,
       CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS sum_tokens,
       max(running_total) AS max_running
FROM r
WHERE running_total - CAST(n_tokens AS BIGINT) < {_BUDGET}
GROUP BY pred_lang
""",
    f"Per-language token budget ({_BUDGET}): best-quality-first greedy take "
    "via one running-sum window over the curated pool",
)
def mix_token_budget(spark, sf_dir):
    # narrow projection BEFORE the two-pass operator: its internal cache then
    # materializes 4 columns, not the full curated row (text included), and
    # both passes stay column-pruned
    cur = (
        _curated(spark, sf_dir)
        .withColumn("tok", F.col("n_tokens").cast("long"))
        .select("doc_id", "pred_lang", "quality_score", "tok")
    )
    took = token_budget_take(
        cur, "pred_lang", "quality_score", "doc_id", "tok", _BUDGET,
    )
    return took.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("sum_tokens"),
        F.max("running_total").alias("max_running"),
    )


_SPLIT = f"""CASE WHEN {hash_bucket_sql("doc_id")} < 800 THEN 'train'
             WHEN {hash_bucket_sql("doc_id")} < 900 THEN 'val'
             ELSE 'test' END"""


@register(
    "mix_train_val_test",
    f"""
SELECT source, {_SPLIT} AS split, count(*) AS n_docs
FROM documents
GROUP BY source, {_SPLIT}
""",
    "Deterministic 80/10/10 train/val/test split from the same hash buckets: "
    "a document never migrates between splits across runs or partitionings",
)
def mix_train_val_test(spark, sf_dir):
    from vector_store_spark.operators.sampling import hash_bucket

    docs = load(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    split = (
        F.when(b < 800, "train").when(b < 900, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


_CAP = 20


@register(
    "mix_source_cap",
    f"""
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY source
    ORDER BY {hash_bucket_sql("doc_id", 100000)} DESC, doc_id
  ) AS rn
  FROM documents
)
WHERE rn <= {_CAP}
GROUP BY source
""",
    f"Per-source cap ({_CAP} docs, pseudorandom hash order): domain balancing "
    "via the histogram-threshold machinery - no whole-group window, "
    "reproducible under any partitioning",
)
def mix_source_cap(spark, sf_dir):
    from vector_store_spark.operators.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", "doc_id", _CAP)
    return capped.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


_SEQ_LEN = 2048


@register(
    "mix_pack_sequences",
    f"""
WITH o AS (
  SELECT doc_id, n_chars,
         CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars AS BIGINT) AS off
  FROM documents
),
p AS (
  SELECT doc_id, off,
         CAST(floor(off / {_SEQ_LEN}) AS BIGINT) AS seq_id,
         CAST(floor((off + n_chars - 1) / {_SEQ_LEN}) AS BIGINT) AS seq_end_id
  FROM o
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(seq_end_id) + 1 AS BIGINT) AS n_sequences,
       CAST(sum(CASE WHEN seq_end_id <> seq_id THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
       CAST(max(off) AS BIGINT) AS last_offset
FROM p
""",
    f"Concat-and-chunk sequence packing ({_SEQ_LEN}-token windows): global "
    "token offsets via distributed prefix-scan (per-id-range bucket sums -> "
    "driver cumsum -> per-bucket windows), never a whole-table window",
)
def mix_pack_sequences(spark, sf_dir):
    from vector_store_spark.operators.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_sequences(docs, "doc_id", "n_chars", _SEQ_LEN, bucket_size=100)
    return packed.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.max("seq_end_id") + 1).cast("long").alias("n_sequences"),
        F.sum(F.when(F.col("spans_boundary"), 1).otherwise(0)).cast("long").alias("n_boundary_docs"),
        F.max("offset").cast("long").alias("last_offset"),
    )


@register(
    "mix_global_shuffle",
    # total order on the multiplicative-hash key, id tie-break — the first
    # 15 docs of the deterministic training order, re-derived in SQL
    f"""
SELECT doc_id, source, CAST({hash_bucket_sql("doc_id", 100_003)} AS BIGINT) AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id LIMIT 15
""",
    "Deterministic global shuffle (training order): total sort on a "
    "multiplicative-hash key of the id — reproducible under any input "
    "partitioning, salt-per-epoch for fresh orders; at scale a "
    "range-partitioned sort producing ordered non-overlapping files",
)
def mix_global_shuffle(spark, sf_dir):
    from vector_store_spark.operators.sampling import global_shuffle

    docs = load(spark, sf_dir, "documents")
    out = global_shuffle(docs, "doc_id")
    return out.select(
        "doc_id", "source", F.col("shuffle_key").cast("long").alias("shuffle_key")
    ).limit(15)
