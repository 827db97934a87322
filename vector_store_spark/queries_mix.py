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
    # cache_input: the upstream is the full curation pipeline (dedup +
    # tokenize + langid Arrow passes) and the projection above is already
    # narrow — exactly the documented case where caching the 4-column input
    # beats re-running the pipeline for the operator's second pass
    took = token_budget_take(
        cur, "pred_lang", "quality_score", "doc_id", "tok", _BUDGET,
        cache_input=True,
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


_TEMP_BUDGET = 500_000  # target kept chars across all sources


@register(
    "mix_temperature_sample",
    # temperature-weighted source mixing (sample source s ∝ n_s^(1/2)):
    # the oracle re-derives the integer-arithmetic rate pipeline — floor-
    # sqrt weights, BIGINT sums, truncating division — so both engines
    # compute the exact same ppm thresholds and therefore the same kept set
    f"""
WITH mass AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n FROM documents GROUP BY source
),
w AS (
  SELECT source, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE) * 1000000.0)) AS BIGINT) AS wgt
  FROM mass
),
z AS (SELECT CAST(sum(wgt) AS BIGINT) AS zz FROM w),
r AS (
  SELECT source, n,
         least(CAST(1000000 AS BIGINT),
               (((CAST({_TEMP_BUDGET} AS BIGINT) * wgt) // zz) * 1000000) // n)
           AS rate_ppm
  FROM w CROSS JOIN z
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_kept,
       max(r.rate_ppm) AS rate_ppm
FROM documents d JOIN r USING (source)
WHERE {hash_bucket_sql("d.doc_id", 1_000_000)} < r.rate_ppm
GROUP BY d.source
""",
    "Temperature-weighted source mixing (keep rate ∝ mass^(1/2)/mass): "
    "low-resource sources up-weighted, heavy sources capped, expected kept "
    "mass = the budget. One dimension-sized aggregate derives per-source "
    "ppm rates in pure integer arithmetic; the kept set is a broadcast-"
    "rates narrow filter over the fact scan — no fact shuffle",
)
def mix_temperature_sample(spark, sf_dir):
    from vector_store_spark.operators.sampling import temperature_sample

    docs = load(spark, sf_dir, "documents")
    kept = temperature_sample(docs, "source", "doc_id", "n_chars", _TEMP_BUDGET)
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
        F.max("rate_ppm").alias("rate_ppm"),
    )


@register(
    "mix_epoch_repeat",
    # upsampling-by-repetition: per-source targets = 3x its mass for light
    # sources (src0..src4), 0.4x for the rest — the oracle re-derives the
    # integer plan (full copies + partial-copy ppm) and the expansion with
    # generate_series, so both engines emit the identical multiset
    f"""
WITH mass AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n FROM documents GROUP BY source
),
tgt AS (
  SELECT source, n,
         CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN n * 3 ELSE (n * 2) // 5 END AS target
  FROM mass
),
plan AS (
  SELECT source, n, target // n AS full_copies,
         ((target % n) * 1000000) // n AS frac_ppm
  FROM tgt
),
expanded AS (
  SELECT d.source, d.doc_id, d.n_chars, gs.copy_id
  FROM documents d
  JOIN plan p USING (source)
  CROSS JOIN LATERAL (SELECT unnest(range(0, p.full_copies + 1)) AS copy_id) gs
  WHERE gs.copy_id < p.full_copies
     OR {hash_bucket_sql("d.doc_id", 1_000_000)} < p.frac_ppm
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS chars_emitted,
       CAST(max(copy_id) AS BIGINT) AS max_copy
FROM expanded GROUP BY source
""",
    "Upsampling by repetition (epochs-per-source, the published-LLM-mixture "
    "shape): integer plan = full copies + a hash-sampled partial copy per "
    "source; plan broadcast, expansion a narrow explode over the fact scan "
    "— emitted mass tracks each source's target",
)
def mix_epoch_repeat(spark, sf_dir):
    from vector_store_spark.operators.sampling import epoch_repeat

    docs = load(spark, sf_dir, "documents")
    light = {f"src{i}" for i in range(5)}
    targets = (
        docs.groupBy("source")
        .agg(F.sum(F.col("n_chars").cast("long")).alias("_mass"))
        .select(
            "source",
            F.when(F.col("source").isin(*light), F.col("_mass") * 3)
            .otherwise(F.expr("(_mass * 2) div 5")).cast("long").alias("target"),
        )
    )
    out = epoch_repeat(docs, "source", "doc_id", "n_chars", targets)
    return out.groupBy("source").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("chars_emitted"),
        F.max("copy_id").cast("long").alias("max_copy"),
    )


@register(
    "mix_export_shards",
    # shard manifest + spot-checked row placement: the manifest is the
    # loader-facing contract (rows + token mass per shard); the first row
    # of each shard pins the within-shard ordering
    f"""
WITH tagged AS (
  SELECT doc_id, n_chars, CAST({hash_bucket_sql("doc_id", 8)} AS INT) AS shard
  FROM documents
),
manifest AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS total_weight,
         min(doc_id) AS min_id, max(doc_id) AS max_id
  FROM tagged GROUP BY shard
),
first_rows AS (
  SELECT shard, doc_id AS first_doc_id FROM (
    SELECT shard, doc_id, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
    FROM tagged
  ) WHERE rn = 1
)
SELECT m.shard, m.n_rows, m.total_weight, m.min_id, m.max_id, f.first_doc_id
FROM manifest m JOIN first_rows f USING (shard)
""",
    "Deterministic training-export sharding: hash-bucket shard assignment "
    "(reproducible under any partitioning) + 0-based within-shard write "
    "order + the shard manifest (rows, token mass, id range) a training "
    "loader plans epochs from",
)
def mix_export_shards(spark, sf_dir):
    from vector_store_spark.operators.sampling import export_shards

    docs = load(spark, sf_dir, "documents")
    rows, manifest = export_shards(docs, "doc_id", "n_chars", n_shards=8)
    first = rows.where(F.col("pos") == 0).select(
        "shard", F.col("doc_id").alias("first_doc_id")
    )
    return manifest.join(F.broadcast(first), "shard")
