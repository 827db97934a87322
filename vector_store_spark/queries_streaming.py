"""Streaming registry entry — oracle-gated: the pipeline's END STATE is
deterministic (LWW idempotence — order of batches/partitions cannot change
it), so the DuckDB oracle re-derives the same b1+b2 event history with plain
window SQL (arg-max per key by (ts, seq), tombstones win, stale replays
lose) and the driver hash-compares the final live snapshot. This upgrades
the heart-of-the-system W3 algebra (reference table/mod.rs:697-1003) from a
rows-only check to a value-checked one; what stays non-SQL-expressible is
only the *mechanism* (micro-batches, checkpoint resume), which
tests/test_streaming.py exercises.

Drives the REAL pipeline end to end: CDC events derived deterministically
from the documents table → file-source micro-batches → foreachBatch LWW merge
into the bucket-partitioned snapshot (S3–S5, W3), across TWO stream starts
sharing one checkpoint (W8 resume), with stale replays that must lose LWW and
tombstones that must win.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from vector_store_spark.registry import load, register
from vector_store_spark.streaming.cdc import CdcSnapshotSink

_SCHEMA = "op string, pk bigint, v double, f int, ts bigint, seq bigint"


def _await(q):
    q.awaitTermination(300)


#: opt-in per-phase wall-clock attribution: bench points this at a dict
#: before a streaming run; the instrumented queries then record their coarse
#: phases (source prep, each stream start, compaction) so a latency
#: regression is attributable to a phase, not just the end-to-end total.
#: None (the default) keeps the hot path untimed.
PHASE_LOG: dict | None = None


def _mark(name: str, t0: float) -> float:
    """Record ``now - t0`` under ``name`` when PHASE_LOG is armed; returns
    the new phase start either way."""
    now = time.perf_counter()
    if PHASE_LOG is not None:
        PHASE_LOG[name] = round(now - t0, 4)
    return now


@register(
    "stream_cdc_endstate",
    """
WITH base AS (
  SELECT doc_id AS pk, CAST(n_chars AS DOUBLE) AS v,
         CAST(doc_id % 10 AS INT) AS f
  FROM documents WHERE doc_id < 1000
),
events AS (
  SELECT 'upsert' AS op, pk, v, f, CAST(100 AS BIGINT) AS ts, pk AS seq FROM base
  UNION ALL
  SELECT 'upsert', pk, v + 1000.0, f, 200, pk FROM base WHERE pk % 5 = 0
  UNION ALL
  SELECT 'upsert', pk, -1.0, f, 50, pk FROM base WHERE pk % 7 = 0
  UNION ALL
  SELECT 'delete', pk, NULL, NULL, 300, pk + 1000000 FROM base WHERE pk % 11 = 0
),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT pk, v, f FROM latest
WHERE op <> 'delete' AND v IS NOT NULL
ORDER BY pk
""",
    "S3-S5/W2/W3/W8 end-to-end, hash-checked: CDC micro-batches -> LWW "
    "snapshot across a checkpoint resume; the deterministic end state is "
    "re-derived by the oracle's LWW window SQL (stale replays lose, "
    "tombstones win)",
)
def stream_cdc_endstate(spark, sf_dir):
    # deterministic subset: streaming fidelity (LWW/replay/tombstone/resume)
    # is row-count independent, and two stream starts already dominate cost
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").where(
        F.col("doc_id") < 1000
    )
    root = tempfile.mkdtemp(prefix="cdc_q_")
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)

    base = docs.select(
        F.lit("upsert").alias("op"),
        F.col("doc_id").alias("pk"),
        F.col("n_chars").cast("double").alias("v"),
        (F.col("doc_id") % 10).cast("int").alias("f"),
        F.lit(100).cast("bigint").alias("ts"),
        F.col("doc_id").alias("seq"),
    )
    # batch 1: bootstrap (the full-scan stand-in, S1)
    base.write.mode("append").json(os.path.join(src, "b1"))
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v", "f"], num_buckets=8)
    stream = spark.readStream.schema(_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream, checkpoint_dir=ckpt))

    # batch 2 after the first run terminates: real updates (ts=200), stale
    # replays (ts=50, must NOT replace), deletes (ts=300, must win)
    updates = base.where(F.col("pk") % 5 == 0).withColumn(
        "v", F.col("v") + 1000.0
    ).withColumn("ts", F.lit(200).cast("bigint"))
    stale = base.where(F.col("pk") % 7 == 0).withColumn(
        "v", F.lit(-1.0)
    ).withColumn("ts", F.lit(50).cast("bigint"))
    deletes = base.where(F.col("pk") % 11 == 0).select(
        F.lit("delete").alias("op"), "pk",
        F.lit(None).cast("double").alias("v"), F.lit(None).cast("int").alias("f"),
        F.lit(300).cast("bigint").alias("ts"), (F.col("pk") + 1_000_000).alias("seq"),
    )
    updates.unionByName(stale).unionByName(deletes).write.mode("append").json(
        os.path.join(src, "b2")
    )
    # second start, same checkpoint: only b2 is processed (W8 resume)
    stream2 = spark.readStream.schema(_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream2, checkpoint_dir=ckpt))

    return sink.live_view("v").orderBy("pk")


_TTL_SCHEMA = "op string, pk bigint, v double, exp bigint, ts bigint, seq bigint"


@register(
    "stream_cdc_ttl_endstate",
    # TTL expiry (validator cdc.rs:567, 699): LWW as usual, then rows whose
    # latest-writer expiry is <= the as_of instant (400) read as tombstones.
    # Re-upserting AFTER expiry resurrects (newer writetime wins); a stale
    # pre-expiry replay cannot (loses LWW even with a far-future TTL).
    """
WITH base AS (
  SELECT doc_id AS pk, CAST(n_chars AS DOUBLE) AS v
  FROM documents WHERE doc_id < 1000
),
events AS (
  SELECT 'upsert' AS op, pk, v,
         CASE WHEN pk % 3 = 0 THEN 250 WHEN pk % 5 = 0 THEN 1000 END AS exp,
         CAST(100 AS BIGINT) AS ts, pk AS seq
  FROM base
  UNION ALL
  SELECT 'upsert', pk, v + 500.0, NULL, 300, pk FROM base WHERE pk % 6 = 0
  UNION ALL
  SELECT 'upsert', pk, -1.0, 9999, 50, pk FROM base WHERE pk % 7 = 0
  UNION ALL
  SELECT 'delete', pk, NULL, NULL, 350, pk + 1000000 FROM base WHERE pk % 11 = 0
),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT pk, v, exp FROM latest
WHERE op <> 'delete' AND v IS NOT NULL AND (exp IS NULL OR exp > 400)
ORDER BY pk
""",
    "CDC TTL expiry end-to-end, hash-checked: expires_at rides the LWW merge "
    "as a value column (latest writer's TTL wins, Scylla USING TTL), "
    "live_view(as_of) reads expired rows as tombstones, re-upsert after "
    "expiry resurrects, stale pre-expiry replays lose",
)
def stream_cdc_ttl_endstate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").where(
        F.col("doc_id") < 1000
    )
    root = tempfile.mkdtemp(prefix="cdc_ttl_q_")
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)

    base = docs.select(
        F.lit("upsert").alias("op"),
        F.col("doc_id").alias("pk"),
        F.col("n_chars").cast("double").alias("v"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(250))
        .when(F.col("doc_id") % 5 == 0, F.lit(1000))
        .cast("bigint").alias("exp"),
        F.lit(100).cast("bigint").alias("ts"),
        F.col("doc_id").alias("seq"),
    )
    base.write.mode("append").json(os.path.join(src, "b1"))
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v"], num_buckets=8,
                           expire_col="exp")
    stream = spark.readStream.schema(_TTL_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream, checkpoint_dir=ckpt))

    # batch 2: resurrect-after-expiry (ts=300, no TTL), stale replay with a
    # far-future TTL (ts=50, must lose), deletes (ts=350, must win)
    resurrect = base.where(F.col("pk") % 6 == 0).withColumn(
        "v", F.col("v") + 500.0
    ).withColumn("exp", F.lit(None).cast("bigint")).withColumn(
        "ts", F.lit(300).cast("bigint"))
    stale = base.where(F.col("pk") % 7 == 0).withColumn(
        "v", F.lit(-1.0)
    ).withColumn("exp", F.lit(9999).cast("bigint")).withColumn(
        "ts", F.lit(50).cast("bigint"))
    deletes = base.where(F.col("pk") % 11 == 0).select(
        F.lit("delete").alias("op"), "pk",
        F.lit(None).cast("double").alias("v"),
        F.lit(None).cast("bigint").alias("exp"),
        F.lit(350).cast("bigint").alias("ts"),
        (F.col("pk") + 1_000_000).alias("seq"),
    )
    resurrect.unionByName(stale).unionByName(deletes).write.mode("append").json(
        os.path.join(src, "b2")
    )
    stream2 = spark.readStream.schema(_TTL_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream2, checkpoint_dir=ckpt))

    return sink.live_view("v", as_of=400).select("pk", "v", "exp").orderBy("pk")


def _hourly_internal_plan(spark, sf_dir):
    """Internal-plan probe (registry entries that surface a memory-sink
    LocalTableScan must expose the distributed work to the suite-wide plan
    bans): the batch equivalent of the streaming tumbling-window aggregation
    — identical shape to each micro-batch's plan."""
    from vector_store_spark.registry import load_events

    ev = load_events(spark, sf_dir).where(F.col("event_id") < 5000)
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").count()


@register(
    "stream_events_hourly_endstate",
    """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM events WHERE event_id < 5000
GROUP BY 1, 2
""",
    "Structured Streaming windowed aggregation, hash-checked: file-source "
    "micro-batches -> watermarked 1h tumbling windows -> complete-mode end "
    "state == the batch GROUP BY (epoch-aligned windows = date_trunc)",
    internal_plan_fn=_hourly_internal_plan,
)
def stream_events_hourly_endstate(spark, sf_dir):
    from vector_store_spark.registry import load_events

    ev = load_events(spark, sf_dir).where(F.col("event_id") < 5000).select(
        "event_id", "ts", "event_type"
    )
    root = tempfile.mkdtemp(prefix="evstream_")
    src = os.path.join(root, "src")
    ev.withColumn("ts_us", F.unix_micros("ts")).drop("ts").write.json(src)

    stream = (
        spark.readStream.schema("event_id long, event_type string, ts_us long")
        .json(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").count()
    name = "evh_" + os.path.basename(root).replace("evstream_", "")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    _await(q)
    return spark.table(name).select(
        F.col("w.start").alias("hour_start"),
        "event_type",
        F.col("count").cast("long").alias("n_events"),
    )


def _stream_dedup_internal_plan(spark, sf_dir):
    """Internal-plan probe: batch equivalent of the streaming keyed-dedup
    pipeline (dropDuplicates state keyed on pk + the endstate rollup)."""
    docs = load(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 2000
    )
    return (
        docs.select(F.col("doc_id").alias("pk"))
        .dropDuplicates(["pk"])
        .select((F.col("pk") % 10).cast("int").alias("f"))
        .groupBy("f").agg(F.count("*").cast("long").alias("n_keys"))
    )


@register(
    "stream_dedup_endstate",
    """
SELECT CAST(doc_id % 10 AS INT) AS f, CAST(count(*) AS BIGINT) AS n_keys
FROM documents WHERE doc_id < 2000
GROUP BY 1
""",
    "Streaming exact dedup, hash-checked: the source replays every key three "
    "times across two files; stateful dropDuplicates emits each key once, so "
    "the end state equals DISTINCT over the underlying key set",
    internal_plan_fn=_stream_dedup_internal_plan,
)
def stream_dedup_endstate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 2000
    )
    root = tempfile.mkdtemp(prefix="dedupstream_")
    src = os.path.join(root, "src")
    base = docs.select(F.col("doc_id").alias("pk"))
    # replay each key 3x across two source files (at-least-once delivery)
    base.union(base).write.mode("append").json(os.path.join(src, "b1"))
    base.write.mode("append").json(os.path.join(src, "b2"))

    stream = spark.readStream.schema("pk long").json(os.path.join(src, "*"))
    deduped = stream.dropDuplicates(["pk"])
    name = "dd_" + os.path.basename(root).replace("dedupstream_", "")
    q = (
        deduped.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    _await(q)
    return spark.table(name).select(
        (F.col("pk") % 10).cast("int").alias("f")
    ).groupBy("f").agg(F.count("*").cast("long").alias("n_keys"))


def _fts_endstate_oracle():
    from vector_store_spark.queries_fts import _BASE_CTES
    from vector_store_spark.registry import ROUND

    final_set = "(SELECT * FROM documents WHERE doc_id >= 50 AND doc_id < 460)"
    ctes = _BASE_CTES.replace("FROM documents", f"FROM {final_set}")
    return f"""
WITH {ctes}
SELECT doc_id, round(score, {ROUND}) AS score
FROM term_scores WHERE term = 'vector'
ORDER BY score DESC, doc_id LIMIT 10
"""


@register(
    "stream_fts_endstate",
    _fts_endstate_oracle(),
    "Streaming FTS maintenance (tantivy.rs:129-130, 383-443), hash-checked: "
    "doc CDC micro-batches -> bucket-partitioned postings/doclens store via "
    "foreachBatch (adds tokenized, deletes tombstoned, stale replays lose "
    "LWW) across a checkpoint resume; the served BM25 top-k equals a clean "
    "rebuild over the final doc set",
)
def stream_fts_endstate(spark, sf_dir):
    from vector_store_spark.operators.bm25 import bm25_search
    from vector_store_spark.registry import ROUND
    from vector_store_spark.streaming.fts import FtsStreamSink

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="fts_stream_")
    src, ix_dir, ckpt = (os.path.join(root, d) for d in ("src", "ix", "ckpt"))
    os.makedirs(src)
    schema = "op string, doc_id bigint, text string, ts bigint, seq bigint"

    t = time.perf_counter()
    base = docs.where(F.col("doc_id") < 400).select(
        F.lit("upsert").alias("op"), "doc_id", "text",
        F.lit(100).cast("bigint").alias("ts"), F.col("doc_id").alias("seq"),
    )
    # batch 1: bootstrap build of the store
    base.write.mode("append").json(os.path.join(src, "b1"))
    t = _mark("prep_b1", t)
    sink = FtsStreamSink(spark, ix_dir, num_buckets=8)
    stream = spark.readStream.schema(schema).json(os.path.join(src, "*"))
    _await(sink.start(stream, checkpoint_dir=ckpt))
    t = _mark("stream1_bootstrap", t)

    # batch 2: adds (ts=200), deletes (ts=300), stale text rewrites (ts=50,
    # must LOSE LWW and leave the original text in the index)
    adds = docs.where((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)).select(
        F.lit("upsert").alias("op"), "doc_id", "text",
        F.lit(200).cast("bigint").alias("ts"), F.col("doc_id").alias("seq"),
    )
    deletes = docs.where(F.col("doc_id") < 50).select(
        F.lit("delete").alias("op"), "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(300).cast("bigint").alias("ts"),
        (F.col("doc_id") + 1_000_000).alias("seq"),
    )
    stale = docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 400)).select(
        F.lit("upsert").alias("op"), "doc_id",
        F.lit("stale vector vector vector text").alias("text"),
        F.lit(50).cast("bigint").alias("ts"), F.col("doc_id").alias("seq"),
    )
    # equal-TIMESTAMP replays of committed docs (ts=100 = the stored rows'
    # ts, higher seq): "equal timestamp does not replace" — the stored text
    # must survive, same tie-break as operators/lww.lww_merge
    eq_replay = docs.where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") < 400)).select(
        F.lit("upsert").alias("op"), "doc_id",
        F.lit("replay vector vector vector equal ts").alias("text"),
        F.lit(100).cast("bigint").alias("ts"),
        (F.col("doc_id") + 2_000_000).alias("seq"),
    )
    # within-batch equal-ts duplicates for NEW docs: the SMALLEST seq wins
    # (lww_merge's (ts, -seq) argmax), so the original text lands
    dup_lo = docs.where((F.col("doc_id") >= 450) & (F.col("doc_id") < 460)).select(
        F.lit("upsert").alias("op"), "doc_id", "text",
        F.lit(200).cast("bigint").alias("ts"), F.col("doc_id").alias("seq"),
    )
    dup_hi = docs.where((F.col("doc_id") >= 450) & (F.col("doc_id") < 460)).select(
        F.lit("upsert").alias("op"), "doc_id",
        F.lit("late duplicate vector text").alias("text"),
        F.lit(200).cast("bigint").alias("ts"),
        (F.col("doc_id") + 3_000_000).alias("seq"),
    )
    (
        adds.unionByName(deletes).unionByName(stale)
        .unionByName(eq_replay).unionByName(dup_lo).unionByName(dup_hi)
        .write.mode("append").json(os.path.join(src, "b2"))
    )
    t = _mark("prep_b2", t)
    # second start, same checkpoint: only b2 is processed (W8 resume)
    stream2 = spark.readStream.schema(schema).json(os.path.join(src, "*"))
    _await(sink.start(stream2, checkpoint_dir=ckpt))
    _mark("stream2_incremental", t)

    return bm25_search(sink.serving_index(), "vector", 10, round_to=ROUND)


_ANN_SCHEMA = "op string, pk bigint, emb array<double>, lbl int, ts bigint, seq bigint"


_IVF_K, _IVF_NPROBE = 8, 4


def _mk_cluster_assign(cents):
    """Null-safe fixed-centroid cosine assignment (tombstones → -1): the
    derived-partition-column twin of operators.ivf.ivf_assign."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as FF
    from pyspark.sql.types import LongType

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)

    def assign(vecs):
        out = np.full(len(vecs), -1, dtype=np.int64)
        mask = np.array([v is not None for v in vecs])
        if mask.any():
            v = np.vstack(vecs[mask].to_numpy()).astype(np.float64)
            s = (v @ cmat.T) / (
                np.linalg.norm(v, axis=1, keepdims=True) * cnorm[None, :]
            )
            out[mask] = cids[np.argmax(s, axis=1)]
        return pd.Series(out)

    udf = FF.pandas_udf(assign, LongType()).asNondeterministic()
    return lambda df: udf(FF.col("emb").cast("array<double>"))


def _cdc_ivf_oracle():
    from vector_store_spark.registry import ROUND, det_query_vector, sql_vec

    q = sql_vec(det_query_vector(7, 64))
    return f"""
WITH base AS (
  SELECT vec_id AS pk, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id < 1000
),
c AS (SELECT pk AS cid, emb AS cv FROM base ORDER BY pk LIMIT {_IVF_K}),
final AS (
  SELECT pk,
         CASE WHEN pk % 5 = 0 THEN list_transform(emb, x -> -x) ELSE emb END AS emb
  FROM base WHERE pk % 11 <> 0
),
sims AS (
  SELECT f.pk, c.cid,
         list_inner_product(f.emb, c.cv) /
         (sqrt(list_inner_product(f.emb, f.emb)) * sqrt(list_inner_product(c.cv, c.cv))) AS sim
  FROM final f CROSS JOIN c
),
asg AS (
  SELECT pk, cid FROM (
    SELECT pk, cid, row_number() OVER (PARTITION BY pk ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {q}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({q}, {q}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT f.pk,
         round(1.0 - list_inner_product(f.emb, {q}) /
               (sqrt(list_inner_product(f.emb, f.emb)) * sqrt(list_inner_product({q}, {q}))), {ROUND}) AS distance
  FROM final f JOIN asg USING (pk)
  WHERE asg.cid IN (SELECT cid FROM probe)
)
SELECT pk, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, pk LIMIT 10
"""


@register(
    "stream_cdc_ivf_topk",
    _cdc_ivf_oracle(),
    "CDC-MAINTAINED approximate index: the LWW snapshot is additionally "
    "partitioned by a fixed-centroid IVF cluster assignment (derived "
    "partition column; updated vectors move directories — W3 "
    "move-between-partitions), and serving probes prune to nprobe cluster "
    "directories; the oracle re-derives end-state vectors, assignment, "
    "probe, and the pruned top-k",
)
def stream_cdc_ivf_topk(spark, sf_dir):
    from vector_store_spark.operators.ivf import ivf_probe
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.registry import ROUND, det_query_vector

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    root = tempfile.mkdtemp(prefix="cdc_ivf_")
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)

    # fixed centroids trained at bootstrap: the K smallest-id ORIGINAL vectors
    cents = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(_IVF_K).collect()
    ]
    base = emb.select(
        F.lit("upsert").alias("op"),
        F.col("vec_id").alias("pk"),
        F.col("embedding").cast("array<double>").alias("emb"),
        F.col("label").cast("int").alias("lbl"),
        F.lit(100).cast("bigint").alias("ts"),
        F.col("vec_id").alias("seq"),
    )
    t = time.perf_counter()
    base.write.mode("append").json(os.path.join(src, "b1"))
    t = _mark("prep_b1", t)
    sink = CdcSnapshotSink(
        spark, snap, ["pk"], ["emb", "lbl"], num_buckets=8,
        derived_partition_cols={"cluster": _mk_cluster_assign(cents)},
    )
    stream = spark.readStream.schema(_ANN_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream, checkpoint_dir=ckpt))
    t = _mark("stream1_bootstrap", t)

    updates = base.where(F.col("pk") % 5 == 0).withColumn(
        "emb", F.transform(F.col("emb"), lambda x: -x)
    ).withColumn("ts", F.lit(200).cast("bigint"))
    stale = base.where(F.col("pk") % 7 == 0).withColumn(
        "emb", F.transform(F.col("emb"), lambda x: x * 0.0)
    ).withColumn("ts", F.lit(50).cast("bigint"))
    deletes = base.where(F.col("pk") % 11 == 0).select(
        F.lit("delete").alias("op"), "pk",
        F.lit(None).cast("array<double>").alias("emb"),
        F.lit(None).cast("int").alias("lbl"),
        F.lit(300).cast("bigint").alias("ts"), (F.col("pk") + 1_000_000).alias("seq"),
    )
    updates.unionByName(stale).unionByName(deletes).write.mode("append").json(
        os.path.join(src, "b2")
    )
    t = _mark("prep_b2", t)
    stream2 = spark.readStream.schema(_ANN_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream2, checkpoint_dir=ckpt))
    _mark("stream2_incremental", t)

    # serving: probe the fixed centroids, scan ONLY those cluster directories
    probes = ivf_probe(cents, det_query_vector(7, 64), _IVF_NPROBE)
    live = sink.live_view("emb").where(F.col("cluster").isin(probes))
    return ann_topk(
        live, "emb", det_query_vector(7, 64), 10,
        tie_break=["pk"], select_cols=["pk"], round_to=ROUND,
    )


def _cdc_ann_oracle():
    from vector_store_spark.registry import ROUND, det_query_vector, sql_vec

    q = sql_vec(det_query_vector(7, 64))
    # final vector per pk after b1+b2: pk%5==0 -> negated (ts=200 update),
    # pk%11==0 -> deleted (ts=300), stale replays (ts=50) lose
    return f"""
WITH base AS (
  SELECT vec_id AS pk, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id < 1000
),
final AS (
  SELECT pk,
         CASE WHEN pk % 5 = 0 THEN list_transform(emb, x -> -x) ELSE emb END AS emb
  FROM base WHERE pk % 11 <> 0
),
scored AS (
  SELECT pk,
         round(1.0 - list_inner_product(emb, {q}) /
               (sqrt(list_inner_product(emb, emb)) * sqrt(list_inner_product({q}, {q}))), {ROUND}) AS distance
  FROM final
)
SELECT pk, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, pk LIMIT 10
"""


@register(
    "stream_cdc_ann_topk",
    _cdc_ann_oracle(),
    "The reference's core loop as ONE hash-checked query: CDC events carry "
    "embedding vectors -> LWW snapshot maintenance (updates replace, stale "
    "replays lose, tombstones win) -> exact ANN top-k served from the live "
    "view; the oracle re-derives the end-state vectors and re-scores them",
)
def stream_cdc_ann_topk(spark, sf_dir):
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.registry import ROUND, det_query_vector

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    root = tempfile.mkdtemp(prefix="cdc_ann_")
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)

    base = emb.select(
        F.lit("upsert").alias("op"),
        F.col("vec_id").alias("pk"),
        F.col("embedding").cast("array<double>").alias("emb"),
        F.col("label").cast("int").alias("lbl"),
        F.lit(100).cast("bigint").alias("ts"),
        F.col("vec_id").alias("seq"),
    )
    t = time.perf_counter()
    base.write.mode("append").json(os.path.join(src, "b1"))
    t = _mark("prep_b1", t)
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["emb", "lbl"], num_buckets=8)
    stream = spark.readStream.schema(_ANN_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream, checkpoint_dir=ckpt))
    t = _mark("stream1_bootstrap", t)

    updates = base.where(F.col("pk") % 5 == 0).withColumn(
        "emb", F.transform(F.col("emb"), lambda x: -x)
    ).withColumn("ts", F.lit(200).cast("bigint"))
    stale = base.where(F.col("pk") % 7 == 0).withColumn(
        "emb", F.transform(F.col("emb"), lambda x: x * 0.0)
    ).withColumn("ts", F.lit(50).cast("bigint"))
    deletes = base.where(F.col("pk") % 11 == 0).select(
        F.lit("delete").alias("op"), "pk",
        F.lit(None).cast("array<double>").alias("emb"),
        F.lit(None).cast("int").alias("lbl"),
        F.lit(300).cast("bigint").alias("ts"), (F.col("pk") + 1_000_000).alias("seq"),
    )
    updates.unionByName(stale).unionByName(deletes).write.mode("append").json(
        os.path.join(src, "b2")
    )
    t = _mark("prep_b2", t)
    stream2 = spark.readStream.schema(_ANN_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream2, checkpoint_dir=ckpt))
    _mark("stream2_incremental", t)

    live = sink.live_view("emb")
    return ann_topk(
        live, "emb", det_query_vector(7, 64), 10,
        tie_break=["pk"], select_cols=["pk"], round_to=ROUND,
    )


@register(
    "stream_cdc_hnsw_topk",
    _cdc_ann_oracle(),  # identical end-state contract: the graph must serve
    # exactly what the LWW snapshot holds
    "CDC-MAINTAINED GRAPH index — the reference's actual architecture "
    "(db_index.rs:130-262: CDC events -> Table actor LWW merge -> USearch "
    "add/remove): the snapshot sink's on_batch hook tombstones every batch "
    "key in the persisted HNSW graph and re-inserts the batch's LWW winners "
    "natively (descend-then-beam linking), so updates epoch-bump their node "
    "(primary_id.rs:27-69) and deletes become traversal-skipped tombstones; "
    "serving is a pure graph beam search over the maintained layout",
)
def stream_cdc_hnsw_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import (
        hnsw_build,
        hnsw_search,
        hnsw_upsert,
    )
    from vector_store_spark.registry import ROUND, det_query_vector

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    root = tempfile.mkdtemp(prefix="cdc_hnsw_")
    src, snap, ckpt, gpath = (
        os.path.join(root, d) for d in ("src", "snap", "ckpt", "graph_ix")
    )
    os.makedirs(src)

    def maintain_graph(sink, batch, batch_id):
        """Mirror db_index_backend's read-back: the batch names the touched
        keys, the committed snapshot provides their winners; graph CRUD is
        ONE fused tombstone-and-reinsert pass.  The key set stays a
        DataFrame end-to-end — semi-joined against the snapshot and passed
        as the distributed ids_removed — so maintenance never collects a
        key list to the driver (the 100 TB micro-batch can be wide)."""
        keys = batch.select("pk").distinct()
        if batch.isEmpty():
            return
        live = sink.live_view("emb").select(
            "pk", F.col("emb").cast("array<float>").alias("emb"))
        if not os.path.exists(os.path.join(gpath, "_hnsw_meta.json")):
            hnsw_build(live, "pk", "emb", gpath, m=8, ef_construction=64,
                       num_slices=4)
            return
        hnsw_upsert(spark, gpath,
                    items=live.join(F.broadcast(keys), "pk", "left_semi"),
                    ids_removed=keys)

    base = emb.select(
        F.lit("upsert").alias("op"),
        F.col("vec_id").alias("pk"),
        F.col("embedding").cast("array<double>").alias("emb"),
        F.col("label").cast("int").alias("lbl"),
        F.lit(100).cast("bigint").alias("ts"),
        F.col("vec_id").alias("seq"),
    )
    t = time.perf_counter()
    base.write.mode("append").json(os.path.join(src, "b1"))
    t = _mark("prep_b1", t)
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["emb", "lbl"], num_buckets=8,
                           on_batch=maintain_graph)
    stream = spark.readStream.schema(_ANN_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream, checkpoint_dir=ckpt))
    t = _mark("stream1_bootstrap_build", t)

    updates = base.where(F.col("pk") % 5 == 0).withColumn(
        "emb", F.transform(F.col("emb"), lambda x: -x)
    ).withColumn("ts", F.lit(200).cast("bigint"))
    stale = base.where(F.col("pk") % 7 == 0).withColumn(
        "emb", F.transform(F.col("emb"), lambda x: x * 0.0)
    ).withColumn("ts", F.lit(50).cast("bigint"))
    deletes = base.where(F.col("pk") % 11 == 0).select(
        F.lit("delete").alias("op"), "pk",
        F.lit(None).cast("array<double>").alias("emb"),
        F.lit(None).cast("int").alias("lbl"),
        F.lit(300).cast("bigint").alias("ts"), (F.col("pk") + 1_000_000).alias("seq"),
    )
    updates.unionByName(stale).unionByName(deletes).write.mode("append").json(
        os.path.join(src, "b2")
    )
    t = _mark("prep_b2", t)
    stream2 = spark.readStream.schema(_ANN_SCHEMA).json(os.path.join(src, "*"))
    _await(sink.start(stream2, checkpoint_dir=ckpt))
    t = _mark("stream2_graph_upsert", t)

    # deferred-removal reclaim (USearch's model: tombstones are traversal-
    # skipped until a slice is garbage-heavy enough to be worth rebuilding).
    # The trigger is driver-side arithmetic on the sidecar dead census the
    # upserts keep current — calling this every batch costs nothing until a
    # slice crosses the threshold; b2's ~27 % tombstones stay below the
    # 40 % reclaim bar, so serving relies on traversal skips (the end-state
    # oracle proves that is exact). test_hnsw_compact_* pins the rebuild
    # path itself above the bar.
    from vector_store_spark.operators.hnsw import hnsw_compact

    hnsw_compact(spark, gpath, min_deleted_frac=0.4)
    _mark("compact", t)

    # serve from the GRAPH, not the snapshot — ef generous enough that the
    # beam is exhaustive at gate scale (recall-vs-ef is a bench metric)
    return hnsw_search(spark, gpath, det_query_vector(7, 64), 10,
                       ef_search=256, round_to=ROUND)


def _alternator_endstate_oracle():
    from vector_store_spark.registry import ROUND, det_query_vector, sql_vec

    q = sql_vec(det_query_vector(7, 64))
    # final vector per pk after b1+b2: pk%5==0 -> negated (ts=200 update),
    # pk%13==0 -> corrupt blob (ts=250, decodes to NULL => unindexed, P8),
    # pk%11==0 -> deleted (ts=300); stale zero-vector replays (ts=50) lose.
    # The oracle scores the RAW embeddings: a PASS proves the tagged-blob
    # encode->decode round-trip composes with LWW in the streaming path.
    return f"""
WITH base AS (
  SELECT vec_id AS pk, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id < 400
),
final AS (
  SELECT pk,
         CASE WHEN pk % 5 = 0 THEN list_transform(emb, x -> -x) ELSE emb END AS emb
  FROM base WHERE pk % 11 <> 0 AND pk % 13 <> 0
),
scored AS (
  SELECT pk,
         round(1.0 - list_inner_product(emb, {q}) /
               (sqrt(list_inner_product(emb, emb)) * sqrt(list_inner_product({q}, {q}))), {ROUND}) AS distance
  FROM final
)
SELECT pk, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, pk LIMIT 10
"""


@register(
    "stream_alternator_endstate",
    _alternator_endstate_oracle(),
    "Alternator CONTINUOUS maintenance (db_index_backend.rs:37-62 read-back "
    "+ vector.rs:62-129 tag decode, in the streaming path): ':attrs' "
    "map<utf8,blob> CDC events (0x05 BE-f32 for even pks, 0x04 DynamoDB-JSON "
    "for odd) -> decode-in-merge -> LWW snapshot across a checkpoint resume; "
    "corrupt blobs decode to NULL and leave the index (P8), stale replays "
    "lose, tombstones win; ANN top-k served from the live view",
)
def stream_alternator_endstate(spark, sf_dir):
    from vector_store_spark.functions.alternator import (
        TAG_DYNAMO_JSON,
        attrs_vector,
        encode_vector_udf,
    )
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.registry import ROUND, det_query_vector

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    root = tempfile.mkdtemp(prefix="cdc_alt_")
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)

    def attrs_of(vec_col):
        # both wire tags in one stream: 0x05 packed BE-f32 (even pks),
        # 0x04 DynamoDB JSON {"L":[{"N":...}]} (odd pks)
        blob = F.when(
            F.col("pk") % 2 == 0, encode_vector_udf()(vec_col)
        ).otherwise(encode_vector_udf(TAG_DYNAMO_JSON)(vec_col))
        return F.create_map(F.lit("v"), blob)

    base = emb.select(
        F.lit("upsert").alias("op"), F.col("vec_id").alias("pk"),
        F.col("embedding").alias("vec"),
        F.lit(100).cast("bigint").alias("ts"), F.col("vec_id").alias("seq"),
    ).select("op", "pk", attrs_of(F.col("vec")).alias("attrs"), "ts", "seq")
    # parquet file source: binary map values round-trip natively
    base.write.mode("append").parquet(os.path.join(src, "b1"))

    sink = CdcSnapshotSink(spark, snap, ["pk"], ["emb"], num_buckets=8)
    schema = "op string, pk bigint, attrs map<string,binary>, ts bigint, seq bigint"

    def start(ckpt_dir):
        stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
        # decode-in-merge: the tagged blob becomes a typed vector INSIDE the
        # micro-batch (Arrow-batched), so the snapshot stores decoded state
        # and every downstream stage is identical to the CQL pipeline
        decoded = stream.withColumn(
            "emb", attrs_vector("attrs", "v", dims=64).cast("array<double>")
        ).drop("attrs")
        return sink.start(decoded, checkpoint_dir=ckpt_dir)

    _await(start(ckpt))

    neg = emb.select(
        F.lit("upsert").alias("op"), F.col("vec_id").alias("pk"),
        F.transform(F.col("embedding"), lambda x: -x).alias("vec"),
        F.lit(200).cast("bigint").alias("ts"), F.col("vec_id").alias("seq"),
    ).where(F.col("pk") % 5 == 0)
    stale = emb.select(
        F.lit("upsert").alias("op"), F.col("vec_id").alias("pk"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(0.0).cast("float")).alias("vec"),
        F.lit(50).cast("bigint").alias("ts"), F.col("vec_id").alias("seq"),
    ).where(F.col("pk") % 7 == 0)
    updates = neg.unionByName(stale).select(
        "op", "pk", attrs_of(F.col("vec")).alias("attrs"), "ts", "seq"
    )
    # corrupt 0x05 blob (3-byte body, not a multiple of 4): decodes to NULL,
    # wins LWW at ts=250, and the doc leaves the index (vector.rs error
    # paths -> P8 null-target-not-indexed)
    corrupt = emb.select(
        F.lit("upsert").alias("op"), F.col("vec_id").alias("pk"),
        F.create_map(F.lit("v"), F.lit(bytes([0x05, 1, 2, 3]))).alias("attrs"),
        F.lit(250).cast("bigint").alias("ts"), (F.col("vec_id") + 500_000).alias("seq"),
    ).where(F.col("pk") % 13 == 0)
    deletes = emb.select(
        F.lit("delete").alias("op"), F.col("vec_id").alias("pk"),
        F.lit(None).cast("map<string,binary>").alias("attrs"),
        F.lit(300).cast("bigint").alias("ts"), (F.col("vec_id") + 1_000_000).alias("seq"),
    ).where(F.col("pk") % 11 == 0)
    updates.unionByName(corrupt).unionByName(deletes).write.mode("append").parquet(
        os.path.join(src, "b2")
    )
    # second start, same checkpoint: only b2 is processed (W8 resume)
    _await(start(ckpt))

    return ann_topk(
        sink.live_view("emb"), "emb", det_query_vector(7, 64), 10,
        tie_break=["pk"], select_cols=["pk"], round_to=ROUND,
    )


def _neardup_oracle():
    from vector_store_spark.queries_dedup import MINHASH_PAIRS_SQL

    return MINHASH_PAIRS_SQL


@register(
    "stream_neardup_endstate",
    _neardup_oracle(),
    "Streaming near-dup ingest, hash-checked: documents stream in across two "
    "batches + a checkpoint resume into an incrementally-maintained "
    "MinHash/LSH band index (new docs join only the buckets they land in); "
    "the accumulated verified pair set must equal the batch pipeline's "
    "exhaustive-banding output over the full corpus — including the jaccard "
    "values, which come from the same exact-verify stage",
)
def stream_neardup_endstate(spark, sf_dir):
    from vector_store_spark.registry import ROUND
    from vector_store_spark.streaming.neardup import NearDupStreamSink

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="neardup_stream_")
    src, store, ckpt = (os.path.join(root, d) for d in ("src", "store", "ckpt"))
    os.makedirs(src)

    t = time.perf_counter()
    # batch 1: two thirds of the corpus (cross-batch pairs are the point:
    # a planted near-dup whose twin arrives later must be found at arrival)
    docs.where(F.col("doc_id") % 3 != 0).write.mode("append").json(
        os.path.join(src, "b1"))
    t = _mark("prep_b1", t)
    sink = NearDupStreamSink(spark, store, id_col="doc_id", text_col="text",
                             n=3, num_hashes=12, bands=4, threshold=0.8)
    schema = "doc_id bigint, text string"
    _await(sink.start(spark.readStream.schema(schema).json(os.path.join(src, "*")),
                      checkpoint_dir=ckpt))
    t = _mark("stream1_bootstrap", t)

    # batch 2: the remaining third; second start, same checkpoint (W8 resume)
    docs.where(F.col("doc_id") % 3 == 0).write.mode("append").json(
        os.path.join(src, "b2"))
    t = _mark("prep_b2", t)
    _await(sink.start(spark.readStream.schema(schema).json(os.path.join(src, "*")),
                      checkpoint_dir=ckpt))
    _mark("stream2_incremental", t)

    return sink.pairs().withColumn("jaccard", F.round("jaccard", ROUND))


def _quality_monitor_oracle():
    from vector_store_spark.queries_text import quality_score_sql
    from vector_store_spark.registry import ROUND

    return f"""
WITH q AS ({quality_score_sql()}),
j AS (
  SELECT d.doc_id, d.source, length(d.text) AS len, q.q,
         CAST(CASE WHEN d.doc_id % 3 <> 0 THEN 0 ELSE 1 END AS INTEGER) AS batch
  FROM documents d JOIN q USING (doc_id)
)
SELECT batch, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len) AS BIGINT) AS n_chars,
       round(sum(CAST(round(q * 1000000) AS BIGINT)) / (count(*) * 1000000.0),
             {ROUND}) AS mean_quality
FROM j GROUP BY batch, source
"""


@register(
    "stream_quality_monitor_endstate",
    _quality_monitor_oracle(),
    "Streaming ingest-health monitor, hash-checked: per micro-batch "
    "per-source doc counts, char mass, and mean composite quality appended "
    "as an idempotent _batch-partitioned time series across a checkpoint "
    "resume — the drift dashboard a crawl pipeline watches; the oracle "
    "re-derives every (batch, source) row from the deterministic split",
)
def stream_quality_monitor_endstate(spark, sf_dir):
    from vector_store_spark.streaming.neardup import QualityMonitorSink

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    root = tempfile.mkdtemp(prefix="qmon_stream_")
    src, store, ckpt = (os.path.join(root, d) for d in ("src", "store", "ckpt"))
    os.makedirs(src)
    schema = "doc_id bigint, text string, source string"

    docs.where(F.col("doc_id") % 3 != 0).write.mode("append").json(
        os.path.join(src, "b1"))
    sink = QualityMonitorSink(spark, store)
    _await(sink.start(spark.readStream.schema(schema).json(os.path.join(src, "*")),
                      checkpoint_dir=ckpt))
    docs.where(F.col("doc_id") % 3 == 0).write.mode("append").json(
        os.path.join(src, "b2"))
    _await(sink.start(spark.readStream.schema(schema).json(os.path.join(src, "*")),
                      checkpoint_dir=ckpt))
    return sink.series()


def _sessions_internal_plan(spark, sf_dir):
    """Internal-plan probe: batch equivalent of the streaming session-window
    aggregation (per-user session assembly — the state-store work each
    micro-batch plans)."""
    from vector_store_spark.registry import load_events

    ev = load_events(spark, sf_dir).where(F.col("event_id") < 5000).select(
        "event_id", "user_id", "ts"
    )
    return ev.groupBy(
        F.session_window("ts", "12 hours").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.max("ts").alias("max_ts"))


@register(
    "stream_sessions_endstate",
    # Spark's session_window starts a NEW session when the inter-event gap
    # reaches the gap duration (session interval is [first, last + gap), so
    # an event at exactly last + gap does not merge) — the oracle's island
    # break is therefore >= gap, unlike batch events_sessions' > (the two
    # document the boundary convention of their respective engines).
    """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus
  FROM events WHERE event_id < 5000
),
o AS (
  SELECT user_id, event_id, tus,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
                OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
                   >= 43200000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
sess AS (
  SELECT user_id, tus,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sid
  FROM o
)
SELECT user_id, make_timestamp(min(tus)) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       max(tus) - min(tus) AS duration_us
FROM sess GROUP BY user_id, sid
""",
    "W-family native session windows, hash-checked: file-source micro-batches "
    "(one file per trigger, so sessions MERGE ACROSS batches in the state "
    "store) -> session_window(12h gap) aggregation -> end state == the batch "
    "gaps-and-islands sessionization re-derived by the oracle. Complete mode "
    "keeps every session in state so the memory sink sees the full end state; "
    "the production posture at scale is append mode + withWatermark, which "
    "emits each session once its gap closes and evicts it from state",
    internal_plan_fn=_sessions_internal_plan,
)
def stream_sessions_endstate(spark, sf_dir):
    from vector_store_spark.registry import load_events

    ev = load_events(spark, sf_dir).where(F.col("event_id") < 5000).select(
        "event_id", "user_id", "ts"
    )
    root = tempfile.mkdtemp(prefix="sessstream_")
    src = os.path.join(root, "src")
    # 4 unordered files + maxFilesPerTrigger=1: session fragments arrive
    # out of order across micro-batches and must merge in the state store
    ev.withColumn("ts_us", F.unix_micros("ts")).drop("ts").repartition(4).write.json(src)

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    agg = stream.groupBy(
        F.session_window("ts", "12 hours").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.max("ts").alias("max_ts"))
    name = "sess_" + os.path.basename(root).replace("sessstream_", "")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    _await(q)
    return spark.table(name).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("n_events").cast("long").alias("n_events"),
        (F.unix_micros("max_ts") - F.unix_micros(F.col("w.start"))).alias("duration_us"),
    )


@register(
    "stream_cdc_resume_endstate",
    # W8 on the CDC->index path (db_cdc/checkpoint_saver.rs: reader progress
    # is persisted so a restarted consumer resumes from the saved window and
    # REPLAYS the uncommitted tail): three event waves land as three
    # micro-batches (coalesced file groups + maxFilesPerTrigger=1); the
    # first run CRASHES mid-stream — after batch 1's snapshot buckets are
    # durably written but before the epoch commits (the on_batch hook runs
    # post-write, so raising there is exactly "output written, progress
    # lost"). The resumed run replays batch 1 against a snapshot that
    # already contains its effects (the LWW merge is idempotent by value:
    # same (ts, seq) winners, dynamic bucket overwrite rewrites identical
    # leaves) and continues to batch 2. The oracle re-derives the LWW end
    # state of ALL THREE waves — stale replays lose, tombstones win even
    # against later lower-ts resurrection attempts.
    """
WITH base AS (
  SELECT doc_id AS pk, CAST(n_chars AS DOUBLE) AS v,
         CAST(doc_id % 10 AS INT) AS f
  FROM documents WHERE doc_id < 1000
),
events AS (
  SELECT 'upsert' AS op, pk, v, f, CAST(100 AS BIGINT) AS ts, pk AS seq FROM base
  UNION ALL
  SELECT 'upsert', pk, v + 1000.0, f, 200, pk FROM base WHERE pk % 5 = 0
  UNION ALL
  SELECT 'upsert', pk, -1.0, f, 50, pk FROM base WHERE pk % 7 = 0
  UNION ALL
  SELECT 'delete', pk, NULL, NULL, 300, pk + 1000000 FROM base WHERE pk % 11 = 0
  UNION ALL
  SELECT 'upsert', pk, v + 5000.0, f, 400, pk + 2000000 FROM base WHERE pk % 3 = 0
  UNION ALL
  SELECT 'upsert', pk, v + 9000.0, f, 250, pk + 3000000 FROM base WHERE pk % 11 = 0
  UNION ALL
  SELECT 'upsert', pk, -2.0, f, 150, pk + 4000000 FROM base WHERE pk % 5 = 0
),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT pk, v, f FROM latest
WHERE op <> 'delete' AND v IS NOT NULL
ORDER BY pk
""",
    "W8 checkpoint resume on the CDC->index path, hash-checked: the stream "
    "crashes after a micro-batch's snapshot write but before its epoch "
    "commit; the resumed run replays that batch idempotently and processes "
    "the rest — the end state equals the oracle's LWW of all three waves",
)
def stream_cdc_resume_endstate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").where(
        F.col("doc_id") < 1000
    )
    root = tempfile.mkdtemp(prefix="cdc_resume_")
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)

    base = docs.select(
        F.lit("upsert").alias("op"),
        F.col("doc_id").alias("pk"),
        F.col("n_chars").cast("double").alias("v"),
        (F.col("doc_id") % 10).cast("int").alias("f"),
        F.lit(100).cast("bigint").alias("ts"),
        F.col("doc_id").alias("seq"),
    )
    updates = base.where(F.col("pk") % 5 == 0).withColumn(
        "v", F.col("v") + 1000.0
    ).withColumn("ts", F.lit(200).cast("bigint"))
    stale = base.where(F.col("pk") % 7 == 0).withColumn(
        "v", F.lit(-1.0)
    ).withColumn("ts", F.lit(50).cast("bigint"))
    deletes = base.where(F.col("pk") % 11 == 0).select(
        F.lit("delete").alias("op"), "pk",
        F.lit(None).cast("double").alias("v"), F.lit(None).cast("int").alias("f"),
        F.lit(300).cast("bigint").alias("ts"), (F.col("pk") + 1_000_000).alias("seq"),
    )
    late = base.where(F.col("pk") % 3 == 0).withColumn(
        "v", F.col("v") + 5000.0
    ).withColumn("ts", F.lit(400).cast("bigint")).withColumn(
        "seq", F.col("pk") + 2_000_000)
    resurrect = base.where(F.col("pk") % 11 == 0).withColumn(
        "v", F.col("v") + 9000.0
    ).withColumn("ts", F.lit(250).cast("bigint")).withColumn(
        "seq", F.col("pk") + 3_000_000)
    stale2 = base.where(F.col("pk") % 5 == 0).withColumn(
        "v", F.lit(-2.0)
    ).withColumn("ts", F.lit(150).cast("bigint")).withColumn(
        "seq", F.col("pk") + 4_000_000)

    # ALL waves are on disk before the first start; coalesce(1) makes each
    # wave exactly one file, maxFilesPerTrigger=1 makes each file exactly
    # one micro-batch — so "crash during batch 1" is deterministic
    t = time.perf_counter()
    base.coalesce(1).write.mode("append").json(os.path.join(src, "b1"))
    updates.unionByName(stale).unionByName(deletes).coalesce(1).write.mode(
        "append").json(os.path.join(src, "b2"))
    late.unionByName(resurrect).unionByName(stale2).coalesce(1).write.mode(
        "append").json(os.path.join(src, "b3"))
    t = _mark("prep_waves", t)

    crashed = {"hit": False}

    def crash_after_write(sink, batch, batch_id):
        if batch_id == 1:
            crashed["hit"] = True
            raise RuntimeError("injected crash: post-write, pre-commit")

    def reader():
        return (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(os.path.join(src, "*"))
        )

    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v", "f"], num_buckets=8,
                           on_batch=crash_after_write)
    q = sink.start(reader(), checkpoint_dir=ckpt)
    try:
        q.awaitTermination(300)
        raise AssertionError("stream 1 was supposed to crash mid-batches")
    except Exception as ex:  # StreamingQueryException wrapping the injected one
        if "injected crash" not in str(ex):
            raise
    assert crashed["hit"], "crash hook never fired"
    t = _mark("stream1_crash_mid_batch", t)

    # resume: same checkpoint, same snapshot store, no crash hook — batch 1
    # replays (idempotent), batch 2 (b3) completes the story
    sink2 = CdcSnapshotSink(spark, snap, ["pk"], ["v", "f"], num_buckets=8)
    _await(sink2.start(reader(), checkpoint_dir=ckpt))
    _mark("stream2_resume", t)

    return sink2.live_view("v").orderBy("pk")
