"""Streaming registry entry (rows-only — Structured Streaming is not
SQL-expressible for the DuckDB oracle, so the driver records the weaker
count/schema check, as the contract allows for genuinely non-SQL ops).

Drives the REAL pipeline end to end: CDC events derived deterministically
from the documents table → file-source micro-batches → foreachBatch LWW merge
into the bucket-partitioned snapshot (S3–S5, W3), across TWO stream starts
sharing one checkpoint (W8 resume), with stale replays that must lose LWW and
tombstones that must win. The result is the final live snapshot; LWW
idempotence makes it deterministic regardless of batch/partition order.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from vector_store_spark.registry import load, register
from vector_store_spark.streaming.cdc import CdcSnapshotSink

_SCHEMA = "op string, pk bigint, v double, f int, ts bigint, seq bigint"


def _await(q):
    q.awaitTermination(300)


@register(
    "stream_cdc_snapshot",
    None,
    "S3-S5/W2/W3/W8 end-to-end: CDC micro-batches -> LWW snapshot across a "
    "checkpoint resume; stale replays lose, tombstones win",
)
def stream_cdc_snapshot(spark, sf_dir):
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
