"""FtsStreamSink behavior: commit visibility, LWW, tombstone persistence.

The hash-checked end-state equivalence with a clean rebuild lives in the
``stream_fts_endstate`` registry entry; these tests pin the per-batch algebra
edges, including the one the registry query cannot order: a STALE upsert
arriving in a LATER batch than the delete must not resurrect the doc.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.bm25 import bm25_search
from vector_store_spark.streaming.fts import FtsStreamSink

SCHEMA = "op string, doc_id bigint, text string, ts bigint, seq bigint"


def _run_batches(spark, batches):
    root = tempfile.mkdtemp(prefix="fts_sink_t_")
    src, ix, ckpt = (os.path.join(root, d) for d in ("src", "ix", "ckpt"))
    os.makedirs(src)
    sink = FtsStreamSink(spark, ix, num_buckets=4)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").json(
            os.path.join(src, f"b{i}")
        )
        q = sink.start(
            spark.readStream.schema(SCHEMA).json(os.path.join(src, "*")),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(300)
    return sink


def _served_docs(sink):
    ix = sink.serving_index()
    return {r[0] for r in ix.doclens.select("doc_id").collect()}, ix


def test_add_update_delete_visibility(spark):
    sink = _run_batches(
        spark,
        [
            [("upsert", 1, "alpha beta", 100, 1), ("upsert", 2, "beta gamma", 100, 2)],
            [("upsert", 1, "delta delta beta", 200, 3), ("delete", 2, None, 300, 4)],
        ],
    )
    docs, ix = _served_docs(sink)
    assert docs == {1}
    hits = {r["doc_id"] for r in bm25_search(ix, "delta", 5).collect()}
    assert hits == {1}
    # old text of doc 1 is gone from the postings
    assert bm25_search(ix, "alpha", 5).count() == 0


def test_stale_upsert_after_delete_does_not_resurrect(spark):
    sink = _run_batches(
        spark,
        [
            [("upsert", 7, "alpha", 100, 1)],
            [("delete", 7, None, 300, 2)],
            # late replay of the ORIGINAL upsert (ts=100 < tombstone ts=300)
            [("upsert", 7, "alpha", 100, 1)],
        ],
    )
    docs, ix = _served_docs(sink)
    assert docs == set()
    assert bm25_search(ix, "alpha", 5).count() == 0


def test_untouched_buckets_not_rewritten(spark):
    """A batch must rewrite only the buckets its doc ids hash into."""
    sink = _run_batches(spark, [[("upsert", i, f"word{i} shared", 100, i) for i in range(16)]])
    before = {
        d: os.path.getmtime(os.path.join(sink.doclens_dir, d))
        for d in os.listdir(sink.doclens_dir)
        if d.startswith("_bucket=")
    }
    assert len(before) > 1
    # touch exactly one doc in a follow-up batch
    root = os.path.dirname(sink.postings_dir)
    src = os.path.join(os.path.dirname(root), "src2")
    spark.createDataFrame([("upsert", 0, "rewritten", 200, 99)], SCHEMA).write.json(src)
    q = sink.start(
        spark.readStream.schema(SCHEMA).json(src),
        checkpoint_dir=os.path.join(os.path.dirname(root), "ckpt2"),
    )
    q.awaitTermination(300)
    bucket0 = sink.spark.createDataFrame([(0,)], "doc_id bigint").select(
        F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("b")
    ).first().b
    after = {
        d: os.path.getmtime(os.path.join(sink.doclens_dir, d))
        for d in os.listdir(sink.doclens_dir)
        if d.startswith("_bucket=")
    }
    changed = {d for d in before if after[d] != before[d]}
    assert changed == {f"_bucket={bucket0}"}


def test_tombstone_gc_past_horizon(spark):
    """gc_tombstones_before: tombstones older than the safety horizon are
    dropped on the next rewrite of their bucket (they are only needed while a
    stale replay could still arrive)."""
    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="fts_gc_t_")
    src, ix, ckpt = (os.path.join(root, d) for d in ("src", "ix", "ckpt"))
    os.makedirs(src)
    sink = FtsStreamSink(spark, ix, num_buckets=1, gc_tombstones_before=200)
    batches = [
        [("upsert", 1, "alpha", 100, 1), ("delete", 2, None, 150, 2)],
        # second batch touches the same (only) bucket: the ts=150 tombstone is
        # past the ts<200 horizon and must be GC'd; the ts=300 one retained
        [("delete", 3, None, 300, 3), ("upsert", 4, "beta", 300, 4)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").json(
            os.path.join(src, f"b{i}")
        )
        q = sink.start(
            spark.readStream.schema(SCHEMA).json(os.path.join(src, "*")),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(300)
    dl = spark.read.parquet(sink.doclens_dir)
    tombs = {r.doc_id for r in dl.where(F.col("dl").isNull()).collect()}
    live = {r.doc_id for r in dl.where(F.col("dl").isNotNull()).collect()}
    assert tombs == {3}  # ts=150 tombstone GC'd, ts=300 retained
    assert live == {1, 4}


def test_streaming_index_serves_through_fts_engine(spark):
    """The reopened-searcher contract end to end: a streaming-maintained
    store registers in FtsEngine and answers /bm25 like any built index."""
    from vector_store_spark.engine import FtsEngine

    sink = _run_batches(
        spark,
        [
            [("upsert", 1, "spark engine", 100, 1), ("upsert", 2, "other text", 100, 2)],
            [("upsert", 3, "spark stream", 200, 3), ("delete", 2, None, 300, 4)],
        ],
    )
    eng = FtsEngine()
    eng.register("live", sink.serving_index())
    out = eng.bm25("live", "spark", limit=5)
    assert set(out.primary_keys["doc_id"]) == {1, 3}
    assert len(out.scores) == 2


def test_emptied_bucket_leaves_dropped(spark):
    """Removing every doc of a bucket (with tombstone GC past the horizon)
    must delete the bucket's postings AND doclens leaves — dynamic overwrite
    cannot rewrite an empty leaf, so stale files would otherwise survive."""
    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="fts_empty_t_")
    src, ix, ckpt = (os.path.join(root, d) for d in ("src", "ix", "ckpt"))
    os.makedirs(src)
    # single bucket: deleting the only doc empties it entirely
    sink = FtsStreamSink(spark, ix, num_buckets=1, gc_tombstones_before=10_000)
    batches = [
        [("upsert", 1, "alpha beta", 100, 1)],
        [("delete", 1, None, 200, 2)],  # ts < GC horizon: tombstone dropped too
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").json(
            os.path.join(src, f"b{i}")
        )
        q = sink.start(
            spark.readStream.schema(SCHEMA).json(os.path.join(src, "*")),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(300)
    for d in (sink.postings_dir, sink.doclens_dir):
        leaves = [e for e in os.listdir(d) if e.startswith("_bucket=")] if os.path.isdir(d) else []
        assert leaves == [], f"stale leaves in {d}: {leaves}"
    ix2 = sink.serving_index()
    assert ix2.n_docs == 0


def test_equal_timestamp_replay_does_not_replace(spark):
    """LWW tie-break parity with operators/lww.lww_merge: (ts, -seq) argmax.
    A later batch's upsert at the SAME timestamp as the committed row must
    LOSE (stored rows carry SNAPSHOT_SEQ=-1 → they win equal-ts ties), and
    within one batch the SMALLEST seq wins on equal ts."""
    sink = _run_batches(
        spark,
        [
            [("upsert", 1, "original spark text", 100, 1)],
            # equal-ts replay of doc 1 (higher seq) must not replace;
            # doc 2 arrives twice in one batch at equal ts — seq 5 wins
            [
                ("upsert", 1, "replayed spark text", 100, 7),
                ("upsert", 2, "first spark words", 200, 5),
                ("upsert", 2, "second spark words", 200, 9),
            ],
        ],
    )
    docs, ix = _served_docs(sink)
    assert docs == {1, 2}
    terms = {r.term for r in ix.postings.collect()}
    assert "original" in terms and "replayed" not in terms
    assert "first" in terms and "second" not in terms
