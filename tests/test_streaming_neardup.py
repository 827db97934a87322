"""Streaming near-dup index mechanics: cross-batch pair discovery, replay
idempotence, checkpoint resume, and batch-parity of the accumulated pairs.
(The value-level end state is also oracle-gated via stream_neardup_endstate.)
"""

import os

import pytest
from pyspark.sql import functions as F

from vector_store_spark.streaming.neardup import NearDupStreamSink

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "an entirely different document about spark structured streaming state"),
    # near-dup of 1, arrives in a LATER batch
    (3, "the quick brown fox jumps over the lazy dog near the river edge"),
    (4, "yet another unrelated text with its own words and token stream here"),
    # near-dup of 2, same later batch
    (5, "an entirely different document about spark structured streaming store"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_pairs_and_replay_idempotence(spark, tmp_path):
    sink = NearDupStreamSink(spark, str(tmp_path / "store"), threshold=0.5)
    sink.process_batch(_mk(spark, DOCS[:2]), 0)
    assert sink.pairs().count() == 0  # no dups within batch 0
    sink.process_batch(_mk(spark, DOCS[2:]), 1)
    got = {(r.id_a, r.id_b) for r in sink.pairs().collect()}
    assert got == {(1, 3), (2, 5)}  # found at the LATER member's arrival
    # replay of batch 1 (checkpoint-failure redelivery) overwrites its own
    # partition: same pairs, no duplicates
    sink.process_batch(_mk(spark, DOCS[2:]), 1)
    rows = sink.pairs().collect()
    assert len(rows) == 2
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 3), (2, 5)}


def test_endstate_equals_batch_pipeline(spark, tmp_path):
    """Any batch split accumulates exactly the batch path's pair set —
    including jaccard values (same verify stage)."""
    from vector_store_spark.operators.dedup import minhash_lsh_pairs

    docs = _mk(spark, DOCS)
    expect = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=12, bands=4,
            threshold=0.5, max_bucket_width=None,
        ).collect()
    }
    sink = NearDupStreamSink(spark, str(tmp_path / "store2"), threshold=0.5)
    for i, row in enumerate(DOCS):  # worst split: one doc per batch
        sink.process_batch(_mk(spark, [row]), i)
    got = {(r.id_a, r.id_b): r.jaccard for r in sink.pairs().collect()}
    assert got == expect


def test_streaming_source_with_checkpoint_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    sink = NearDupStreamSink(spark, str(tmp_path / "store3"), threshold=0.5)
    schema = "doc_id bigint, text string"

    _mk(spark, DOCS[:2]).write.mode("append").json(os.path.join(src, "b1"))
    q = sink.start(
        spark.readStream.schema(schema).json(os.path.join(src, "*")), ckpt
    )
    q.awaitTermination(120)
    assert sink.pairs().count() == 0

    _mk(spark, DOCS[2:]).write.mode("append").json(os.path.join(src, "b2"))
    q2 = sink.start(
        spark.readStream.schema(schema).json(os.path.join(src, "*")), ckpt
    )
    q2.awaitTermination(120)
    assert {(r.id_a, r.id_b) for r in sink.pairs().collect()} == {(1, 3), (2, 5)}


def test_rejects_bad_band_config(spark, tmp_path):
    with pytest.raises(ValueError, match="divide"):
        NearDupStreamSink(spark, str(tmp_path / "x"), num_hashes=10, bands=4)


def test_at_least_once_rows_within_batch(spark, tmp_path):
    """Duplicate delivery of the same row inside one batch must not create
    a self-pair or inflate the index."""
    sink = NearDupStreamSink(spark, str(tmp_path / "store4"), threshold=0.5)
    sink.process_batch(_mk(spark, [DOCS[0], DOCS[0], DOCS[1]]), 0)
    assert sink.pairs().count() == 0
    assert (
        sink._read(sink.sets_dir, "id long, hs array<long>")
        .groupBy("id").count().where(F.col("count") > 1).count() == 0
    )


def test_quality_monitor_series_and_replay(spark, tmp_path):
    """Per-batch per-source stats accumulate as a series; a replayed batch
    overwrites its own partition (no double counting); the duplicate
    delivery inside a batch counts once."""
    from vector_store_spark.streaming.neardup import QualityMonitorSink

    rows1 = [(1, "a decent document with several words", "web"),
             (2, "another fine piece of text here", "web"),
             (3, "short", "book")]
    rows2 = [(4, "later batch content arriving now", "web"),
             (4, "later batch content arriving now", "web")]  # dup delivery
    mk = lambda r: spark.createDataFrame(r, "doc_id long, text string, source string")
    sink = QualityMonitorSink(spark, str(tmp_path / "store"))
    sink.process_batch(mk(rows1), 0)
    sink.process_batch(mk(rows2), 1)
    got = {(r["batch"], r["source"]): (r["n_docs"], r["n_chars"])
           for r in sink.series().collect()}
    assert got[(0, "web")] == (2, len(rows1[0][1]) + len(rows1[1][1]))
    assert got[(0, "book")] == (1, 5)
    assert got[(1, "web")] == (1, len(rows2[0][1]))  # deduped within batch
    # replay batch 1: series unchanged
    sink.process_batch(mk(rows2), 1)
    assert len(sink.series().collect()) == 3
    # an empty store yields the typed empty series
    empty = QualityMonitorSink(spark, str(tmp_path / "none")).series()
    assert empty.count() == 0 and "mean_quality" in empty.columns
