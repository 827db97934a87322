"""applyInPandasWithState LWW: multi-batch streaming equals batch lww_merge on
the same events; equal-ts no-replace; tombstones; state persists across
micro-batches."""

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.lww import lww_merge
from vector_store_spark.streaming.stateful import stateful_lww

SCHEMA = "id long, ts long, seq long, op string, v double, label string"

BATCH1 = [
    (1, 100, 0, "upsert", 1.0, "a"),
    (1, 200, 1, "upsert", 2.0, "b"),
    (2, 100, 2, "upsert", 5.0, "x"),
    (2, 100, 3, "upsert", 9.0, "y"),  # equal ts: first (seq 2) wins
]
BATCH2 = [
    (1, 150, 4, "upsert", 99.0, "z"),   # late, stale -> ignored
    (2, 300, 5, "delete", None, None),  # tombstone both columns @300
    (3, 50, 6, "upsert", 7.0, "q"),
]


def _write_batch(d, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    t = pa.table(
        {
            "id": pa.array(cols[0], "int64"),
            "ts": pa.array(cols[1], "int64"),
            "seq": pa.array(cols[2], "int64"),
            "op": pa.array(cols[3], "string"),
            "v": pa.array(cols[4], "float64"),
            "label": pa.array(cols[5], "string"),
        }
    )
    pq.write_table(t, os.path.join(d, name))


def _run_stream(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    merged = stateful_lww(stream, ["id"], ["v", "label"])
    q = (
        merged.writeStream.outputMode("update")
        .foreachBatch(lambda df, _bid: df.write.mode("append").parquet(out_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_lww_matches_batch_merge(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    for d in (src, out, ckpt):
        d.mkdir()

    # micro-batch 1
    _write_batch(str(src), "b1.parquet", BATCH1)
    _run_stream(spark, str(src), str(ckpt), str(out))
    # micro-batch 2 (same checkpoint -> state persists)
    _write_batch(str(src), "b2.parquet", BATCH2)
    _run_stream(spark, str(src), str(ckpt), str(out))

    # final state per key = last appended row per key
    got = spark.read.parquet(str(out))
    w = F.struct(F.col("v_writetime"), F.col("label_writetime"))
    final = {
        r.id: r
        for r in got.withColumn("_w", w)
        .orderBy("_w")
        .collect()
    }  # dict keeps the last (max writetime) row per id

    batch_events = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    expected = {
        r.id: r
        for r in lww_merge(
            batch_events, ["id"], ["v", "label"], emit_writetimes=True
        ).collect()
    }

    assert set(final) == set(expected) == {1, 2, 3}
    for k in expected:
        assert final[k].v == expected[k].v, k
        assert final[k].label == expected[k].label, k
        assert final[k].v_writetime == expected[k].v_writetime, k

    # spot-check pinned semantics
    assert expected[1].v == 2.0 and expected[1].label == "b"   # stale 150 ignored
    assert expected[2].v is None and expected[2].label is None  # tombstoned
    assert expected[3].v == 7.0
