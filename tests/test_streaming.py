"""Streaming CDC maintenance tests (S3–S5, W2/W3/W8): file-source micro-batches
through foreachBatch into the bucket-partitioned LWW snapshot, with checkpoint
resume and late/duplicate reconciliation."""

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_store_spark.streaming.cdc import CdcSnapshotSink, merge_batch_into_snapshot

SCHEMA = "op string, pk int, v double, f int, ts bigint, seq bigint"


def write_events(dirpath, fname, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as fh:
        for op, pk, v, f, ts, seq in rows:
            fh.write(json.dumps({"op": op, "pk": pk, "v": v, "f": f, "ts": ts, "seq": seq}) + "\n")


def run_stream(spark, sink, src_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(src_dir)
    q = sink.start(stream, checkpoint_dir=ckpt)
    q.awaitTermination(120)


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "snap"), str(tmp_path / "ckpt")


def snapshot_dict(sink, target="v"):
    return {r.pk: (r.v, r.f) for r in sink.live_view(target).collect()}


def test_two_microbatches_with_late_and_duplicate_events(spark, dirs):
    src, snap, ckpt = dirs
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v", "f"], num_buckets=4)

    # batch 1: bootstrap (the full-scan stand-in)
    write_events(src, "b1.json", [
        ("upsert", 1, 1.0, 10, 100, 1),
        ("upsert", 2, 2.0, 20, 100, 2),
        ("upsert", 3, 3.0, 30, 100, 3),
    ])
    run_stream(spark, sink, src, ckpt)
    assert snapshot_dict(sink) == {1: (1.0, 10), 2: (2.0, 20), 3: (3.0, 30)}

    # batch 2: newer update, duplicate of an old event (fine-reader replay),
    # a late stale update, and a delete
    write_events(src, "b2.json", [
        ("upsert", 1, 1.5, 11, 200, 4),   # real update
        ("upsert", 2, 2.0, 20, 100, 2),   # exact duplicate — idempotent
        ("upsert", 3, 9.9, 99, 50, 5),    # late & stale — must NOT replace ts=100
        ("delete", 2, None, None, 300, 6),
    ])
    run_stream(spark, sink, src, ckpt)
    assert snapshot_dict(sink) == {1: (1.5, 11), 3: (3.0, 30)}

    # tombstone is retained: a later replay of a stale upsert cannot resurrect
    write_events(src, "b3.json", [("upsert", 2, 2.2, 22, 250, 7)])  # 250 < 300
    run_stream(spark, sink, src, ckpt)
    assert snapshot_dict(sink) == {1: (1.5, 11), 3: (3.0, 30)}

    # but a genuinely newer write does re-insert
    write_events(src, "b4.json", [("upsert", 2, 2.5, 25, 400, 8)])
    run_stream(spark, sink, src, ckpt)
    assert snapshot_dict(sink) == {1: (1.5, 11), 2: (2.5, 25), 3: (3.0, 30)}


def test_checkpoint_resume_skips_processed_files(spark, dirs):
    src, snap, ckpt = dirs
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v", "f"], num_buckets=2)
    write_events(src, "b1.json", [("upsert", 1, 1.0, 10, 100, 1)])
    run_stream(spark, sink, src, ckpt)
    # restarting with the same checkpoint must not reprocess b1 (W8);
    # replay would be harmless (idempotent) but progress must advance
    run_stream(spark, sink, src, ckpt)
    assert snapshot_dict(sink) == {1: (1.0, 10)}


def test_bucket_partition_layout(spark, dirs):
    src, snap, ckpt = dirs
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v", "f"], num_buckets=4)
    write_events(src, "b1.json", [("upsert", i, float(i), i, 100, i) for i in range(20)])
    run_stream(spark, sink, src, ckpt)
    buckets = [d for d in os.listdir(snap) if d.startswith("_bucket=")]
    assert len(buckets) >= 2  # physically partitioned by bucket


def test_gc_tombstones(spark):
    batch = spark.createDataFrame(
        [("upsert", 1, 1.0, 100, 1), ("delete", 1, None, 200, 2), ("delete", 2, None, 150, 3)],
        "op string, pk int, v double, ts bigint, seq bigint",
    )
    merged = merge_batch_into_snapshot(None, batch, ["pk"], ["v"], gc_tombstones_before=180)
    rows = {r.pk: r.v for r in merged.collect()}
    assert rows == {1: None}  # pk=2's tombstone (ts 150 < 180) collected; pk=1 kept


def test_derived_partition_cols_prune_serving(spark, sf_dir, tmp_path):
    """CdcSnapshotSink with a derived 'cluster' partition column: the
    snapshot serves cluster-pruned scans (PartitionFilters), and an updated
    vector moves to its new cluster directory (W3 move-between-partitions)."""
    import os

    from pyspark.sql import functions as F

    from vector_store_spark.sources.index_store import prune_report
    from vector_store_spark.streaming.cdc import CdcSnapshotSink

    root = str(tmp_path)
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)
    schema = "op string, pk bigint, v double, ts bigint, seq bigint"

    def parity_cluster(df):
        return F.when(F.col("v").isNull(), F.lit(-1)).otherwise(
            (F.col("v") % 2).cast("long")
        )

    sink = CdcSnapshotSink(
        spark, snap, ["pk"], ["v"], num_buckets=2,
        derived_partition_cols={"cluster": parity_cluster},
    )
    b1 = [("upsert", i, float(i), 100, i) for i in range(10)]
    spark.createDataFrame(b1, schema).write.json(os.path.join(src, "b1"))
    q = sink.start(
        spark.readStream.schema(schema).json(os.path.join(src, "*")),
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)
    # pk=3 moves from cluster 1 (v=3) to cluster 0 (v=4): move-between-partitions
    spark.createDataFrame(
        [("upsert", 3, 4.0, 200, 99)], schema
    ).write.json(os.path.join(src, "b2"))
    q = sink.start(
        spark.readStream.schema(schema).json(os.path.join(src, "*")),
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)

    live = sink.live_view("v")
    even = live.where(F.col("cluster") == 0)
    assert {r.pk for r in even.collect()} == {0, 2, 3, 4, 6, 8}
    rep = prune_report(even)
    assert any("cluster" in p for p in rep["partition_filters"])


def test_derived_partition_stale_leaf_dropped_on_move(spark, tmp_path):
    """When the ONLY row of a (bucket, cluster) leaf moves cluster (or dies),
    dynamic overwrite cannot rewrite the now-empty leaf — the sink must drop
    its directory or the old row would resurrect next to the new one."""
    import os

    from pyspark.sql import functions as F

    from vector_store_spark.streaming.cdc import CdcSnapshotSink

    root = str(tmp_path)
    src, snap, ckpt = (os.path.join(root, d) for d in ("src", "snap", "ckpt"))
    os.makedirs(src)
    schema = "op string, pk bigint, v double, ts bigint, seq bigint"

    def parity_cluster(df):
        return F.when(F.col("v").isNull(), F.lit(-1)).otherwise(
            (F.col("v") % 2).cast("long")
        )

    sink = CdcSnapshotSink(
        spark, snap, ["pk"], ["v"], num_buckets=1,
        derived_partition_cols={"cluster": parity_cluster},
    )
    # pk=1 is the ONLY odd-v row: cluster=1 leaf has exactly one row
    b1 = [("upsert", 1, 3.0, 100, 1), ("upsert", 2, 2.0, 100, 2)]
    spark.createDataFrame(b1, schema).write.json(os.path.join(src, "b1"))
    q = sink.start(
        spark.readStream.schema(schema).json(os.path.join(src, "*")),
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)
    # move pk=1 to cluster 0 — the cluster=1 leaf becomes empty
    spark.createDataFrame(
        [("upsert", 1, 4.0, 200, 9)], schema
    ).write.json(os.path.join(src, "b2"))
    q = sink.start(
        spark.readStream.schema(schema).json(os.path.join(src, "*")),
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)

    live = sink.live_view("v").collect()
    assert {(r.pk, r.v, r.cluster) for r in live} == {(1, 4.0, 0), (2, 2.0, 0)}
    # exactly one row for pk=1 — the stale cluster=1 copy is gone
    assert sum(1 for r in live if r.pk == 1) == 1
    bucket_dirs = [
        os.path.join(snap, d) for d in os.listdir(snap) if d.startswith("_bucket=")
    ]
    leaves = {e for b in bucket_dirs for e in os.listdir(b) if e.startswith("cluster=")}
    assert "cluster=1" not in leaves


def test_ttl_expiry_vs_lww(spark, dirs):
    """TTL semantics (validator cdc.rs:567, 699): expires_at rides LWW as a
    value column; live_view(as_of) reads expired rows as tombstones; a
    NEWER upsert resurrects an expired key, a stale pre-expiry replay (even
    with a far-future TTL) loses LWW; GC drops rows expired past the
    horizon."""
    src, snap, ckpt = dirs
    schema = "op string, pk int, v double, exp bigint, ts bigint, seq bigint"

    def write(fname, rows):
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, fname), "w") as fh:
            for op, pk, v, exp, ts, seq in rows:
                fh.write(json.dumps({"op": op, "pk": pk, "v": v, "exp": exp,
                                     "ts": ts, "seq": seq}) + "\n")

    # num_buckets=1 so every micro-batch touches the one bucket: the GC
    # assertion below needs pk=1's leaf to be REWRITTEN by the b3 merge
    # (GC, like tombstone GC, compacts only touched buckets)
    sink = CdcSnapshotSink(spark, snap, ["pk"], ["v"], num_buckets=1,
                           expire_col="exp")
    write("b1.json", [
        ("upsert", 1, 1.0, 250, 100, 1),   # expires at 250
        ("upsert", 2, 2.0, None, 100, 2),  # no TTL
        ("upsert", 3, 3.0, 250, 100, 3),   # expires at 250
        ("upsert", 4, 4.0, 1000, 100, 4),  # far-future TTL
    ])
    stream = spark.readStream.schema(schema).json(src)
    sink.start(stream, checkpoint_dir=ckpt).awaitTermination(120)

    def live(as_of):
        return {r.pk: r.v for r in sink.live_view("v", as_of=as_of).collect()}

    assert live(200) == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}  # nothing expired yet
    assert live(300) == {2: 2.0, 4: 4.0}                  # 1, 3 expired

    write("b2.json", [
        ("upsert", 3, 33.0, None, 300, 5),  # resurrect AFTER expiry: wins
        ("upsert", 1, -1.0, 9999, 50, 6),   # stale replay: loses LWW
    ])
    stream2 = spark.readStream.schema(schema).json(src)
    sink.start(stream2, checkpoint_dir=ckpt).awaitTermination(120)
    assert live(300) == {2: 2.0, 3: 33.0, 4: 4.0}  # 3 resurrected, 1 stays dead

    # GC: a sink with the safety horizon past pk=1's expiry drops the row
    # from the leaf entirely on its next touching merge
    sink_gc = CdcSnapshotSink(spark, snap, ["pk"], ["v"], num_buckets=1,
                              expire_col="exp", gc_tombstones_before=500)
    write("b3.json", [("upsert", 5, 5.0, None, 400, 7)])
    stream3 = spark.readStream.schema(schema).json(src)
    sink_gc.start(stream3, checkpoint_dir=ckpt).awaitTermination(120)
    snap_rows = {r.pk for r in sink_gc.read_snapshot().collect()}
    assert 1 not in snap_rows  # expired (250) < horizon (500): GC'd
    assert {2, 3, 4, 5} <= snap_rows


def test_session_window_merges_fragments_across_microbatches(spark, tmp_path):
    """Two halves of ONE logical session arrive in separate micro-batches
    (older fragment second): the session-window state store must merge them
    into a single session spanning both."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = 1_700_000_000_000_000  # µs
    mins = lambda m: base + m * 60_000_000  # noqa: E731
    # session A: events at t0 and t0+5min (gap 10min) — split across files,
    # LATER half first; session B: a lone event 30min out
    with open(os.path.join(src, "f1.json"), "w") as f:
        f.write(_json.dumps({"event_id": 2, "user_id": 1, "ts_us": mins(5)}) + "\n")
        f.write(_json.dumps({"event_id": 3, "user_id": 1, "ts_us": mins(30)}) + "\n")
    with open(os.path.join(src, "f2.json"), "w") as f:
        f.write(_json.dumps({"event_id": 1, "user_id": 1, "ts_us": mins(0)}) + "\n")

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    agg = stream.groupBy(
        F.session_window("ts", "10 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("sess_merge_test").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["w"].start.timestamp() * 1e6 - base, r.n)
        for r in spark.table("sess_merge_test").collect()
    )
    # one merged 2-event session at t0, one singleton at +30min
    assert got == [(0.0, 2), (30 * 60_000_000.0, 1)]


def test_session_window_append_mode_emits_closed_sessions(spark, tmp_path):
    """The at-scale sessionization posture documented on
    stream_sessions_endstate: append mode + watermark emits each session ONCE
    its gap closes and evicts it from state. Run 1 processes the events; run 2
    (same checkpoint) feeds a far-future sentinel that advances the watermark
    and flushes every remaining real session. The sentinel's own session
    stays open and must never emit."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    base = 1_700_000_000_000_000
    mins = lambda m: base + m * 60_000_000  # noqa: E731
    with open(os.path.join(src, "b1.json"), "w") as f:
        # user 1: two sessions (gap 10min): [0,5] and [40]
        for eid, m in ((1, 0), (2, 5), (3, 40)):
            f.write(_json.dumps({"event_id": eid, "user_id": 1, "ts_us": mins(m)}) + "\n")

    emitted: list = []

    def start():
        stream = (
            spark.readStream.schema("event_id long, user_id long, ts_us long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            .withWatermark("ts", "1 minute")
        )
        agg = stream.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        ).agg(F.count("*").alias("n"))
        return (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: emitted.extend(
                (r.user_id, r.n) for r in df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )

    start().awaitTermination(120)
    run1 = set(emitted)
    # run 1 may or may not flush the closed [0,5] session (emission needs a
    # batch AFTER the watermark advance; availableNow's trailing no-data
    # batch is version-dependent) — but it must NOT emit the open singleton
    assert run1 <= {(1, 2)}

    # TWO sentinel files (one per micro-batch): batch b2 advances the
    # watermark past the open session's close, and batch b3 is the DATA
    # batch that emits it — so the final flush does not depend on the
    # version-specific trailing no-data batch either
    for fname, m in (("b2.json", 24 * 60), ("b3.json", 48 * 60)):
        with open(os.path.join(src, fname), "w") as f:
            f.write(_json.dumps({"event_id": 99, "user_id": -1, "ts_us": mins(m)}) + "\n")
    start().awaitTermination(120)
    # the sentinels push the watermark past every real session's close:
    # both real sessions are out exactly once; the FIRST sentinel's session
    # closes too (the second advanced the watermark past it) but the final
    # sentinel's session stays open and must never emit
    assert sorted(t for t in emitted if t[0] != -1) == [(1, 1), (1, 2)]
    assert emitted.count((-1, 1)) == 1
