"""W3/W4/A5 merge semantics — ports the reference's state-machine sweep
(table/mod.rs:1420-1676) and FIXTURES.md F6 scripted sequences to batch."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.lww import lww_latest, lww_merge

SCHEMA = "op string, pk int, v array<float>, f int, ts bigint, seq bigint"


def merge(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return lww_merge(df, ["pk"], ["v", "f"], target_col=kw.pop("target_col", "v"), **kw)


def by_pk(df):
    return {r.pk: r for r in df.collect()}


def test_f6_scripted_sequence(spark):
    rows = [
        # pk=1: insert → stale upsert (ignored) → newer (replaces) → delete → re-insert
        ("upsert", 1, [1.0], 10, 100, 1),
        ("upsert", 1, [9.0], 90, 50, 2),    # stale: ts 50 < 100
        ("upsert", 1, [2.0], 20, 150, 3),
        ("delete", 1, None, None, 200, 4),
        ("upsert", 1, [3.0], 30, 250, 5),
        # pk=2: ends deleted
        ("upsert", 2, [5.0], 50, 100, 6),
        ("delete", 2, None, None, 300, 7),
        # pk=3: null-v upsert ⇒ target tombstone (not indexed)
        ("upsert", 3, [7.0], 70, 100, 8),
        ("upsert", 3, None, 71, 200, 9),
    ]
    got = by_pk(merge(spark, rows))
    assert set(got) == {1}
    assert got[1].v == [3.0] and got[1].f == 30


def test_equal_ts_does_not_replace(spark):
    # table/mod.rs:624-660: an equal-timestamp write does not replace
    rows = [
        ("upsert", 1, [1.0], 10, 100, 1),
        ("upsert", 1, [2.0], 20, 100, 2),  # same ts, processed later ⇒ ignored
    ]
    got = by_pk(merge(spark, rows))
    assert got[1].v == [1.0] and got[1].f == 10


def test_delete_vs_equal_ts_upsert_order(spark):
    # processed-first wins on ties, for deletes too
    rows = [
        ("upsert", 1, [1.0], 10, 100, 1),
        ("delete", 1, None, None, 100, 2),  # equal ts, later ⇒ does not replace
        ("delete", 2, None, None, 100, 3),
        ("upsert", 2, [2.0], 20, 100, 4),   # equal ts after delete ⇒ stays dead
    ]
    got = by_pk(merge(spark, rows))
    assert set(got) == {1}
    assert got[1].v == [1.0]


def test_per_column_writetimes(spark):
    # FIXTURES.md F3: category updated later than v — per-column independence
    schema = "op string, pk int, v array<float>, f int, ts bigint, wt_v bigint, wt_f bigint, seq bigint"
    rows = [
        ("upsert", 1, [1.0], 10, 100, 100, 100, 1),
        ("upsert", 1, [2.0], 20, 150, 120, 200, 2),  # v write older than f write
        ("upsert", 1, [3.0], 30, 160, 90, 150, 3),   # both stale vs current
    ]
    df = spark.createDataFrame(rows, schema)
    got = by_pk(
        lww_merge(df, ["pk"], ["v", "f"], writetime_cols={"v": "wt_v", "f": "wt_f"}, target_col="v")
    )
    assert got[1].v == [2.0]  # wt 120 beats 100 and 90
    assert got[1].f == 20     # wt 200 beats 100 and 150


def test_delete_tombstones_at_event_ts_even_with_writetimes(spark):
    schema = "op string, pk int, v array<float>, f int, ts bigint, wt_v bigint, wt_f bigint, seq bigint"
    rows = [
        ("upsert", 1, [1.0], 10, 100, 100, 300, 1),  # f written 'in the future'
        ("delete", 1, None, None, 200, None, None, 2),
    ]
    df = spark.createDataFrame(rows, schema)
    merged = lww_merge(df, ["pk"], ["v", "f"], writetime_cols={"v": "wt_v", "f": "wt_f"})
    got = by_pk(merged)
    assert got[1].v is None          # tombstoned (100 < 200)
    assert got[1].f == 10            # f's writetime 300 survives the ts-200 tombstone


def test_partition_move_and_partition_lifecycle(spark):
    # W4: partition key derived from a value column — a move is just the row
    # landing in its new partition in the merged snapshot; emptied partitions
    # vanish (table/mod.rs:237-285, 989-1000)
    rows = [
        ("upsert", 1, [1.0], 7, 100, 1),   # partition f=7
        ("upsert", 1, [1.0], 8, 200, 2),   # moves to partition f=8
        ("upsert", 2, [2.0], 7, 100, 3),
        ("delete", 2, None, None, 200, 4),  # partition 7 now empty
    ]
    snap = merge(spark, rows)
    parts = {r.f: r["count"] for r in snap.groupBy("f").count().collect()}
    assert parts == {8: 1}


def test_emit_writetimes(spark):
    rows = [("upsert", 1, [1.0], 10, 100, 1), ("upsert", 1, [2.0], 20, 150, 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = by_pk(lww_merge(df, ["pk"], ["v", "f"], emit_writetimes=True))
    assert got[1].v_writetime == 150 and got[1].f_writetime == 150


def test_lww_latest(spark):
    df = spark.createDataFrame(
        [(1, 100, 1, "a"), (1, 200, 2, "b"), (1, 200, 3, "c"), (2, 50, 4, "d")],
        "pk int, ts bigint, seq bigint, val string",
    )
    got = {r.pk: r.val for r in lww_latest(df, ["pk"], "ts", "seq", ["val"]).collect()}
    assert got == {1: "b", 2: "d"}  # ts 200 wins; seq 2 beats seq 3 on tie


def test_sixteen_partition_layout_sweep(spark):
    """Port of table/mod.rs:1426-1676: the same scripted event stream swept
    through every partition-key layout (all 16 subsets of the key/filter
    columns). Batch semantics: the merged snapshot is layout-invariant; only
    the partition *assignment* of live rows changes, moved rows land in their
    new partition, and emptied partitions vanish."""
    from itertools import combinations

    schema = "op string, pk int, c1 int, c2 int, v array<float>, f int, ts bigint, seq bigint"
    rows = [
        ("upsert", 1, 10, 100, [1.0], 7, 100, 1),
        ("upsert", 1, 10, 100, [2.0], 8, 200, 2),   # replaces
        ("upsert", 2, 20, 200, [3.0], 7, 100, 3),
        ("delete", 2, 20, 200, None, None, 300, 4),  # row gone
        ("upsert", 3, 30, 300, [4.0], 9, 100, 5),
        ("upsert", 3, 30, 300, [4.5], 5, 150, 6),   # f moves 9 -> 5 (partition
                                                     # move when f in layout)
        ("upsert", 4, 40, 400, None, 6, 100, 7),     # null target: not indexed
    ]
    df = spark.createDataFrame(rows, schema)
    merged = lww_merge(df, ["pk", "c1", "c2"], ["v", "f"], target_col="v")
    live = {(r.pk, r.c1, r.c2): r for r in merged.collect()}
    # layout-invariant merged snapshot
    assert set(live) == {(1, 10, 100), (3, 30, 300)}
    assert live[(1, 10, 100)].v == [2.0] and live[(1, 10, 100)].f == 8
    assert live[(3, 30, 300)].f == 5

    cols = ["pk", "c1", "c2", "f"]
    layouts = [()] + [
        c for n in range(1, 5) for c in combinations(cols, n)
    ]
    assert len(layouts) == 16
    for layout in layouts:
        if not layout:  # global index: one partition with every live row
            parts = {(): 2}
        else:
            parts = {
                tuple(r[c] for c in layout): r["cnt"]
                for r in merged.groupBy(*layout).agg(F.count("*").alias("cnt")).collect()
            }
        # every partition has ≥1 live row (W4: emptied partitions vanish)
        assert all(v >= 1 for v in parts.values()), layout
        total = sum(parts.values())
        assert total == 2, layout
        if "f" in layout:
            # pk=3's row must sit in its post-move partition (f=5, not f=9)
            fi = layout.index("f")
            assert all(key[fi] != 9 for key in parts), layout
