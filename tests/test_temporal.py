"""asof_join / range_join_bucketed semantics: backward match, equal-ts
inclusion, tolerance, null on no-match, and bucket-blocking exactness vs a
naive range-predicate join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.temporal import asof_join, range_join_bucketed


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(20)), (3, 10, _ts(5)), (4, 20, _ts(30))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(8)), (101, 10, _ts(10)), (102, 10, _ts(15)), (103, 30, _ts(1))],
        "rid long, k long, ts timestamp",
    )
    return left, right


def test_asof_backward_with_equal_ts_and_nulls(sides):
    left, right = sides
    got = {r.lid: (r.rid_r, r.ts_r) for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r").collect()}
    assert got[1] == (101, _ts(10))   # equal ts matches
    assert got[2] == (102, _ts(15))   # latest preceding
    assert got[3] == (None, None)     # rights at 8/10/15 are all in the future
    assert got[4] == (None, None)     # key 20 has no right rows


def test_asof_tolerance(sides):
    left, right = sides
    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r",
                     tolerance_us=2_000_000).collect()}
    assert got[1] == 101   # lag 0 <= 2s
    assert got[2] is None  # lag 5s > 2s
    assert got[3] is None  # no backward match at all


def test_range_join_bucketed_matches_naive(spark):
    import random

    rnd = random.Random(3)
    left = spark.createDataFrame(
        [(i, rnd.randint(0, 5), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 3000)))
         for i in range(200)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, rnd.randint(0, 5), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 3000)))
         for i in range(200)],
        "rid long, k long, ts timestamp",
    )
    lo, hi = -120_000_000, 45_000_000
    got = {(r.lid, r.rid_r) for r in range_join_bucketed(
        left, right, ["k"], "ts", lo, hi, right_cols=["rid"], suffix="_r"
    ).collect()}
    naive = {(r.lid, r.rid) for r in (
        left.alias("l").join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.unix_micros(F.col("r.ts")) >= F.unix_micros(F.col("l.ts")) + lo)
            & (F.unix_micros(F.col("r.ts")) <= F.unix_micros(F.col("l.ts")) + hi),
        ).select(F.col("l.lid"), F.col("r.rid"))
    ).collect()}
    assert got == naive and len(got) > 0


def test_range_join_left_outer_zero_fill(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(30)), (2, 20, _ts(30))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(25))], "rid long, k long, ts timestamp"
    )
    j = range_join_bucketed(
        left, right, ["k"], "ts", -10_000_000, 0,
        right_cols=["rid"], suffix="_r", how="left_outer",
    )
    counts = {r.lid: r.n for r in j.groupBy("lid").agg(
        F.sum(F.when(F.col("rid_r").isNotNull(), 1).otherwise(0)).alias("n")
    ).collect()}
    assert counts == {1: 1, 2: 0}  # lid=2 survives with zero matches


def test_asof_join_matches_pandas_merge_asof(spark):
    """Independent oracle: pandas.merge_asof (direction='backward',
    allow_exact_matches=True) over randomized keyed timelines."""
    import random

    import pandas as pd

    rnd = random.Random(11)
    lrows = [(i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 5000)))
             for i in range(300)]
    rrows = [(1000 + i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 5000)))
             for i in range(300)]
    # merge_asof needs unique (key, ts) on the right for a deterministic pick
    seen = set()
    rrows = [r for r in rrows if (r[1], r[2]) not in seen and not seen.add((r[1], r[2]))]
    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, k long, ts timestamp")

    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r").collect()}

    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == expect


def test_asof_forward_with_equal_ts_and_nulls(sides):
    left, right = sides
    got = {r.lid: (r.rid_r, r.ts_r) for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r",
                     direction="forward").collect()}
    assert got[1] == (101, _ts(10))   # equal ts matches
    assert got[2] == (None, None)     # nothing at-or-after 20 for key 10
    assert got[3] == (100, _ts(8))    # earliest following
    assert got[4] == (None, None)     # key 20 has no right rows


def test_asof_forward_tolerance(sides):
    left, right = sides
    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r",
                     direction="forward", tolerance_us=2_000_000).collect()}
    assert got[1] == 101   # lead 0 <= 2s
    assert got[3] is None  # lead 3s > 2s


def test_asof_forward_matches_pandas_merge_asof(spark):
    """Independent oracle for direction='forward' over randomized keyed
    timelines, same protocol as the backward cross-validation."""
    import random

    import pandas as pd

    rnd = random.Random(13)
    lrows = [(i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 5000)))
             for i in range(300)]
    rrows = [(1000 + i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 5000)))
             for i in range(300)]
    seen = set()
    rrows = [r for r in rrows if (r[1], r[2]) not in seen and not seen.add((r[1], r[2]))]
    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, k long, ts timestamp")

    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r",
                     direction="forward").collect()}

    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == expect


def test_asof_nearest(sides):
    left, right = sides
    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r",
                     direction="nearest").collect()}
    assert got[1] == 101  # exact match at 10
    assert got[2] == 102  # only backward exists (15 vs nothing after 20)
    assert got[3] == 100  # 8 is 3s ahead, nearest (no backward)
    assert got[4] is None


def test_asof_nearest_matches_pandas_merge_asof(spark):
    import random

    import pandas as pd

    rnd = random.Random(17)
    # odd/even second offsets so no exact-distance ties (tie-break is
    # pinned separately: backward wins, pandas semantics)
    lrows = [(i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=2 * rnd.randint(0, 2500)))
             for i in range(300)]
    rrows = [(1000 + i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=2 * rnd.randint(0, 2500) + 1))
             for i in range(300)]
    seen = set()
    rrows = [r for r in rrows if (r[1], r[2]) not in seen and not seen.add((r[1], r[2]))]
    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, k long, ts timestamp")

    got = {r.lid: r.rid_r for r in
           asof_join(left, right, ["k"], "ts", ["rid"], suffix="_r",
                     direction="nearest").collect()}

    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == expect
