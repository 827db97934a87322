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


def test_events_funnel_strict_ordering(spark, tmp_path):
    """Sequential semantics: a click BEFORE the first view doesn't convert,
    a purchase requires a prior qualifying click, equal timestamps are NOT
    'after' (strict >)."""
    import datetime as dt

    from vector_store_spark.queries_temporal import events_funnel

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: view(1) -> click(2) -> purchase(3): full funnel
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "purchase", 0.0, "{}"),
        # u2: click(1) BEFORE view(2): stops at view
        (4, t(1), 2, "click", 0.0, "{}"),
        (5, t(2), 2, "view", 0.0, "{}"),
        # u3: view(1), click AT the same second (strict > excludes it)
        (6, t(1), 3, "view", 0.0, "{}"),
        (7, t(1), 3, "click", 0.0, "{}"),
        # u4: purchase only: no view -> counted in n_users alone
        (8, t(1), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    # load_events expects a directory holding events.parquet
    out = events_funnel(spark, str(tmp_path)).collect()[0]
    assert out["n_users"] == 4
    assert out["n_view"] == 3
    assert out["n_view_click"] == 1  # only u1: u2's click precedes its view
    assert out["n_full_funnel"] == 1
    assert out["conversion_rate"] == round(1.0 / 3.0, 6)


def test_events_hourly_anomalies_zscore_math(spark, tmp_path):
    """Hand-computed z on counts [1, 3, 2]: mean=2, sample var=1, so the
    hours score -1, +1, 0; single-hour types drop (undefined variance)."""
    import datetime as dt

    from vector_store_spark.queries_temporal import events_hourly_anomalies

    h = lambda i, m: dt.datetime(2024, 1, 1, i, m, 0)  # noqa: E731
    rows = []
    eid = 0
    for hour, n in ((0, 1), (1, 3), (2, 2)):
        for m in range(n):
            eid += 1
            rows.append((eid, h(hour, m), 1, "click", 0.0, "{}"))
    rows.append((99, h(0, 0), 1, "view", 0.0, "{}"))  # one hour only -> dropped
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_hourly_anomalies(spark, str(tmp_path)).collect()
    got = {(r["event_type"], r["hour_ts"].hour): (r["n_events"], r["zscore"]) for r in out}
    assert got == {
        ("click", 0): (1, -1.0),
        ("click", 1): (3, 1.0),
        ("click", 2): (2, 0.0),
    }


def test_attribution_last_touch_semantics(spark, tmp_path):
    """Last-touch: most recent STRICTLY PRIOR view/click in (ts, event_id)
    order; purchases with no prior touch attribute to 'direct'; value sums
    in integer cents."""
    import datetime as dt

    from vector_store_spark.queries_temporal import events_attribution

    t0 = dt.datetime(2026, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        # user 1: view -> click -> purchase  => click
        (1, s(1), 1, "view", 0.0, "{}"),
        (2, s(2), 1, "click", 0.0, "{}"),
        (3, s(3), 1, "purchase", 10.5, "{}"),
        # user 2: purchase first (no touch) => direct; then view -> purchase
        (4, s(1), 2, "purchase", 2.0, "{}"),
        (5, s(2), 2, "view", 0.0, "{}"),
        (6, s(3), 2, "purchase", 3.25, "{}"),
        # user 3: click at the SAME ts as the purchase but lower event_id —
        # the (ts, event_id) tie-break makes it a prior row => click
        (7, s(5), 3, "click", 0.0, "{}"),
        (8, s(5), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)
    got = {
        r.channel: (r.n_purchases, r.value_cents)
        for r in events_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {"click": (2, 1150), "direct": (1, 200), "view": (1, 325)}
