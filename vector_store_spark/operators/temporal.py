"""Temporal joins the reference's event pipelines imply but Spark lacks as
built-ins: as-of join and interval (range) join — expressed as compositions
of existing DataFrame ops (the brief's preferred custom-operator tier), with
no cross join and no per-row Python.

- ``asof_join``: for every left row, the latest right row with
  ``right.ts <= left.ts`` per key — the union-tag + running ``last_value``
  window formulation: one shuffle on the key, each key's timeline scanned
  once, no join node at all. Skew follows key cardinality (user-keyed
  timelines are high-cardinality); this is the classic scale-safe as-of.
- ``range_join_bucketed``: pairs with ``right.ts ∈ [left.ts+lower,
  left.ts+upper]`` per key — time-bucket blocking: the left side fans out to
  the ≤ ⌈span/width⌉+1 buckets its window covers, the join is a plain
  equi-join on (key, bucket), and an exact range filter removes bucket-edge
  false positives. At 100 TB this is a shuffle equi-join on (key, bucket)
  (big-big range joins genuinely shuffle); the bucket key bounds the blowup
  to window-coverage, never a nested-loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the payload (``right_cols`` and the
    right timestamp, suffixed) of the key's latest right row at-or-before
    ``ts_col`` (``direction='backward'``), earliest right row at-or-after it
    (``'forward'``), or whichever of those two is closer in time
    (``'nearest'``, backward winning exact-distance ties); nulls when none
    exists (or it is further than ``tolerance_us``). Equal timestamps match
    (right sorts before left at the same instant). Right (key, ts) pairs
    must be unique for a deterministic result.

    All directions are the same union-tag window scan — forward reverses the
    timeline (ORDER BY ts DESC) so the running ``last_value`` picks the
    smallest right ts ≥ left ts; nearest evaluates both windows over ONE
    shuffle (same partitioning, two sort orders) and picks the smaller
    absolute distance. Cross-validated against pandas merge_asof in
    tests/test_temporal.py."""
    if direction not in ("backward", "forward", "nearest"):
        raise NotImplementedError("asof_join supports backward/forward/nearest")
    on = list(on)
    right_cols = [c for c in right_cols if c != ts_col]
    pay = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in right_cols])
    r_sel = right.select(*on, F.col(ts_col), pay.alias("_apay"))
    pay_type = r_sel.schema["_apay"].dataType

    lcols = left.columns
    u_l = left.select(
        *lcols,
        F.lit(None).cast(pay_type).alias("_apay"),
        F.lit(1).alias("_atag"),
    )
    u_r = r_sel.select(
        *[
            (F.col(c) if (c in on or c == ts_col)
             else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        "_apay",
        F.lit(0).alias("_atag"),
    )
    def _win(asc: bool):
        order = F.col(ts_col).asc() if asc else F.col(ts_col).desc()
        return (
            Window.partitionBy(*on)
            .orderBy(order, F.col("_atag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    u = u_l.unionByName(u_r)
    lts = F.unix_micros(F.col(ts_col))

    def _lag_of(match):  # non-negative time distance of a candidate match
        return F.abs(F.unix_micros(match[ts_col]) - lts)

    if direction in ("backward", "forward"):
        u = u.withColumn(
            "_amatch",
            F.last("_apay", ignorenulls=True).over(_win(direction == "backward")),
        )
    else:  # nearest: both scans share one shuffle (same partitioning)
        back = F.last("_apay", ignorenulls=True).over(_win(True))
        fwd = F.last("_apay", ignorenulls=True).over(_win(False))
        u = u.withColumn("_amb", back).withColumn("_amf", fwd)
        u = u.withColumn(
            "_amatch",
            F.when(F.col("_amb").isNull(), F.col("_amf"))
            .when(F.col("_amf").isNull(), F.col("_amb"))
            # strict <: backward wins exact-distance ties (pandas semantics)
            .when(_lag_of(F.col("_amf")) < _lag_of(F.col("_amb")), F.col("_amf"))
            .otherwise(F.col("_amb")),
        ).drop("_amb", "_amf")
    out = u.where(F.col("_atag") == 1)
    if tolerance_us is not None:
        out = out.withColumn(
            "_amatch",
            F.when(_lag_of(F.col("_amatch")) <= tolerance_us, F.col("_amatch")),
        )
    out = out.withColumn(f"{ts_col}{suffix}", F.col(f"_amatch.{ts_col}"))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_amatch.{c}"))
    return out.drop("_apay", "_atag", "_amatch")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    lower_us: int,
    upper_us: int,
    bucket_us: int | None = None,
    right_cols: Sequence[str] = (),
    suffix: str = "_right",
    broadcast_right: bool = False,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs per key with
    ``right.ts ∈ [left.ts + lower_us, left.ts + upper_us]`` (inclusive,
    microsecond offsets, ``lower_us <= upper_us``). Bucket width defaults to
    the window span, so each left row fans out to at most 2 buckets.

    ``broadcast_right=True`` hints the right side broadcast — correct when it
    is a filtered, metadata-sized slice; leave False for big-big interval
    joins, where the shuffle equi-join on (key, bucket) IS the intended
    100 TB plan (a genuine big-big range join has to shuffle; the bucket key
    is what keeps it from being a nested loop).

    ``how='left_outer'`` keeps unmatched left rows (null right columns) by
    moving the range predicate into the join condition. NB the bucket fanout
    then yields one null row per *unmatched bucket* of a left row — always
    aggregate per left id downstream (count non-null right ids), never treat
    left_outer output rows as distinct left rows."""
    if lower_us > upper_us:
        raise ValueError("lower_us must be <= upper_us")
    on = list(on)
    w_us = bucket_us or max(upper_us - lower_us, 1)
    r_us = F.unix_micros(F.col(ts_col))
    l_us = F.unix_micros(F.col(ts_col))
    right_cols = [c for c in right_cols if c != ts_col]
    r = right.select(
        *on,
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.floor(r_us / w_us).alias("_rbkt"),
    )
    l = left.withColumn(
        "_rbkt",
        F.explode(
            F.sequence(
                F.floor((l_us + lower_us) / w_us),
                F.floor((l_us + upper_us) / w_us),
            )
        ),
    )
    if broadcast_right:
        r = F.broadcast(r)
    lo = F.unix_micros(F.col(ts_col)) + lower_us
    hi = F.unix_micros(F.col(ts_col)) + upper_us
    rr = F.unix_micros(F.col(f"{ts_col}{suffix}"))
    in_range = (rr >= lo) & (rr <= hi)
    if how == "inner":
        return l.join(r, [*on, "_rbkt"]).drop("_rbkt").where(in_range)
    if how == "left_outer":
        r2 = r
        for c in [*on, "_rbkt"]:
            r2 = r2.withColumnRenamed(c, f"_r_{c}")
        cond = F.col("_rbkt") == F.col("_r__rbkt")
        for c in on:
            cond = cond & (F.col(c) == F.col(f"_r_{c}"))
        out = l.join(r2, cond & in_range, "left_outer")
        return out.drop("_rbkt", "_r__rbkt", *[f"_r_{c}" for c in on])
    raise ValueError(f"how must be inner or left_outer, got {how!r}")
