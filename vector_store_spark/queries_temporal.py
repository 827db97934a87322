"""Temporal-join registry entries over the events table: as-of join (each
error event → the user's latest preceding click) and an interval join (clicks
within the 10 minutes before each error), both oracle-gated — DuckDB's native
ASOF JOIN / range-predicate join re-derive what the bucketed Spark plans
compute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.operators.temporal import asof_join, range_join_bucketed
from vector_store_spark.registry import load_events, register

_WINDOW_US = 600 * 1_000_000  # 10 minutes


@register(
    "events_asof_error_click",
    """
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS click_event_id, r.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND r.ts <= l.ts
""",
    "As-of join: each error event paired with the user's latest at-or-before "
    "click (union-tag + running last_value window - one shuffle, no join node)",
)
def events_asof_error_click(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(errors, clicks, ["user_id"], "ts", ["event_id"], suffix="_r")
    return out.select(
        "event_id", "user_id", "ts",
        F.col("event_id_r").alias("click_event_id"),
        F.col("ts_r").alias("click_ts"),
    )


@register(
    "events_asof_forward_click",
    """
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS click_event_id, r.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND r.ts >= l.ts
""",
    "Forward as-of join: each error event paired with the user's earliest "
    "at-or-after click (same single-window scan, timeline reversed)",
)
def events_asof_forward_click(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        errors, clicks, ["user_id"], "ts", ["event_id"], suffix="_r",
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("event_id_r").alias("click_event_id"),
        F.col("ts_r").alias("click_ts"),
    )


@register(
    "events_asof_nearest_click",
    # nearest = the closer of the backward/forward matches (backward wins
    # exact ties); DuckDB has no nearest ASOF, so the oracle runs both
    # directions and picks by absolute distance — an independent formulation
    # of the same semantics
    """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
r AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
b AS (
  SELECT l.event_id, l.user_id, l.ts, r.event_id AS rid, r.ts AS rts
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
),
f AS (
  SELECT l.event_id, r.event_id AS rid, r.ts AS rts
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
)
SELECT b.event_id, b.user_id, b.ts,
       CASE WHEN b.rid IS NULL THEN f.rid
            WHEN f.rid IS NULL THEN b.rid
            WHEN epoch_us(f.rts) - epoch_us(b.ts) < epoch_us(b.ts) - epoch_us(b.rts) THEN f.rid
            ELSE b.rid END AS click_event_id,
       CASE WHEN b.rid IS NULL THEN f.rts
            WHEN f.rid IS NULL THEN b.rts
            WHEN epoch_us(f.rts) - epoch_us(b.ts) < epoch_us(b.ts) - epoch_us(b.rts) THEN f.rts
            ELSE b.rts END AS click_ts
FROM b JOIN f USING (event_id)
""",
    "Nearest as-of join: each error paired with the temporally closest click "
    "in either direction (backward wins ties) — two window orders, one shuffle",
)
def events_asof_nearest_click(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        errors, clicks, ["user_id"], "ts", ["event_id"], suffix="_r",
        direction="nearest",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("event_id_r").alias("click_event_id"),
        F.col("ts_r").alias("click_ts"),
    )


@register(
    "events_range_join_counts",
    f"""
SELECT l.event_id, count(r.event_id) AS n_clicks_10m
FROM (SELECT * FROM events WHERE event_type = 'error') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND epoch_us(r.ts) >= epoch_us(l.ts) - {_WINDOW_US}
 AND epoch_us(r.ts) <= epoch_us(l.ts)
GROUP BY l.event_id
""",
    "Interval join via time-bucket blocking: clicks in the 10 minutes before "
    "each error - equi-join on (user, bucket) + exact range filter, no "
    "nested loop",
)
def events_range_join_counts(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = range_join_bucketed(
        errors, clicks, ["user_id"], "ts",
        lower_us=-_WINDOW_US, upper_us=0, right_cols=["event_id"], suffix="_r",
        broadcast_right=True,  # one event-type slice: metadata-sized
        how="left_outer",      # zero-count errors survive; aggregate per id
    )
    return joined.groupBy("event_id").agg(
        F.sum(F.when(F.col("event_id_r").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_clicks_10m")
    )


@register(
    "events_type_stats_salted",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(min(event_id) AS BIGINT) AS min_event_id,
       CAST(max(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
""",
    "Heavy-hitter aggregation via explicit two-phase salting: 5 dominant "
    "event types x 32 salts bound per-reducer volume; distinct-users runs "
    "per (type, salt, user) then merges - no single-reducer key",
)
def events_type_stats_salted(spark, sf_dir):
    from vector_store_spark.operators.skew import salted_agg

    ev = load_events(spark, sf_dir)
    # count-distinct decomposes by salting on the DISTINCT column itself:
    # (type, user-salt) partials hold distinct user sets disjointly
    partial = salted_agg(
        ev,
        ["event_type"],
        phase1=[
            F.count("*").alias("_n"),
            F.countDistinct("user_id").alias("_nu"),
            F.min("event_id").alias("_mn"),
            F.max("event_id").alias("_mx"),
        ],
        phase2=[
            F.sum("_n").cast("long").alias("n_events"),
            F.sum("_nu").cast("long").alias("n_users"),
            F.min("_mn").cast("long").alias("min_event_id"),
            F.max("_mx").cast("long").alias("max_event_id"),
        ],
        salt_buckets=32,
        salt_expr=F.pmod(F.col("user_id"), F.lit(32)),
    )
    return partial


@register(
    "events_value_percentiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50_value,
       round(quantile_cont(value, 0.9), 6) AS p90_value,
       round(quantile_cont(value, 0.99), 6) AS p99_value
FROM events
GROUP BY event_type
""",
    "Per-type event-value distribution (exact interpolated p50/p90/p99; "
    "approx_percentile is the sketch variant at scale)",
)
def events_value_percentiles(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50_value"),
        F.round(F.percentile("value", 0.9), 6).alias("p90_value"),
        F.round(F.percentile("value", 0.99), 6).alias("p99_value"),
    )
