"""LWW / ingestion-merge registry entries (SURVEY.md §2.4 A5, §2.8 W2/W3) over
the driver's events table.

The events table stands in for the CDC stream (TESTDATA.md): event_id is the
processing sequence, ts the writetime, event_type='error' plays the delete op.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.operators.lww import lww_latest, lww_merge
from vector_store_spark.registry import load_events, register


@register(
    "lww_latest_event",
    """
SELECT user_id, event_type, value
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
  FROM events
)
WHERE rn = 1
""",
    "A5: arg-max-by-writetime merge — latest state per key (table/mod.rs:624-660)",
)
def lww_latest_event(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return lww_latest(ev, ["user_id"], "ts", "event_id", ["event_type", "value"])


@register(
    "lww_snapshot",
    """
WITH ev AS (
  SELECT *, CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
  FROM events
),
latest AS (
  SELECT user_id, op, value, props,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
  FROM ev
)
SELECT user_id, value, props
FROM latest
WHERE rn = 1 AND op <> 'delete'
""",
    "W3: upsert/delete merge with tombstones — live snapshot only (table/mod.rs:697-1003)",
)
def lww_snapshot(spark, sf_dir):
    ev = load_events(spark, sf_dir).withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("delete")).otherwise(F.lit("upsert"))
    )
    return lww_merge(
        ev, ["user_id"], ["value", "props"],
        ts_col="ts", seq_col="event_id", target_col="value",
    )


@register(
    "lww_percolumn_writetimes",
    """
WITH v AS (
  SELECT user_id, value FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id ASC) AS rn
    FROM events
  ) WHERE rn = 1
),
p AS (
  SELECT user_id, props FROM (
    SELECT user_id, props,
           row_number() OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) + event_id % 997) DESC, event_id ASC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT v.user_id AS user_id, v.value AS value, p.props AS props
FROM v JOIN p ON v.user_id = p.user_id
""",
    "F3 per-column writetimes: columns merge independently (table/mod.rs:298, FIXTURES F3)",
)
def lww_percolumn_writetimes(spark, sf_dir):
    ev = (
        load_events(spark, sf_dir)
        .withColumn("op", F.lit("upsert"))
        .withColumn("wt_v", F.unix_micros("ts"))
        .withColumn("wt_p", F.unix_micros("ts") + F.col("event_id") % 997)
    )
    return lww_merge(
        ev, ["user_id"], ["value", "props"],
        ts_col="wt_v", seq_col="event_id",
        writetime_cols={"value": "wt_v", "props": "wt_p"},
    )


@register(
    "events_hourly_rollup",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events
FROM events
GROUP BY 1, 2
""",
    "W1/W2 batch analog: tumbling-window rollup of the CDC stream (micro-batch agg)",
)
def events_hourly_rollup(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@register(
    "events_sessions",
    """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
marked AS (
  SELECT user_id, event_id, tus, value,
         CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sess AS (
  SELECT user_id, tus, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       (max(tus) - min(tus)) / 1000000 AS duration_s,
       round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, session_id
""",
    "Sessionization: 30-min-gap sessions per user (lag + running sum), per-session rollup",
)
def events_sessions(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).withColumn("tus", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(
            F.lag("tus").over(w).isNull()
            | ((F.col("tus") - F.lag("tus").over(w)) > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_id", F.sum("new_s").over(ws))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max("tus") - F.min("tus")) / 1_000_000).alias("duration_s"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@register(
    "events_props_extract",
    """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
FROM events
GROUP BY event_type
""",
    "Semi-structured props: JSON field extraction pushed through a rollup "
    "(get_json_object stays JVM-side)",
)
def events_props_extract(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.countDistinct(k).alias("distinct_k"),
    )
