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


@register(
    "events_funnel",
    # sequential funnel semantics in windowed SQL: the per-user first view,
    # the first click strictly AFTER that view, the first purchase strictly
    # AFTER that click; NULL ordering constraints propagate through the
    # 3-valued CASE guards identically on both engines
    """
WITH w1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM w2
), u AS (
  SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
         max(t_purchase) AS t_purchase
  FROM w3 GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(t_view) AS BIGINT) AS n_view,
       CAST(count(t_click) AS BIGINT) AS n_view_click,
       CAST(count(t_purchase) AS BIGINT) AS n_full_funnel,
       round(CASE WHEN count(t_view) = 0 THEN 0.0
                  ELSE CAST(count(t_purchase) AS DOUBLE)
                       / CAST(count(t_view) AS DOUBLE) END, 6) AS conversion_rate
FROM u
""",
    "Ordered conversion funnel view -> click -> purchase (strictly "
    "increasing timestamps per user): ONE exchange on user_id feeds three "
    "chained conditional-min windows, the per-user reduce reuses the same "
    "partitioning, and the summary is a partial-aggregated single row — "
    "no joins, no second shuffle",
)
def events_funnel(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    staged = (
        ev.withColumn("t_view", F.min(F.when(is_("view"), F.col("ts"))).over(w))
        .withColumn(
            "t_click",
            F.min(
                F.when(is_("click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    is_("purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    n_view = F.count("t_view")
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        n_view.cast("long").alias("n_view"),
        F.count("t_click").cast("long").alias("n_view_click"),
        F.count("t_purchase").cast("long").alias("n_full_funnel"),
        F.round(
            F.when(n_view == 0, F.lit(0.0)).otherwise(
                F.count("t_purchase").cast("double") / n_view.cast("double")
            ),
            6,
        ).alias("conversion_rate"),
    )


@register(
    "events_hourly_anomalies",
    # z-scores from EXACT integer sums: per-(type, hour) counts are BIGINT,
    # so sum / sum-of-squares are exact on both engines; mean and the
    # sample-variance numerator derive from those integers with the same
    # IEEE divisions, and sqrt is correctly-rounded everywhere — the score
    # is bit-identical cross-engine (no stddev_samp accumulation-order drift)
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(n_events) AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
),
scored AS (
  SELECT h.event_type, h.hour_ts, h.n_events,
         round((CAST(h.n_events AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.n_hours AS DOUBLE))
               / sqrt((CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / CAST(s.n_hours AS DOUBLE))
                      / CAST(s.n_hours - 1 AS DOUBLE)), 6) AS zscore
  FROM hourly h JOIN stats s ON s.event_type = h.event_type
  WHERE s.n_hours > 1
)
SELECT event_type, hour_ts, n_events, zscore
FROM scored
ORDER BY abs(zscore) DESC, event_type, hour_ts LIMIT 15
""",
    "Hourly ingest-anomaly sweep: top-15 (type, hour) buckets by |z-score| "
    "of the hourly event count against that type's own monthly "
    "distribution — the monitoring query behind rate-spike alerts. Two "
    "same-key aggregations plus a type-bounded broadcast join; counts stay "
    "integer-exact so the score is engine-stable",
)
def events_hourly_anomalies(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("n_events").cast("long").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("s2"),
    )
    # the stats side is bounded by the event-type vocabulary — a true
    # dimension, broadcast by design
    j = hourly.join(F.broadcast(stats), "event_type").where(F.col("n_hours") > 1)
    n, s1, s2, nh = (
        F.col("n_events").cast("double"),
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
        F.col("n_hours").cast("double"),
    )
    z = F.round(
        (n - s1 / nh) / F.sqrt((s2 - s1 * s1 / nh) / (F.col("n_hours") - 1).cast("double")),
        6,
    )
    return (
        j.select("event_type", "hour_ts", "n_events", z.alias("zscore"))
        .orderBy(
            F.abs(F.col("zscore")).desc(),
            F.col("event_type").asc(),
            F.col("hour_ts").asc(),
        )
        .limit(15)
    )


@register(
    "events_attribution",
    # last-touch attribution: each purchase credits the user's most recent
    # STRICTLY PRIOR marketing touch (view/click) in (ts, event_id) order —
    # the deterministic tie-break makes same-timestamp rows engine-stable.
    # Purchase value is summed in integer cents (floor(value*100) is the same
    # IEEE double op on both engines), so the totals are bit-exact.
    """
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT coalesce(channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
""",
    "Last-touch purchase attribution: ONE exchange on user_id feeds the "
    "running last-marketing-touch window (per-user history is bounded), the "
    "channel aggregate is partial-combined — no joins; 'direct' = purchases "
    "with no prior touch",
)
def events_attribution(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type").isin("view", "click"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", F.coalesce(channel, F.lit("direct")))
        .where(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
    )


@register(
    "events_markov_transitions",
    # user-journey transition matrix: per user in (ts, event_id) order,
    # count each (prev_type -> next_type) step and its row-normalized
    # probability. Counts are exact integers; the probability is one
    # integer/integer division rounded on both engines.
    """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
t AS (
  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM o WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
r AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_n FROM t GROUP BY prev_type)
SELECT t.prev_type, t.next_type, t.n,
       round(CAST(t.n AS DOUBLE) / r.row_n, 6) AS p
FROM t JOIN r USING (prev_type)
""",
    "Event-type Markov transition matrix (user-journey analytics): ONE "
    "exchange on user_id feeds the lag window; the transition rollup is "
    "type-pair-bounded and the row-normalizing join touches only the "
    "|types|^2 matrix",
)
def events_markov_transitions(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    t = o.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").cast("long").alias("n"))
    r = t.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_n"))
    return (
        t.join(F.broadcast(r), "prev_type")  # |types|-bounded row sums
        .select(
            "prev_type", "next_type", "n",
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
        )
    )


@register(
    "events_dau_wau_stickiness",
    # DAU/WAU engagement: WAU(d) = distinct users active in [d-6, d],
    # computed by replicating each (user, active-day) row into the <= 7
    # report days it supports — a BOUNDED 7x expansion + one distinct,
    # instead of a rolling count-distinct window (which Spark cannot do
    # exactly without holding per-day user sets in window state)
    """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN ud u
    ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau USING (day)
""",
    "DAU / trailing-7-day WAU / stickiness ratio per day: the rolling "
    "distinct is a bounded 7x EXPLODE of the (user, active-day) frame onto "
    "the report days it supports, then one distinct aggregation — an equi "
    "plan (no range join, no per-day user set in window state); the final "
    "day-keyed merge is calendar-bounded and broadcast. The oracle states "
    "the same semantics as a range join, which DuckDB handles natively",
)
def events_dau_wau_stickiness(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    # each active (user, day) supports report days day..day+6; report days
    # with no activity of their own are dropped by the inner day merge below
    wau = (
        ud.select(
            "user_id",
            F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day"),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(F.broadcast(wau), "day").select(
        "day", "dau", "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


@register(
    "events_retention_cohorts",
    # Weekly retention matrix: cohort = the Monday-truncated week of a
    # user's FIRST event; one row per (cohort_week, week_offset) with the
    # distinct users still active and the retention rate against cohort
    # size. Shuffle posture: the user-week frame joins its per-user cohort
    # assignment on user_id (fact-fact SHUFFLE_HASH — a per-user frame is
    # corpus-sized and must never broadcast); the final size merge keys on
    # cohort_week, which is CALENDAR-bounded, so that side broadcasts.
    """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
coh AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
act AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, u.week) // 7 AS BIGINT) AS week_offset,
         u.user_id
  FROM uw u JOIN coh c USING (user_id)
),
ret AS (
  SELECT cohort_week, week_offset,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM act GROUP BY cohort_week, week_offset
),
sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users FROM coh GROUP BY cohort_week)
SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_users,
       round(CAST(r.n_active AS DOUBLE) / s.cohort_users, 6) AS retention
FROM ret r JOIN sz s USING (cohort_week)
""",
    "Weekly retention cohorts: first-activity week per user, distinct active "
    "users per (cohort, week-offset), retention rate vs cohort size — the "
    "growth-analytics staple next to DAU/WAU stickiness",
)
def events_retention_cohorts(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    uw = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = uw.join(coh.hint("SHUFFLE_HASH"), "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("week_offset"),
        "user_id",
    )
    ret = act.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").cast("long").alias("n_active")
    )
    sz = coh.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    return ret.join(F.broadcast(sz), "cohort_week").select(
        "cohort_week", "week_offset", "n_active", "cohort_users",
        F.round(F.col("n_active").cast("double") / F.col("cohort_users"), 6)
        .alias("retention"),
    )
