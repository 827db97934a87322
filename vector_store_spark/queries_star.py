"""Star-schema analytics over the driver's TPC-H-ish tables — the biggest
inputs in the bench (lineitem ≈ 600k rows at sf0.1). These exercise the join
and aggregation shapes a 100 TB deployment lives on: dimension joins are
broadcast (no fact-table shuffle for the join), date filters push to the
parquet scan, aggregations run partial→final on the group keys, and top-n
per group uses a single window over one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_store_spark.registry import ROUND, load, register


@register(
    "star_revenue_by_nation",
    f"""
SELECT n.n_name AS nation,
       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), {ROUND}) AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND l.l_shipdate >= DATE '1995-01-01'
GROUP BY n.n_name
""",
    "Star join: fact-fact edges (lineitem-orders, -customer) are shuffle-hash "
    "joins on their keys — both sides grow linearly with SF, so neither may "
    "be broadcast; true dimensions (nation, region) stay broadcast",
)
def star_revenue_by_nation(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= "1995-01-01")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # orders and customer are FACT-classed (row count scales with SF): at the
    # 100 TB target a broadcast of either is an executor OOM. Shuffle-hash on
    # the equi-key keeps cost O(data/partitions) per executor with no sort;
    # a deployment would bucket lineitem+orders on orderkey (write_bucketed,
    # sources/bucketed.py) to drop even that shuffle. nation/region are
    # constant-size dimensions — broadcast is right for them at any SF.
    joined = (
        l.join(o.hint("SHUFFLE_HASH"), l.l_orderkey == o.o_orderkey)
        .join(c.hint("SHUFFLE_HASH"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            # revenue terms are 2dp·2dp money — exactly 4 decimal digits —
            # so round each term onto its true 4dp grid and SUM AS DECIMAL:
            # the aggregate is then associative (partial-agg order can't
            # shift the 6dp rounded total, which a double sum does at sf≥0.1)
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                    ).cast("decimal(18,4)")
                ).cast("double"),
                ROUND,
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "star_top_parts_per_returnflag",
    f"""
WITH agg AS (
  SELECT l_returnflag, l_partkey,
         round(sum(l_quantity), {ROUND}) AS total_qty
  FROM lineitem GROUP BY l_returnflag, l_partkey
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY l_returnflag ORDER BY total_qty DESC, l_partkey
  ) AS rnk
  FROM agg
)
SELECT l_returnflag, l_partkey, total_qty, rnk FROM ranked WHERE rnk <= 5
""",
    "Top-n per group: pre-aggregate then one window over the reduced set",
)
def star_top_parts_per_returnflag(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag", "l_partkey").agg(
        F.round(F.sum("l_quantity"), ROUND).alias("total_qty")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("total_qty").desc(), F.col("l_partkey").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
    )


@register(
    "star_order_priority_fulfillment",
    f"""
SELECT o.o_orderpriority AS priority,
       count(DISTINCT o.o_orderkey) AS n_orders,
       round(avg(o.o_totalprice), {ROUND}) AS avg_price
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o.o_orderpriority
""",
    "Semi-join (EXISTS) + distinct aggregation on the orders dimension",
)
def star_order_priority_fulfillment(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    # The semi-join side is fact-derived (distinct orderkeys of ~25% of
    # lineitem — linear in SF), so it must NOT be broadcast: shuffle-hash
    # semi-join on the key. The distinct itself is partial-aggregated
    # map-side before its shuffle.
    matched = o.join(l.select("l_orderkey").distinct().hint("SHUFFLE_HASH"),
                     o.o_orderkey == F.col("l_orderkey"), "left_semi")
    return matched.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.round(F.avg("o_totalprice"), ROUND).alias("avg_price"),
    )


@register(
    "star_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS count_order,
       round(CAST(sum(l_quantity) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    "TPC-H Q1-style pricing summary (integer-exact subset: quantities are "
    "integral, so sums/averages are order-independent): one hash aggregate "
    "with map-side partial combine",
)
def star_pricing_summary(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.count("*").cast("long").alias("count_order"),
        F.round(
            F.sum("l_quantity").cast("long") / F.count("*").cast("double"), 6
        ).alias("avg_qty"),
    )


@register(
    "star_orders_monthly",
    """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       round(min(o_totalprice), 6) AS min_price,
       round(max(o_totalprice), 6) AS max_price
FROM orders
GROUP BY 1, 2
""",
    "Monthly order rollup by status (count, distinct customers, order-"
    "independent min/max price bounds): one hash aggregate over the fact "
    "table, partial-combined map-side",
)
def star_orders_monthly(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("order_month"),
        "o_orderstatus",
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
    )


@register(
    "star_shipping_priority",
    # TPC-H Q3 shape: revenue of not-yet-shipped lineitems for one market
    # segment's orders placed before the cutoff, top-10 orders. Ordering is
    # over the ROUNDED revenue (the cross-engine-stable value) with
    # (o_orderdate, l_orderkey) tie-breaks.
    f"""
SELECT l.l_orderkey,
       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), {ROUND}) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
    "Q3-style shipping priority: one segment's pre-cutoff orders with "
    "unshipped revenue, top-10 by revenue — customer-orders and "
    "orders-lineitem edges are fact-fact shuffle-hash joins (the segment "
    "filter thins customer but it still scales with SF), the top-10 is a "
    "TakeOrderedAndProject over the per-order rollup",
)
def star_shipping_priority(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    joined = (
        o.join(c.hint("SHUFFLE_HASH"), o.o_custkey == c.c_custkey)
        .join(l.hint("SHUFFLE_HASH"), o.o_orderkey == l.l_orderkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        # same decimal-sum hardening as star_revenue_by_nation: exact 4dp
        # terms, associative decimal aggregate, stable 6dp total at any SF
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).cast("double"),
            ROUND,
        ).alias("revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )
