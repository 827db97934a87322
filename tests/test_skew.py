"""salted_agg: two-phase decomposition equals the direct aggregate, and the
salt actually spreads a heavy-hitter key across reducers."""

from pyspark.sql import functions as F

from vector_store_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot" if i % 10 else "cold", i, i * 2) for i in range(2000)],
        ["k", "uid", "v"],
    )
    got = {r.k: (r.n, r.nu, r.s) for r in salted_agg(
        df, ["k"],
        phase1=[F.count("*").alias("_n"), F.countDistinct("uid").alias("_nu"),
                F.sum("v").alias("_s")],
        phase2=[F.sum("_n").alias("n"), F.sum("_nu").alias("nu"),
                F.sum("_s").alias("s")],
        salt_expr=F.pmod(F.col("uid"), F.lit(16)),
    ).collect()}
    direct = {r.k: (r.n, r.nu, r.s) for r in df.groupBy("k").agg(
        F.count("*").alias("n"), F.countDistinct("uid").alias("nu"),
        F.sum("v").alias("s"),
    ).collect()}
    assert got == direct


def test_salted_agg_spreads_heavy_key(spark):
    df = spark.createDataFrame([("hot", i) for i in range(1000)], ["k", "uid"])
    partial = (
        df.withColumn("_salt", F.pmod(F.col("uid"), F.lit(8)))
        .groupBy("k", "_salt").agg(F.count("*").alias("n"))
    )
    rows = partial.collect()
    assert len(rows) == 8            # one partial per salt, not one giant group
    assert max(r.n for r in rows) <= 1000 / 8 + 8
