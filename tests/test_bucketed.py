"""Bucketed storage (sources/bucketed.py): co-located joins and aggregations
really are shuffle-free — asserted on the physical plan, not assumed.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    from vector_store_spark.sources.bucketed import write_bucketed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    meta = emb.select("vec_id", (F.col("vec_id") % 7).alias("shard"))
    write_bucketed(emb, "t_emb_b", ["vec_id"], 8, path=str(tmp_path / "emb"))
    write_bucketed(meta, "t_meta_b", ["vec_id"], 8, path=str(tmp_path / "meta"))
    yield "t_emb_b", "t_meta_b"
    spark.sql("DROP TABLE IF EXISTS t_emb_b")
    spark.sql("DROP TABLE IF EXISTS t_meta_b")


def test_bucketed_join_has_no_exchange_or_sort(spark, bucketed_pair):
    from vector_store_spark.sources.bucketed import co_located_join

    left, right = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, left, right, ["vec_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-to-bucket
        assert "Sort" not in plan.replace("SortMergeJoin", "SMJ")  # sortBy honored
        n = joined.count()
        assert n == spark.table(left).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("vec_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket layout satisfies the distribution
    assert agg.where(F.col("n") != 1).count() == 0
