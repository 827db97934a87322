"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship ANN query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus the
training-data pipeline operators, each paired with DuckDB oracle SQL where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact filtered cosine top-k over the embeddings table
    (the reference's `ORDER BY v ANN OF [...] LIMIT k`)."""
    from vector_store_spark.registry import all_queries

    return all_queries()["ann_cosine_topk"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_store_spark.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from vector_store_spark.registry import all_queries

    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
