"""Query registry: every implemented operator exposed as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB-equivalent oracle SQL string.

This is the correctness surface the driver grades (CORRECTNESS_r{N}.json): each
entry pairs the Spark-first implementation with independently-written ANSI/DuckDB
SQL computing the same result. Column names and rounding are aligned on both
sides; float determinism was verified empirically (Spark sequential ``aggregate``
sums are bit-identical to DuckDB ``list_inner_product`` on DOUBLE[]).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

ROUND = 6  # decimal places for float outputs on both engines


def det_query_vector(seed: int, dims: int = 64) -> list[float]:
    """Deterministic pseudo-random query vector (exact integer arithmetic, so the
    identical literal can be embedded in both Spark code and oracle SQL)."""
    return [(((seed * 31 + i * 37) % 97) - 48) / 48.0 for i in range(dims)]


def sql_vec(values: list[float]) -> str:
    """DOUBLE[] literal for DuckDB. repr() round-trips doubles exactly."""
    return "CAST([" + ", ".join(repr(float(v)) for v in values) + "] AS DOUBLE[])"


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None ⇒ non-SQL-expressible, rows-only check
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], description: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effects: each module registers its queries
    from vector_store_spark import queries_ann  # noqa: F401

    try:
        from vector_store_spark import queries_filtering  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_lww  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_fts  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_dedup  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_text  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_ivf  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_multimodal  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_quantize  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_star  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_curation  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_mix  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_streaming  # noqa: F401
    except ImportError:
        pass
    try:
        from vector_store_spark import queries_temporal  # noqa: F401
    except ImportError:
        pass
    return dict(_REGISTRY)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's reader rejects by
    default and DuckDB silently truncates to µs. Read nanos as long and truncate
    to µs so both engines see identical timestamps."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
