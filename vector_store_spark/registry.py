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
    """Import every queries_* module for its registration side effects.

    Imports fail LOUDLY: a broken module must surface as an error, not
    silently shrink the driver-visible query surface by a whole family.
    All failures are collected so one broken module doesn't mask another.
    """
    import importlib

    modules = [
        "queries_ann", "queries_filtering", "queries_lww", "queries_fts",
        "queries_dedup", "queries_text", "queries_ivf", "queries_multimodal",
        "queries_quantize", "queries_star", "queries_curation", "queries_mix",
        "queries_streaming", "queries_temporal",
    ]
    errors = []
    for mod in modules:
        try:
            importlib.import_module(f"vector_store_spark.{mod}")
        except Exception as ex:  # noqa: BLE001 - collect, then raise below
            errors.append(f"{mod}: {type(ex).__name__}: {ex}")
    if errors:
        raise ImportError(
            "query module(s) failed to import (registry would silently lose "
            "their queries): " + "; ".join(errors)
        )
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
