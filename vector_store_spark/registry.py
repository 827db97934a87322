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
    #: memoized-oracle variant for stretch-SF gates: ``memo_setup`` is a list
    #: of (temp_table_name, self_contained_sql) statements materialized ONCE
    #: per gate run (shared across entries by table name), and ``memo_sql`` is
    #: a rewrite of ``oracle`` that references those temp tables. The driver
    #: always runs the self-contained ``oracle``; tools/check_correctness.py
    #: prefers ``memo_sql`` so a 20-50 min shared CTE chain (e.g. the 50k-doc
    #: MinHash closure) is paid once per run instead of once per entry. Both
    #: variants are built from the SAME SQL fragments so they cannot drift.
    memo_setup: Optional[list] = None
    memo_sql: Optional[str] = None
    #: entries whose registry fn eager-localizes (returns a LocalTableScan)
    #: MUST register an internal-plan probe: (spark, sf_dir) -> DataFrame (or
    #: list of DataFrames) exposing the lazy plan(s) of the distributed
    #: operators the entry drives, so the suite-wide plan bans in
    #: tests/test_plans.py still audit them (VERDICT r13 next #8)
    internal_plan_fn: Optional[Callable] = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], description: str = "",
             memo_setup: Optional[list] = None, memo_sql: Optional[str] = None,
             internal_plan_fn: Optional[Callable] = None):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description,
                                    memo_setup=memo_setup, memo_sql=memo_sql,
                                    internal_plan_fn=internal_plan_fn)
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
        "queries_streaming", "queries_temporal", "queries_hnsw",
        "queries_diversity", "queries_engine",
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


#: per-(session, corpus, table) SCHEMA memo — metadata only, never data or
#: results: each load() still returns a FRESH DataFrame (new attribute ids,
#: re-listed files, re-read data at execution); only the reader's footer
#: schema inference is skipped on repeat loads. Measured 94 -> 15 ms per
#: load() call (driver-side DataSource resolution), ~200+ calls per bench
#: run. Events is NOT loaded through here (load_events does its own read
#: under the nanosAsLong conf), so no cached schema can pin conf-dependent
#: type surfacing.
_SCHEMA_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, sf_dir, name)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def memo_cached_frame(cache: dict, key: str, builder) -> DataFrame:
    """Per-corpus memo for a standing cached DataFrame that SELF-HEALS after
    ``spark.catalog.clearCache()``: the memoized frame outlives its
    cache-manager entry, so without the storageLevel check every consumer
    would silently re-derive the full pipeline per call (the r13 bm25_term
    4.14x scaling artifact — same failure class for the minhash-pair and
    kNN-graph memos)."""
    df = cache.get(key)
    if df is not None and not df.storageLevel.useMemory:
        df = None
    if df is None:
        df = builder().cache()
        cache[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet, normalizing ``ts`` to a µs-precision timestamp
    whatever the on-disk physical type is.

    Generators have shipped this file both as TIMESTAMP(NANOS) (which Spark's
    reader rejects by default and DuckDB silently truncates to µs) and as plain
    timestamp[us]. With ``nanosAsLong`` set the nanos case surfaces as BIGINT
    and needs an explicit ns→µs truncation to match DuckDB; the µs case already
    arrives as a timestamp and must pass through untouched. Branch on the
    post-read dtype so either vintage of testdata works."""
    from pyspark.sql import functions as F

    # Must be set before the read for the TIMESTAMP(NANOS) case; harmless no-op
    # when the file stores µs timestamps. Session tz pinned to UTC so the
    # NTZ→LTZ normalization below is value-preserving on any host.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(df.dtypes)["ts"]
    if dtype == "bigint":  # TIMESTAMP(NANOS) read as raw longs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # Downstream operators (unix_micros, windowing) expect TIMESTAMP_LTZ,
        # which is what both historical branches produced.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
