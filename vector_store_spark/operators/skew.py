"""Skew-safe aggregation: two-phase salted aggregate for heavy-hitter keys.

A ``groupBy(key)`` over a 100 TB corpus with a handful of dominant keys
(event types, languages, top domains) concentrates each key's entire volume
on one reducer. Spark's partial (map-side) aggregation already absorbs most
of this for algebraic aggregates; ``salted_agg`` makes the pattern explicit
and robust for the cases partial aggregation does not cover (high-cardinality
partial maps that spill, or non-algebraic composites): phase 1 groups by
(key, salt) — volume per reducer is bounded by N_key / salt_buckets — and
phase 2 re-aggregates the per-salt partials, a KB-sized shuffle.

Only algebraically decomposable aggregates fit (count → sum of counts,
sum → sum, min/max → min/max); the helper takes the phase-1/phase-2 pairs
explicitly so the decomposition is visible and testable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    phase1: Sequence[Column],
    phase2: Sequence[Column],
    salt_buckets: int = 32,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase aggregate: ``groupBy(*group_cols, salt)`` with ``phase1``
    aggregates, then ``groupBy(*group_cols)`` with ``phase2`` aggregates over
    the partials. ``phase1`` columns must be aliased; ``phase2`` re-aggregates
    those aliases. ``salt_expr`` defaults to a uniform random-ish hash of the
    whole row (`spark_partition_id` is NOT used — it would break determinism
    guarantees under repartitioning; the salt only needs to spread rows, not
    be reproducible, but a content hash keeps reruns identical)."""
    salt = salt_expr if salt_expr is not None else F.pmod(
        F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*phase1)
    )
    return partial.groupBy(*group_cols).agg(*phase2)
