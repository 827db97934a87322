"""Distance and similarity column expressions.

These are the rebuild's F1/F2 scalar functions (SURVEY.md §2.7). All are pure
Catalyst expressions (zip_with / aggregate higher-order functions) so they run
JVM-side inside whole-stage codegen — no Python in the hot path.

Semantics pinned to the reference:
- SpaceType → metric mapping (vs_index/usearch.rs:450-487): Cosine→cos distance,
  Euclidean→**squared** L2, DotProduct→1-dot ("IP"), Hamming→differing-bit count.
- Distance domains (distance.rs:58-105): Cosine ∈ [0,2]; Euclidean ≥ 0;
  DotProduct any non-NaN; Hamming integer ∈ [0, dims].
- Similarity score (similarity.rs:26-37): Cosine/DotProduct ``(2-d)/2``;
  Euclidean ``1/(1+d)``; Hamming ``1-d/dims``.

All arithmetic is f64: elements are cast to double before multiply/accumulate so
results are reproducible across engines (the driver's DuckDB oracle casts to
DOUBLE[] the same way); accumulation is sequential left-to-right (Catalyst
``aggregate`` semantics).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_store_spark.types import SpaceType

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def vector_lit(values: Sequence[float]) -> Column:
    """A literal query vector as array<double>."""
    return F.array(*[F.lit(float(v)) for v in values])


def _fsum(arr: Column) -> Column:
    """Sequential left-to-right sum of array<double> (deterministic order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_product(a: ColumnOrName, b: ColumnOrName) -> Column:
    a, b = _col(a), _col(b)
    return _fsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def vector_norm(a: ColumnOrName) -> Column:
    """Euclidean norm ||a||."""
    return F.sqrt(dot_product(a, a))


def l2sq_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Squared L2 — the reference's "euclidean" (USearch L2sq,
    vs_index/usearch.rs:483)."""
    a, b = _col(a), _col(b)
    diff_sq = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return _fsum(diff_sq)


def cosine_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """1 - cos(a,b) ∈ [0,2]. Zero-norm input ⇒ distance 1.0 (treated as
    orthogonal), keeping the result inside the valid domain (distance.rs:58-105)."""
    a, b = _col(a), _col(b)
    dot = dot_product(a, b)
    denom = vector_norm(a) * vector_norm(b)
    return F.when(denom == F.lit(0.0), F.lit(1.0)).otherwise(F.lit(1.0) - dot / denom)


def dot_product_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """USearch "IP" metric: 1 - <a,b> (unbounded; similarity (2-d)/2 = (1+dot)/2)."""
    return F.lit(1.0) - dot_product(a, b)


def hamming_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Count of positions whose *sign bit* differs, matching the reference's B1
    binarization (sign > 0 ⇒ 1; vs_index/usearch.rs:1179-1205). Operates on the
    raw float arrays; for pre-packed binary vectors use
    functions.quantize.hamming_packed."""
    a, b = _col(a), _col(b)
    diff = F.zip_with(
        a, b,
        lambda x, y: F.when((x > 0) != (y > 0), F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    return _fsum(diff)


def distance_expr(space: SpaceType, a: ColumnOrName, b: ColumnOrName) -> Column:
    if space == SpaceType.COSINE:
        return cosine_distance(a, b)
    if space == SpaceType.EUCLIDEAN:
        return l2sq_distance(a, b)
    if space == SpaceType.DOT_PRODUCT:
        return dot_product_distance(a, b)
    if space == SpaceType.HAMMING:
        return hamming_distance(a, b)
    raise ValueError(f"unknown space type: {space}")


def similarity_expr(space: SpaceType, distance: ColumnOrName, dims: int | None = None) -> Column:
    """Distance → similarity score (similarity.rs:26-37)."""
    d = _col(distance)
    if space in (SpaceType.COSINE, SpaceType.DOT_PRODUCT):
        return (F.lit(2.0) - d) / F.lit(2.0)
    if space == SpaceType.EUCLIDEAN:
        return F.lit(1.0) / (F.lit(1.0) + d)
    if space == SpaceType.HAMMING:
        if dims is None:
            raise ValueError("hamming similarity requires dims")
        return F.lit(1.0) - d / F.lit(float(dims))
    raise ValueError(f"unknown space type: {space}")


def validate_distance_domain(space: SpaceType, value: float, dims: int | None = None) -> bool:
    """Python-side domain check mirroring distance.rs:58-105 (used by tests and
    the API layer)."""
    import math

    if math.isnan(value):
        return False
    if space == SpaceType.COSINE:
        return 0.0 <= value <= 2.0
    if space == SpaceType.EUCLIDEAN:
        return value >= 0.0
    if space == SpaceType.DOT_PRODUCT:
        return True
    if space == SpaceType.HAMMING:
        return dims is not None and 0 <= value <= dims and float(value).is_integer()
    raise ValueError(f"unknown space type: {space}")
