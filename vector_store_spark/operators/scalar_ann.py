"""Scalar-quantized ANN serving: i8 / f16 / bf16 candidate scoring with
optional full-precision rescoring (SURVEY.md §2.7 F3 as a SERVING strategy,
not just a storage function).

Reference: quantization is an index option and ``rescoring`` a per-query CQL
option, exercised per scalar kind in
crates/validator/src/quantization_and_rescoring.rs:117-256. Here the strategy
is a DataFrame program: score the quantized representation (cheaper storage /
shuffle width; on disk the quantized column is what a deployment would
persist), pull ``n_candidates`` via TakeOrderedAndProject (partition-local
k-heaps), then — when ``rescore`` — re-rank the candidate set against the
full-precision column. With rescore=False the quantized distances ARE the
result, matching rescoring=false semantics (cheaper, approximate values).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_store_spark.functions.distance import (
    distance_expr,
    similarity_expr,
    vector_lit,
)
from vector_store_spark.functions.quantize import (
    dequantize_i8,
    quantize_bf16_udf,
    quantize_f16_udf,
    quantize_i8,
)
from vector_store_spark.types import SpaceType

SCALAR_KINDS = ("i8", "f16", "bf16")


def _quantize_query(kind: str, query: Sequence[float]) -> list[float]:
    """Driver-side quantization of the query literal (exact twins of the
    column-side round-trips; numpy for the IEEE kinds)."""
    import numpy as np

    if kind == "i8":
        return [
            max(-127, min(127, round(float(v) * 127))) / 127.0 for v in query
        ]
    f32 = np.asarray(query, dtype=np.float32)
    if kind == "f16":
        return [float(v) for v in f32.astype(np.float16).astype(np.float64)]
    if kind == "bf16":
        return [
            float(v)
            for v in (f32.view(np.uint32) & np.uint32(0xFFFF0000))
            .view(np.float32)
            .astype(np.float64)
        ]
    raise ValueError(f"unknown scalar quantization kind {kind!r}; have {SCALAR_KINDS}")


def _quantize_column(kind: str, col):
    if kind == "i8":
        return dequantize_i8(quantize_i8(col))
    if kind == "f16":
        return quantize_f16_udf()(col)
    if kind == "bf16":
        return quantize_bf16_udf()(col)
    raise ValueError(f"unknown scalar quantization kind {kind!r}; have {SCALAR_KINDS}")


def scalar_quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int,
    kind: str = "i8",
    space: SpaceType = SpaceType.COSINE,
    rescore: bool = True,
    n_candidates: int | None = None,
    select_cols: Sequence[str] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k by quantized distance, optionally rescored at full precision.

    Returns (select_cols…, distance, similarity) like the other strategies.
    ``n_candidates`` defaults to 3·k — the rescore pool; ignored when
    rescore=False (the quantized top-k is final).
    """
    select = list(select_cols or [id_col])
    v = F.col(vec_col).cast("array<double>")
    qq = _quantize_query(kind, query)
    qdist = distance_expr(space, _quantize_column(kind, v), vector_lit(qq))

    if not rescore:
        out = df.select(*select, qdist.alias("distance"))
        if round_to is not None:
            out = out.withColumn("distance", F.round("distance", round_to))
        out = out.orderBy(F.col("distance").asc(), *[F.col(c) for c in select]).limit(k)
        return out.withColumn(
            "similarity", similarity_expr(space, F.col("distance"), dims=len(query))
        )

    n_cand = n_candidates or 3 * k
    cand = (
        df.select(*select, F.col(vec_col), qdist.alias("qdist"))
        .orderBy(F.col("qdist").asc(), *[F.col(c) for c in select])
        .limit(n_cand)
    )
    dist = distance_expr(space, v, vector_lit(list(map(float, query))))
    rescored = cand.withColumn(
        "distance", F.round(dist, round_to) if round_to is not None else dist
    )
    return (
        rescored.orderBy(F.col("distance").asc(), *[F.col(c) for c in select])
        .limit(k)
        .select(
            *select,
            "distance",
            similarity_expr(space, F.col("distance"), dims=len(query)).alias("similarity"),
        )
    )
