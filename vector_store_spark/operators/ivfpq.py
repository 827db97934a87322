"""IVF-PQ: inverted-file pruning composed with product-quantization
compression — the actual 100 TB memory tier (Jégou et al. 2011 §IV; the
reference couples pruning with quantized storage inside its graph engine,
crates/vector-store/src/vs_index/usearch.rs:503-513).

Composition, both stages in L2 space:

  build:  L2-assign every vector to its nearest centroid (IVF partitioning)
          AND encode it to m_sub byte codes against a global codebook (PQ
          compression). At scale the index is parquet partitioned by
          ``cluster`` storing only (id, pq_code) — candidate scans never
          touch the full-precision vectors.
  search: rank centroids by L2 to the query → take nprobe clusters
          (partition pruning) → ADC over only those clusters' codes →
          top-k. Optional rescoring re-ranks the k·rescore ADC winners by
          exact L2 against the full vectors (a k·rescore-row point lookup).

Deterministic build (smallest-id centroids/codebook) keeps the whole pipeline
oracle-expressible; pass trained centroids/codebooks for the recall-bearing
variant (bench extras report both).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_store_spark.operators.ivf import ivf_assign, ivf_centroids, ivf_probe
from vector_store_spark.operators.pq import (
    pq_adc_distance,
    pq_adc_lut,
    pq_codebook,
    pq_encode,
)
from vector_store_spark.types import SpaceType


def ivfpq_topk(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    k_centroids: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    k_codes: int = 16,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    centroids: list | None = None,
    codebook: np.ndarray | None = None,
    n_assign: int = 1,
    rescore: int = 0,
) -> DataFrame:
    """IVF pruning → PQ/ADC scoring → (optional) exact rescoring, all in L2."""
    cents = centroids if centroids is not None else ivf_centroids(
        items, id_col, vec_col, k_centroids
    )
    cb = codebook if codebook is not None else pq_codebook(
        items, id_col, vec_col, m_sub, k_codes
    )
    assigned = ivf_assign(
        items, id_col, vec_col, cents, space=SpaceType.EUCLIDEAN, n_assign=n_assign
    )
    probes = ivf_probe(cents, query, nprobe, space=SpaceType.EUCLIDEAN)
    cand = assigned.where(F.col("cluster").isin(probes))
    if n_assign > 1:
        cand = cand.dropDuplicates([id_col])
    encoded = pq_encode(cand, vec_col, cb)
    lut = pq_adc_lut(cb, query)
    dist = pq_adc_distance("pq_code", lut)
    if round_to is not None:
        dist = F.round(dist, round_to)
    cols = select_cols or [id_col]
    if rescore > 0:
        shortlist = (
            encoded.withColumn("adc", dist)
            .orderBy(F.col("adc").asc(), F.col(id_col).asc())
            .limit(rescore * k)
        )
        from vector_store_spark.functions.distance import distance_expr, vector_lit

        exact = distance_expr(
            SpaceType.EUCLIDEAN, F.col(vec_col).cast("array<double>"), vector_lit(query)
        )
        if round_to is not None:
            exact = F.round(exact, round_to)
        return (
            shortlist.withColumn("distance", exact)
            .orderBy(F.col("distance").asc(), F.col(id_col).asc())
            .limit(k)
            .select(*cols, "distance")
        )
    return (
        encoded.withColumn("distance", dist)
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
        .select(*cols, "distance")
    )
