"""Embedding clustering operators (training-data pipeline, beyond the
reference's engine surface).

``kmeans_assign`` is one Lloyd assignment pass against a FIXED centroid
matrix — the building block the trained ANN layouts already use internally
(operators/ivf.py trains with iterated assignments; reference counterpart:
the IVF cluster routing in crates/vector-store's usearch-backed index is
opaque/in-binary). Exposing the pass as a first-class operator gives the
pipeline corpus bucketing / cluster profiling (domain discovery, per-cluster
quality audits) at GEMM speed.

Scale shape: the centroid matrix is k-bounded and ships inside the UDF
closure (no join, no shuffle); assignment is mapInPandas over Arrow batches
(vectorized over rows, SEQUENTIAL over dims so every distance is
bit-identical to the Catalyst ``zip_with`` fold and DuckDB's
``list_inner_product`` on the same values — argmin ties cannot diverge
across engines); the per-cluster rollup is a k-key groupBy with map-side
combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kmeans_assign(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every row to its nearest centroid by squared L2 (ties -> the
    smallest centroid index, matching a (l2sq, cid) row_number oracle).

    ``centroids`` is a k x dims array-like (k is bounded: collected
    metadata, never a fact-sized frame). Returns (id_col, *keep_cols,
    cluster_id long, l2sq double).
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2 or not len(C):
        raise ValueError("centroids must be a non-empty k x dims matrix")
    k, dims = C.shape
    keep = [c for c in keep_cols if c != id_col]
    src_dtypes = dict(emb.dtypes)
    keep_schema = "".join(f", {c} {src_dtypes[c]}" for c in keep)
    schema = f"{id_col} {src_dtypes[id_col]}{keep_schema}, cluster_id long, l2sq double"
    # keep_cols may include vec_col itself (carry the vector downstream);
    # dedupe the projection so the Arrow batch has unique column names
    sel = list(dict.fromkeys([id_col, *keep, vec_col]))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # rows x dims
            if V.ndim != 2 or V.shape[1] != dims:
                raise ValueError(
                    f"vector width {V.shape[1] if V.ndim == 2 else 'ragged'} "
                    f"!= centroid dims {dims} — refusing to score a prefix"
                )
            acc = np.zeros((len(pdf), k), dtype=np.float64)
            # sequential over dims: acc accumulates (v_d - c_d)^2 in dim order,
            # the exact fold order of zip_with/list_inner_product
            for d in range(dims):
                diff = V[:, d, None] - C[None, :, d]
                acc += diff * diff
            cid = acc.argmin(axis=1)  # first minimum = smallest centroid index
            out = {id_col: pdf[id_col]}
            for c in keep:
                out[c] = pdf[c]
            out["cluster_id"] = cid.astype(np.int64)
            out["l2sq"] = acc[np.arange(len(pdf)), cid]
            yield pd.DataFrame(out)

    return emb.select(*sel).mapInPandas(assign, schema)
