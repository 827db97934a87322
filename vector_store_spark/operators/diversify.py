"""Result diversification for ANN serving: MMR re-ranking and per-group
capped top-k.

The reference serves raw nearest-neighbor lists (usearch.rs:203-248 beam
search → top-k). Production retrieval layers routinely post-process that
list for diversity — RAG context building wants k *distinct* passages, not
k near-copies of the best one. Two standard policies:

- **MMR** (Maximal Marginal Relevance, Carbonell & Goldstein, SIGIR'98):
  greedily pick argmax λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s). Iterative
  by definition, so it runs driver-side — but only over the top-``pool``
  shortlist the distributed exact/ANN top-k already produced (result-sized,
  like IVF probe selection). The fact-table work stays in the engine.
- **Capped top-k**: global top-k subject to "≤ cap results per group"
  (source, domain, dup-cluster...). Order-equivalent to: per-group top-cap,
  then global top-k of the survivors — fully declarative, no iteration.

Scale shape of the capped variant: a naive per-group window shuffles the
whole fact table. Instead the scorer prunes per Arrow batch (per-batch
per-group top-cap ⇒ ≤ batches·groups·cap rows leave the scan) and only the
pruned survivors hit the per-group window and the final k-row sort.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_store_spark.types import SpaceType


def _seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Strictly sequential float64 dot product — bit-identical to DuckDB's
    ``list_inner_product`` on DOUBLE[] (left-to-right summation), which the
    oracle side uses. numpy's pairwise-summed ``@`` is NOT."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _round_half_up_scalar(x: float, round_to: int) -> float:
    """Scalar HALF_UP round matching Spark's ``F.round`` and DuckDB's
    ``round`` on doubles (half away from zero)."""
    scale = 10.0 ** round_to
    return math.floor(abs(x) * scale + 0.5) / scale * (1.0 if x >= 0 else -1.0)


def mmr_rerank(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int,
    pool: int = 40,
    lam: float = 0.7,
    round_to: int | None = None,
) -> DataFrame:
    """MMR-diversified top-k: distributed exact top-``pool`` shortlist
    (cosine), then the greedy driver-side selection over those ``pool``
    rows. Returns (rank, id, relevance, mmr_score) — ``relevance`` the
    cosine similarity to the query, ``mmr_score`` the greedy objective at
    selection time (the first pick's diversity term is 0).

    Determinism: scores are rounded to ``round_to`` before comparison and
    ties break on ascending id, so the selection is a pure function of the
    shortlist; all dot products are sequential float64 (``_seq_dot``) to be
    bit-identical with a SQL re-derivation.
    """
    from vector_store_spark.operators.topk import ann_topk

    if k <= 0:
        raise ValueError("limit must be positive")
    shortlist = ann_topk(
        items, vec_col, query, pool, space=SpaceType.COSINE,
        tie_break=[id_col], select_cols=[id_col, vec_col], round_to=round_to,
    ).collect()  # pool rows — result-sized, same altitude as IVF probes
    ids = [r[id_col] for r in shortlist]
    vecs = [[float(x) for x in r[vec_col]] for r in shortlist]
    q = [float(x) for x in query]
    qn = math.sqrt(_seq_dot(q, q)) or 1.0
    norms = [math.sqrt(_seq_dot(v, v)) for v in vecs]
    rel = [
        (_seq_dot(v, q) / (n * qn)) if n > 0 else 0.0
        for v, n in zip(vecs, norms)
    ]
    n_cand = len(ids)
    sim = [[0.0] * n_cand for _ in range(n_cand)]
    for i in range(n_cand):
        for j in range(i + 1, n_cand):
            denom = norms[i] * norms[j]
            s = _seq_dot(vecs[i], vecs[j]) / denom if denom > 0 else 0.0
            sim[i][j] = sim[j][i] = s

    picked: list[int] = []
    out_rows = []
    remaining = set(range(n_cand))
    for rank in range(1, min(k, n_cand) + 1):
        best_i, best_key, best_score = None, None, None
        for i in sorted(remaining):
            div = max((sim[i][j] for j in picked), default=0.0)
            score = lam * rel[i] - (1.0 - lam) * div
            if round_to is not None:
                score = _round_half_up_scalar(score, round_to)
            key = (-score, ids[i])
            if best_key is None or key < best_key:
                best_i, best_key, best_score = i, key, score
        picked.append(best_i)
        remaining.discard(best_i)
        r = rel[best_i]
        if round_to is not None:
            r = _round_half_up_scalar(r, round_to)
        out_rows.append((rank, ids[best_i], r, best_score))

    spark = items.sparkSession
    id_type = dict(items.dtypes)[id_col]
    return spark.createDataFrame(
        out_rows,
        f"rank int, {id_col} {id_type}, relevance double, mmr_score double",
    )


def ann_topk_capped(
    items: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int,
    cap_col: str,
    cap: int,
    space: SpaceType = SpaceType.COSINE,
    id_col: str = "vec_id",
    select_cols: Sequence[str] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Global top-k with at most ``cap`` results per ``cap_col`` group —
    equivalent to scanning candidates in (distance, id) order and skipping
    any whose group already holds ``cap`` picks (a skipped candidate has
    ``cap`` better same-group candidates, so per-group-top-cap → global
    top-k reproduces the greedy exactly).

    Plan: Arrow-batched scorer keeps per-batch per-group top-``cap``
    (boundary ties included, resolved by the later window) ⇒ the per-group
    window and the final sort see ≤ batches·groups·cap rows, never the fact
    table. Same pruning contract as ``ann_topk``'s GEMM path.
    """
    import numpy as np  # noqa: F401  (validated here, used in the UDF)

    from vector_store_spark.operators.topk import _round_half_up

    if k <= 0 or cap <= 0:
        raise ValueError("k and cap must be positive")
    cols = list(select_cols) if select_cols is not None else [id_col, cap_col]
    if cap_col not in cols:
        cols.append(cap_col)
    if id_col not in cols:
        cols.append(id_col)
    fields = {f.name: f.dataType.simpleString() for f in items.schema.fields}
    out_schema = ", ".join([f"{c} {fields[c]}" for c in cols] + ["distance double"])
    qlist = [float(x) for x in query]

    def score(batches):
        import numpy as np
        import pandas as pd

        q = np.asarray(qlist, dtype=np.float64)
        qn = np.linalg.norm(q) or 1.0
        q2 = float(q @ q)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
            dots = X @ q
            if space == SpaceType.COSINE:
                xn = np.linalg.norm(X, axis=1)
                zero = xn == 0.0
                xn[zero] = 1.0
                d = 1.0 - dots / (xn * qn)
                d[zero] = 1.0
            elif space == SpaceType.DOT_PRODUCT:
                d = 1.0 - dots
            else:  # EUCLIDEAN (l2sq)
                d = (X * X).sum(axis=1) + q2 - 2.0 * dots
            if round_to is not None:
                d = _round_half_up(d, round_to)
            f = pdf[cols].copy()
            f["distance"] = d
            # per-group top-cap with boundary ties kept (same reasoning as
            # _gemm_topk: the winner of a tie group must not be cut here)
            keep = []
            for _, g in f.groupby(cap_col, sort=False):
                dg = g["distance"].to_numpy()
                cc = min(cap, len(dg))
                if cc < len(dg):
                    kth = np.partition(dg, cc - 1)[cc - 1]
                    keep.append(g[dg <= kth])
                else:
                    keep.append(g)
            yield pd.concat(keep, ignore_index=True)

    pruned = items.select(*dict.fromkeys([*cols, vector_col])).mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy(cap_col).orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    survivors = (
        pruned.withColumn("_cap_rn", F.row_number().over(w))
        .where(F.col("_cap_rn") <= cap)
        .drop("_cap_rn")
    )
    return survivors.orderBy(F.col("distance").asc(), F.col(id_col).asc()).limit(k)
