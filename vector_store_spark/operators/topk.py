"""Top-k ANN operators (SURVEY.md §2.5 T1/T2, §2.3 J1/J3).

The reference answers ``ORDER BY v ANN OF [...] LIMIT k`` with an HNSW beam
search (vs_index/usearch.rs:203-248). The Spark-first equivalent is exact
filtered top-k: ``WHERE pred ORDER BY dist LIMIT k``. Catalyst compiles that to
``TakeOrderedAndProject`` — each partition keeps a k-row heap, only k rows per
partition reach the driver merge, so it scales linearly with data and never
shuffles the full table. Filtering happens *before* top-k, matching the
reference's filtered-ANN guarantee (top-k OF the filtered set, usearch.rs:224-248),
and predicates push down to the Parquet scan.

For batches of query vectors, ``knn_join`` avoids a crossJoin blow-up: the query
matrix is broadcast to every partition and scored with one float64 GEMM per Arrow
batch (mapInPandas), keeping only per-batch top-k before a final global top-k —
the classic brute-force-kNN-on-Spark pattern.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_store_spark.functions.distance import distance_expr, similarity_expr, vector_lit
from vector_store_spark.types import SpaceType


def ann_topk(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int,
    space: SpaceType = SpaceType.COSINE,
    predicate: Column | None = None,
    select_cols: Sequence[str] | None = None,
    tie_break: Sequence[str] = (),
    dist_col: str = "distance",
    sim_col: str = "similarity",
    round_to: int | None = None,
    gemm: bool | None = None,
) -> DataFrame:
    """Exact top-k by distance to ``query``, ascending (T1/T2).

    ``tie_break`` columns make the k-boundary deterministic (the reference's HNSW
    is approximate so it has no such need; an exact engine must pin ties).
    ``round_to`` rounds distance/similarity for cross-engine comparison.

    ``gemm`` (default: auto — on except Hamming): score with the Arrow-batched
    numpy path (per-partition GEMM + per-batch top-k) instead of per-row
    Column expressions. The expression path is the executable spec (and the
    only bit-sequential one); the GEMM path is the scale path — Catalyst
    higher-order functions are CodegenFallback, so the expression scorer runs
    interpreted (~µs/element), while one BLAS matvec per Arrow batch is ~100×
    cheaper and emits only k rows per partition into the final merge. The two
    are cross-validated in tests; with ``round_to`` they agree exactly.
    """
    if k <= 0:
        raise ValueError("limit must be positive")  # lib.rs:499-505 (NonZero)
    dims = len(query)
    if gemm is None:
        gemm = space != SpaceType.HAMMING
    out = df
    if predicate is not None:
        out = out.where(predicate)  # predicate still pushes to the scan

    if gemm and space != SpaceType.HAMMING:
        # no select_cols: keep every column (incl. the vector), matching the
        # expression path's output schema
        passthrough = list(select_cols) if select_cols is not None else list(out.columns)
        for c in tie_break:
            if c not in passthrough:
                passthrough.append(c)
        out = _gemm_topk(
            out, vector_col, list(map(float, query)), k, space,
            passthrough, dist_col, round_to,
        )
        order = [F.col(dist_col).asc()] + [F.col(c).asc() for c in tie_break]
        out = out.orderBy(*order).limit(k)
    else:
        dist = distance_expr(space, F.col(vector_col), vector_lit(query))
        if round_to is not None:
            dist = F.round(dist, round_to)
        out = out.withColumn(dist_col, dist)
        order = [F.col(dist_col).asc()] + [F.col(c).asc() for c in tie_break]
        out = out.orderBy(*order).limit(k)

    sim = similarity_expr(space, F.col(dist_col), dims=dims)
    if round_to is not None:
        sim = F.round(sim, round_to)
    out = out.withColumn(sim_col, sim)
    if select_cols is not None:
        out = out.select(*select_cols, dist_col, sim_col)
    return out


def _round_half_up(d, round_to: int):
    """numpy twin of Spark's HALF_UP round (np.round is half-even)."""
    import numpy as np

    scale = 10.0 ** round_to
    return np.floor(np.abs(d) * scale + 0.5) / scale * np.sign(d)


def _gemm_topk(
    src: DataFrame,
    vector_col: str,
    query: list,
    k: int,
    space: SpaceType,
    passthrough: list,
    dist_col: str,
    round_to: int | None,
) -> DataFrame:
    """mapInPandas single-query scorer: one numpy matvec per Arrow batch,
    per-batch top-k, ≤ k rows per batch reach the driver-side merge. Rounding
    (HALF_UP, matching Spark/DuckDB) happens *before* the per-batch cut so the
    global k-boundary is decided on rounded values exactly like the
    expression path."""
    import numpy as np  # noqa: F401

    fields = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    out_schema = ", ".join(
        [f"{c} {fields[c]}" for c in passthrough] + [f"{dist_col} double"]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        q = np.asarray(query, dtype=np.float64)
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
                d[zero] = 1.0  # zero-norm convention (distance.py)
            elif space == SpaceType.DOT_PRODUCT:
                d = 1.0 - dots
            else:  # EUCLIDEAN (l2sq)
                d = (X * X).sum(axis=1) + q2 - 2.0 * dots
            if round_to is not None:
                d = _round_half_up(d, round_to)
            kk = min(k, len(d))
            if kk < len(d):
                # keep every row tied at the k-boundary: the global merge
                # breaks ties on tie_break columns, and the winner of a tie
                # group must not be cut inside its batch
                kth = np.partition(d, kk - 1)[kk - 1]
                top = np.nonzero(d <= kth)[0]
            else:
                top = np.arange(len(d))
            f = pdf.iloc[top][passthrough].copy()
            f[dist_col] = d[top]
            yield f

    in_cols = passthrough if vector_col in passthrough else [*passthrough, vector_col]
    return src.select(*in_cols).mapInPandas(score, schema=out_schema)


def knn_join(
    items: DataFrame,
    vector_col: str,
    queries: "list[tuple]",
    k: int,
    space: SpaceType = SpaceType.COSINE,
    id_cols: Sequence[str] = (),
    query_id_col: str = "query_id",
    dist_col: str = "distance",
    round_to: int | None = None,
) -> DataFrame:
    """Batch kNN: for every (query_id, vector) in ``queries`` return the k nearest
    items. ``queries`` is a small driver-side list [(qid, [floats...]), ...] —
    it is broadcast (numpy matrix inside the UDF closure), never shuffled.

    Plan shape: mapInPandas (per-batch GEMM + per-batch top-k, emitting ≤
    n_queries·k rows per batch) → window top-k per query. The window input is at
    most n_partitions · n_queries · k rows — tiny regardless of table size.
    """
    import numpy as np  # noqa: F401  (validated here, used in the UDF)

    if not queries:
        raise ValueError("queries must be non-empty")
    qids = [q[0] for q in queries]
    qmat = [list(map(float, q[1])) for q in queries]
    dims = len(qmat[0])
    if any(len(v) != dims for v in qmat):
        raise ValueError("all query vectors must share dimensions")  # P9

    id_cols = list(id_cols)
    src = items.select(*id_cols, vector_col)
    id_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema if f.name in id_cols)
    out_schema = f"{query_id_col} string, {id_fields}, {dist_col} double"

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        Q = np.asarray(qmat, dtype=np.float64)  # (nq, d)
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0.0] = 1.0
        if space == SpaceType.HAMMING:
            # sign-binarize + MSB-first pack once per task (usearch.rs:480-487
            # treats Hamming as first-class over B1-packed vectors); scoring is
            # XOR + popcount-LUT over packed bytes — 8 dims per byte op
            Qb = np.packbits(Q > 0, axis=1)  # (nq, d/8)
            popcount = np.unpackbits(
                np.arange(256, dtype=np.uint8)[:, None], axis=1
            ).sum(axis=1).astype(np.float64)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
            if space == SpaceType.HAMMING:
                Xb = np.packbits(X > 0, axis=1)  # (n, d/8)
                dist = popcount[
                    np.bitwise_xor(Xb[:, None, :], Qb[None, :, :])
                ].sum(axis=2)  # (n, nq)
            else:
                dots = X @ Q.T  # (n, nq)
                if space == SpaceType.COSINE:
                    xn = np.linalg.norm(X, axis=1)
                    xn[xn == 0.0] = 1.0
                    dist = 1.0 - dots / np.outer(xn, qn)
                elif space == SpaceType.DOT_PRODUCT:
                    dist = 1.0 - dots
                else:  # EUCLIDEAN (l2sq)
                    x2 = (X * X).sum(axis=1)
                    q2 = (Q * Q).sum(axis=1)
                    dist = x2[:, None] + q2[None, :] - 2.0 * dots
            frames = []
            kk = min(k, len(pdf))
            for j, qid in enumerate(qids):
                dj = dist[:, j]
                if kk < len(dj):
                    # keep EVERY row tied at the batch-local k-boundary (same
                    # rule as _gemm_topk above): the global merge breaks ties
                    # on id_cols, and the winner of a tie group must not be
                    # cut inside its batch — integer Hamming distances tie
                    # constantly, so a bare argpartition[:k] drops the
                    # smallest-id member of a boundary tie at larger SFs
                    kth = np.partition(dj, kk - 1)[kk - 1]
                    top = np.nonzero(dj <= kth)[0]
                else:
                    top = np.arange(len(dj))
                f = pdf.iloc[top][id_cols].copy()
                f.insert(0, query_id_col, str(qid))
                f[dist_col] = dj[top]
                frames.append(f)
            yield pd.concat(frames, ignore_index=True)

    partial = src.mapInPandas(score, schema=out_schema)
    if round_to is not None:
        partial = partial.withColumn(dist_col, F.round(dist_col, round_to))
    w = Window.partitionBy(query_id_col).orderBy(F.col(dist_col).asc(), *[F.col(c).asc() for c in id_cols])
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str,
    k_const: int = 60,
    limit: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of result lists —
    the standard hybrid-search combiner (lexical BM25 leg + vector ANN leg,
    the two families this engine serves): each input frame carries
    (``id_col``, ``rank``) with 1-based ranks over its own top-N, and the
    fused score is Σ 1/(k_const + rank) over the legs that returned the id
    (an absent leg contributes 0). Deterministic and float-stable across
    engines: ranks are integers, each contribution is one correctly-rounded
    division, the sum is one addition per leg.

    Scale shape: the inputs are top-N frames (result-sized), so the full
    outer join and the final sort are metadata-sized — fusion adds no
    fact-table work beyond the legs themselves."""
    if not ranked:
        raise ValueError("rrf_fuse requires at least one ranked input")
    tagged = []
    for i, df in enumerate(ranked):
        tagged.append(df.select(
            id_col,
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank").cast("double"))
             ).alias(f"_rrf{i}"),
        ))
    out = tagged[0]
    for t in tagged[1:]:
        # full outer can't broadcast; shuffle-hash over the top-N frames
        # keeps the merge sort-free (both sides are result-sized)
        out = out.join(t.hint("SHUFFLE_HASH"), id_col, "full_outer")
    score = None
    for i in range(len(tagged)):
        c = F.coalesce(F.col(f"_rrf{i}"), F.lit(0.0))
        score = c if score is None else score + c
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        out.withColumn("rrf_score", score)
        .select(id_col, "rrf_score")
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(limit)
    )


def ranked_top_n(
    df: DataFrame, order_cols: Sequence[Column], n: int
) -> DataFrame:
    """df + 1-based ``rank`` over ``order_cols``, truncated to the top ``n``
    — the per-leg input shape of :func:`rrf_fuse`. The window is single-
    partition by design: it runs over a leg's TOP-N candidates (result-
    sized), never the fact table — rank the output of a top-k operator,
    not a raw scan."""
    w = Window.orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
    )


def knn_label_vote(
    items: DataFrame,
    vector_col: str,
    label_col: str,
    queries: "list[tuple]",
    k: int,
    space: SpaceType = SpaceType.COSINE,
    id_cols: Sequence[str] = ("vec_id",),
    round_to: int | None = None,
) -> DataFrame:
    """kNN classification (the semi-supervised labeling step of a training-
    data pipeline: propagate labels from a labeled pool to query points):
    each query's label is the majority vote of its k nearest labeled
    neighbors, ties broken by (votes desc, label asc). Built directly on
    :func:`knn_join` — the label rides the neighbor rows as a payload
    column, so voting is one result-sized aggregation (n_queries · k rows)
    after the broadcast-GEMM kNN; no extra pass over the table."""
    nn = knn_join(
        items, vector_col, queries, k, space=space,
        id_cols=[*id_cols, label_col], round_to=round_to,
    )
    votes = nn.groupBy("query_id", label_col).agg(F.count("*").alias("votes"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_id", F.col(label_col).alias("predicted_label"), "votes")
    )
