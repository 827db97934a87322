"""All-pairs kNN graph and embedding-space label diagnostics.

Two embedding-pipeline operators the reference's point-query API doesn't
cover but its data model (id, vector, label) makes natural:

- :func:`knn_graph` — every row's ``m`` nearest neighbors, the edge list
  that near-dup clustering, label propagation, and graph-index builds
  (HNSW/NSG literature) consume. A naive formulation is an O(n²)
  cross-join; the scale shape here is IVF blocking: assign each vector to
  its ``n_assign`` nearest centroids (same FLANN-style multiple assignment
  as operators/ivf.ivf_assign), run one exact GEMM per cluster block, keep
  per-block top-m, and merge per id. Work is Σ_c |block_c|² instead of n² —
  with k_centroids ∝ √n this is ~n^1.5, and each block is an independent
  task. Recall follows multiple assignment: a true neighbor is found iff
  the pair shares ≥1 of their n_assign clusters (n_assign=2 captures
  boundary pairs single assignment loses).
- :func:`label_centroids` / :func:`label_outliers` — per-label mean vector
  and distance-to-own-centroid ranking: the standard embedding-space
  mislabel/outlier sweep a training-data audit runs (CLIP-filtering style).
  Centroids via posexplode + partial-aggregated avg per (label, dim): the
  shuffle carries labels × dims rows, never the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_store_spark.operators.ivf import ivf_assign, ivf_centroids
from vector_store_spark.types import SpaceType


def knn_graph(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    k_centroids: int = 8,
    n_assign: int = 2,
    round_to: int | None = None,
    centroids: list | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked all-pairs kNN (cosine): per-cluster exact GEMM → per-block
    top-m → min-merge across blocks → per-id top-m. Returns
    (``id_col``, nbr_id, distance), ≤ m rows per id.

    Determinism: distances are HALF_UP-rounded *before* every cut and ties
    break on ascending neighbor id, so the per-block exact-m cut composes
    with the global window without boundary ambiguity (a neighbor cut in
    its block has ≥ m better-(distance, nbr) candidates that are all
    present globally). Cross-block duplicates of a pair carry the same
    rounded distance; ``min`` makes the merge deterministic even if the
    two blocks' GEMMs differ in the last float bit.

    ``max_block`` is the skew guard: IVF clusters are data-sized, so one hot
    cluster would otherwise become one task holding |cluster|² GEMM work.
    With ``max_block`` set, every cluster is hash-split into
    ceil(|cluster|/max_block) chunks and processed as a grid of chunk-pair
    cells ((a, b), a ≤ b — diagonal cells carry the within-chunk pairs), so
    per-task memory is ≤ 2·max_block rows whatever the skew; the same
    per-cell top-m → min-merge chain keeps the result IDENTICAL to the
    unsplit path (pinned by test). The total GEMM work is unchanged — the
    grid only bounds how much of it lands in one task. Replication cost is
    one extra copy of each row per chunk in its cluster (the standard
    theta-join grid trade)."""
    import math

    import numpy as np  # noqa: F401  (validated here, used in the UDF)

    if m <= 0:
        raise ValueError("m must be positive")
    if max_block is not None and max_block <= 0:
        raise ValueError("max_block must be positive when set")
    cents = centroids if centroids is not None else ivf_centroids(
        items, id_col, vec_col, k_centroids
    )
    assigned = ivf_assign(
        items, id_col, vec_col, cents, space=SpaceType.COSINE, n_assign=n_assign
    ).select(id_col, vec_col, "cluster")

    id_type = dict(items.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, nbr_id {id_type}, distance double"

    def block(pdf):
        import numpy as np
        import pandas as pd

        from vector_store_spark.operators.topk import _round_half_up

        ids = pdf[id_col].to_numpy()
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        n = len(ids)
        if n < 2:
            return pd.DataFrame({id_col: ids[:0], "nbr_id": ids[:0],
                                 "distance": np.zeros(0)})
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        D = 1.0 - (X @ X.T) / np.outer(norms, norms)
        if round_to is not None:
            D = _round_half_up(D, round_to)
        src, dst, dist = [], [], []
        mm = min(m, n - 1)
        for i in range(n):
            d = D[i].copy()
            d[i] = np.inf  # exclude self
            order = np.lexsort((ids, d))[:mm]
            src.extend([ids[i]] * mm)
            dst.extend(ids[order])
            dist.extend(d[order])
        return pd.DataFrame({id_col: src, "nbr_id": dst, "distance": dist})

    if max_block is None:
        per_block = assigned.groupBy("cluster").applyInPandas(block, out_schema)
    else:
        # grid sub-blocking: chunk = hash(id) mod ceil(|cluster|/max_block);
        # the per-cluster chunk counts are a k_centroids-row aggregate
        # (driver-side, like the centroid table itself), and the cell map
        # (cluster, chunk) -> (cell_a, cell_b) is metadata-sized — broadcast.
        sizes = {
            r["cluster"]: r["n"]
            for r in assigned.groupBy("cluster").agg(
                F.count("*").alias("n")).collect()
        }
        cell_rows = []
        for c, n in sizes.items():
            nc = max(1, math.ceil(n / max_block))
            for chunk in range(nc):
                for other in range(nc):
                    cell_rows.append(
                        (c, chunk, min(chunk, other), max(chunk, other))
                    )
        cluster_type = dict(assigned.dtypes)["cluster"]
        cells = assigned.sparkSession.createDataFrame(
            sorted(set(cell_rows)),
            f"cluster {cluster_type}, _chunk int, _ca int, _cb int",
        )
        nchunk_expr = F.create_map(*[
            x for c, n in sorted(sizes.items())
            for x in (F.lit(c), F.lit(max(1, math.ceil(n / max_block))))
        ])
        chunked = assigned.withColumn(
            "_chunk",
            F.pmod(F.xxhash64(F.col(id_col)), nchunk_expr[F.col("cluster")])
            .cast("int"),
        )
        gridded = chunked.join(F.broadcast(cells), ["cluster", "_chunk"])

        def grid_cell(key, pdf):
            import numpy as np
            import pandas as pd

            from vector_store_spark.operators.topk import _round_half_up

            _, ca, cb = key
            empty = pd.DataFrame({id_col: pdf[id_col][:0],
                                  "nbr_id": pdf[id_col][:0],
                                  "distance": np.zeros(0)})
            if ca == cb:
                return block(pdf)
            A = pdf[pdf["_chunk"] == ca]
            B = pdf[pdf["_chunk"] == cb]
            if A.empty or B.empty:
                return empty
            XA = np.asarray([np.asarray(v, dtype=np.float64) for v in A[vec_col]])
            XB = np.asarray([np.asarray(v, dtype=np.float64) for v in B[vec_col]])
            na = np.linalg.norm(XA, axis=1)
            nb = np.linalg.norm(XB, axis=1)
            na[na == 0.0] = 1.0
            nb[nb == 0.0] = 1.0
            D = 1.0 - (XA @ XB.T) / np.outer(na, nb)
            if round_to is not None:
                D = _round_half_up(D, round_to)
            ia = A[id_col].to_numpy()
            ib = B[id_col].to_numpy()
            src, dst, dist = [], [], []
            ma = min(m, len(ib))
            for i in range(len(ia)):
                order = np.lexsort((ib, D[i]))[:ma]
                src.extend([ia[i]] * ma)
                dst.extend(ib[order])
                dist.extend(D[i][order])
            mb = min(m, len(ia))
            for j in range(len(ib)):
                order = np.lexsort((ia, D[:, j]))[:mb]
                src.extend([ib[j]] * mb)
                dst.extend(ia[order])
                dist.extend(D[:, j][order])
            return pd.DataFrame({id_col: src, "nbr_id": dst, "distance": dist})

        per_block = gridded.groupBy("cluster", "_ca", "_cb").applyInPandas(
            grid_cell, out_schema
        )
    merged = per_block.groupBy(id_col, "nbr_id").agg(
        F.min("distance").alias("distance")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("nbr_id").asc()
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= m)
        .drop("_rn")
    )


def label_centroids(
    items: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Per-label mean vector as (``label_col``, centroid array<double>).
    posexplode → avg per (label, pos) → re-assemble: the partial aggregate
    collapses the dims× blow-up map-side, so the exchange carries
    labels × dims rows regardless of table size."""
    exploded = items.select(
        label_col, F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("pos", "val")
    )
    per_dim = exploded.groupBy(label_col, "pos").agg(F.avg("val").alias("c"))
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def label_outliers(
    items: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str,
    top_n: int = 15,
    round_to: int | None = None,
    centroid_round_to: int | None = None,
) -> DataFrame:
    """The ``top_n`` vectors farthest (L2²) from their own label's centroid
    — ranked mislabel/outlier candidates for an embedding-space audit.
    The centroid frame is label-dimension-sized and broadcast; scoring is
    one Arrow-batched numpy pass over the fact scan; only the global
    ``top_n`` rows survive the final sort.

    ``centroid_round_to`` snaps centroid components to a fixed grid BEFORE
    distance scoring: Spark's partial-agg ``avg`` and a sequential oracle
    ``avg`` differ by ~1e-15 per component, and rounding only the final
    dist_sq lets that drift flip a 6-dp boundary — same recipe as the
    refined-kmeans profile, erase the drift at the centroid."""
    import numpy as np  # noqa: F401

    cents = label_centroids(items, label_col, vec_col)
    joined = items.select(id_col, label_col, vec_col).join(
        F.broadcast(cents), label_col
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        from vector_store_spark.operators.topk import _round_half_up

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            C = np.asarray([np.asarray(c, dtype=np.float64) for c in pdf["centroid"]])
            if centroid_round_to is not None:
                C = _round_half_up(C, centroid_round_to)
            d2 = ((X - C) ** 2).sum(axis=1)
            if round_to is not None:
                d2 = _round_half_up(d2, round_to)
            out = pdf[[id_col, label_col]].copy()
            out["dist_sq"] = d2
            yield out

    id_type = dict(items.dtypes)[id_col]
    lbl_type = dict(items.dtypes)[label_col]
    scored = joined.mapInPandas(
        score, schema=f"{id_col} {id_type}, {label_col} {lbl_type}, dist_sq double"
    )
    return scored.orderBy(F.col("dist_sq").desc(), F.col(id_col).asc()).limit(top_n)


def contrastive_triplets(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k_centroids: int = 8,
    n_assign: int = 2,
    round_to: int | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """Metric-learning triplet mining over the same IVF blocking as
    :func:`knn_graph`: for every anchor, its nearest SAME-label neighbor
    (the positive) and its nearest DIFFERENT-label neighbor (the hard
    negative — the in-batch-hard-negative selection contrastive training
    recipes use, but corpus-wide and deterministic). Anchors missing either
    side within their blocks are dropped (inner join).

    Per block each anchor emits ≤ 2 rows (best per category), merged
    across blocks by min-distance then a per-(anchor, category) window —
    the same cut-compose argument as knn_graph's top-m: the per-category
    winner of the union is the winner of some block's per-category cut.

    Returns (anchor_id, positive_id, pos_distance, negative_id,
    neg_distance)."""
    import numpy as np  # noqa: F401

    cents = centroids if centroids is not None else ivf_centroids(
        items, id_col, vec_col, k_centroids
    )
    assigned = ivf_assign(
        items, id_col, vec_col, cents, space=SpaceType.COSINE, n_assign=n_assign
    ).select(id_col, vec_col, label_col, "cluster")

    id_type = dict(items.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, nbr_id {id_type}, same_label boolean, "
        "distance double"
    )

    def block(pdf):
        import numpy as np
        import pandas as pd

        from vector_store_spark.operators.topk import _round_half_up

        ids = pdf[id_col].to_numpy()
        labels = pdf[label_col].to_numpy()
        n = len(ids)
        empty = pd.DataFrame({id_col: ids[:0], "nbr_id": ids[:0],
                              "same_label": np.zeros(0, dtype=bool),
                              "distance": np.zeros(0)})
        if n < 2:
            return empty
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        D = 1.0 - (X @ X.T) / np.outer(norms, norms)
        if round_to is not None:
            D = _round_half_up(D, round_to)
        src, dst, same, dist = [], [], [], []
        for i in range(n):
            d = D[i].copy()
            d[i] = np.inf
            order = np.lexsort((ids, d))
            for want_same in (True, False):
                mask = (labels[order] == labels[i]) == want_same
                hits = order[mask]
                if len(hits) and np.isfinite(d[hits[0]]):
                    j = hits[0]
                    src.append(ids[i])
                    dst.append(ids[j])
                    same.append(want_same)
                    dist.append(d[j])
        return pd.DataFrame({id_col: src, "nbr_id": dst,
                             "same_label": np.array(same, dtype=bool),
                             "distance": dist})

    per_block = assigned.groupBy("cluster").applyInPandas(block, out_schema)
    merged = per_block.groupBy(id_col, "nbr_id", "same_label").agg(
        F.min("distance").alias("distance")
    )
    w = Window.partitionBy(id_col, "same_label").orderBy(
        F.col("distance").asc(), F.col("nbr_id").asc()
    )
    best = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    pos = best.where(F.col("same_label")).select(
        F.col(id_col).alias("anchor_id"),
        F.col("nbr_id").alias("positive_id"),
        F.col("distance").alias("pos_distance"),
    )
    neg = best.where(~F.col("same_label")).select(
        F.col(id_col).alias("anchor_id"),
        F.col("nbr_id").alias("negative_id"),
        F.col("distance").alias("neg_distance"),
    )
    # both legs are one row per anchor (corpus-row-count-sized): shuffle-hash
    return pos.join(neg.hint("SHUFFLE_HASH"), "anchor_id")


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    nbr_col: str,
    n_nodes: float,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (e.g. the blocked
    kNN graph): ``r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u)/outdeg(u)``
    from a uniform start.  Teleport-only formulation: mass at dangling nodes
    (no out-edges) evaporates instead of being redistributed — the same
    simplification as the canonical Spark PageRank example, chosen so every
    iteration is pure joins/aggregates with no per-iteration scalar pass;
    on a kNN graph dangling nodes are block singletons (rare to absent).

    Scale shape: the per-source ``rank/outdeg`` fan-out joins the edge list
    with the node-sized rank frame (both fact-sized -> SHUFFLE_HASH), the
    contribution sum shuffles on the destination key with map-side partial
    combine, and the left join back onto the node set re-seeds the next
    iteration.  ``iterations`` is a fixed small constant, so the lineage
    depth is bounded; no driver-side collection anywhere.

    Returns (``id_col``, rank) with sum(rank) <= 1 (teleport-only leak).
    """
    if iterations <= 0:
        raise ValueError("iterations must be positive")
    deg = edges.groupBy(id_col).agg(F.count("*").cast("double").alias("_outdeg"))
    ed = (
        edges.join(deg.hint("SHUFFLE_HASH"), id_col)
        .select(
            F.col(id_col).alias("_src"),
            F.col(nbr_col).alias("_dst"),
            "_outdeg",
        )
    )
    node_ids = nodes.select(id_col)
    ranks = node_ids.select(
        F.col(id_col), F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            ed.join(
                ranks.withColumnRenamed(id_col, "_src").hint("SHUFFLE_HASH"),
                "_src",
            )
            .groupBy("_dst")
            .agg(F.sum(F.col("rank") / F.col("_outdeg")).alias("_contrib"))
        )
        ranks = (
            node_ids.join(
                contrib.withColumnRenamed("_dst", id_col).hint("SHUFFLE_HASH"),
                id_col,
                "left",
            )
            .select(
                F.col(id_col),
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce("_contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
