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
    min_candidates: int | None = None,
) -> DataFrame:
    """IVF pruning → PQ/ADC scoring → (optional) exact rescoring, all in L2.

    ``min_candidates`` arms the adaptive probe (same contract as
    :func:`~vector_store_spark.operators.ivf.ivf_topk`): ``items`` is the
    already-filtered set (T2 semantics, usearch.rs:224-248); one count
    decides the tier — exact L2 ranking at or under the floor, an escalated
    nprobe just above it, untouched probing on large sets."""
    if min_candidates is not None:
        from vector_store_spark.operators.ivf import adaptive_nprobe
        from vector_store_spark.operators.topk import ann_topk

        n_rows = items.count()
        kc = len(centroids) if centroids is not None else k_centroids
        np_eff = adaptive_nprobe(n_rows, kc, nprobe, min_candidates, k=k)
        if np_eff is None:
            return ann_topk(
                items, vec_col, query, k,
                space=SpaceType.EUCLIDEAN, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        nprobe = np_eff
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


def ivfpq_build(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    k_centroids: int = 16,
    m_sub: int = 8,
    k_codes: int = 16,
    trained: bool = False,
    n_assign: int = 1,
    seed: int = 42,
    filtering_cols: list | None = None,
    residual: bool = False,
) -> tuple:
    """Persist the IVF-PQ memory-tier layout: parquet ``partitionBy(cluster)``
    storing ONLY (id, pq_code) — m_sub bytes per vector instead of the full-
    precision array, so candidate scans read codes, never vectors (those stay
    in the source table for the rescore/back-join point lookup). This is the
    on-disk shape where 100 TB of vectors stops fitting hot storage: probes
    prune cluster directories AND each candidate row is ~64× narrower.
    Centroids + codebook go to a ``_ivfpq_meta.json`` sidecar. Returns
    (centroids, codebook).

    ``filtering_cols`` names narrow payload columns to store NEXT TO the
    codes: restricted ANN on the memory tier (usearch.rs:1108-1154 evaluates
    predicates inside traversal; the quantized layout keeps the filterable
    attributes in-index for the same reason), so ``ivfpq_search``'s
    ``predicate`` applies to the pruned code scan before ADC."""
    import json
    import os

    from vector_store_spark.operators.ivf import ivf_centroids_trained
    from vector_store_spark.operators.pq import pq_codebook_trained
    from vector_store_spark.sources.index_store import fresh_dir, write_local_index

    if trained:
        cents = ivf_centroids_trained(
            items, vec_col, k_centroids, space=SpaceType.EUCLIDEAN, seed=seed
        )
    else:
        cents = ivf_centroids(items, id_col, vec_col, k_centroids)
    if residual:
        # IVFADC layout (Jégou et al. 2011 §IV): codes encode v − centroid
        # of the row's OWN cluster, so the same byte budget quantizes the
        # residual distribution (concentrated near the origin) instead of
        # the raw vectors — the composition real quantized tiers persist
        cb = (
            ivfpq_residual_codebook_trained(
                items, id_col, vec_col, cents, m_sub, k_codes, seed=seed,
                train_n_assign=n_assign,
            )
            if trained
            else ivfpq_residual_codebook(items, id_col, vec_col, cents, m_sub, k_codes)
        )
    elif trained:
        cb = pq_codebook_trained(items, id_col, vec_col, m_sub, k_codes, seed=seed)
    else:
        cb = pq_codebook(items, id_col, vec_col, m_sub, k_codes)
    assigned = ivf_assign(
        items, id_col, vec_col, cents, space=SpaceType.EUCLIDEAN, n_assign=n_assign
    )
    if residual:
        assigned = assigned.withColumn(
            "_res",
            residual_expr_udf(cents)(
                F.col("cluster"), F.col(vec_col).cast("array<double>")
            ),
        )
        encoded = pq_encode(assigned, "_res", cb).select(
            id_col, "cluster", "pq_code", *(filtering_cols or [])
        )
    else:
        encoded = pq_encode(assigned, vec_col, cb).select(
            id_col, "cluster", "pq_code", *(filtering_cols or [])
        )
    fresh_dir(path)
    write_local_index(encoded, path, ["cluster"])
    meta = {
        "m_sub": m_sub,
        "n_assign": n_assign,
        "k_centroids": k_centroids,
        "residual": bool(residual),
        "centroids": [[cid, list(map(float, cv))] for cid, cv in cents],
        "codebook": np.asarray(cb, dtype=np.float64).tolist(),
    }
    with open(os.path.join(path, "_ivfpq_meta.json"), "w") as f:
        json.dump(meta, f)
    return cents, cb


def ivfpq_search(
    spark,
    path: str,
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    nprobe: int = 4,
    rescore: int = 0,
    select_cols: list | None = None,
    round_to: int | None = None,
    predicate=None,
    min_candidates: int | None = None,
) -> DataFrame:
    """Query a persisted IVF-PQ index: probe the sidecar centroids (driver-
    side), scan ONLY the probed cluster directories' (id, pq_code) rows
    (partition pruning + 8-byte rows), ADC-score against the query LUT, then
    back-join the k (or k·rescore, exact-re-ranked) winners to the source
    table for payload columns — the J1 id→key point lookup, broadcast because
    the shortlist is result-sized.

    ``predicate`` filters the pruned code scan (over columns the build stored
    via ``filtering_cols``) BEFORE ADC — restricted ANN on the memory tier,
    top-k OF the filtered candidates (T2).

    ``min_candidates`` (with a predicate) arms the adaptive probe — the same
    count-then-tier contract as ivf.ivf_search: one pushed, column-pruned
    count of the filtered code rows decides between exact ranking (the
    filtered ids back-join to the source vectors — a min_candidates-bounded,
    broadcastable set — and rank by true distance, the reference's
    restricted-search guarantee) and an escalated nprobe."""
    import json
    import os

    from vector_store_spark.operators.ivf import adaptive_nprobe

    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    cents = [(cid, cv) for cid, cv in meta["centroids"]]
    cb = np.asarray(meta["codebook"], dtype=np.float64)
    if min_candidates is not None and predicate is not None:
        filtered = spark.read.parquet(path).where(predicate)
        if meta["n_assign"] > 1:
            filtered = filtered.dropDuplicates([id_col])
        n_filtered = filtered.count()
        np_eff = adaptive_nprobe(
            n_filtered, meta["k_centroids"], nprobe, min_candidates, k=k
        )
        if np_eff is None:
            from vector_store_spark.functions.distance import (
                distance_expr,
                vector_lit,
            )

            exact = distance_expr(
                SpaceType.EUCLIDEAN,
                F.col(vec_col).cast("array<double>"),
                vector_lit(query),
            )
            if round_to is not None:
                exact = F.round(exact, round_to)
            cols = select_cols or [id_col]
            back = items.join(F.broadcast(filtered.select(id_col)), id_col)
            return (
                back.withColumn("distance", exact)
                .orderBy(F.col("distance").asc(), F.col(id_col).asc())
                .limit(k)
                .select(*cols, "distance")
            )
        nprobe = np_eff
    probes = ivf_probe(cents, query, nprobe, space=SpaceType.EUCLIDEAN)
    cand = spark.read.parquet(path).where(F.col("cluster").isin(probes))
    if predicate is not None:
        cand = cand.where(predicate)
    if meta.get("residual"):
        # IVFADC serving: one LUT per probed cluster from the query's OWN
        # residual q − centroid_c (driver-side, nprobe × m_sub × k_codes)
        qv = np.asarray(query, dtype=np.float64)
        cmap = {cid: np.asarray(cv, dtype=np.float64) for cid, cv in cents}
        luts = {c: pq_adc_lut(cb, (qv - cmap[c]).tolist()) for c in probes}
        dist = _adc_by_cluster_udf(luts)(F.col("cluster"), F.col("pq_code"))
    else:
        lut = pq_adc_lut(cb, query)
        dist = pq_adc_distance("pq_code", lut)
    if round_to is not None:
        dist = F.round(dist, round_to)
    if meta["n_assign"] > 1:
        if meta.get("residual"):
            # replica codes differ per assigned cluster (each encodes the
            # residual to ITS centroid), so the survivor must be picked
            # deterministically: keep the min-ADC replica (ties by cluster) —
            # same contract as ivfpq_residual_topk's smallest-residual window.
            # A bare dropDuplicates keeps whichever replica a partition scan
            # hands the hash-agg first, making top-k run-dependent.
            from pyspark.sql import Window

            cand = cand.withColumn("_adc", dist)
            w = Window.partitionBy(id_col).orderBy(
                F.col("_adc").asc(), F.col("cluster").asc()
            )
            cand = (
                cand.withColumn("_rep_rn", F.row_number().over(w))
                .where(F.col("_rep_rn") == 1)
                .drop("_rep_rn")
            )
            dist = F.col("_adc")
        else:
            # flat PQ: every replica carries the SAME code (it encodes the raw
            # vector), so any survivor scores identically — dedupe is cheap
            cand = cand.dropDuplicates([id_col])
    cols = select_cols or [id_col]
    shortlist = (
        cand.withColumn("distance", dist)
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(rescore * k if rescore > 0 else k)
        .select(id_col, "distance")
    )
    if rescore > 0:
        from vector_store_spark.functions.distance import distance_expr, vector_lit

        exact = distance_expr(
            SpaceType.EUCLIDEAN, F.col(vec_col).cast("array<double>"), vector_lit(query)
        )
        if round_to is not None:
            exact = F.round(exact, round_to)
        rej = items.join(F.broadcast(shortlist.select(id_col)), id_col)
        return (
            rej.withColumn("distance", exact)
            .orderBy(F.col("distance").asc(), F.col(id_col).asc())
            .limit(k)
            .select(*cols, "distance")
        )
    back = items.select(*dict.fromkeys([*cols, id_col])).join(
        F.broadcast(shortlist), id_col
    )
    return (
        back.orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .select(*cols, "distance")
        .limit(k)
    )


def residual_expr_udf(centroids: list):
    """(cluster, vector) -> vector - centroid[cluster], Arrow-batched.
    Float64 elementwise subtraction — bit-identical to the oracle's
    ``list_transform(list_zip(v, cv), p -> p[1] - p[2])``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    cmap = {cid: np.asarray(cv, dtype=np.float64) for cid, cv in centroids}

    def batch(clusters, vecs):
        return pd.Series([
            (np.asarray(v, dtype=np.float64) - cmap[c]).tolist()
            for c, v in zip(clusters, vecs)
        ])

    return F.pandas_udf(batch, ArrayType(DoubleType())).asNondeterministic()


def ivfpq_residual_codebook(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    m_sub: int,
    k_codes: int,
) -> np.ndarray:
    """Deterministic residual codebook: the subvector slices of the K
    smallest-id rows' residuals (vector − its nearest centroid, L2).
    Assignment of the sample happens driver-side (numpy) with the same
    argmin-L2 / smallest-cid tie-break as ivf_assign."""
    rows = (
        items.select(id_col, vec_col).orderBy(id_col).limit(k_codes).collect()
    )
    mat = np.array([list(map(float, r[1])) for r in rows], dtype=np.float64)
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    c2 = (cmat * cmat).sum(axis=1)
    score = 2.0 * (mat @ cmat.T) - c2[None, :]  # argmax = nearest (ties: first)
    assign = np.argmax(score, axis=1)
    res = mat - cmat[assign]
    dims = res.shape[1]
    if dims % m_sub:
        raise ValueError(f"dims {dims} not divisible by m_sub {m_sub}")
    d_sub = dims // m_sub
    return res.reshape(k_codes, m_sub, d_sub).transpose(1, 0, 2).copy()


def _adc_by_cluster_udf(luts: dict):
    """(cluster, code) -> Σ_s lut[cluster][s, code[s]] (per-cluster LUTs:
    the residual-ADC scoring of IVFADC). Left-to-right sum over subspaces
    (oracle list_sum order)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def batch(clusters, codes):
        out = []
        for c, code in zip(clusters, codes):
            lut = luts[c]
            s = 0.0
            for j in range(lut.shape[0]):
                s += lut[j, code[j]]
            out.append(s)
        return pd.Series(out, dtype="float64")

    return F.pandas_udf(batch, DoubleType()).asNondeterministic()


def ivfpq_residual_topk(
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
    min_candidates: int | None = None,
) -> DataFrame:
    """Textbook IVFADC (Jégou et al. 2011 §IV): PQ codes are trained on and
    encode *residuals* v − centroid(v), and the query builds one LUT per
    probed cluster from its own residual q − centroid_c. Residuals
    concentrate around the origin, so the same code budget quantizes much
    finer than flat PQ — this is why real systems compose IVF and PQ this
    way. Same plan shape as :func:`ivfpq_topk` plus one narrow residual map.
    ``min_candidates`` arms the same adaptive probe as :func:`ivfpq_topk`."""
    if min_candidates is not None:
        from vector_store_spark.operators.ivf import adaptive_nprobe
        from vector_store_spark.operators.topk import ann_topk

        n_rows = items.count()
        kc = len(centroids) if centroids is not None else k_centroids
        np_eff = adaptive_nprobe(n_rows, kc, nprobe, min_candidates, k=k)
        if np_eff is None:
            return ann_topk(
                items, vec_col, query, k,
                space=SpaceType.EUCLIDEAN, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        nprobe = np_eff
    cents = centroids if centroids is not None else ivf_centroids(
        items, id_col, vec_col, k_centroids
    )
    cb = codebook if codebook is not None else ivfpq_residual_codebook(
        items, id_col, vec_col, cents, m_sub, k_codes
    )
    assigned = ivf_assign(
        items, id_col, vec_col, cents, space=SpaceType.EUCLIDEAN, n_assign=n_assign
    )
    probes = ivf_probe(cents, query, nprobe, space=SpaceType.EUCLIDEAN)
    cand = assigned.where(F.col("cluster").isin(probes))
    cand = cand.withColumn(
        "_res",
        residual_expr_udf(cents)(F.col("cluster"), F.col(vec_col).cast("array<double>")),
    )
    if n_assign > 1:
        # keep ONE replica per id, deterministically the best-quantized one:
        # the smallest-residual copy (= nearest probed centroid; ties by
        # cluster). A bare dropDuplicates could keep a 2nd-assignment replica
        # whose larger residual quantizes worse — same shuffle, better ADC.
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.aggregate("_res", F.lit(0.0), lambda s, x: s + x * x).asc(),
            F.col("cluster").asc(),
        )
        cand = (
            cand.withColumn("_rep_rn", F.row_number().over(w))
            .where(F.col("_rep_rn") == 1)
            .drop("_rep_rn")
        )
    encoded = pq_encode(cand, "_res", cb)

    q = np.asarray(query, dtype=np.float64)
    cmap = {cid: np.asarray(cv, dtype=np.float64) for cid, cv in cents}
    luts = {c: pq_adc_lut(cb, (q - cmap[c]).tolist()) for c in probes}
    dist = _adc_by_cluster_udf(luts)(F.col("cluster"), F.col("pq_code"))
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


def ivfpq_residual_codebook_trained(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    m_sub: int,
    k_codes: int,
    seed: int = 42,
    n_iter: int = 25,
    sample_rows: int = 16384,
    train_n_assign: int = 1,
) -> np.ndarray:
    """Data-adaptive residual codebook: per-subspace Lloyd k-means over the
    residuals of a deterministic sample (same train-on-sample recipe as
    pq_codebook_trained, applied to v − centroid(v)).

    ``train_n_assign > 1`` trains on residuals to each of the top-n nearest
    centroids (the sample is stacked n×): when the index is built with
    FLANN-style multiple assignment, replica rows encode residuals to their
    2nd..n-th centroid, which are larger and out-of-distribution for a
    codebook trained only on nearest-centroid residuals — match this to the
    search-time ``n_assign`` so every stored code is in-distribution."""
    rows = (
        items.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    )
    mat = np.array([list(map(float, r[1])) for r in rows], dtype=np.float64)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    c2 = (cmat * cmat).sum(axis=1)
    d2 = c2[None, :] - 2.0 * (mat @ cmat.T)  # + ||v||², constant per row
    na = max(1, min(train_n_assign, cmat.shape[0]))
    top = np.argsort(d2, axis=1, kind="stable")[:, :na]
    res = np.concatenate([mat - cmat[top[:, a]] for a in range(na)], axis=0)
    dims = res.shape[1]
    if dims % m_sub:
        raise ValueError(f"dims {dims} not divisible by m_sub {m_sub}")
    d_sub = dims // m_sub
    sub = res.reshape(len(res), m_sub, d_sub)
    rng = np.random.default_rng(seed)
    books = []
    for s in range(m_sub):
        X = sub[:, s, :]
        init_idx = rng.choice(len(X), size=min(k_codes, len(X)), replace=False)
        C = X[np.sort(init_idx)].copy()
        for _ in range(n_iter):
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            a = d2.argmin(axis=1)
            for j in range(len(C)):
                m = a == j
                if m.any():
                    C[j] = X[m].mean(axis=0)
        books.append(C)
    return np.stack(books)
