"""Product quantization (PQ) with asymmetric distance computation (ADC) —
the memory-compression scale path for vector search (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; the building block of
IVF-PQ / FAISS-style indexes).

At 100 TB the full-precision vectors don't fit hot storage: PQ splits each
vector into M subspaces and stores one small code per subspace (here M bytes
per vector instead of 4·dims), and ADC scores candidates against a per-query
lookup table without ever decoding. The reference ships scalar quantization
(F32..B1, usearch.rs:503-513); PQ is the vector-quantization counterpart at
the next compression tier.

Determinism contract (oracle-checkable, like operators/ivf.py): codebooks are
the subvector slices of the K smallest-id rows — no random k-means — so the
whole encode → LUT → ADC pipeline re-derives in SQL. Swap in sampled k-means
codebooks behind the same interface for quality at scale.

Plan shape: encode is one narrow Arrow pass (codebook broadcast in the UDF
closure); search is scan → per-row LUT sum → TakeOrderedAndProject. No
shuffle, no join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType


def pq_codebook(items: DataFrame, id_col: str, vec_col: str, m_sub: int, k_codes: int) -> np.ndarray:
    """Deterministic codebook: shape (m_sub, k_codes, dims/m_sub), entry
    [s][j] = subvector s of the j-th smallest-id row (metadata-sized; lives
    on the driver like IVF centroids)."""
    rows = (
        items.select(id_col, vec_col).orderBy(id_col).limit(k_codes).collect()
    )
    mat = np.array([list(map(float, r[1])) for r in rows], dtype=np.float64)
    dims = mat.shape[1]
    if dims % m_sub:
        raise ValueError(f"dims {dims} not divisible by m_sub {m_sub}")
    d_sub = dims // m_sub
    # (k, m, d_sub) -> (m, k, d_sub)
    return mat.reshape(k_codes, m_sub, d_sub).transpose(1, 0, 2).copy()


def pq_codebook_trained(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    k_codes: int,
    seed: int = 42,
    n_iter: int = 25,
    sample_rows: int = 16384,
) -> np.ndarray:
    """Data-adaptive codebook: per-subspace Lloyd k-means on a deterministic
    sample (the FAISS training recipe — PQ codebooks are always trained on a
    bounded sample, not the full corpus, so at 100 TB this is one narrow
    sampled scan + a driver-side fit over ≤ ``sample_rows`` rows). Matches the
    reference's data-adaptive index build (usearch.rs:74-92) at the PQ tier.

    Deterministic for fixed (seed, input rows): the sample is the
    ``sample_rows`` smallest-id rows (id order, not partition order) and the
    k-means init is a seeded RNG choice among sample rows. Same return shape
    as :func:`pq_codebook`, so encode/LUT/ADC are unchanged."""
    rows = (
        items.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    )
    mat = np.array([list(map(float, r[1])) for r in rows], dtype=np.float64)
    dims = mat.shape[1]
    if dims % m_sub:
        raise ValueError(f"dims {dims} not divisible by m_sub {m_sub}")
    d_sub = dims // m_sub
    sub = mat.reshape(len(mat), m_sub, d_sub)
    rng = np.random.default_rng(seed)
    books = []
    for s in range(m_sub):
        X = sub[:, s, :]
        x2 = (X * X).sum(axis=1)
        # init: k distinct sample rows (seeded); Lloyd iterations to converge
        init_idx = rng.choice(len(X), size=min(k_codes, len(X)), replace=False)
        C = X[np.sort(init_idx)].copy()
        for _ in range(n_iter):
            # argmin L2² via the GEMM expansion (||x||² constant per row)
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            a = d2.argmin(axis=1)
            for j in range(len(C)):
                m = a == j
                if m.any():
                    C[j] = X[m].mean(axis=0)
        books.append(C)
    return np.stack(books)  # (m_sub, k_codes, d_sub)


def pq_encode(items: DataFrame, vec_col: str, codebook: np.ndarray, code_col: str = "pq_code") -> DataFrame:
    """items + ``code_col`` array<int> of length m_sub: per-subspace argmin
    L2² to the codebook (first/lowest code wins ties, matching SQL
    row_number ORDER BY dist, code)."""
    m_sub, k_codes, d_sub = codebook.shape
    cb = codebook  # broadcast via closure

    def encode(vecs):
        import pandas as pd

        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64).reshape(m_sub, 1, d_sub)
            # (m, k): L2² of each subvector against each code
            d = ((x - cb) ** 2).sum(axis=2)
            out.append(d.argmin(axis=1).astype("int32"))
        return pd.Series(out)

    udf = F.pandas_udf(encode, ArrayType(IntegerType())).asNondeterministic()
    return items.withColumn(code_col, udf(F.col(vec_col)))


def pq_adc_lut(codebook: np.ndarray, query: list[float]) -> np.ndarray:
    """Per-query lookup table, shape (m_sub, k_codes): L2² of the query's
    subvector s against code j. Computed once on the driver."""
    m_sub, k_codes, d_sub = codebook.shape
    q = np.asarray(query, dtype=np.float64).reshape(m_sub, 1, d_sub)
    return ((q - codebook) ** 2).sum(axis=2)


def pq_adc_distance(code_col: Column | str, lut: np.ndarray) -> Column:
    """ADC distance = Σ_s lut[s][code[s]] as an Arrow-batched expression
    (the LUT is a closure constant; per row this is m_sub array lookups)."""
    lut_c = lut

    def adc(codes):
        import pandas as pd

        m = lut_c.shape[0]
        rows = np.arange(m)
        out = np.empty(len(codes), dtype=np.float64)
        for i, c in enumerate(codes):
            # left-to-right sum over subspaces (oracle list_sum order)
            s = 0.0
            for j in range(m):
                s += lut_c[j, c[j]]
            out[i] = s
        return pd.Series(out)

    udf = F.pandas_udf(adc, DoubleType()).asNondeterministic()
    return udf(F.col(code_col) if isinstance(code_col, str) else code_col)


def pq_topk(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    m_sub: int = 8,
    k_codes: int = 16,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    codebook: np.ndarray | None = None,
    rescore: int = 0,
) -> DataFrame:
    """End-to-end PQ search: codebook → encode → ADC top-k. Exactness is
    governed by (m_sub, k_codes); recall vs brute force is a bench metric.

    ``codebook`` overrides the deterministic build (pass
    :func:`pq_codebook_trained` output for the recall-bearing index).
    ``rescore > 0`` adds the reference's rescoring stage
    (quantization_and_rescoring.rs:117-256): take ``rescore·k`` ADC
    candidates (TakeOrderedAndProject — per-partition heaps), then re-rank
    that metadata-sized set by exact L2² over the original vectors."""
    cb = codebook if codebook is not None else pq_codebook(
        items, id_col, vec_col, m_sub, k_codes
    )
    encoded = pq_encode(items, vec_col, cb)
    lut = pq_adc_lut(cb, query)
    dist = pq_adc_distance("pq_code", lut)
    if round_to is not None:
        dist = F.round(dist, round_to)
    cols = select_cols or [id_col]
    if rescore > 0:
        cand = (
            encoded.withColumn("adc", dist)
            .orderBy(F.col("adc").asc(), F.col(id_col).asc())
            .limit(rescore * k)
        )
        from vector_store_spark.functions.distance import distance_expr, vector_lit
        from vector_store_spark.types import SpaceType

        exact = distance_expr(
            SpaceType.EUCLIDEAN, F.col(vec_col).cast("array<double>"), vector_lit(query)
        )
        if round_to is not None:
            exact = F.round(exact, round_to)
        return (
            cand.withColumn("distance", exact)
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


def pq_build_local(
    items: DataFrame,
    part_col: str,
    id_col: str,
    vec_col: str,
    path: str,
    m_sub: int = 8,
    k_codes: int = 16,
) -> dict:
    """Per-partition PQ sub-indexes — the engine-agnostic local tier
    (lib.rs:677-680) at the PQ engine, completing the local matrix next to
    the exact/IVF/LSH sub-index builds.

    Each partition gets its OWN deterministic codebook (subvector slices of
    that partition's k_codes smallest-id rows — reproducible in oracle SQL);
    every row is encoded against its own partition's codebook in one Arrow
    pass (codebooks ride in the closure — metadata-sized: n_partitions ×
    m_sub × k_codes × d_sub). Codes are stored ``partitionBy(part_col)``:
    a query's partition Eq prunes to one directory of m_sub-byte rows.
    Returns {part_value: codebook}."""
    import json
    import os

    import pandas as pd
    from pyspark.sql import Window

    from vector_store_spark.sources.index_store import fresh_dir, write_local_index

    w = Window.partitionBy(part_col).orderBy(id_col)
    cb_rows = (
        items.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k_codes)
        .select(part_col, id_col, vec_col)
        .collect()
    )
    by_part: dict = {}
    for r in sorted(cb_rows, key=lambda r: (r[0], r[1])):
        by_part.setdefault(r[0], []).append(list(map(float, r[2])))
    books = {}
    for pv, vecs in by_part.items():
        mat = np.array(vecs, dtype=np.float64)
        dims = mat.shape[1]
        if dims % m_sub:
            raise ValueError(f"dims {dims} not divisible by m_sub {m_sub}")
        d_sub = dims // m_sub
        books[pv] = mat.reshape(len(vecs), m_sub, d_sub).transpose(1, 0, 2).copy()

    def encode(parts, vecs):
        out = np.empty(len(parts), dtype=object)
        parr = parts.to_numpy()
        for pv in pd.unique(parts):
            cb = books[pv]
            m, _, d_sub = cb.shape
            for i in np.nonzero(parr == pv)[0]:
                x = np.asarray(vecs.iloc[i], dtype=np.float64).reshape(m, 1, d_sub)
                out[i] = ((x - cb) ** 2).sum(axis=2).argmin(axis=1).astype("int32")
        return pd.Series(out)

    udf = F.pandas_udf(encode, ArrayType(IntegerType())).asNondeterministic()
    encoded = items.select(
        part_col, id_col,
        udf(F.col(part_col), F.col(vec_col).cast("array<double>")).alias("pq_code"),
    )
    fresh_dir(path)
    write_local_index(encoded, path, [part_col])
    meta = {
        "m_sub": m_sub, "k_codes": k_codes, "part_col": part_col,
        "books": [[pv, books[pv].tolist()] for pv in books],
    }
    with open(os.path.join(path, "_pq_local_meta.json"), "w") as f:
        json.dump(meta, f)
    return books


def pq_search_local(
    spark,
    path: str,
    part_value,
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    rescore: int = 0,
    select_cols: list | None = None,
    round_to: int | None = None,
    predicate=None,
) -> DataFrame:
    """Query ONE partition's PQ sub-index: the partition Eq prunes to that
    partition's code directory, ADC scores against THAT partition's own
    codebook (driver-side LUT), optional exact rescore back-joins the
    shortlist to the source table. ``predicate`` filters the pruned code
    scan (restricted local search)."""
    import json
    import os

    with open(os.path.join(path, "_pq_local_meta.json")) as f:
        meta = json.load(f)
    cb = None
    for pv, book in meta["books"]:
        if pv == part_value:
            cb = np.asarray(book, dtype=np.float64)
            break
    if cb is None:
        raise KeyError(f"no sub-index for partition {part_value!r}")
    cand = spark.read.parquet(path).where(F.col(meta["part_col"]) == part_value)
    if predicate is not None:
        cand = cand.where(predicate)
    lut = pq_adc_lut(cb, query)
    dist = pq_adc_distance("pq_code", lut)
    if round_to is not None:
        dist = F.round(dist, round_to)
    cols = select_cols or [id_col]
    shortlist = (
        cand.withColumn("distance", dist)
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(rescore * k if rescore > 0 else k)
        .select(id_col, "distance")
    )
    if rescore > 0:
        from vector_store_spark.functions.distance import distance_expr, vector_lit
        from vector_store_spark.types import SpaceType

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
