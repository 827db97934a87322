"""Sign-LSH (random hyperplane) approximate nearest neighbor — the third
engine behind the strategy interface (SURVEY.md §2.9: exact / lsh / ivf,
mirroring the reference's pluggable VsIndexFactory).

Random-hyperplane LSH for cosine similarity (Charikar 2002): each of H
hyperplanes contributes one sign bit; P(bit_a == bit_b) = 1 − θ(a,b)/π.
Bits are grouped into B bands of R bits; vectors sharing any band bucket are
candidates; candidates are re-ranked exactly.

Hyperplanes here are deterministic (the same integer-arithmetic generator the
query vectors use) so bucketing is reproducible in oracle SQL. Bucketing is
one map-only pass (no shuffle); the search is a bucket equi-join —
`partitionBy(band, bucket)` storage turns probes into partition pruning at
scale, exactly like the text-side MinHash LSH.

vs IVF: LSH needs no training pass (no centroid scan) and handles inserts
append-only; IVF gives tighter candidate sets on clustered data. Both share
the exact re-rank stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.types import SpaceType


def lsh_hyperplanes(dims: int, num_bits: int, seed: int = 97) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via exact integer arithmetic —
    embeddable verbatim in both Spark code and oracle SQL.

    CAVEAT (measured, r16): the mod-97 lattice makes every plane a cyclic
    shift of one base vector, so sign bits across planes are correlated and
    empirical band recall falls short of the independent-planes S-curve as
    band width grows (r=8/h=3 at 24k vectors: 0.95-0.97 observed vs 0.9999
    analytic). Kept verbatim for the entries whose oracles pin it; new
    recall-sensitive paths use :func:`lsh_hyperplanes_mixed`."""
    return [
        [((((seed + h) * 31 + i * 37) % 97) - 48) / 48.0 for i in range(dims)]
        for h in range(num_bits)
    ]


def lsh_hyperplanes_mixed(dims: int, num_bits: int) -> list[list[float]]:
    """Well-mixed deterministic hyperplanes: a two-round multiply-xor-shift
    integer hash per (plane, coordinate) — closed-form, so oracle SQL
    re-derives identical values with BIGINT ops (*, %, xor, >>) and one
    exact final division (x < 2^32 < 2^53). Unlike the mod-97 lattice of
    :func:`lsh_hyperplanes`, coordinates are decorrelated across planes and
    the empirical band S-curve tracks the independent-planes analytic model
    (r=8/h=3 at 24k vectors: 1.00 measured vs 0.95-0.97 for the lattice).
    All intermediates stay below 2^63 (k < 2^27 ⇒ k·2654435761 < 2^59;
    x < 2^32 ⇒ x·1597334677 < 2^63), so int64 engines agree exactly."""
    out = []
    for h in range(num_bits):
        row = []
        for i in range(dims):
            k = h * 1000003 + i
            x = (k * 2654435761) % 4294967296
            x = x ^ (x >> 16)
            x = (x * 1597334677) % 4294967296
            x = x ^ (x >> 13)
            row.append((x / 4294967296.0) * 2.0 - 1.0)
        out.append(row)
    return out


def sign_bits_expr(vec: Column, planes: list[list[float]]) -> list[Column]:
    """One sign bit per hyperplane: 1 iff <v, p> > 0. Dot products are
    sequential-sum Column expressions (bit-parity with the oracle)."""
    bits = []
    for p in planes:
        dot = F.aggregate(
            F.zip_with(
                vec, F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bits.append(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def lsh_bucket_cols(vec: Column, planes: list[list[float]], bands: int) -> list[Column]:
    """Band bucket keys: R sign bits folded into one integer per band."""
    num_bits = len(planes)
    if num_bits % bands:
        raise ValueError("bands must divide num_bits")
    r = num_bits // bands
    bits = sign_bits_expr(vec, planes)
    out = []
    for b in range(bands):
        acc = F.lit(0)
        for j in range(r):
            acc = acc * 2 + bits[b * r + j]
        out.append(acc.alias(f"bucket_{b}"))
    return out


def with_lsh_buckets(df, vec_col: str, planes: list[list[float]], bands: int):
    """Arrow twin of ``lsh_bucket_cols``: ONE numpy GEMM per batch computes
    every plane's dot product at once (vs num_bits interpreted higher-order
    aggregates per row — CodegenFallback, ~µs/element), then folds sign bits
    into band buckets. Same integers on this data as the expression path
    (cross-validated in tests); the scale path for corpus-wide bucketing
    (near-dup candidate generation), where the per-row expression cost
    dominates the whole job.

    Returns ``df`` plus ``bucket_0..bucket_{bands-1}`` int columns. The UDF
    lands in its own projection (nondeterministic blocks CollapseProject),
    so the GEMM runs once per row no matter how many bucket columns the
    caller consumes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, IntegerType

    num_bits = len(planes)
    if num_bits % bands:
        raise ValueError("bands must divide num_bits")
    r = num_bits // bands
    pmat = np.asarray(planes, dtype=np.float64).T  # (dims, num_bits)
    weights = 1 << np.arange(r - 1, -1, -1, dtype=np.int64)

    def batch(vecs):
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = (m @ pmat > 0).astype(np.int64)             # (n, num_bits)
        folded = bits.reshape(len(m), bands, r) @ weights  # (n, bands)
        return pd.Series(list(folded.astype(np.int32)))

    udf = F.pandas_udf(batch, ArrayType(IntegerType())).asNondeterministic()
    out = df.withColumn("_lsh_bk", udf(F.col(vec_col)))
    out = out.select(
        "*", *[F.element_at("_lsh_bk", b + 1).alias(f"bucket_{b}")
               for b in range(bands)]
    )
    return out.drop("_lsh_bk")


def _banded(items: DataFrame, vec_col: str, planes: list[list[float]], bands: int) -> DataFrame:
    """items × bands rows with (band, bucket) columns — the persisted-layout
    shape — computed on the Arrow GEMM path (:func:`with_lsh_buckets`, one
    numpy matvec per batch) instead of per-row interpreted aggregates.  Same
    integers as :func:`lsh_bucket_cols` (cross-validated in tests)."""
    keep = items.columns
    bucketed = with_lsh_buckets(items, vec_col, planes, bands)
    return bucketed.select(
        *keep,
        F.posexplode(
            F.array(*[F.col(f"bucket_{b}") for b in range(bands)])
        ).alias("band", "bucket"),
    )


def lsh_query_buckets(query: list[float], planes: list[list[float]], bands: int) -> list[int]:
    """Driver-side band buckets for a query vector (exact integer/float twin
    of the Column expressions — metadata-sized work)."""
    r = len(planes) // bands
    bits = [1 if sum(x * y for x, y in zip(query, p)) > 0 else 0 for p in planes]
    return [
        int("".join(map(str, bits[b * r : (b + 1) * r])), 2) for b in range(bands)
    ]


def lsh_multiprobe_buckets(
    query: list[float], planes: list[list[float]], bands: int, t: int
) -> list[list[int]]:
    """Query-aware multiprobe (Lv et al., VLDB'07): per band, the primary
    bucket plus the ``t`` cheapest perturbation SETS — bit subsets ranked by
    the total hyperplane margin Σ|<q, p>| of the flipped bits, so the probes
    most likely to hold true near neighbors come first (a pair of
    razor-thin margins can rank above one wide single flip, per the paper).
    Recovers recall lost to unlucky bucket boundaries (the known LSH
    failure under selective filters) WITHOUT rebuilding or adding hash
    tables: probes stay driver-side literals, the candidate scan just
    matches ≤ 1+t buckets per band; t ranges up to 2^r − 1 (full band
    enumeration). Returns one bucket list per band, primary first.

    The t cheapest perturbation sets are generated with the paper's
    best-first heap expansion (shift/expand successors over margin-sorted
    bits), NOT a full 2^r enumeration — O(t·r log t) per band, so wide
    bands (r=32 → ~4B subsets) stay cheap, and t<=0 skips the walk
    entirely (the default lsh_topk/lsh_search path)."""
    r = len(planes) // bands
    dots = [sum(x * y for x, y in zip(query, p)) for p in planes]
    bits = [1 if d > 0 else 0 for d in dots]
    out = []
    for b in range(bands):
        seg = bits[b * r : (b + 1) * r]
        primary = int("".join(map(str, seg)), 2)
        probes = [primary]
        if t > 0:
            for flips in _cheapest_flip_sets(
                [abs(dots[b * r + i]) for i in range(r)], t
            ):
                mask = 0
                for i in flips:
                    mask |= 1 << (r - 1 - i)  # bit i is MSB-first
                probes.append(primary ^ mask)
        out.append(probes)
    return out


def _cheapest_flip_sets(costs: list[float], t: int) -> list[tuple[int, ...]]:
    """The ``t`` non-empty subsets of ``range(len(costs))`` with the smallest
    total cost, in (sum, len, subset) order — Lv et al.'s shift/expand
    successor walk over cost-sorted positions, each subset generated once
    from a parent of no greater sum, so a heap pop sequence is globally
    sum-ordered without materializing the 2^r lattice."""
    import heapq

    r = len(costs)
    if r == 0 or t <= 0:
        return []
    order = sorted(range(r), key=lambda i: (costs[i], i))
    csorted = [costs[i] for i in order]

    def key(state: tuple[int, ...]):
        orig = tuple(sorted(order[p] for p in state))
        return (sum(csorted[p] for p in state), len(state), orig), orig

    heap = []
    k0, o0 = key((0,))
    heapq.heappush(heap, (k0, (0,), o0))
    picked: list[tuple[int, ...]] = []
    while heap and len(picked) < t:
        _, state, orig = heapq.heappop(heap)
        picked.append(orig)
        m = state[-1]
        if m + 1 < r:
            for nxt in (state[:-1] + (m + 1,), state + (m + 1,)):  # shift, expand
                kn, on = key(nxt)
                heapq.heappush(heap, (kn, nxt, on))
    return picked


def lsh_build(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    num_bits: int = 16,
    bands: int = 4,
    seed: int = 97,
) -> None:
    """Build-and-persist the LSH serving layout: every vector is written once
    per band under ``partitionBy(band, bucket)`` (bands× storage — the classic
    LSH trade for O(1) probes), so a query probe becomes Catalyst partition
    pruning down to ≤ bands directories instead of a full-scan bucket
    recompute. Symmetric with ivf_build's cluster layout; hyperplane metadata
    goes to a ``_lsh_meta.json`` sidecar."""
    import json
    import os

    from vector_store_spark.sources.index_store import fresh_dir, write_local_index

    dims = items.select(
        F.size(F.col(vec_col).cast("array<double>")).alias("d")
    ).first().d
    planes = lsh_hyperplanes(dims, num_bits, seed)
    # Arrow GEMM banding (same integers as the lsh_bucket_cols expression
    # path, cross-validated in tests): the build scans the whole corpus, so
    # the per-row interpreted-aggregate cost dominated the write
    banded = _banded(items, vec_col, planes, bands)
    fresh_dir(path)  # full build: stale band/bucket dirs from a prior build must go
    write_local_index(banded, path, ["band", "bucket"])
    with open(os.path.join(path, "_lsh_meta.json"), "w") as f:
        json.dump({"dims": dims, "num_bits": num_bits, "bands": bands, "seed": seed}, f)


def lsh_update(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    items_added: DataFrame | None = None,
    ids_removed: list | None = None,
) -> None:
    """Incremental CRUD on a persisted LSH layout (the vs_index add/remove
    surface at the LSH engine — the layout LSH is chosen for: no centroids
    to retrain, adds are append-shaped).

    Added vectors are banded against the sidecar hyperplanes and land in
    their (band, bucket) leaves; removals are anti-joined out. Only TOUCHED
    leaves are rewritten (dynamic partition overwrite): the bands×buckets of
    added rows plus the leaves holding removed ids (found with an
    id-filtered scan — predicate pushdown, never a full rewrite). An upsert
    is remove(id) + add(new row); emptied leaves are deleted explicitly (W4
    partition lifecycle). Work is O(touched leaves + changed rows)."""
    import json
    import os
    import shutil

    from vector_store_spark.sources.index_store import write_local_index

    with open(os.path.join(path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    planes = lsh_hyperplanes(meta["dims"], meta["num_bits"], meta["seed"])
    bands = meta["bands"]
    span = 1 << (meta["num_bits"] // bands)  # bucket value range per band
    index = spark.read.parquet(path)

    removed_df = None
    if ids_removed:
        id_type = index.schema[id_col].dataType.simpleString()
        removed_df = spark.createDataFrame(
            [(g,) for g in ids_removed], f"{id_col} {id_type}"
        )
    if items_added is not None:
        added_ids = items_added.select(id_col)
        removed_df = (
            added_ids if removed_df is None else removed_df.unionByName(added_ids)
        )

    leaf_key = F.col("band") * span + F.col("bucket")
    banded_new = None
    if items_added is not None:
        # cache: consumed by the touched-leaf collect AND the merged write.
        # Banding runs on the Arrow GEMM path (one numpy matvec per batch)
        # instead of num_bits interpreted higher-order aggregates per row —
        # same integers (cross-validated in tests), ~100× cheaper per row
        banded_new = _banded(items_added, vec_col, planes, bands).cache()
    # ONE job resolves the touched-leaf set: leaves holding outgoing ids
    # (id-filtered scan, pushed down) unioned with the new rows' leaves
    touched: set[int] = set()
    probe = None
    if removed_df is not None:
        probe = index.join(
            F.broadcast(removed_df.distinct()), id_col, "left_semi"
        ).select(leaf_key.alias("_leaf"))
    if banded_new is not None:
        new_leaves = banded_new.select(leaf_key.alias("_leaf"))
        probe = new_leaves if probe is None else probe.unionByName(new_leaves)
    if probe is not None:
        touched.update(r._leaf for r in probe.distinct().collect())
    if not touched:
        if banded_new is not None:
            banded_new.unpersist()
        return

    kept = index.where(leaf_key.isin(list(touched)))
    if removed_df is not None:
        kept = kept.join(F.broadcast(removed_df.distinct()), id_col, "left_anti")
    out = kept
    if banded_new is not None:
        out = kept.unionByName(banded_new.select(*kept.columns))
    out = out.cache()
    remaining = {
        r._leaf for r in out.select(leaf_key.alias("_leaf")).distinct().collect()
    }
    write_local_index(out, path, ["band", "bucket"])
    out.unpersist()
    if banded_new is not None:
        banded_new.unpersist()
    for leaf in touched - remaining:
        shutil.rmtree(
            os.path.join(path, f"band={leaf // span}", f"bucket={leaf % span}"),
            ignore_errors=True,
        )


def lsh_search(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    predicate=None,
    multiprobe: int = 0,
    min_candidates: int | None = None,
) -> DataFrame:
    """Query a persisted LSH index: compute the query's band buckets
    driver-side (metadata-sized), scan ONLY the matching (band, bucket)
    directories (partition pruning — assert with
    sources.index_store.prune_report), dedupe candidates that share several
    bands, exact cosine re-rank. Same candidate semantics as lsh_topk.

    ``predicate`` is an optional boolean Column over the stored payload
    columns — filtered ANN on the serving index (usearch.rs:1108-1154
    restricted traversal): a pushed parquet filter composed with the
    band/bucket partition pruning; the top-k is of the filtered candidate
    set (T2). ``multiprobe`` adds t perturbed buckets per band
    (lsh_multiprobe_buckets) — the recall knob for selective filters,
    still pure partition pruning (≤ bands·(1+t) directories).

    ``min_candidates`` (with a predicate) arms the adaptive probe — the
    same count-then-tier contract as ivf.ivf_search: one pushed,
    column-pruned count of the filtered index (band 0 only, so each item
    counts once) decides between exact ranking over the filtered rows
    (highly selective predicate — the reference's restricted-search
    guarantee, top-k OF the filtered set) and an escalated multiprobe
    width (see :func:`adaptive_multiprobe`)."""
    import json
    import os

    with open(os.path.join(path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    planes = lsh_hyperplanes(meta["dims"], meta["num_bits"], meta["seed"])
    if min_candidates is not None and predicate is not None:
        # every item is stored once per band: band 0 alone is one full copy,
        # so the count scan prunes to 1/bands of the layout and needs no
        # distinct
        n_filtered = (
            spark.read.parquet(path)
            .where((F.col("band") == 0) & predicate)
            .count()
        )
        mp_eff = adaptive_multiprobe(
            n_filtered, meta["num_bits"], meta["bands"], multiprobe,
            min_candidates, k=k,
        )
        if mp_eff is None:
            filtered = spark.read.parquet(path).where(
                (F.col("band") == 0) & predicate
            )
            return ann_topk(
                filtered, vec_col, query, k,
                space=SpaceType.COSINE, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        multiprobe = mp_eff
    qbl = lsh_multiprobe_buckets(query, planes, meta["bands"], multiprobe)
    cond = None
    for b, qvs in enumerate(qbl):
        c = (F.col("band") == b) & F.col("bucket").isin(qvs)
        cond = c if cond is None else (cond | c)
    scan = spark.read.parquet(path).where(cond)
    if predicate is not None:
        scan = scan.where(predicate)
    candidates = scan.dropDuplicates([id_col])
    return ann_topk(
        candidates, vec_col, query, k,
        space=SpaceType.COSINE, tie_break=[id_col],
        select_cols=select_cols or [id_col], round_to=round_to,
    )


def lsh_build_local(
    items: DataFrame,
    part_col: str,
    id_col: str,
    vec_col: str,
    path: str,
    num_bits: int = 16,
    bands: int = 4,
    seed: int = 97,
) -> None:
    """Per-partition LSH sub-indexes — the reference's engine-agnostic
    one-sub-index-per-partition LOCAL tier (lib.rs:677-680) at the LSH
    engine, completing the local matrix next to ivf_build_local.

    Hyperplanes are the deterministic global family (LSH needs no training
    pass, so per-partition isolation is purely storage). Layout:
    ``partitionBy(part_col, band)`` directories with rows **sorted by
    bucket within each file** — the partition Eq and the band probe are
    directory pruning (PartitionFilters), while the bucket probe is a
    pushed parquet filter answered by row-group min/max stats on the
    bucket-sorted files. A third directory level (bucket) would multiply
    the leaf count by 2^R (P x B x 2^R tiny dirs: 16x more directories
    and a ~10x slower build commit at equal bytes, measured) without
    changing bytes read — row-group skipping prunes the same data.
    Inserts stay append-only per partition (the LSH trade: no centroids
    to retrain, new rows land in their (part, band) leaves)."""
    import json
    import os

    from vector_store_spark.sources.index_store import fresh_dir

    dims = items.select(
        F.size(F.col(vec_col).cast("array<double>")).alias("d")
    ).first().d
    planes = lsh_hyperplanes(dims, num_bits, seed)
    # Arrow GEMM banding — same integers as the expression path (see lsh_build)
    banded = _banded(items, vec_col, planes, bands)
    fresh_dir(path)
    (
        banded.repartition(F.col(part_col), F.col("band"))
        .sortWithinPartitions("bucket")
        .write.partitionBy(part_col, "band")
        .mode("overwrite")
        .parquet(path)
    )
    meta = {
        "dims": dims, "num_bits": num_bits, "bands": bands, "seed": seed,
        "part_col": part_col,
    }
    with open(os.path.join(path, "_lsh_local_meta.json"), "w") as f:
        json.dump(meta, f)


def lsh_search_local(
    spark,
    path: str,
    part_value,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    predicate=None,
    multiprobe: int = 0,
    min_candidates: int | None = None,
) -> DataFrame:
    """Query ONE partition's LSH sub-index: the partition Eq and the band
    probe prune directories (PartitionFilters), the bucket probe is a
    pushed filter answered by row-group stats on the bucket-sorted files,
    then cross-band dedupe and exact cosine re-rank. ``predicate`` adds a
    pushed residual payload filter (restricted local search, T2);
    ``multiprobe`` widens the bucket probe per band.

    ``min_candidates`` (with a predicate) arms the adaptive probe over the
    PARTITION's filtered rows — count-then-tier as in lsh_search, with the
    partition Eq composed into both the count scan and the exact fallback."""
    import json
    import os

    with open(os.path.join(path, "_lsh_local_meta.json")) as f:
        meta = json.load(f)
    planes = lsh_hyperplanes(meta["dims"], meta["num_bits"], meta["seed"])
    if min_candidates is not None and predicate is not None:
        part_eq = F.col(meta["part_col"]) == part_value
        n_filtered = (
            spark.read.parquet(path)
            .where(part_eq & (F.col("band") == 0) & predicate)
            .count()
        )
        mp_eff = adaptive_multiprobe(
            n_filtered, meta["num_bits"], meta["bands"], multiprobe,
            min_candidates, k=k,
        )
        if mp_eff is None:
            filtered = spark.read.parquet(path).where(
                part_eq & (F.col("band") == 0) & predicate
            )
            return ann_topk(
                filtered, vec_col, query, k,
                space=SpaceType.COSINE, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        multiprobe = mp_eff
    qbl = lsh_multiprobe_buckets(query, planes, meta["bands"], multiprobe)
    cond = None
    for b, qvs in enumerate(qbl):
        c = (F.col("band") == b) & F.col("bucket").isin(qvs)
        cond = c if cond is None else (cond | c)
    scan = spark.read.parquet(path).where(
        (F.col(meta["part_col"]) == part_value) & cond
    )
    if predicate is not None:
        scan = scan.where(predicate)
    candidates = scan.dropDuplicates([id_col])
    return ann_topk(
        candidates, vec_col, query, k,
        space=SpaceType.COSINE, tie_break=[id_col],
        select_cols=select_cols or [id_col], round_to=round_to,
    )


def adaptive_multiprobe(
    n_rows: int, num_bits: int, bands: int, multiprobe: int, min_candidates: int,
    k: int | None = None,
) -> int | None:
    """Pick the multiprobe width that keeps the expected candidate pool
    above the candidate floor on a filtered set of ``n_rows`` — the LSH
    analogue of :func:`~vector_store_spark.operators.ivf.adaptive_nprobe`.
    Returns None when the set is at/under the floor (rank exactly instead).

    Driver arithmetic under the uniform-bucket approximation: a query probes
    (1+t) buckets in each of ``bands`` bands of width r = num_bits/bands, so
    expected pool ≈ n·bands·(1+t)/2^r; solve for t and clamp to
    [multiprobe, 2^r − 1] (the full band enumeration). ``k`` (the query
    limit) arms the selectivity-scaled floor — see
    :func:`~vector_store_spark.operators.ivf.adaptive_floor`."""
    from vector_store_spark.operators.ivf import adaptive_floor

    floor = adaptive_floor(min_candidates, n_rows, k)
    if n_rows <= floor:
        return None
    import math

    r = num_bits // bands
    t = math.ceil(floor * (1 << r) / (n_rows * bands)) - 1
    return min((1 << r) - 1, max(multiprobe, t))


def lsh_topk(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    num_bits: int = 16,
    bands: int = 4,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    multiprobe: int = 0,
    min_candidates: int | None = None,
) -> DataFrame:
    """Candidates = rows sharing ≥1 band bucket with the query (computed
    driver-side — the query's buckets are literals, so the candidate filter is
    an OR of equality predicates that prunes partitions/row-groups), then
    exact cosine top-k over candidates only. ``multiprobe`` widens each
    band's probe to 1+t buckets (smallest-margin bit flips).

    ``min_candidates`` is the adaptive guard of the filtered-search path
    (same contract as ivf_topk's): ``items`` is the already-filtered set
    (T2 semantics); one count decides the tier — exact ranking at or under
    the floor, a WIDENED multiprobe in the band just above it (see
    :func:`adaptive_multiprobe` — the LSH analogue of nprobe escalation, so
    recall does not cliff at n = min_candidates + 1), untouched probing on
    large sets."""
    if min_candidates is not None:
        mp_eff = adaptive_multiprobe(
            items.count(), num_bits, bands, multiprobe, min_candidates, k=k
        )
        if mp_eff is None:
            return ann_topk(
                items, vec_col, query, k,
                space=SpaceType.COSINE, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        multiprobe = mp_eff
    planes = lsh_hyperplanes(len(query), num_bits)
    qbl = lsh_multiprobe_buckets(query, planes, bands, multiprobe)
    # Arrow GEMM banding — same integers as the expression path (see lsh_build)
    bucketed = with_lsh_buckets(items, vec_col, planes, bands)
    cond = None
    for b, qvs in enumerate(qbl):
        c = F.col(f"bucket_{b}").isin(qvs)
        cond = c if cond is None else (cond | c)
    candidates = bucketed.where(cond).drop(*[f"bucket_{b}" for b in range(bands)])
    return ann_topk(
        candidates, vec_col, query, k,
        space=SpaceType.COSINE, tie_break=[id_col],
        select_cols=select_cols or [id_col], round_to=round_to,
    )
