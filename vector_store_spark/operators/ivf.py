"""IVF (inverted-file) approximate nearest neighbor — the scale path beyond
brute-force top-k (SURVEY.md §2.9: the strategy interface's 'ivf' engine;
reference counterpart: the pluggable VsIndexFactory engines,
crates/vector-store/src/vs_index/factory.rs:1-37).

Structure:
  build:  pick K centroids → assign every vector to its nearest centroid
          (one Arrow-batched GEMM pass, no shuffle) → at scale, write the
          index ``partitionBy("cluster")`` so probes prune parquet partitions.
  search: rank centroids against the query (driver-side, K is metadata-sized),
          take the top ``nprobe`` clusters, exact top-k over only those
          clusters — Catalyst turns the cluster filter into partition pruning.

Two builds share the same assignment/probe/search machinery:
- :func:`ivf_centroids` — deterministic (K smallest ids), so the whole
  algorithm — assignment, probe, ranking — is reproducible in oracle SQL
  (the correctness surface).
- :func:`ivf_centroids_trained` — distributed MLlib KMeans (the 100 TB
  recall-bearing build); combine with ``n_assign=2`` multiple assignment
  for ≥0.9 recall@10 at nprobe ≤ K/2 on weakly-clustered data.

Recall is governed by nprobe/K exactly as in FAISS-style IVF-Flat: the
candidate set is the union of the nprobe nearest clusters, and the final
ranking within candidates is exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.types import SpaceType


def ivf_centroids(items: DataFrame, id_col: str, vec_col: str, k: int) -> list:
    """Deterministic seed centroids: the K rows with smallest id. Returns
    [(cid, vector)] sorted by cid — metadata-sized, safe to hold on the
    driver (the same role as an ANN index's centroid table)."""
    rows = (
        items.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(k)
        .collect()
    )
    return [(r.cid, [float(x) for x in r.cv]) for r in rows]


def ivf_centroids_trained(
    items: DataFrame,
    vec_col: str,
    k: int,
    space: SpaceType = SpaceType.COSINE,
    seed: int = 42,
    max_iter: int = 20,
) -> list:
    """Data-adaptive centroids via MLlib KMeans (distributed — the 100 TB
    training path, matching the reference's data-adaptive index build,
    crates/vector-store/src/vs_index/usearch.rs:74-92). ``space`` selects the
    distanceMeasure (cosine → spherical k-means). Deterministic for a fixed
    seed + input. Returns [(cid, vector)] with cid = 0..k-1, the same shape
    as :func:`ivf_centroids`, so assignment/probe/search are unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if space == SpaceType.COSINE:
        measure = "cosine"
    elif space == SpaceType.EUCLIDEAN:
        measure = "euclidean"
    else:
        raise ValueError(f"trained centroids support cosine/euclidean, not {space}")
    train = items.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    if space == SpaceType.COSINE:
        # MLlib cosine KMeans rejects zero-norm points; drop them (they can
        # never be cosine-nearest anyway — distance.py maps them to d=1).
        from pyspark.ml.functions import vector_to_array

        norm_ok = F.aggregate(
            vector_to_array("features"), F.lit(0.0), lambda a, x: a + x * x
        ) > 0
        train = train.where(norm_ok)
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, distanceMeasure=measure, initMode="k-means||"
    ).fit(train)
    return [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]


def ivf_assign(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    space: SpaceType = SpaceType.COSINE,
    n_assign: int = 1,
) -> DataFrame:
    """items + ``cluster`` column = nearest centroid (argmax cosine or argmin
    L2², per ``space``), ties broken by smallest cid. One numpy GEMM per
    Arrow batch; at scale this is a map-only stage pipelined behind the scan.

    ``n_assign > 1`` is FLANN-style *multiple assignment*: each vector is
    replicated into its ``n_assign`` nearest clusters (one exploded row per
    cluster), trading n× index storage for a large recall gain at the same
    nprobe — the lever that lifts IVF recall on weakly-clustered data.
    Consumers must de-duplicate ids when more than one assigned cluster is
    probed (ivf_topk does)."""
    import numpy as np
    import pandas as pd

    if space not in (SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT):
        raise ValueError(f"ivf_assign: unsupported space {space}")
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    c2 = (cmat * cmat).sum(axis=1)
    na = min(n_assign, len(cids))

    def scores(vecs):
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        if space == SpaceType.COSINE:
            return (v @ cmat.T) / (
                np.linalg.norm(v, axis=1, keepdims=True) * cnorm[None, :]
            )
        if space == SpaceType.DOT_PRODUCT:
            return v @ cmat.T
        # EUCLIDEAN: negated L2² (constant ||v||² dropped) so argmax = nearest
        return 2.0 * (v @ cmat.T) - c2[None, :]

    if na == 1:
        def assign(vecs):
            # argmax returns the first (lowest index) max; centroids are sorted
            # by cid, so ties resolve to the smallest cid — same as the
            # oracle's ORDER BY sim DESC, cid / ORDER BY l2 ASC, cid.
            return pd.Series(cids[np.argmax(scores(vecs), axis=1)])

        assign_udf = F.pandas_udf(assign, LongType()).asNondeterministic()
        return items.withColumn(
            "cluster", assign_udf(F.col(vec_col).cast("array<double>"))
        )

    def assign_multi(vecs):
        s = scores(vecs)
        # stable top-na by (score desc, cid asc): argsort on -score is stable,
        # so equal scores keep cid order
        top = np.argsort(-s, axis=1, kind="stable")[:, :na]
        return pd.Series(list(cids[top]))

    multi_udf = F.pandas_udf(assign_multi, ArrayType(LongType())).asNondeterministic()
    return items.withColumn(
        "cluster",
        F.explode(multi_udf(F.col(vec_col).cast("array<double>"))),
    )


def ivf_probe(
    centroids: list,
    query: list[float],
    nprobe: int,
    space: SpaceType = SpaceType.COSINE,
) -> list[int]:
    """The nprobe cluster ids nearest to the query (cosine: sim DESC, cid ASC;
    euclidean: L2² ASC, cid ASC)."""
    if space not in (SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT):
        raise ValueError(f"ivf_probe: unsupported space {space}")
    qn = math.sqrt(sum(x * x for x in query))

    def score(cv):
        if space == SpaceType.COSINE:
            dot = sum(x * y for x, y in zip(cv, query))
            n = math.sqrt(sum(x * x for x in cv))
            return dot / (n * qn) if n * qn else 0.0
        if space == SpaceType.DOT_PRODUCT:
            return sum(x * y for x, y in zip(cv, query))
        return -sum((x - y) * (x - y) for x, y in zip(cv, query))

    ranked = sorted(((score(cv), -cid) for cid, cv in centroids), reverse=True)
    return [-ncid for _, ncid in ranked[:nprobe]]


def ivf_build(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    k_centroids: int = 16,
    space: SpaceType = SpaceType.COSINE,
    trained: bool = False,
    n_assign: int = 1,
    seed: int = 42,
) -> list:
    """Build-and-persist: assign (optionally trained centroids, optionally
    multiple assignment) and write the index ``partitionBy("cluster")`` — the
    serving layout where a probe becomes Catalyst partition pruning (only the
    nprobe cluster directories are read; the reference's per-partition
    sub-index routing, lib.rs:677-680, at the IVF tier). Centroids + build
    metadata go to a ``_ivf_meta.json`` sidecar (underscore-prefixed files
    are invisible to the parquet reader). Returns the centroids."""
    import json
    import os

    from vector_store_spark.sources.index_store import fresh_dir, write_local_index

    if trained:
        cents = ivf_centroids_trained(items, vec_col, k_centroids, space=space, seed=seed)
    else:
        cents = ivf_centroids(items, id_col, vec_col, k_centroids)
    assigned = ivf_assign(items, id_col, vec_col, cents, space=space, n_assign=n_assign)
    fresh_dir(path)  # full build: stale cluster dirs from a prior build must go
    write_local_index(assigned, path, ["cluster"])
    meta = {
        "space": space.value,
        "n_assign": n_assign,
        "k_centroids": k_centroids,
        "centroids": [[cid, list(map(float, cv))] for cid, cv in cents],
    }
    with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return cents


def ivf_update(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    items_added: DataFrame | None = None,
    ids_removed: list | None = None,
    on_memory_pressure: str = "raise",
) -> dict:
    """Incremental CRUD on a persisted IVF layout (the vs_index add/remove
    surface, usearch.rs — vectors are added to / removed from the committed
    index without a rebuild; centroids stay the trained artifacts from the
    build, exactly as USearch never re-trains on CRUD).

    Added vectors are assigned against the sidecar centroids and appended to
    their cluster directories; removals are anti-joined out. Only TOUCHED
    cluster directories are rewritten (dynamic partition overwrite): the
    clusters of added vectors plus the clusters holding removed ids — found
    with an id-filtered scan (predicate pushdown), never a full-index
    rewrite. An upsert is remove(id) + add(new row). Work is
    O(touched clusters + changed rows), not O(index).

    The maintenance wave runs under the reference's protective trio
    (operators/admission.py): adds are DROPPED under memory pressure (R7,
    usearch.rs:1156-1177 — removals still process), capacity grows in
    reserve increments under an exclusive permit when free space dips under
    the channel size (R6 accounting analogue — parquet needs no
    pre-allocation, the increment/threshold arithmetic and permit ordering
    are what's preserved), and the leaf rewrite itself holds the per-layout
    operation gate in its exclusive Remove mode whenever ids can leave the
    index (R8, usearch.rs:546-555; an upsert removes before it adds).

    Memory pressure (R7): the reference DROPS the add and keeps serving
    because its in-memory index is rebuilt from ScyllaDB on restart; here
    the parquet layout IS the source of truth, so the default
    ``on_memory_pressure="raise"`` raises a catchable
    :class:`~vector_store_spark.operators.admission.AdmissionError` instead
    (callers retry or fail the job); pass ``"drop"`` for the reference's
    literal drop-and-continue semantics. Either way the memory signal is
    sampled DRIVER-side only (host//cgroup of the orchestrating process) —
    it guards the driver-orchestrated wave, not executor heap.

    Returns ``{"added": n, "removed": n, "add_wave_dropped": bool}`` with
    the row counts actually applied."""
    from vector_store_spark.operators.admission import (
        AdmissionError,
        Mode,
        capacity_for,
        default_watcher,
        gate_for,
    )

    status = {"added": 0, "removed": 0, "add_wave_dropped": False}
    if items_added is not None and not default_watcher().check_memory_allocation(
        True, key=path
    ):
        if on_memory_pressure == "raise":
            raise AdmissionError(
                f"ivf_update add wave refused for {path}: driver memory over "
                "admission limit (R7); retry or pass on_memory_pressure='drop'"
            )
        items_added = None  # R7 drop semantics: removals still proceed
        status["add_wave_dropped"] = True
    if items_added is None and not ids_removed:
        return status
    gate = gate_for(path)
    n_added = 0
    if items_added is not None:
        # one count on the cached frame up front: the wave reuses the cache,
        # and capacity accounting no longer recomputes the input afterwards
        items_added = items_added.cache()
        n_added = items_added.count()
        cap = capacity_for(path)
        target = cap.needs_more_capacity()
        if target is not None:
            with gate.permit(Mode.RESERVE):  # exclusive, usearch.rs:905-917
                cap.reserve(target)
    # the whole wave can remove ids (upsert = remove + add): exclusive mode
    wave_permit = gate.permit(Mode.REMOVE)
    try:
        _ivf_update_wave(spark, path, id_col, vec_col, items_added, ids_removed)
        if items_added is not None:
            capacity_for(path).added(n_added)
            status["added"] = n_added
        if ids_removed:
            capacity_for(path).removed(len(ids_removed))
            status["removed"] = len(ids_removed)
    finally:
        wave_permit.release()
        if items_added is not None:
            items_added.unpersist()
    return status


def _ivf_update_wave(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    items_added: DataFrame | None,
    ids_removed: list | None,
) -> None:
    """The leaf rewrite itself (see :func:`ivf_update` for the contract)."""
    import json
    import os

    from vector_store_spark.sources.index_store import write_local_index

    with open(os.path.join(path, "_ivf_meta.json")) as f:
        meta = json.load(f)
    space = SpaceType(meta["space"])
    cents = [(cid, cv) for cid, cv in meta["centroids"]]
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
            added_ids if removed_df is None
            else removed_df.unionByName(added_ids)
        )

    assigned_new = None
    if items_added is not None:
        # consumed twice (touched-cluster collect + the merged write) and the
        # CDC maintenance path feeds a snapshot+LWW plan in — cache the
        # assignment once
        assigned_new = ivf_assign(
            items_added, id_col, vec_col, cents,
            space=space, n_assign=meta["n_assign"],
        ).cache()
    # ONE job resolves the touched-cluster set: clusters holding outgoing ids
    # (id-filtered scan, pushed down) unioned with the new rows' assignments
    touched = set()
    probe = None
    if removed_df is not None:
        probe = index.join(
            F.broadcast(removed_df.distinct()), id_col, "left_semi"
        ).select("cluster")
    if assigned_new is not None:
        new_cl = assigned_new.select("cluster")
        probe = new_cl if probe is None else probe.unionByName(new_cl)
    if probe is not None:
        touched.update(r.cluster for r in probe.distinct().collect())
    if not touched:
        if assigned_new is not None:
            assigned_new.unpersist()
        return

    kept = index.where(F.col("cluster").isin(list(touched)))
    if removed_df is not None:
        kept = kept.join(F.broadcast(removed_df.distinct()), id_col, "left_anti")
    out = kept
    if assigned_new is not None:
        out = kept.unionByName(assigned_new.select(*kept.columns))
    out = out.cache()
    remaining = {r.cluster for r in out.select("cluster").distinct().collect()}
    write_local_index(out, path, ["cluster"])
    out.unpersist()
    if assigned_new is not None:
        assigned_new.unpersist()
    # dynamic overwrite only rewrites partitions PRESENT in the output — a
    # cluster emptied by removals must have its directory dropped explicitly
    # (the W4 partition-lifecycle delete)
    import shutil

    for cid in touched - remaining:
        shutil.rmtree(os.path.join(path, f"cluster={cid}"), ignore_errors=True)


def ivf_build_local(
    items: DataFrame,
    part_col: str,
    id_col: str,
    vec_col: str,
    path: str,
    k_centroids: int = 8,
    space: SpaceType = SpaceType.COSINE,
) -> dict:
    """Per-partition IVF sub-indexes — the reference's one-sub-index-per-
    partition LOCAL layout (lib.rs:677-680; usearch.rs:815-864 builds a
    USearch index per partition) at the IVF tier.

    Deterministic per-partition centroids (the K smallest ids WITHIN each
    partition — reproducible in oracle SQL), assignment of every row against
    its OWN partition's centroids in one Arrow pass (the per-partition
    centroid tables ride along as a closure dict — metadata-sized:
    n_partitions × K × dims), then ``partitionBy(part_col, cluster)``
    storage: a query with a partition Eq prunes to its partition directory
    and the probe prunes further to nprobe cluster subdirectories — both
    visible as PartitionFilters. Returns {part_value: [(cid, vector)]}."""
    import json
    import os

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from vector_store_spark.sources.index_store import fresh_dir, write_local_index

    if space != SpaceType.COSINE:
        raise ValueError("ivf_build_local supports cosine (add spaces as needed)")
    w = Window.partitionBy(part_col).orderBy(id_col)
    cent_rows = (
        items.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k_centroids)
        .select(part_col, F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    by_part: dict = {}
    for r in cent_rows:
        by_part.setdefault(r[0], []).append((r.cid, [float(x) for x in r.cv]))
    tables = {}
    for pv, cents in by_part.items():
        cents.sort()
        cids = np.array([c for c, _ in cents], dtype=np.int64)
        cmat = np.array([v for _, v in cents], dtype=np.float64)
        tables[pv] = (cids, cmat, np.linalg.norm(cmat, axis=1))

    def assign(parts, vecs):
        out = np.empty(len(parts), dtype=np.int64)
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        parr = parts.to_numpy()
        for pv in pd.unique(parts):
            m = parr == pv
            cids, cmat, cnorm = tables[pv]
            s = (v[m] @ cmat.T) / (
                np.linalg.norm(v[m], axis=1, keepdims=True) * cnorm[None, :]
            )
            # first max = smallest cid on ties (cids sorted ascending)
            out[m] = cids[np.argmax(s, axis=1)]
        return pd.Series(out)

    assign_udf = F.pandas_udf(assign, LongType()).asNondeterministic()
    assigned = items.withColumn(
        "cluster", assign_udf(F.col(part_col), F.col(vec_col).cast("array<double>"))
    )
    fresh_dir(path)
    write_local_index(assigned, path, [part_col, "cluster"])
    meta = {
        "space": space.value,
        "part_col": part_col,
        "k_centroids": k_centroids,
        "partitions": [
            [pv, [[cid, list(map(float, cv))] for cid, cv in cents]]
            for pv, cents in by_part.items()
        ],
    }
    with open(os.path.join(path, "_ivf_local_meta.json"), "w") as f:
        json.dump(meta, f)
    return by_part


def ivf_update_local(
    spark,
    path: str,
    part_value,
    id_col: str,
    vec_col: str,
    items_added: DataFrame | None = None,
    ids_removed: list | None = None,
) -> None:
    """Incremental CRUD on ONE partition's sub-index (the local twin of
    :func:`ivf_update`): additions are assigned against THAT partition's own
    centroids from the sidecar, removals anti-joined out, and only the
    touched (partition, cluster) directories are rewritten — other
    partitions' sub-indexes are untouched, exactly the reference's
    per-partition index isolation (usearch.rs:815-864)."""
    import json
    import os
    import shutil

    import numpy as np
    import pandas as pd

    from vector_store_spark.sources.index_store import write_local_index

    with open(os.path.join(path, "_ivf_local_meta.json")) as f:
        meta = json.load(f)
    part_col = meta["part_col"]
    cents = None
    for pv, cs in meta["partitions"]:
        if pv == part_value:
            cents = [(cid, cv) for cid, cv in cs]
            break
    if cents is None:
        raise KeyError(f"no sub-index for partition {part_value!r}")
    space = SpaceType(meta["space"])

    part_rows = spark.read.parquet(path).where(F.col(part_col) == part_value)
    removed_df = None
    if ids_removed:
        id_type = part_rows.schema[id_col].dataType.simpleString()
        removed_df = spark.createDataFrame(
            [(g,) for g in ids_removed], f"{id_col} {id_type}"
        )
    if items_added is not None:
        items_added = items_added.where(F.col(part_col) == part_value)
        added_ids = items_added.select(id_col)
        removed_df = (
            added_ids if removed_df is None else removed_df.unionByName(added_ids)
        )

    assigned_new = None
    if items_added is not None:
        # same two-consumer shape as ivf_update — cache the assignment once
        assigned_new = ivf_assign(
            items_added, id_col, vec_col, cents, space=space).cache()
    # ONE job resolves the touched-cluster set (same fusion as ivf_update)
    touched = set()
    probe = None
    if removed_df is not None:
        probe = part_rows.join(
            F.broadcast(removed_df.distinct()), id_col, "left_semi"
        ).select("cluster")
    if assigned_new is not None:
        new_cl = assigned_new.select("cluster")
        probe = new_cl if probe is None else probe.unionByName(new_cl)
    if probe is not None:
        touched.update(r.cluster for r in probe.distinct().collect())
    if not touched:
        if assigned_new is not None:
            assigned_new.unpersist()
        return

    kept = part_rows.where(F.col("cluster").isin(list(touched)))
    if removed_df is not None:
        kept = kept.join(F.broadcast(removed_df.distinct()), id_col, "left_anti")
    out = kept
    if assigned_new is not None:
        out = kept.unionByName(assigned_new.select(*kept.columns))
    out = out.cache()
    remaining = {r.cluster for r in out.select("cluster").distinct().collect()}
    write_local_index(out, path, [part_col, "cluster"])
    out.unpersist()
    if assigned_new is not None:
        assigned_new.unpersist()
    for cid in touched - remaining:
        shutil.rmtree(
            os.path.join(path, f"{part_col}={part_value}", f"cluster={cid}"),
            ignore_errors=True,
        )


def ivf_search_local(
    spark,
    path: str,
    part_value,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    nprobe: int = 2,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    predicate=None,
    min_candidates: int | None = None,
) -> DataFrame:
    """Query ONE partition's sub-index: probe that partition's own centroids
    (driver-side, metadata-sized), scan only (part, probed clusters)
    directories — the partition Eq AND the cluster probe are both partition
    pruning — then exact re-rank. The local twin of ivf_search; ``predicate``
    adds a residual payload filter (pushed, composing with both pruning
    levels) for restricted local search.

    ``min_candidates`` (with a predicate) arms the adaptive probe over the
    PARTITION's filtered rows — the same count-then-tier contract as
    ivf_search, with the partition Eq composed into both the count scan and
    the exact fallback."""
    import json
    import os

    with open(os.path.join(path, "_ivf_local_meta.json")) as f:
        meta = json.load(f)
    space = SpaceType(meta["space"])
    cents = None
    for pv, cs in meta["partitions"]:
        if pv == part_value:
            cents = [(cid, cv) for cid, cv in cs]
            break
    if cents is None:
        raise KeyError(f"no sub-index for partition {part_value!r}")
    if min_candidates is not None and predicate is not None:
        part_eq = F.col(meta["part_col"]) == part_value
        filtered = spark.read.parquet(path).where(part_eq & predicate)
        np_eff = adaptive_nprobe(
            filtered.count(), len(cents), nprobe, min_candidates, k=k
        )
        if np_eff is None:
            return ann_topk(
                filtered, vec_col, query, k,
                space=space, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        nprobe = np_eff
    probes = ivf_probe(cents, query, nprobe, space=space)
    candidates = spark.read.parquet(path).where(
        (F.col(meta["part_col"]) == part_value) & F.col("cluster").isin(probes)
    )
    if predicate is not None:
        candidates = candidates.where(predicate)
    return ann_topk(
        candidates, vec_col, query, k,
        space=space, tie_break=[id_col],
        select_cols=select_cols or [id_col], round_to=round_to,
    )


def ivf_search(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    nprobe: int = 4,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    predicate=None,
    min_candidates: int | None = None,
) -> DataFrame:
    """Query a persisted IVF index: probe against the sidecar centroids
    (driver-side, metadata-sized), scan ONLY the probed cluster directories
    (partition pruning — assert with sources.index_store.prune_report), exact
    re-rank within candidates.

    ``predicate`` is an optional boolean Column over the stored payload
    columns (the layout persists every item column alongside the vector):
    filtered ANN on the serving index, the reference's restricted search
    (crates/vector-store/src/vs_index/usearch.rs:1108-1154 evaluates
    restrictions inside traversal; here the predicate is a pushed parquet
    filter composed WITH the cluster partition pruning, and the top-k is of
    the filtered candidate set — T2 semantics).

    ``min_candidates`` (with a predicate) arms the adaptive probe: one
    pushed, column-pruned count of the filtered index decides between exact
    ranking over the filtered rows (highly selective predicate) and an
    escalated nprobe (see :func:`adaptive_nprobe`) — the selective filter
    can no longer starve the candidate pool below k."""
    import json
    import os

    with open(os.path.join(path, "_ivf_meta.json")) as f:
        meta = json.load(f)
    space = SpaceType(meta["space"])
    cents = [(cid, cv) for cid, cv in meta["centroids"]]
    if min_candidates is not None and predicate is not None:
        filtered = spark.read.parquet(path).where(predicate)
        if meta["n_assign"] > 1:
            filtered = filtered.dropDuplicates([id_col])
        np_eff = adaptive_nprobe(
            filtered.count(), len(cents), nprobe, min_candidates, k=k
        )
        if np_eff is None:
            return ann_topk(
                filtered, vec_col, query, k,
                space=space, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        nprobe = np_eff
    probes = ivf_probe(cents, query, nprobe, space=space)
    candidates = spark.read.parquet(path).where(F.col("cluster").isin(probes))
    if predicate is not None:
        candidates = candidates.where(predicate)
    if meta["n_assign"] > 1:
        candidates = candidates.dropDuplicates([id_col])
    return ann_topk(
        candidates, vec_col, query, k,
        space=space, tie_break=[id_col],
        select_cols=select_cols or [id_col], round_to=round_to,
    )


def adaptive_floor(min_candidates: int, n_rows: int, k: int | None) -> int:
    """The candidate floor, scaled with the (filtered) set size — VERDICT
    r15 #7: the ABSOLUTE floor alone stops escalating exactly where the
    filtered set is largest, leaving a mid-selectivity recall dip (measured
    at sf0.1: recall@10 = 0.90 at n=1000 with the base probes, ≥0.95 in
    every other bucket — the top-k is still cluster-dispersed at k/n =
    1%). A k·sqrt(n) term keeps escalation alive through the mid range yet
    DECAYS relative to n, so large corpora keep their tuned base probes
    (at n=1000/k=10 it lifts nprobe 8→11 of 16; by n=4000 the base wins):

        floor = max(min_candidates, ceil(2 · k · sqrt(n)))

    ``k=None`` preserves the pure absolute floor."""
    if k is None:
        return min_candidates
    import math

    return max(min_candidates, math.ceil(2.0 * k * math.sqrt(n_rows)))


def adaptive_nprobe(
    n_rows: int, k_centroids: int, nprobe: int, min_candidates: int,
    k: int | None = None,
) -> int | None:
    """Escalate ``nprobe`` so the expected candidate pool stays above the
    candidate floor when the (filtered) row set is small — the guarantee
    the reference's graph search gives for free (top-k OF the filtered set,
    usearch.rs:224-248): a selective predicate must not silently starve the
    probe. Returns None when the set is so small the caller should skip IVF
    and rank exactly (the filtered count is already known from the pruned
    scan, so exact costs one candidate-sized pass).

    Driver-side arithmetic only: expected pool ≈ n_rows · nprobe/k_centroids
    under the uniform-cluster approximation, so the escalated value is
    ceil(floor · k_centroids / n_rows), clamped to [nprobe, k_centroids].
    ``k`` (the query limit) arms the selectivity-scaled floor — see
    :func:`adaptive_floor`."""
    floor = adaptive_floor(min_candidates, n_rows, k)
    if n_rows <= floor:
        return None
    import math

    return min(
        k_centroids, max(nprobe, math.ceil(floor * k_centroids / n_rows))
    )


def ivf_topk(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    k_centroids: int = 16,
    nprobe: int = 4,
    space: SpaceType = SpaceType.COSINE,
    select_cols: list[str] | None = None,
    round_to: int | None = None,
    centroids: list | None = None,
    n_assign: int = 1,
    min_candidates: int | None = None,
) -> DataFrame:
    """Build-and-search in one call (batch-engine shape: the 'index' is the
    assigned DataFrame; a persisted deployment would write it partitioned by
    cluster and reuse it across queries). Assignment, probing and final
    ranking all run in ``space``. ``centroids`` overrides the deterministic
    smallest-id build — pass :func:`ivf_centroids_trained` output for the
    data-adaptive (recall-bearing) index; ``n_assign > 1`` adds multiple
    assignment (see :func:`ivf_assign`).

    ``min_candidates`` arms the adaptive probe (see :func:`adaptive_nprobe`):
    one count of ``items`` (the filtered set — callers restrict BEFORE
    calling, T2 semantics), then exact ranking if the set is tiny, else an
    escalated nprobe. Default off: fixed-probe behavior is unchanged."""
    if min_candidates is not None:
        n_rows = items.count()
        kc = len(centroids) if centroids is not None else k_centroids
        np_eff = adaptive_nprobe(n_rows, kc, nprobe, min_candidates, k=k)
        if np_eff is None:
            return ann_topk(
                items, vec_col, query, k,
                space=space, tie_break=[id_col],
                select_cols=select_cols or [id_col], round_to=round_to,
            )
        nprobe = np_eff
    cents = centroids if centroids is not None else ivf_centroids(
        items, id_col, vec_col, k_centroids
    )
    assigned = ivf_assign(items, id_col, vec_col, cents, space=space, n_assign=n_assign)
    probes = ivf_probe(cents, query, nprobe, space=space)
    candidates = assigned.where(F.col("cluster").isin(probes))
    if n_assign > 1:
        # a vector replicated into two probed clusters must score once
        candidates = candidates.dropDuplicates([id_col])
    return ann_topk(
        candidates, vec_col, query, k,
        space=space, tie_break=[id_col],
        select_cols=select_cols or [id_col], round_to=round_to,
    )


def ivf_knn_join(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list,
    k: int,
    k_centroids: int = 16,
    nprobe: int = 4,
    space: SpaceType = SpaceType.COSINE,
    centroids: list | None = None,
    n_assign: int = 1,
    query_id_col: str = "query_id",
    dist_col: str = "distance",
    round_to: int | None = None,
) -> DataFrame:
    """Batch kNN through IVF pruning: one scan answers every query, but each
    query only scores rows in its own nprobe clusters. The scan is filtered
    to the UNION of all probed clusters (partition pruning on a persisted
    index); inside each Arrow batch one GEMM scores all queries and a
    per-query cluster mask (+inf) hides rows outside that query's probe set.
    Emits ≤ n_queries·k rows per batch into the global per-query top-k window
    — the pruned version of operators.topk.knn_join, and the batch shape a
    1000-executor scan engine actually runs."""
    import numpy as np
    import pandas as pd

    if space not in (SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT):
        raise ValueError(f"ivf_knn_join: unsupported space {space}")
    cents = centroids if centroids is not None else ivf_centroids(
        items, id_col, vec_col, k_centroids
    )
    qids = [q[0] for q in queries]
    qmat = [list(map(float, q[1])) for q in queries]
    probes = {qid: set(ivf_probe(cents, qv, nprobe, space=space))
              for qid, qv in zip(qids, qmat)}
    union_clusters = sorted(set().union(*probes.values()))

    assigned = ivf_assign(items, id_col, vec_col, cents, space=space, n_assign=n_assign)
    cand = assigned.where(F.col("cluster").isin(union_clusters))
    if n_assign > 1:
        cand = cand.dropDuplicates([id_col])
    src = cand.select(id_col, "cluster", vec_col)
    id_t = src.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} string, {id_col} {id_t}, {dist_col} double"

    def score(batches):
        Q = np.asarray(qmat, dtype=np.float64)
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0.0] = 1.0
        # (n_queries, n_clusters_union) membership mask
        cl_index = {c: i for i, c in enumerate(union_clusters)}
        allow = np.zeros((len(qids), len(union_clusters)), dtype=bool)
        for j, qid in enumerate(qids):
            for c in probes[qid]:
                allow[j, cl_index[c]] = True
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cl = np.asarray([cl_index[c] for c in pdf["cluster"]])
            dots = X @ Q.T
            if space == SpaceType.COSINE:
                xn = np.linalg.norm(X, axis=1)
                xn[xn == 0.0] = 1.0
                dist = 1.0 - dots / np.outer(xn, qn)
            elif space == SpaceType.DOT_PRODUCT:
                dist = 1.0 - dots
            else:
                x2 = (X * X).sum(axis=1)
                q2 = (Q * Q).sum(axis=1)
                dist = x2[:, None] + q2[None, :] - 2.0 * dots
            # mask rows outside each query's probe set
            dist = np.where(allow[:, cl].T, dist, np.inf)
            frames = []
            for j, qid in enumerate(qids):
                dj = dist[:, j]
                ok = np.nonzero(np.isfinite(dj))[0]
                if not len(ok):
                    continue
                kk = min(k, len(ok))
                top = ok[np.argpartition(dj[ok], kk - 1)[:kk]] if kk < len(ok) else ok
                f = pdf.iloc[top][[id_col]].copy()
                f.insert(0, query_id_col, str(qid))
                f[dist_col] = dj[top]
                frames.append(f)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partial = src.mapInPandas(score, schema=out_schema)
    if round_to is not None:
        partial = partial.withColumn(dist_col, F.round(dist_col, round_to))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col(dist_col).asc(), F.col(id_col).asc()
    )
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_assign_expr(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    space: SpaceType = SpaceType.COSINE,
) -> DataFrame:
    """Column-expression twin of :func:`ivf_assign` (single assignment): the
    executable spec, computing the identical argmax with Catalyst
    higher-order functions (sequential-sum dot products — the bit-order the
    oracle SQL uses). Interpreted (~µs/element), so the Arrow GEMM path is
    the hot path; this one exists for cross-validation and for environments
    without Python workers."""
    if space not in (SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT):
        raise ValueError(f"ivf_assign_expr: unsupported space {space}")
    from vector_store_spark.functions.distance import dot_product, vector_lit, vector_norm

    v = F.col(vec_col).cast("array<double>")
    scored = []
    for cid, cv in centroids:
        lit = vector_lit([float(x) for x in cv])
        if space == SpaceType.COSINE:
            s = dot_product(v, lit) / (vector_norm(v) * vector_norm(lit))
        elif space == SpaceType.DOT_PRODUCT:
            s = dot_product(v, lit)
        else:
            s = 2.0 * dot_product(v, lit) - F.lit(
                float(sum(x * x for x in cv))
            )
        # greatest() keeps the FIRST maximal struct; encode -cid so ties
        # resolve to the smallest cid, matching the numpy argmax twin
        scored.append(F.struct(s.alias("s"), F.lit(-int(cid)).alias("nc")))
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return items.withColumn("cluster", (-best["nc"]).cast("long"))
