"""Graph-ANN (HNSW) engine: build determinism, exhaustive-search exactness,
beam-width recall, filter-inside-traversal, CRUD, and engine integration.

Mirrors the reference's USearch coverage (crates/vector-store/src/vs_index/
usearch.rs tests + crates/validator search/filtering): ann returns nearest,
restricted ann returns top-k OF the filtered set, add/remove take effect.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.hnsw import (
    _build_graph,
    _levels_of,
    hnsw_build,
    hnsw_delete,
    hnsw_insert,
    hnsw_search,
    hnsw_upsert,
)
from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.registry import ROUND, det_query_vector
from vector_store_spark.types import IndexMetadata, SpaceType

N, DIMS = 400, 16
Q = det_query_vector(3, DIMS)


def _vec(i):
    return [(((i * 13 + j * 7) % 41) - 20) / 20.0 for j in range(DIMS)]


@pytest.fixture(scope="module")
def items(spark):
    rows = [(i, _vec(i), i % 5) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


@pytest.fixture(scope="module")
def built(spark, items, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hnsw") / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    return path


def _exact(items, q, k, pred=None):
    df = items if pred is None else items.where(pred)
    return [
        (r.vec_id, r.distance)
        for r in ann_topk(df, "embedding", q, k, tie_break=["vec_id"],
                          select_cols=["vec_id"], round_to=ROUND).collect()
    ]


def test_levels_follow_geometric_law():
    ids = np.arange(100_000, dtype=np.int64)
    lv = _levels_of(ids, m=8)
    # fraction at level >= 1 is ~1/m under the geometric law
    frac = (lv >= 1).mean()
    assert 0.08 < frac < 0.18
    assert lv.max() <= 6


def test_build_deterministic():
    ids = np.arange(120, dtype=np.int64)
    vecs = np.array([_vec(int(i)) for i in ids], dtype=np.float32)
    a = _build_graph(ids, vecs, 6, 32, SpaceType.COSINE)
    b = _build_graph(ids, vecs, 6, 32, SpaceType.COSINE)
    assert a[2] == b[2] and a[3] == b[3]
    assert all(
        len(x) == len(y) and all(np.array_equal(p, q) for p, q in zip(x, y))
        for x, y in zip(a[1], b[1])
    )


def test_layer0_connected():
    """Connectivity repair guarantees ef>=n search is exhaustive."""
    ids = np.arange(200, dtype=np.int64)
    vecs = np.array([_vec(int(i)) for i in ids], dtype=np.float32)
    _, adj, entry, _ = _build_graph(ids, vecs, 4, 16, SpaceType.COSINE)
    seen = {entry}
    stack = [entry]
    while stack:
        v = stack.pop()
        for u in adj[v][0]:
            if int(u) not in seen:
                seen.add(int(u))
                stack.append(int(u))
    assert len(seen) == len(ids)


def test_pure_crud_sequence_stays_exact():
    """Spark-free model check of the shared insertion path (_insert_nodes,
    used by both build and upsert): after every step of a deterministic
    insert/delete/reinsert sequence, an exhaustive beam over the encoded
    blob equals numpy brute force over the live rows. Runs dozens of
    graph states in milliseconds — the depth the Spark round-trip tests
    can't afford."""
    from vector_store_spark.operators.hnsw import (
        _encode,
        _insert_nodes,
        _prep,
        _repair_layer0,
        _slice_search,
    )

    space = SpaceType.COSINE
    m, efc = 5, 24
    q = np.asarray(Q, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    ids = np.arange(80, dtype=np.int64)
    vecs = np.array([_vec(int(i)) for i in ids], dtype=np.float32)
    levels, adj, entry, maxl = _build_graph(ids, vecs, m, efc, space)
    deleted = np.zeros(len(ids), np.uint8)

    def apply_insert(new_ids, new_vecs):
        nonlocal ids, vecs, levels, adj, entry, maxl, deleted
        n0 = len(ids)
        ids = np.concatenate([ids, new_ids])
        vecs = np.vstack([vecs, new_vecs])
        levels = np.concatenate([levels, _levels_of(new_ids, m)])
        deleted = np.concatenate([deleted, np.zeros(len(new_ids), np.uint8)])
        mat = _prep(vecs, space)
        entry, maxl = _insert_nodes(mat, adj, levels, entry, maxl, n0, m, efc, space)
        _repair_layer0(mat, adj, space)

    def check():
        row = _encode(0, ids, vecs, levels, adj, entry, maxl, deleted)
        got_ids, got_d = _slice_search(row, DIMS, list(q), 10, len(ids),
                                       space, None, round_to=9)
        live = deleted == 0
        mat = _prep(vecs, space)
        d = 1.0 - mat[live] @ qn
        lid = ids[live]
        # the brute tie-breaks on the same rounded key the engine uses
        # (per-batch BLAS can differ by 1 ulp on exactly-tied vectors)
        d9 = np.floor(np.abs(d) * 1e9 + 0.5) / 1e9 * np.sign(d)
        order = np.lexsort((lid, d9))[:10]
        assert got_ids == [int(x) for x in lid[order]]
        assert np.allclose(got_d, d[order], atol=1e-8)

    steps = [
        ("ins", np.arange(80, 120)), ("del", [5, 17, 80, 81, 99]),
        ("ins", np.arange(120, 160)), ("del", list(range(0, 60, 4))),
        ("del", [150, 151]), ("ins", np.arange(500, 520)),
        ("reinsert", [17, 99]),  # epoch bump: delete left them dead above
    ]
    for kind, arg in steps:
        if kind == "ins":
            new_ids = np.asarray(arg, dtype=np.int64)
            apply_insert(new_ids, np.array([_vec(int(i) + 1000) for i in new_ids],
                                           dtype=np.float32))
        elif kind == "reinsert":
            new_ids = np.asarray(arg, dtype=np.int64)
            apply_insert(new_ids, np.array([_vec(int(i) + 2000) for i in new_ids],
                                           dtype=np.float32))
        else:
            deleted[np.isin(ids, np.asarray(arg, dtype=np.int64))] = 1
        check()


def test_exhaustive_search_is_exact(spark, items, built):
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, built, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == _exact(items, Q, 10)


def test_recall_monotone_in_ef(spark, items, built):
    want = {v for v, _ in _exact(items, Q, 10)}

    def recall(ef):
        got = {r.vec_id for r in
               hnsw_search(spark, built, Q, 10, ef_search=ef).collect()}
        return len(got & want) / 10

    r8, r64 = recall(8), recall(64)
    assert r8 <= r64  # wider beam never hurts
    assert r64 >= 0.9  # expansion_search=64 ≈ the reference default


def test_filtered_inside_traversal(spark, items, built):
    pred = F.col("label").isin(1, 3)
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, built, Q, 10, ef_search=N,
                                predicate=pred, round_to=ROUND).collect()]
    assert got == _exact(items, Q, 10, pred)  # top-k OF the filtered set
    assert all(v % 5 in (1, 3) for v, _ in got)


def test_crud_insert_delete(spark, items, tmp_path):
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    new = spark.createDataFrame(
        [(9001, Q, 9), (9002, [0.0] * DIMS, 9)],
        "vec_id long, embedding array<float>, label int",
    )
    hnsw_insert(spark, path, new)
    top = hnsw_search(spark, path, Q, 3, ef_search=64).collect()
    assert top[0].vec_id == 9001 and top[0].distance < 1e-9

    hnsw_delete(spark, path, [9001, 0])
    rows = hnsw_search(spark, path, Q, N, ef_search=N).collect()
    ids = {r.vec_id for r in rows}
    assert 9001 not in ids and 0 not in ids and 9002 in ids
    # post-CRUD exhaustive search still exact over the surviving set
    want = _exact(
        items.unionByName(new).where(~F.col("vec_id").isin(9001, 0)), Q, 10)
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == want


def test_delete_then_insert_keeps_payload_alignment(spark, items, tmp_path):
    """Regression: new node indices must continue from the BLOB length, not
    the payload's max(node) — tombstone deletes shrink the payload but not
    the blob, and a misaligned payload would corrupt the filtered-search
    allow-bitmaps for every node inserted afterwards."""
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    hnsw_delete(spark, path, [0, 3, 6, 9, 12])
    new = spark.createDataFrame(
        [(9001, Q, 1), (9002, [0.5] * DIMS, 2), (9003, [-0.5] * DIMS, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    hnsw_insert(spark, path, new)
    pred = F.col("label") == 1
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                predicate=pred, round_to=ROUND).collect()]
    final = items.unionByName(new).where(~F.col("vec_id").isin(0, 3, 6, 9, 12))
    assert got == _exact(final, Q, 10, pred)
    assert got[0][0] == 9001  # the label-1 insert at the query point wins


def test_engine_hnsw_strategy(spark, items, built):
    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.types import Filter, Restriction

    meta = IndexMetadata(
        keyspace="ks", index="gx", table="t", primary_key_columns=("vec_id",),
        partition_key_count=1, target_column="embedding", dimensions=DIMS,
        filtering_columns=("label",), connectivity=6, expansion_add=48,
        expansion_search=N,
    )
    eng = VectorStoreEngine()
    eng.register(items, meta, strategy="hnsw", strategy_opts={"path": built})
    resp = eng.ann("ks", "t", "embedding", Q, limit=5)
    assert resp.primary_keys["vec_id"] == [v for v, _ in _exact(items, Q, 5)]
    # restricted ANN through the engine lifecycle (usearch.rs:1108-1154)
    flt = Filter(restrictions=(Restriction.eq("label", 2),),
                 allow_filtering=True)
    resp = eng.ann("ks", "t", "embedding", Q, limit=5, flt=flt)
    want = _exact(items, Q, 5, F.col("label") == 2)
    assert resp.primary_keys["vec_id"] == [v for v, _ in want]


def test_local_sub_graphs_round_trip_and_pruning(spark, items, tmp_path):
    """One HNSW sub-graph per partition: searching a partition equals exact
    top-k over that partition alone (exhaustive ef), the blob scan prunes to
    the one slice directory, and CRUD touches only mapped sub-graphs."""
    from vector_store_spark.operators.hnsw import hnsw_search_local
    from vector_store_spark.sources.index_store import prune_report

    path = str(tmp_path / "ix")
    meta = hnsw_build(items, "vec_id", "embedding", path, m=6,
                      ef_construction=48, part_col="label",
                      payload_cols=["label"])
    assert meta["num_slices"] == 5 and len(meta["partitions"]) == 5
    got = hnsw_search_local(spark, path, 3, Q, 10, ef_search=N,
                            round_to=ROUND)
    rows = [(r.vec_id, r.distance) for r in got.collect()]
    assert rows == _exact(items, Q, 10, F.col("label") == 3)
    assert "slice" in " ".join(prune_report(got)["partition_filters"])
    with pytest.raises(KeyError):
        hnsw_search_local(spark, path, 99, Q, 5)
    # CRUD on the local layout: insert maps by partition value, delete
    # sweeps every sub-graph (an id does not determine its partition)
    new = spark.createDataFrame([(9001, Q, 3)],
                                "vec_id long, embedding array<float>, label int")
    hnsw_insert(spark, path, new)
    hnsw_delete(spark, path, [8])  # label 8%5==3 partition
    got2 = [(r.vec_id, r.distance)
            for r in hnsw_search_local(spark, path, 3, Q, 10, ef_search=N,
                                       round_to=ROUND).collect()]
    final = items.unionByName(new).where(F.col("vec_id") != 8)
    assert got2 == _exact(final, Q, 10, F.col("label") == 3)
    assert got2[0][0] == 9001


def test_fused_upsert_equals_delete_then_insert(spark, items, tmp_path):
    """The one-pass upsert (the CDC maintenance hot path) must equal
    delete-then-insert — including the epoch-bump case where an id is in
    BOTH sets (tombstoned old node, fresh reinserted node wins)."""
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    # id 7 is updated (in both sets), 11/13 deleted, 9005 fresh
    upd = spark.createDataFrame(
        [(7, [0.9] * DIMS, 1), (9005, Q, 2)],
        "vec_id long, embedding array<float>, label int",
    )
    hnsw_upsert(spark, path, items=upd, ids_removed=[7, 11, 13])
    final = (
        items.where(~F.col("vec_id").isin(7, 11, 13)).unionByName(upd)
    )
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == _exact(final, Q, 10)
    assert got[0][0] == 9005
    # the updated id 7 serves its NEW vector (old node tombstoned)
    q9 = [0.9] * DIMS
    top = hnsw_search(spark, path, q9, 1, ef_search=N).collect()
    assert top[0].vec_id == 7 and top[0].distance < 1e-9
    # filtered search stays aligned post-upsert (payload bitmaps)
    pred = F.col("label") == 2
    gotf = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 5, ef_search=N,
                                 predicate=pred, round_to=ROUND).collect()]
    assert gotf == _exact(final, Q, 5, pred)


def test_compact_reclaims_tombstones(spark, items, tmp_path):
    """Compaction (USearch's deferred-removal reclaim): slices above the
    tombstone threshold are rebuilt from live nodes only — blob shrinks,
    results (incl. filtered, whose payload bitmaps are renumbered) are
    unchanged — while clean slices are untouched."""
    import os

    from vector_store_spark.operators.hnsw import hnsw_compact

    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    # slice = vec_id % 3: kill ~half of slice 0, nothing of slices 1/2
    gone = [i for i in range(0, N, 3)][: N // 6]
    hnsw_delete(spark, path, gone)
    pre = {r["slice"]: r["n"] for r in
           spark.read.parquet(os.path.join(path, "graph")).collect()}

    done = hnsw_compact(spark, path, min_deleted_frac=0.2)
    assert done == [0]
    post = {r["slice"]: r["n"] for r in
            spark.read.parquet(os.path.join(path, "graph")).collect()}
    assert post[0] == pre[0] - len(gone)
    assert post[1] == pre[1] and post[2] == pre[2]  # clean slices untouched

    final = items.where(~F.col("vec_id").isin(gone))
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == _exact(final, Q, 10)
    pred = F.col("label") == 0
    gotf = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 5, ef_search=N,
                                 predicate=pred, round_to=ROUND).collect()]
    assert gotf == _exact(final, Q, 5, pred)
    # idempotent: nothing left above threshold
    assert hnsw_compact(spark, path, min_deleted_frac=0.2) == []
    # the sidecar dead census (the free driver-side trigger) tracks every
    # blob write: all-live after the rebuild, and n matches the blobs
    import json

    with open(os.path.join(path, "_hnsw_meta.json")) as f:
        stats = json.load(f)["dead_stats"]
    assert {int(s): v[0] for s, v in stats.items()} == post
    assert all(v[1] == 0 for v in stats.values())


def test_compact_distrusts_partial_census(spark, items, tmp_path):
    """A PARTIAL sidecar census (an index built before the census existed
    gets only touched slices recorded; a crash between blob overwrite and
    census write leaves the same shape) must NOT exempt unrecorded slices:
    compaction falls back to the pruned scan, still reclaims the garbage
    slice, and backfills the census (ADVICE r10)."""
    import json
    import os

    from vector_store_spark.operators.hnsw import hnsw_compact

    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    gone = [i for i in range(0, N, 3)][: N // 6]   # ~half of slice 0
    hnsw_delete(spark, path, gone)
    meta_path = os.path.join(path, "_hnsw_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    # simulate the pre-census/partial shape: the garbage slice is missing
    del meta["dead_stats"]["0"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    done = hnsw_compact(spark, path, min_deleted_frac=0.2)
    assert done == [0]
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == _exact(items.where(~F.col("vec_id").isin(gone)), Q, 10)
    # the fallback scan backfilled the census: complete and all-live
    with open(meta_path) as f:
        stats = json.load(f)["dead_stats"]
    assert set(stats) == {"0", "1", "2"}
    assert all(v[1] == 0 for v in stats.values())


def test_i8_quantized_graph_rescore(spark, items, tmp_path):
    """The quantization index option composed with the graph engine
    (usearch.rs:503-513 + quantization_and_rescoring.rs): int8 blobs are
    ~4x smaller, approximate beam + exact rescore from the base table
    recovers the exact top-k, and inserts reuse the slice's stored scale."""
    import os

    f32_path = str(tmp_path / "f32")
    i8_path = str(tmp_path / "i8")
    hnsw_build(items, "vec_id", "embedding", f32_path, m=6, ef_construction=48,
               num_slices=3)
    hnsw_build(items, "vec_id", "embedding", i8_path, m=6, ef_construction=48,
               num_slices=3, quantization="i8")

    def vec_buffer_bytes(p):
        return {r["slice"]: (len(bytes(r["vecs"])), r["n"]) for r in
                spark.read.parquet(os.path.join(p, "graph")).collect()}

    f32b, i8b = vec_buffer_bytes(f32_path), vec_buffer_bytes(i8_path)
    for sl, (nbytes, n) in i8b.items():
        assert nbytes == n * DIMS            # 1 byte/component stored
        assert f32b[sl][0] == n * DIMS * 4   # vs 4 bytes at f32

    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, i8_path, Q, 10, ef_search=N, rescore=4,
                                rescore_with=(items, "embedding"),
                                round_to=ROUND).collect()]
    assert got == _exact(items, Q, 10)

    new = spark.createDataFrame([(9001, Q)], "vec_id long, embedding array<float>")
    hnsw_insert(spark, i8_path, new)
    base2 = items.select("vec_id", "embedding").unionByName(new)
    got2 = hnsw_search(spark, i8_path, Q, 1, ef_search=N, rescore=4,
                       rescore_with=(base2, "embedding"),
                       round_to=ROUND).collect()
    assert got2[0].vec_id == 9001


def test_knn_batch_matches_per_query_exact(spark, items, built):
    """Graph batch kNN (J3 twin) returns each query's exact top-k at an
    exhaustive beam, in knn_join's (query_id, id, distance) contract."""
    from vector_store_spark.operators.hnsw import hnsw_knn_batch

    qs = [("a", Q), ("b", _vec(7)), ("c", _vec(123))]
    got = hnsw_knn_batch(spark, built, qs, 5, ef_search=N, round_to=ROUND)
    rows = [((r.query_id, r.vec_id, r.distance))
            for r in got.orderBy("query_id", "distance", "vec_id").collect()]
    want = []
    for name, q in sorted(qs):
        want.extend((name, v, d) for v, d in _exact(items, q, 5))
    assert rows == want


def test_engine_local_hnsw_strategy(spark, items, tmp_path):
    """Engine serving of the LOCAL graph layout: the consumed partition-key
    Eq selects the per-partition sub-graph (usearch.rs:815-864 routing)."""
    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.plans.restrictions import FilterError
    from vector_store_spark.types import Filter, IndexMetadata, Restriction

    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               part_col="label", payload_cols=["label"])
    meta = IndexMetadata(
        keyspace="ks", index="lgx", table="t",
        primary_key_columns=("label", "vec_id"), partition_key_count=1,
        target_column="embedding", dimensions=DIMS,
        partitioning=("label",), expansion_search=N,
    )
    eng = VectorStoreEngine()
    eng.register(items, meta, strategy="hnsw", strategy_opts={"local_path": path})
    # hnsw emits (id, distance, similarity): a two-column pk is rejected
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", Q, limit=5,
                flt=Filter(restrictions=(Restriction.eq("label", 3),)))

    meta1 = IndexMetadata(
        keyspace="ks", index="lgx1", table="t1",
        primary_key_columns=("vec_id",), partition_key_count=0,
        target_column="embedding", dimensions=DIMS,
        partitioning=("label",), filtering_columns=("label",),
        expansion_search=N,
    )
    eng.register(items, meta1, strategy="hnsw",
                 strategy_opts={"local_path": path})
    resp = eng.ann("ks", "t1", "embedding", Q, limit=5,
                   flt=Filter(restrictions=(Restriction.eq("label", 3),),
                              allow_filtering=True))
    want = _exact(items, Q, 5, F.col("label") == 3)
    assert resp.primary_keys["vec_id"] == [v for v, _ in want]


def test_incremental_insertion_preserves_recall(spark, items, tmp_path):
    """Graph quality under maintenance: a graph grown by upserts must not
    degrade materially vs a fresh build of the same end state (the quality
    question the CDC maintenance path raises — USearch has the identical
    property via insert-time linking)."""
    grown = str(tmp_path / "grown")
    fresh = str(tmp_path / "fresh")
    first = items.where(F.col("vec_id") < 300)
    rest = items.where(F.col("vec_id") >= 300)
    hnsw_build(first, "vec_id", "embedding", grown, m=6, ef_construction=48,
               num_slices=3)
    hnsw_insert(spark, grown, rest.select("vec_id", "embedding"))
    hnsw_build(items, "vec_id", "embedding", fresh, m=6, ef_construction=48,
               num_slices=3)

    def recall(path, q):
        want = {v for v, _ in _exact(items, q, 10)}
        got = {r.vec_id for r in
               hnsw_search(spark, path, q, 10, ef_search=32).collect()}
        return len(got & want) / 10

    for q in (Q, _vec(7), _vec(55)):
        rg, rf = recall(grown, q), recall(fresh, q)
        assert rg >= rf - 0.2 and rg >= 0.7, (rg, rf)


def test_fully_deleted_slice_serves_empty(spark, items, tmp_path):
    """Edge: tombstoning every node of a slice (or the whole index) leaves
    traversal through dead nodes but zero results — no crash, no ghosts."""
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3)
    hnsw_delete(spark, path, list(range(N)))  # everything, incl. entry nodes
    assert hnsw_search(spark, path, Q, 10, ef_search=N).collect() == []


def test_search_plan_no_shuffle(spark, built):
    """Serving reads num_slices blob rows and merges with one
    TakeOrderedAndProject — no Exchange before the merge."""
    plan = hnsw_search(spark, built, Q, 10, ef_search=32)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_hamming_b1_graph_round_trip(spark, items, tmp_path):
    """Hamming/B1 graph end-to-end (USearch's B1↦Hamming coupling,
    usearch.rs:463-487, 1179-1205): build packs sign bits (~32x smaller
    blobs), search packs the QUERY too (the round-7 crash: a raw f64 query
    hit XOR-popcount), upsert packs inserts, compact rebuilds packed."""
    import os

    from vector_store_spark.operators.hnsw import hnsw_compact

    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"],
               space=SpaceType.HAMMING, quantization="b1")
    blob = {r["slice"]: (len(bytes(r["vecs"])), r["n"]) for r in
            spark.read.parquet(os.path.join(path, "graph")).collect()}
    for _, (nbytes, n) in blob.items():
        assert nbytes == n * ((DIMS + 7) // 8)  # packed bits, not floats

    def exact(df, q, k, pred=None):
        d = df if pred is None else df.where(pred)
        return [(r.vec_id, r.distance) for r in
                ann_topk(d, "embedding", q, k, space=SpaceType.HAMMING,
                         tie_break=["vec_id"], select_cols=["vec_id"],
                         round_to=ROUND).collect()]

    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == exact(items, Q, 10)
    # filtered traversal in Hamming space
    pred = F.col("label").isin(0, 4)
    gotf = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 5, ef_search=N,
                                 predicate=pred, round_to=ROUND).collect()]
    assert gotf == exact(items, Q, 5, pred)
    # CRUD: fused upsert with an extra non-vector column present and a
    # re-added id (epoch bump) — both round-7 failure shapes
    upd = spark.createDataFrame(
        [(7, Q, 1, "x"), (9001, Q, 2, "y")],
        "vec_id long, embedding array<float>, label int, extra string",
    )
    hnsw_upsert(spark, path, items=upd, ids_removed=[11])
    final = (items.where(~F.col("vec_id").isin(7, 11))
             .unionByName(upd.drop("extra")))
    got2 = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                 round_to=ROUND).collect()]
    assert got2 == exact(final, Q, 10)
    # compact the tombstones away; results unchanged
    hnsw_delete(spark, path, [i for i in range(0, N, 3)][: N // 6])
    hnsw_compact(spark, path, min_deleted_frac=0.05)
    final2 = final.where(~F.col("vec_id").isin(
        [i for i in range(0, N, 3)][: N // 6]))
    got3 = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                 round_to=ROUND).collect()]
    assert got3 == exact(final2, Q, 10)


def test_dot_product_graph_exact_and_recall(spark, items, tmp_path):
    """DOT_PRODUCT graph scoring (USearch "IP": dist = 1 - <a,b>, raw
    magnitudes): exhaustive beam equals the exact engine; the default beam
    holds the recall pin."""
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, space=SpaceType.DOT_PRODUCT)

    def exact(k):
        return [(r.vec_id, r.distance) for r in
                ann_topk(items, "embedding", Q, k, space=SpaceType.DOT_PRODUCT,
                         tie_break=["vec_id"], select_cols=["vec_id"],
                         round_to=ROUND).collect()]

    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == exact(10)
    want = {v for v, _ in exact(10)}
    got64 = {r.vec_id for r in
             hnsw_search(spark, path, Q, 10, ef_search=64).collect()}
    assert len(got64 & want) / 10 >= 0.9


def test_space_quant_validation(spark, items, tmp_path):
    """The graph rejects space/quantization pairs it cannot score rather
    than silently falling back (the round-6 latent wrong-answer path)."""
    path = str(tmp_path / "ix")
    for kwargs in (
        dict(space=SpaceType.HAMMING),                       # needs b1
        dict(space=SpaceType.HAMMING, quantization="i8"),
        dict(space=SpaceType.COSINE, quantization="b1"),     # b1 is hamming-only
        dict(quantization="f16"),                            # unknown storage
    ):
        with pytest.raises(ValueError):
            hnsw_build(items, "vec_id", "embedding", path, m=6,
                       ef_construction=48, num_slices=3, **kwargs)


def test_upsert_requires_persisted_vec_col(spark, items, tmp_path):
    """hnsw_upsert consumes meta['vec_col'] (persisted at build) instead of
    inferring 'the first leftover column'; a batch without it raises."""
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3)
    bad = spark.createDataFrame([(9001, [0.1] * DIMS)],
                                "vec_id long, other array<float>")
    with pytest.raises(ValueError, match="embedding"):
        hnsw_insert(spark, path, bad)
    # with several candidate columns, the sidecar name wins (no inference)
    ones = [1.0] * DIMS
    ok = spark.createDataFrame([(9001, Q, ones)],
                               "vec_id long, aaa array<float>, embedding array<float>")
    hnsw_insert(spark, path, ok.select("vec_id", "aaa", "embedding"))
    top = hnsw_search(spark, path, ones, 1, ef_search=N).collect()
    # stored 'embedding' (all-ones), not 'aaa' (Q): exact hit at distance 0
    assert top[0].vec_id == 9001 and top[0].distance < 1e-9


def test_global_search_rejects_local_layout(spark, items, tmp_path):
    """Local layouts keep ids unique per partition, not globally: the
    cross-slice merge entry points refuse them (mirror of
    hnsw_search_local's inverse guard)."""
    from vector_store_spark.operators.hnsw import hnsw_knn_batch

    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               part_col="label")
    with pytest.raises(ValueError, match="local"):
        hnsw_search(spark, path, Q, 5)
    with pytest.raises(ValueError, match="local"):
        hnsw_knn_batch(spark, path, [("a", Q)], 5)


def test_emptied_slice_payload_partition_cleared(spark, items, tmp_path):
    """Deleting every row of a slice must CLEAR its payload partition
    directory (dynamic overwrite skips partitions absent from the output,
    which used to leave stale rows that resurfaced after compaction
    renumbering), and a later reinsert into the emptied slice restarts
    cleanly."""
    import os

    from vector_store_spark.operators.hnsw import hnsw_compact

    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    slice0 = [i for i in range(N) if i % 3 == 0]
    hnsw_delete(spark, path, slice0)
    pay = spark.read.parquet(os.path.join(path, "payload"))
    assert pay.where(F.col("slice") == 0).count() == 0
    assert not os.path.exists(os.path.join(path, "payload", "slice=0"))
    # compact the fully-dead slice away, then reinsert into it
    hnsw_compact(spark, path, min_deleted_frac=0.05)
    new = spark.createDataFrame([(9000, Q, 1)],  # 9000 % 3 == 0
                                "vec_id long, embedding array<float>, label int")
    hnsw_insert(spark, path, new)
    pred = F.col("label") == 1
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 5, ef_search=N,
                                predicate=pred, round_to=ROUND).collect()]
    final = items.where(F.col("vec_id") % 3 != 0).unionByName(new)
    assert got == _exact(final, Q, 5, pred)
    assert got[0][0] == 9000


def test_degree_cap_bounded_under_repeated_upserts():
    """The layer-0 degree cap's motivating scenario: many CDC micro-batches
    must not grow hub degrees (blob size / per-hop beam cost) without
    bound, and the DIVERSIFIED pruning rule must hold recall while doing it
    (pure nearest-k pruning regressed recall@10 0.9→0.8 in round 7)."""
    from vector_store_spark.operators.hnsw import (
        _encode,
        _insert_nodes,
        _prep,
        _repair_layer0,
        _slice_search,
    )

    space = SpaceType.COSINE
    m, efc, dims = 6, 48, 16

    def vec(i):  # distinct per id (golden-ratio lattice), unlike _vec
        return [((i * 0.6180339887 * (j + 1) + 0.7 * j) % 1.0) - 0.5
                for j in range(dims)]

    ids = np.arange(60, dtype=np.int64)
    vecs = np.array([vec(int(i)) for i in ids], np.float32)
    levels, adj, entry, maxl = _build_graph(ids, vecs, m, efc, space)
    for b in range(30):
        new_ids = np.arange(60 + b * 15, 60 + (b + 1) * 15, dtype=np.int64)
        new_vecs = np.array([vec(int(i)) for i in new_ids], np.float32)
        n0 = len(ids)
        ids = np.concatenate([ids, new_ids])
        vecs = np.vstack([vecs, new_vecs])
        levels = np.concatenate([levels, _levels_of(new_ids, m)])
        mat = _prep(vecs, space)
        entry, maxl = _insert_nodes(mat, adj, levels, entry, maxl, n0, m,
                                    efc, space)
        _repair_layer0(mat, adj, space, m)
    degs = [len(a[0]) for a in adj]
    assert max(degs) <= 4 * m + 4, max(degs)       # bounded, not growing
    assert sum(degs) / len(degs) <= 2 * m + 4      # mean ~ the 2m cap
    q = np.asarray(vec(99999), np.float64)
    row = _encode(0, ids, vecs, levels, adj, entry, maxl)
    got, _ = _slice_search(row, dims, list(q), 10, 64, space, None)
    d = 1.0 - _prep(vecs, space) @ (q / np.linalg.norm(q))
    want = set(ids[np.lexsort((ids, d))[:10]].tolist())
    assert len(set(got) & want) / 10 >= 0.9


def test_upsert_with_dataframe_key_set(spark, items, tmp_path):
    """The streaming-maintenance shape: ids_removed as a DataFrame rides
    the cogroup as slice-tagged marker rows (no driver-collected key list).
    Must equal the literal-list path exactly — fused upsert and delete-only
    both."""
    path = str(tmp_path / "ix")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=3, payload_cols=["label"])
    upd = spark.createDataFrame(
        [(7, [0.9] * DIMS, 1), (9005, Q, 2)],
        "vec_id long, embedding array<float>, label int",
    )
    keys = spark.createDataFrame([(7,), (11,), (13,)], "vec_id long")
    hnsw_upsert(spark, path, items=upd, ids_removed=keys)
    final = items.where(~F.col("vec_id").isin(7, 11, 13)).unionByName(upd)
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == _exact(final, Q, 10)
    # delete-only with a DataFrame key set
    hnsw_upsert(spark, path,
                ids_removed=spark.createDataFrame([(9005,)], "vec_id long"))
    final2 = final.where(F.col("vec_id") != 9005)
    got2 = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                 round_to=ROUND).collect()]
    assert got2 == _exact(final2, Q, 10)
    # filtered search stays aligned (payload anti-joined distributively)
    pred = F.col("label") == 1
    gotf = [(r.vec_id, r.distance)
            for r in hnsw_search(spark, path, Q, 5, ef_search=N,
                                 predicate=pred, round_to=ROUND).collect()]
    assert gotf == _exact(final2, Q, 5, pred)


def test_diskann_alpha_variant(spark, items, tmp_path):
    """The DiskANN-class engine variant (vs_index/diskann.rs): same graph
    surface, the differentiating knob is Vamana's RobustPrune slack alpha
    (diskann.rs:452-464, default 1.2; validated finite/>0, lib.rs:161-168).
    Exhaustive search stays exact regardless of alpha; the engine serves it
    under strategy='diskann'."""
    from vector_store_spark.engine import VectorStoreEngine

    path = str(tmp_path / "ix")
    with pytest.raises(ValueError, match="alpha"):
        hnsw_build(items, "vec_id", "embedding", path, alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        hnsw_build(items, "vec_id", "embedding", path, alpha=float("inf"))
    meta = hnsw_build(items, "vec_id", "embedding", path, m=6,
                      ef_construction=48, num_slices=3, alpha=1.2)
    assert meta["alpha"] == 1.2
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, path, Q, 10, ef_search=N,
                                round_to=ROUND).collect()]
    assert got == _exact(items, Q, 10)
    # CRUD inherits the persisted alpha (meta-driven, like quantization)
    new = spark.createDataFrame([(9001, Q)], "vec_id long, embedding array<float>")
    hnsw_insert(spark, path, new)
    top = hnsw_search(spark, path, Q, 1, ef_search=64).collect()
    assert top[0].vec_id == 9001
    # engine dispatch: strategy="diskann" serves the graph
    emeta = IndexMetadata(
        keyspace="ks", index="dk", table="t", primary_key_columns=("vec_id",),
        partition_key_count=1, target_column="embedding", dimensions=DIMS,
        expansion_search=N,
    )
    eng = VectorStoreEngine()
    eng.register(items, emeta, strategy="diskann", strategy_opts={"path": path})
    resp = eng.ann("ks", "t", "embedding", Q, limit=5)
    want = _exact(items.unionByName(new.withColumn("label", F.lit(0))), Q, 5)
    assert resp.primary_keys["vec_id"] == [v for v, _ in want]


def test_randomized_crud_sweep_all_spaces():
    """Seeded random state-machine sweep (the graph twin of the reference's
    Table state-machine test, table/mod.rs:1420-1676): random
    insert/delete/reinsert sequences over every space, checked after every
    step — an exhaustive beam over the encoded blob must equal numpy brute
    force over the live rows. Dozens of graph states per space in seconds,
    Spark-free."""
    import random

    from vector_store_spark.operators.hnsw import (
        _b1_pack_rows,
        _encode,
        _insert_nodes,
        _prep,
        _repair_layer0,
        _slice_search,
    )

    dims, m, efc = 12, 5, 24

    def vec(rng):
        return [rng.uniform(-1, 1) for _ in range(dims)]

    for space in (SpaceType.COSINE, SpaceType.EUCLIDEAN,
                  SpaceType.DOT_PRODUCT, SpaceType.HAMMING):
        quant = "b1" if space == SpaceType.HAMMING else "f32"
        rng = random.Random(20260814 + hash(space.value) % 1000)
        raw = {i: vec(rng) for i in range(30)}
        next_id = 30
        ids = np.array(sorted(raw), dtype=np.int64)
        fv = np.array([raw[i] for i in sorted(raw)], dtype=np.float32)
        store = _b1_pack_rows(fv) if quant == "b1" else fv
        levels, adj, entry, maxl = _build_graph(ids, store, m, efc, space)
        deleted = np.zeros(len(ids), np.uint8)

        def brute(q):
            live = deleted == 0
            mat = _prep(store, space)
            if space == SpaceType.HAMMING:
                qq = _b1_pack_rows(np.asarray(q)[None, :])[0]
                d = np.array([float(np.unpackbits(np.bitwise_xor(r, qq)).sum())
                              for r in mat[live]])
            elif space == SpaceType.COSINE:
                qn = np.asarray(q, np.float64)
                qn = qn / np.linalg.norm(qn)
                d = 1.0 - mat[live] @ qn
            elif space == SpaceType.DOT_PRODUCT:
                d = 1.0 - mat[live] @ np.asarray(q, np.float64)
            else:
                d = ((mat[live] - np.asarray(q, np.float64)) ** 2).sum(1)
            lid = ids[live]
            d9 = np.floor(np.abs(d) * 1e9 + 0.5) / 1e9 * np.sign(d)
            order = np.lexsort((lid, d9))[:8]
            return [int(x) for x in lid[order]]

        for step in range(12):
            op = rng.choice(["ins", "del", "reinsert"])
            if op == "ins":
                k = rng.randrange(1, 8)
                new_ids = np.arange(next_id, next_id + k, dtype=np.int64)
                next_id += k
                new_raw = np.array([vec(rng) for _ in new_ids], np.float32)
            elif op == "reinsert":
                dead = ids[deleted == 1]
                if len(dead) == 0:
                    continue
                new_ids = np.sort(np.asarray(
                    rng.sample(list(dead), min(3, len(dead))), dtype=np.int64))
                new_raw = np.array([vec(rng) for _ in new_ids], np.float32)
            else:
                live_ids = ids[deleted == 0]
                if len(live_ids) <= 8:
                    continue
                kill = rng.sample(list(live_ids), rng.randrange(1, 5))
                deleted[np.isin(ids, np.asarray(kill, dtype=np.int64))] = 1
                q = vec(rng)
                row = _encode(0, ids, store, levels, adj, entry, maxl,
                              deleted, quant=quant)
                got, _ = _slice_search(row, dims, q, 8, len(ids), space,
                                       None, quant=quant, round_to=9)
                assert got == brute(q), (space, step, "del")
                continue
            # insert path (fresh or reinsert-with-epoch-bump)
            deleted[np.isin(ids, new_ids)] = 1  # tombstone any old node
            n0 = len(ids)
            ids = np.concatenate([ids, new_ids])
            new_store = _b1_pack_rows(new_raw) if quant == "b1" else new_raw
            store = np.vstack([store, new_store])
            levels = np.concatenate([levels, _levels_of(new_ids, m)])
            deleted = np.concatenate(
                [deleted, np.zeros(len(new_ids), np.uint8)])
            mat = _prep(store, space)
            entry, maxl = _insert_nodes(mat, adj, levels, entry, maxl, n0,
                                        m, efc, space)
            _repair_layer0(mat, adj, space, m)
            q = vec(rng)
            row = _encode(0, ids, store, levels, adj, entry, maxl, deleted,
                          quant=quant)
            got, _ = _slice_search(row, dims, q, 8, len(ids), space, None,
                                   quant=quant, round_to=9)
            assert got == brute(q), (space, step, op)


def test_filtered_search_plan_cogroups_not_broadcasts(spark, items, built):
    """Scale regression: the filtered path must ship allow-lists as
    COGROUPED data (FlatMapCoGroupsInPandas), never as a collect_list
    aggregation broadcast onto the blobs — at 100 TB a broad predicate's
    node set would funnel through the driver-sized broadcast."""
    plan = hnsw_search(spark, built, Q, 10, ef_search=32,
                       predicate=F.col("label") == 1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "collect_list" not in plan
    assert "TakeOrderedAndProject" in plan


def test_filtered_adaptive_guard(spark, items, built):
    """min_candidates arms the count-then-tier guard on the graph engine:
    a selective predicate at/under the floor is scored exhaustively (exact
    top-k OF the filtered set — the unguarded beam's canonical failure
    mode), and above the floor the beam widens so allowed nodes keep
    filling the result heap."""
    # exact tier: ~6 % of rows, far under the floor
    pred = F.col("vec_id") % 17 == 0
    got = [(r.vec_id, r.distance)
           for r in hnsw_search(spark, built, Q, 10, ef_search=8,
                                predicate=pred, min_candidates=100,
                                round_to=ROUND).collect()]
    assert got == _exact(items, Q, 10, pred)
    # escalation tier: the guarded beam's hits are a superset of the
    # narrow unguarded beam's
    pred_wide = F.col("vec_id") % 2 == 0
    truth = {v for v, _ in _exact(items, Q, 10, pred_wide)}
    plain = {r.vec_id for r in hnsw_search(
        spark, built, Q, 10, ef_search=8, predicate=pred_wide,
        round_to=ROUND).collect()}
    guarded = {r.vec_id for r in hnsw_search(
        spark, built, Q, 10, ef_search=8, predicate=pred_wide,
        min_candidates=60, round_to=ROUND).collect()}
    assert len(guarded & truth) >= len(plain & truth)


def test_filtered_adaptive_guard_local(spark, items, tmp_path):
    from vector_store_spark.operators.hnsw import hnsw_search_local

    path = str(tmp_path / "ix_local")
    hnsw_build(items, "vec_id", "embedding", path, m=6, ef_construction=48,
               part_col="label", payload_cols=["label"])
    pred = F.col("vec_id") % 3 == 0
    got = [(r.vec_id, r.distance)
           for r in hnsw_search_local(spark, path, 2, Q, 10, ef_search=8,
                                      predicate=pred, min_candidates=320,
                                      round_to=ROUND).collect()]
    assert got == _exact(items, Q, 10, (F.col("label") == 2) & pred)
