"""Engine strategy axis (engine.ANN_STRATEGIES, §2.9 vs_index/factory.rs):
every strategy serves the same query lifecycle; approximate answers come from
the filtered candidate pool (T2 semantics)."""

import pytest

from vector_store_spark.engine import VectorStoreEngine
from vector_store_spark.plans.restrictions import FilterError
from vector_store_spark.registry import det_query_vector
from vector_store_spark.types import IndexKind, IndexMetadata, SpaceType


def _meta(space=SpaceType.COSINE):
    return IndexMetadata(
        keyspace="ks", index=f"ix_{space.value}", table="t",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64, kind=IndexKind.VECTOR,
        space_type=space,
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.mark.parametrize("strategy", ["exact", "lsh", "ivf"])
def test_cosine_strategies_serve_topk(emb, strategy):
    eng = VectorStoreEngine()
    eng.register(emb, _meta(), strategy=strategy)
    out = eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)
    assert len(out.primary_keys["vec_id"]) == 5
    assert out.distances == sorted(out.distances)
    assert out.similarity_scores == sorted(out.similarity_scores, reverse=True)


def test_pq_strategy_euclidean(emb):
    eng = VectorStoreEngine()
    eng.register(emb, _meta(SpaceType.EUCLIDEAN), strategy="pq")
    out = eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)
    assert len(out.primary_keys["vec_id"]) == 5
    assert out.distances == sorted(out.distances)
    for d, s in zip(out.distances, out.similarity_scores):
        assert s == 1.0 / (1.0 + d)


@pytest.mark.parametrize("strategy", ["ivfpq", "ivfpq_residual"])
def test_ivfpq_strategies_euclidean(emb, strategy):
    eng = VectorStoreEngine()
    eng.register(emb, _meta(SpaceType.EUCLIDEAN), strategy=strategy)
    out = eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)
    assert len(out.primary_keys["vec_id"]) == 5
    assert out.distances == sorted(out.distances)
    for d, s in zip(out.distances, out.similarity_scores):
        assert s == 1.0 / (1.0 + d)


def test_ivfpq_full_probe_full_rescore_is_exact(emb):
    """nprobe=K and rescore·k ≥ N degrade IVF-PQ gracefully to exact L2."""
    from vector_store_spark.operators.ivfpq import ivfpq_topk
    from vector_store_spark.operators.topk import ann_topk

    q = det_query_vector(31, 64)
    got = ivfpq_topk(
        emb, "vec_id", "embedding", q, 10, k_centroids=8, nprobe=8,
        rescore=50, select_cols=["vec_id"], round_to=9,
    )
    brute = ann_topk(
        emb, "embedding", q, 10, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"], round_to=9,
    )
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]


@pytest.mark.parametrize("kind", ["i8", "f16", "bf16"])
def test_scalar_quantized_strategies_serve_topk(emb, kind):
    """quantization_and_rescoring.rs:117-256: each scalar kind serves the
    lifecycle; rescore=True re-ranks candidates at full precision."""
    eng = VectorStoreEngine()
    eng.register(emb, _meta(), strategy=kind, strategy_opts={"rescore": True})
    out = eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)
    assert len(out.primary_keys["vec_id"]) == 5
    assert out.distances == sorted(out.distances)
    assert out.similarity_scores == sorted(out.similarity_scores, reverse=True)


@pytest.mark.parametrize("kind", ["i8", "f16", "bf16"])
def test_scalar_rescore_matches_exact_on_top1(emb, kind):
    """With a wide candidate pool, rescored scalar quantization recovers the
    exact nearest neighbor (the rescoring=true contract: quantized recall,
    full-precision values)."""
    from vector_store_spark.operators.topk import ann_topk

    q = det_query_vector(7, 64)
    eng = VectorStoreEngine()
    eng.register(
        emb, _meta(), strategy=kind,
        strategy_opts={"rescore": True, "n_candidates": 100},
    )
    got = eng.ann("ks", "t", "embedding", q, 1)
    brute = ann_topk(
        emb, "embedding", q, 1, space=SpaceType.COSINE,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()
    assert got.primary_keys["vec_id"][0] == brute[0].vec_id


def test_scalar_no_rescore_returns_quantized_distances(emb):
    """rescore=False: the quantized distances ARE the result (cheaper,
    approximate), so f16 values differ from the exact ones in general but
    stay sorted and domain-valid."""
    eng = VectorStoreEngine()
    eng.register(emb, _meta(), strategy="i8", strategy_opts={"rescore": False})
    out = eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)
    assert len(out.distances) == 5
    assert out.distances == sorted(out.distances)
    for d in out.distances:
        assert 0.0 <= d <= 2.0


def test_strategy_space_mismatch_rejected(emb):
    eng = VectorStoreEngine()
    eng.register(emb, _meta(SpaceType.EUCLIDEAN), strategy="lsh")
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)


def test_unknown_strategy_rejected(emb):
    eng = VectorStoreEngine()
    with pytest.raises(ValueError):
        eng.register(emb, _meta(), strategy="diskann2")


def test_engine_serves_persisted_ivf_and_lsh(spark, emb, tmp_path):
    """The reference's indexes are persisted artifacts; the engine serves
    them through the same lifecycle via the `path` strategy_opt, with probes
    becoming partition pruning."""
    from vector_store_spark.operators.ivf import ivf_build
    from vector_store_spark.operators.lsh import lsh_build

    q = det_query_vector(7, 64)
    ivf_path = str(tmp_path / "eng_ivf")
    ivf_build(emb, "vec_id", "embedding", ivf_path, k_centroids=8)
    lsh_path = str(tmp_path / "eng_lsh")
    lsh_build(emb, "vec_id", "embedding", lsh_path, num_bits=16, bands=4)

    for strategy, path in (("ivf", ivf_path), ("lsh", lsh_path)):
        eng = VectorStoreEngine()
        eng.register(emb, _meta(), strategy=strategy,
                     strategy_opts={"path": path})
        out = eng.ann("ks", "t", "embedding", q, 5)
        assert len(out.primary_keys["vec_id"]) == 5
        assert out.distances == sorted(out.distances)


def _filtering_meta():
    import dataclasses

    return dataclasses.replace(_meta(), filtering_columns=("label",))


def test_engine_persisted_serves_residual_filter(spark, emb, tmp_path):
    """Filtered ANN on the persisted serving layouts (usearch.rs:1108-1154:
    the reference evaluates restrictions inside index traversal; here the
    residual predicate is a pushed parquet filter composed with the
    cluster/bucket partition pruning). Every returned row satisfies the
    filter and matches the exact filtered answer at full probe width."""
    from vector_store_spark.operators.ivf import ivf_build
    from vector_store_spark.operators.lsh import lsh_build
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.types import Filter, Restriction, SpaceType

    q = det_query_vector(7, 64)
    ivf_path = str(tmp_path / "eng_ivf_f")
    ivf_build(emb, "vec_id", "embedding", ivf_path, k_centroids=4)
    lsh_path = str(tmp_path / "eng_lsh_f")
    lsh_build(emb, "vec_id", "embedding", lsh_path, num_bits=4, bands=4)

    flt = Filter(restrictions=(Restriction.eq("label", 1),), allow_filtering=True)
    for strategy, path, opts in (
        # nprobe = k_centroids: full probe, so the filtered result must
        # EQUAL the exact filtered top-k (no recall slack in the assert)
        ("ivf", ivf_path, {"path": ivf_path, "nprobe": 4}),
        # 4 bands x 1 bit: a query probes 4 of 8 (band,bucket) leaves;
        # assert filter correctness + containment in the exact ranking
        ("lsh", lsh_path, {"path": lsh_path}),
    ):
        eng = VectorStoreEngine()
        eng.register(emb, _filtering_meta(), strategy=strategy, strategy_opts=opts)
        out = eng.ann("ks", "t", "embedding", q, 5, flt=flt)
        got = out.primary_keys["vec_id"]
        assert len(got) == 5
        assert out.distances == sorted(out.distances)
        exact = ann_topk(
            emb.where("label = 1"), "embedding", q, 200, space=SpaceType.COSINE,
            tie_break=["vec_id"], select_cols=["vec_id", "label"],
        ).collect()
        assert all(r.label == 1 for r in exact)
        exact_ids = [r.vec_id for r in exact]
        if strategy == "ivf":
            assert got == exact_ids[:5]
        else:
            assert set(got) <= set(exact_ids)


def test_engine_persisted_filter_plan_prunes_and_pushes(spark, emb, tmp_path):
    """The filtered persisted probe must show BOTH pruning levels in the
    scan: PartitionFilters on cluster (the probe) and PushedFilters on the
    payload column (the residual predicate)."""
    from vector_store_spark.operators.ivf import ivf_build
    from vector_store_spark.types import Filter, Restriction

    path = str(tmp_path / "eng_ivf_plan")
    ivf_build(emb, "vec_id", "embedding", path, k_centroids=8)
    eng = VectorStoreEngine()
    # min_candidates=None OPTS OUT of the default-armed adaptive guard
    # (dispatch setdefault keeps the explicit None): this test pins the
    # fixed-PROBE plan shape, which the guard's exact tier would bypass on
    # this selective filter
    eng.register(emb, _filtering_meta(), strategy="ivf",
                 strategy_opts={"path": path, "nprobe": 2,
                                "min_candidates": None})
    topk, _ = eng.ann_df(
        "ks", "t", "embedding", det_query_vector(7, 64), 5,
        flt=Filter(restrictions=(Restriction.eq("label", 1),), allow_filtering=True),
    )
    plan = topk._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "cluster" in scan.split("PartitionFilters")[1].split("]")[0]
    pushed = scan.split("PushedFilters")[1].split("]")[0]
    assert "label" in pushed and "EqualTo" in pushed


def test_engine_persisted_applies_partition_restriction(spark, emb, tmp_path):
    """Consumed partition-key Eq restrictions must constrain the persisted
    probe too (they were silently dropped before): register with label as a
    partition key and check every hit has the requested label."""
    import dataclasses

    from vector_store_spark.operators.ivf import ivf_build
    from vector_store_spark.types import Filter, Restriction

    path = str(tmp_path / "eng_ivf_pk")
    ivf_build(emb, "vec_id", "embedding", path, k_centroids=4)
    meta = dataclasses.replace(
        _meta(), primary_key_columns=("label", "vec_id"), partition_key_count=1,
        partitioning=("label",),
    )
    eng = VectorStoreEngine()
    eng.register(emb, meta, strategy="ivf",
                 strategy_opts={"path": path, "nprobe": 4})
    topk, _ = eng.ann_df(
        "ks", "t", "embedding", det_query_vector(7, 64), 5,
        flt=Filter(restrictions=(Restriction.eq("label", 3),)),
    )
    rows = topk.collect()  # select_cols = PK columns, so label rides along
    assert rows and all(r.label == 3 for r in rows)


def test_engine_serves_local_persisted_sub_indexes(spark, emb, tmp_path):
    """LOCAL persisted sub-indexes through the engine lifecycle
    (lib.rs:677-680): the consumed partition-key Eq selects the per-partition
    sub-index (the Eq is NOT re-checked per row — it became directory
    pruning), the residual predicate pushes into the pruned scan, and a query
    without the partition Eq is rejected as no-global-index."""
    import dataclasses

    from vector_store_spark.operators.ivf import ivf_build_local, ivf_search_local
    from vector_store_spark.types import Filter, Restriction

    q = det_query_vector(7, 64)
    path = str(tmp_path / "eng_ivf_loc")
    ivf_build_local(emb, "label", "vec_id", "embedding", path, k_centroids=4)
    meta = dataclasses.replace(
        _meta(), primary_key_columns=("label", "vec_id"), partition_key_count=1,
        partitioning=("label",), filtering_columns=("vec_id",),
    )
    eng = VectorStoreEngine()
    eng.register(emb, meta, strategy="ivf",
                 strategy_opts={"local_path": path, "nprobe": 2})
    out = eng.ann("ks", "t", "embedding", q, 5,
                  flt=Filter(restrictions=(Restriction.eq("label", 3),)))
    direct = ivf_search_local(
        spark, path, 3, "vec_id", "embedding", q, 5, nprobe=2,
        select_cols=["label", "vec_id"],
    ).collect()
    assert out.primary_keys["vec_id"] == [r.vec_id for r in direct]
    assert all(lb == 3 for lb in out.primary_keys["label"])

    # residual predicate composes with the sub-index scan
    out2 = eng.ann("ks", "t", "embedding", q, 5, flt=Filter(
        restrictions=(Restriction.eq("label", 3), Restriction.gte("vec_id", 100)),
        allow_filtering=True,
    ))
    assert all(v >= 100 for v in out2.primary_keys["vec_id"])
    assert all(lb == 3 for lb in out2.primary_keys["label"])

    # no partition Eq -> the local index cannot serve (planner outcome)
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", q, 5)


def test_routing_group_keys_on_target_column_list(spark):
    """R1 with multi-target metadata (RoutingGroupKey, indexes.rs:70-78):
    a query naming ANY member of the target_columns list routes to the
    index; scoring stays on the list head."""
    import numpy as np

    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.types import IndexMetadata

    dims = 8
    rows = [(i, [float((i * 7 + j) % 5) for j in range(dims)],
             [float((i * 3 + j) % 5) for j in range(dims)]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, emb array<float>, summary_emb array<float>")
    meta = IndexMetadata(
        keyspace="ks", index="mt", table="t", primary_key_columns=("vec_id",),
        partition_key_count=1, target_column="emb",
        target_columns=("emb", "summary_emb"), dimensions=dims,
    )
    eng = VectorStoreEngine()
    eng.register(df, meta, strategy="exact")
    q = [1.0] * dims
    via_head = eng.ann("ks", "t", "emb", q, limit=5)
    via_member = eng.ann("ks", "t", "summary_emb", q, limit=5)
    # same group, same scored column (the head): identical results
    assert via_head.primary_keys == via_member.primary_keys
    # an unrelated column does not route
    import pytest

    with pytest.raises(Exception):
        eng.ann("ks", "t", "nope", q, limit=5)


def test_engine_forwards_adaptive_guard(spark, emb, tmp_path):
    """The adaptive filtered guard is reachable from the engine surface:
    strategy_opts={'min_candidates': ...} forwards to the persisted
    ivf/lsh/hnsw search paths, so a selective restriction returns the
    EXACT filtered top-k through the full query lifecycle (route →
    validate → gate → top-k)."""
    import dataclasses

    from vector_store_spark.operators.hnsw import hnsw_build
    from vector_store_spark.operators.ivf import ivf_build
    from vector_store_spark.operators.lsh import lsh_build
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.types import Filter, Restriction, SpaceType

    q = det_query_vector(7, 64)
    ivf_path = str(tmp_path / "g_ivf")
    ivf_build(emb, "vec_id", "embedding", ivf_path, k_centroids=8)
    lsh_path = str(tmp_path / "g_lsh")
    lsh_build(emb, "vec_id", "embedding", lsh_path, num_bits=16, bands=4)
    h_path = str(tmp_path / "g_hnsw")
    hnsw_build(emb, "vec_id", "embedding", h_path, m=6, ef_construction=48,
               num_slices=2, payload_cols=["label"])

    # label IN (2,): ~1/8 of rows — under the floor, exact tier everywhere
    flt = Filter(restrictions=(Restriction.eq("label", 2),), allow_filtering=True)
    exact = [r.vec_id for r in ann_topk(
        emb.where("label = 2"), "embedding", q, 5, space=SpaceType.COSINE,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()]
    for strategy, opts in (
        ("ivf", {"path": ivf_path, "nprobe": 2, "min_candidates": 1000}),
        ("lsh", {"path": lsh_path, "min_candidates": 1000}),
        ("hnsw", {"path": h_path, "ef_search": 8, "min_candidates": 1000}),
    ):
        eng = VectorStoreEngine()
        eng.register(emb, _filtering_meta(), strategy=strategy, strategy_opts=opts)
        out = eng.ann("ks", "t", "embedding", q, 5, flt=flt)
        assert out.primary_keys["vec_id"] == exact, strategy


def test_engine_arms_guard_by_default(spark, emb):
    """A residual predicate surviving to a candidate-PRUNING strategy arms
    min_candidates=32·k in dispatch WITHOUT the caller passing it — the
    reference's restricted-search guarantee (usearch.rs:224-248) holds for
    bare engine callers, not just registry queries that know the knob."""
    import dataclasses

    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.types import Filter, Restriction, SpaceType

    q = det_query_vector(7, 64)
    flt = Filter(restrictions=(Restriction.eq("label", 2),), allow_filtering=True)

    exact_cos = [r.vec_id for r in ann_topk(
        emb.where("label = 2"), "embedding", q, 5, space=SpaceType.COSINE,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()]
    for strategy in ("ivf", "lsh"):
        eng = VectorStoreEngine()
        eng.register(emb, _filtering_meta(), strategy=strategy)  # NO opts
        out = eng.ann("ks", "t", "embedding", q, 5, flt=flt)
        assert out.primary_keys["vec_id"] == exact_cos, strategy

    exact_l2 = [r.vec_id for r in ann_topk(
        emb.where("label = 2"), "embedding", q, 5, space=SpaceType.EUCLIDEAN,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()]
    for strategy in ("ivfpq", "ivfpq_residual"):
        eng = VectorStoreEngine()
        meta = dataclasses.replace(
            _meta(SpaceType.EUCLIDEAN), filtering_columns=("label",))
        eng.register(emb, meta, strategy=strategy)  # NO opts
        out = eng.ann("ks", "t", "embedding", q, 5, flt=flt)
        assert out.primary_keys["vec_id"] == exact_l2, strategy


def test_engine_ivfpq_default_nprobe_is_ef_over_8(spark, emb):
    """The shipped IVF-PQ default must be the ≥0.9-recall configuration:
    dispatch maps expansion_search (64) ↦ nprobe 8 (ef/8 — double the flat
    IVF mapping, ADC distances are quantized), not the operator's nprobe=4."""
    from vector_store_spark.operators.ivfpq import ivfpq_topk

    q = det_query_vector(7, 64)
    eng = VectorStoreEngine()
    eng.register(emb, _meta(SpaceType.EUCLIDEAN), strategy="ivfpq")
    got = eng.ann("ks", "t", "embedding", q, 5)
    want = [r.vec_id for r in ivfpq_topk(
        emb, "vec_id", "embedding", q, 5, nprobe=8, select_cols=["vec_id"],
    ).collect()]
    assert got.primary_keys["vec_id"] == want


def test_serving_cache_parity_with_spark_path(spark, emb):
    """The RAM-resident serving snapshot (engine.ServingCache, the usearch
    in-RAM posture) must match the Spark path within the engine's OWN
    reproducibility envelope: the Arrow GEMM scorer's unrounded distances
    are already batch-layout-dependent in the last ulp (BLAS matvec isn't
    split-invariant), so the pinned contract is identical ranking
    (primary keys, in order) and identical values at the oracle's 6-dp
    rounding — across every supported space. Hamming (expression path) IS
    bit-exact."""
    for space in (SpaceType.COSINE, SpaceType.EUCLIDEAN,
                  SpaceType.DOT_PRODUCT, SpaceType.HAMMING):
        eng = VectorStoreEngine()
        eng.register(emb, _meta(space), strategy="exact")
        for seed in (3, 7, 11, 29):
            q = det_query_vector(seed, 64)
            want = eng.ann("ks", "t", "embedding", q, 10)
            cache = eng.enable_serving_cache("ks", f"ix_{space.value}")
            phases: dict = {}
            got = eng.ann("ks", "t", "embedding", q, 10, phases=phases)
            assert phases["path"] == "cache"
            assert got.primary_keys == want.primary_keys, space
            for g, w in zip(got.distances, want.distances):
                assert round(g, 6) == round(w, 6), space
                assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), space
            for g, w in zip(got.similarity_scores, want.similarity_scores):
                assert round(g, 6) == round(w, 6), space
            if space == SpaceType.HAMMING:
                assert got.distances == want.distances  # bit-exact fold
            eng.disable_serving_cache(f"ix_{space.value}")
            assert cache.nbytes > 0


def test_serving_cache_guards_and_rearm(spark, emb):
    from vector_store_spark.operators.admission import AdmissionError
    from vector_store_spark.types import Filter, Restriction

    eng = VectorStoreEngine()
    meta = IndexMetadata(
        keyspace="ks", index="ix_cache", table="t",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64, kind=IndexKind.VECTOR,
        space_type=SpaceType.COSINE, filtering_columns=("label",),
    )
    eng.register(emb, meta, strategy="exact")
    # memory admission: an over-limit snapshot is refused loudly
    with pytest.raises(AdmissionError):
        eng.enable_serving_cache("ks", "ix_cache", memory_limit_bytes=16)
    assert "ix_cache" not in eng.serving_caches
    eng.enable_serving_cache("ks", "ix_cache")
    q = det_query_vector(5, 64)
    # dimension mismatch raises the SAME FilterError through the fast path
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", [1.0, 2.0], 3)
    # a restricted request is served from RAM too (r17 — the reference's
    # restricted search is RAM-resident, usearch.rs:1108-1154), with
    # identical results to the Spark path at the engine's 6-dp envelope
    flt = Filter(restrictions=(Restriction.eq("label", 1),),
                 allow_filtering=True)
    phases: dict = {}
    got_f = eng.ann("ks", "t", "embedding", q, 3, flt=flt, phases=phases)
    assert phases["path"] == "cache"
    eng.disable_serving_cache("ix_cache")
    want_f = eng.ann("ks", "t", "embedding", q, 3, flt=flt)
    assert got_f.primary_keys == want_f.primary_keys
    for g, w in zip(got_f.distances, want_f.distances):
        assert round(g, 6) == round(w, 6)
    eng.enable_serving_cache("ks", "ix_cache")
    # ALLOW FILTERING still gated on the cache path (same 400 mapping)
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", q, 3,
                flt=Filter(restrictions=(Restriction.eq("label", 1),)))
    # CRUD swap: registering a NEW frame re-arms the snapshot transparently
    half = emb.limit(100)
    eng.register(half, meta, strategy="exact")
    got = eng.ann("ks", "t", "embedding", q, 3)
    want_ids = {r.vec_id for r in half.select("vec_id").collect()}
    assert set(got.primary_keys["vec_id"]) <= want_ids
    # non-exact strategies refuse to arm
    eng.register(emb, _meta(SpaceType.COSINE), strategy="lsh")
    with pytest.raises(ValueError):
        eng.enable_serving_cache("ks", "ix_cosine")


def _hnsw_cache_meta():
    return IndexMetadata(
        keyspace="ks", index="ix_hnsw_cache", table="t",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64, kind=IndexKind.VECTOR,
        space_type=SpaceType.COSINE,
    )


def test_hnsw_serving_cache_parity_and_crud_rearm(spark, emb, tmp_path):
    """HnswServingCache (the usearch graph-in-RAM posture) must match the
    Spark hnsw path the way test_serving_cache_parity pins exact: identical
    ranking and identical values at 6-dp — guaranteed structurally, since
    both paths run operators/hnsw._search_prepped on the same decoded
    slices. Also pins the in-place-CRUD staleness contract: hnsw_upsert
    rewrites slice files, which must flip the layout fingerprint and
    re-arm the snapshot on the next request."""
    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_upsert

    path = str(tmp_path / "g_cache")
    hnsw_build(emb, "vec_id", "embedding", path, m=8, ef_construction=64,
               num_slices=2, payload_cols=["label"])
    eng = VectorStoreEngine()
    eng.register(emb, _hnsw_cache_meta(), strategy="hnsw",
                 strategy_opts={"path": path, "ef_search": 128, "round_to": 6})
    q = det_query_vector(7, 64)
    want = eng.ann("ks", "t", "embedding", q, 10)
    cache = eng.enable_serving_cache("ks", "ix_hnsw_cache")
    assert cache.nbytes > 0
    phases: dict = {}
    got = eng.ann("ks", "t", "embedding", q, 10, phases=phases)
    assert phases["path"] == "cache"
    assert got.primary_keys == want.primary_keys
    for g, w in zip(got.distances, want.distances):
        assert round(g, 6) == round(w, 6)
    for g, w in zip(got.similarity_scores, want.similarity_scores):
        assert round(g, 6) == round(w, 6)
    # dimension mismatch raises the SAME FilterError through the fast path
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", [1.0, 2.0], 3)

    # in-place CRUD: remove the current best id, upsert one new vector —
    # no df swap, only the persisted layout changes
    best = got.primary_keys["vec_id"][0]
    new = spark.createDataFrame(
        [(999001, det_query_vector(7, 64), 5)],
        "vec_id long, embedding array<float>, label int")
    hnsw_upsert(spark, path, items=new, ids_removed=[best])
    got2 = eng.ann("ks", "t", "embedding", q, 10, phases=(p2 := {}))
    assert p2["path"] == "cache"  # re-armed, still served from RAM
    assert best not in got2.primary_keys["vec_id"]
    assert 999001 in got2.primary_keys["vec_id"]  # dup of q's neighborhood
    eng.disable_serving_cache("ix_hnsw_cache")
    want2 = eng.ann("ks", "t", "embedding", q, 10)
    assert got2.primary_keys == want2.primary_keys
    for g, w in zip(got2.distances, want2.distances):
        assert round(g, 6) == round(w, 6)


def test_hnsw_serving_cache_refuses_rescore_and_local(emb, tmp_path, spark):
    """Configs the snapshot cannot replicate are refused at arm time, never
    half-armed: rescore re-reads original vectors from the base table, and
    local layouts serve per-partition Eq requests the cache path declines."""
    from vector_store_spark.operators.hnsw import hnsw_build

    path = str(tmp_path / "g_resc")
    hnsw_build(emb, "vec_id", "embedding", path, m=6, ef_construction=48,
               num_slices=2, payload_cols=["label"])
    eng = VectorStoreEngine()
    eng.register(emb, _hnsw_cache_meta(), strategy="hnsw",
                 strategy_opts={"path": path, "rescore": 4,
                                "rescore_with": (emb, "embedding")})
    with pytest.raises(ValueError, match="rescore"):
        eng.enable_serving_cache("ks", "ix_hnsw_cache")
    lpath = str(tmp_path / "g_local")
    hnsw_build(emb, "vec_id", "embedding", lpath, m=6, ef_construction=48,
               part_col="label", payload_cols=["label"])
    eng2 = VectorStoreEngine()
    eng2.register(emb, _hnsw_cache_meta(), strategy="hnsw",
                  strategy_opts={"path": lpath})
    with pytest.raises(ValueError, match="local"):
        eng2.enable_serving_cache("ks", "ix_hnsw_cache")


def test_hnsw_serving_cache_filtered_parity(spark, emb, tmp_path):
    """Restricted requests through the GRAPH snapshot: the payload rides in
    RAM, the predicate is evaluated by the Catalyst-parity Python
    evaluator, and the count-then-tier adaptive guard replicates
    hnsw_search's arithmetic — exhaustive tier at/under the floor, widened
    beam above it. Results must match the Spark hnsw path at 6-dp."""
    from vector_store_spark.operators.hnsw import hnsw_build
    from vector_store_spark.types import Filter, Restriction

    path = str(tmp_path / "g_filt")
    hnsw_build(emb, "vec_id", "embedding", path, m=8, ef_construction=64,
               num_slices=2, payload_cols=["label"])
    eng = VectorStoreEngine()
    meta = IndexMetadata(
        keyspace="ks", index="ix_hnsw_cache", table="t",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64, kind=IndexKind.VECTOR,
        space_type=SpaceType.COSINE, filtering_columns=("label",),
    )
    eng.register(emb, meta, strategy="hnsw",
                 strategy_opts={"path": path, "ef_search": 256,
                                "round_to": 6})
    q = det_query_vector(7, 64)
    for flt in (
        # selective filter -> exhaustive tier (n_filtered <= 32k floor)
        Filter(restrictions=(Restriction.eq("label", 3),),
               allow_filtering=True),
        # broad filter -> widened-beam tier
        Filter(restrictions=(Restriction.gte("label", 1),),
               allow_filtering=True),
    ):
        want = eng.ann("ks", "t", "embedding", q, 10, flt=flt)
        eng.enable_serving_cache("ks", "ix_hnsw_cache")
        phases: dict = {}
        got = eng.ann("ks", "t", "embedding", q, 10, flt=flt, phases=phases)
        assert phases["path"] == "cache"
        assert got.primary_keys == want.primary_keys, flt
        for g, w in zip(got.distances, want.distances):
            assert round(g, 6) == round(w, 6)
        eng.disable_serving_cache("ix_hnsw_cache")
