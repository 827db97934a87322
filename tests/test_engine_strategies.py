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
        eng.register(emb, _meta(), strategy="hnsw")


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


def test_engine_persisted_rejects_residual_filter(spark, emb, tmp_path):
    from vector_store_spark.operators.ivf import ivf_build
    from vector_store_spark.types import Filter, Restriction

    path = str(tmp_path / "eng_ivf2")
    ivf_build(emb, "vec_id", "embedding", path, k_centroids=8)
    eng = VectorStoreEngine()
    meta = _meta()
    eng.register(emb, meta, strategy="ivf", strategy_opts={"path": path})
    import dataclasses

    meta2 = dataclasses.replace(meta, filtering_columns=("label",))
    eng.indexes[meta.index].state.metadata = meta2
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5,
                flt=Filter(restrictions=(Restriction.eq("label", 1),)))
