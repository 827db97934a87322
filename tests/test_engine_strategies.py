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


def test_strategy_space_mismatch_rejected(emb):
    eng = VectorStoreEngine()
    eng.register(emb, _meta(SpaceType.EUCLIDEAN), strategy="lsh")
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "embedding", det_query_vector(7, 64), 5)


def test_unknown_strategy_rejected(emb):
    eng = VectorStoreEngine()
    with pytest.raises(ValueError):
        eng.register(emb, _meta(), strategy="hnsw")
