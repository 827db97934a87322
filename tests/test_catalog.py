"""Catalog discovery diff (S7/R5), bootstrap state machine + 503 gating (W7),
scan progress promotion (A4), lag metrics (W5)."""

import pytest

from vector_store_spark.plans.catalog import (
    CatalogDiff,
    IndexingLagMetrics,
    NodeState,
    NodeStatus,
    NotServingError,
    ScanProgress,
    catalog_df,
    check_index_serving,
    diff_catalog,
)
from vector_store_spark.types import IndexKind, IndexMetadata, IndexState, IndexStatus


def meta(name, version="v1"):
    return IndexMetadata(
        keyspace="ks", index=name, table="t", primary_key_columns=("id",),
        partition_key_count=1, target_column="v", dimensions=4, version=version,
        kind=IndexKind.VECTOR,
    )


def test_diff_add_remove_rebuild(spark):
    active = catalog_df(spark, [meta("a"), meta("b"), meta("c", version="v1")])
    discovered = catalog_df(spark, [meta("b"), meta("c", version="v2"), meta("d")])
    d = diff_catalog(discovered, active)
    assert d.to_add == [("ks", "d")]
    assert d.to_remove == [("ks", "a")]
    assert d.to_rebuild == [("ks", "c")]


def test_diff_empty_catalogs(spark):
    empty = catalog_df(spark, [])
    full = catalog_df(spark, [meta("a")])
    assert diff_catalog(full, empty).to_add == [("ks", "a")]
    assert diff_catalog(empty, full).to_remove == [("ks", "a")]


def test_node_state_machine_forward_only():
    n = NodeState()
    with pytest.raises(NotServingError) as ei:
        n.check_serving()
    assert ei.value.code == "NODE_BOOTSTRAPPING"
    n.advance(NodeStatus.CONNECTING_TO_DB)
    n.advance(NodeStatus.SERVING)
    n.check_serving()  # no raise
    with pytest.raises(ValueError):
        n.advance(NodeStatus.DISCOVERING_INDEXES)


def test_index_gate_carries_progress():
    st = IndexState(meta("a"), IndexStatus.FULL_SCANNING, scan_progress_pct=42.5)
    with pytest.raises(NotServingError) as ei:
        check_index_serving(st)
    assert ei.value.code == "INDEX_BUILDING"
    assert ei.value.progress_pct == 42.5


def test_scan_progress_promotes_to_serving():
    st = IndexState(meta("a"), IndexStatus.FULL_SCANNING)
    p = ScanProgress(total=200)
    p.record(50)
    p.apply_to(st)
    assert st.scan_progress_pct == 25.0 and st.status == IndexStatus.FULL_SCANNING
    p.record(150)
    p.apply_to(st)
    assert st.status == IndexStatus.SERVING and st.scan_progress_pct == 100.0


def test_lag_metrics_summary():
    m = IndexingLagMetrics()
    for dur, rows in [(120.0, 10), (80.0, 5), (200.0, 20)]:
        m.on_progress({"batchDuration": dur, "numInputRows": rows})
    s = m.summary()
    assert s == {"batches": 3, "rows": 35, "p50_ms": 120.0, "max_ms": 200.0}
    assert m.listener() is not None


def test_catalog_round_trips_full_option_set(spark):
    """CREATE INDEX-shaped registrations round-trip through the catalog with
    the FULL vector option set (lib.rs:594-601), including the graph-ANN
    knobs (connectivity/expansion_add/expansion_search, usearch.rs:74-92)
    that the Spark engines accept-and-record rather than drop."""
    from vector_store_spark.plans.catalog import metas_from_catalog
    from vector_store_spark.types import Quantization, SpaceType

    m = IndexMetadata(
        keyspace="ks", index="opts_ix", table="t", primary_key_columns=(),
        partition_key_count=0, target_column="emb", dimensions=128,
        version="v3", kind=IndexKind.VECTOR, space_type=SpaceType.EUCLIDEAN,
        quantization=Quantization.I8,
        connectivity=32, expansion_add=256, expansion_search=96,
    )
    df = catalog_df(spark, [m])
    row = df.first()
    assert (row.connectivity, row.expansion_add, row.expansion_search) == (32, 256, 96)
    assert (row.dimensions, row.space_type, row.quantization) == (128, "euclidean", "i8")
    (back,) = metas_from_catalog(df)
    assert back == m
    # and a second round-trip is a fixed point
    assert metas_from_catalog(catalog_df(spark, [back])) == [back]


def test_expansion_search_maps_to_probe_breadth(spark, sf_dir):
    """SURVEY §2.9 graph-ANN mapping: expansion_search (ef-search) drives the
    IVF probe width when no explicit nprobe strategy_opt is given. ef large
    enough to cover every centroid ⇒ full probe ⇒ the approximate answer
    degrades gracefully to the exact one."""
    import dataclasses

    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.registry import det_query_vector
    from vector_store_spark.types import SpaceType

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = det_query_vector(7, 64)
    base = IndexMetadata(
        keyspace="ks", index="ef_ix", table="t", primary_key_columns=("vec_id",),
        partition_key_count=1, target_column="embedding", dimensions=64,
        kind=IndexKind.VECTOR, space_type=SpaceType.COSINE,
    )
    # ef=16*16=256 -> nprobe 16 = k_centroids: full probe == exact
    eng = VectorStoreEngine()
    eng.register(emb, dataclasses.replace(base, expansion_search=256),
                 strategy="ivf", strategy_opts={"k_centroids": 16})
    got = eng.ann("ks", "t", "embedding", q, 5)
    brute = ann_topk(
        emb, "embedding", q, 5, space=SpaceType.COSINE,
        tie_break=["vec_id"], select_cols=["vec_id"],
    ).collect()
    assert got.primary_keys["vec_id"] == [r.vec_id for r in brute]
    # an explicit nprobe strategy_opt wins over the mapped ef value
    eng2 = VectorStoreEngine()
    eng2.register(emb, dataclasses.replace(base, expansion_search=16),
                  strategy="ivf", strategy_opts={"k_centroids": 16, "nprobe": 16})
    got2 = eng2.ann("ks", "t", "embedding", q, 5)
    assert got2.primary_keys["vec_id"] == [r.vec_id for r in brute]


def test_catalog_round_trips_multi_target_columns(spark):
    """The reference's target_columns is a non-empty LIST (lib.rs:638): head
    = the scored column, tail = additionally-indexed columns. A two-target
    registration round-trips through the catalog, and the list head is
    pinned to target_column."""
    import pytest

    from vector_store_spark.plans.catalog import metas_from_catalog

    m = IndexMetadata(
        keyspace="ks", index="mt_ix", table="t", primary_key_columns=(),
        partition_key_count=0, target_column="emb",
        target_columns=("emb", "summary_emb"), dimensions=64,
    )
    df = catalog_df(spark, [m])
    assert df.first().target_columns == ["emb", "summary_emb"]
    (back,) = metas_from_catalog(df)
    assert back == m
    assert back.all_target_columns == ("emb", "summary_emb")
    assert metas_from_catalog(catalog_df(spark, [back])) == [back]
    # a list whose head is not the scored column is rejected
    bad = IndexMetadata(
        keyspace="ks", index="bad", table="t", primary_key_columns=(),
        partition_key_count=0, target_column="emb",
        target_columns=("other", "emb"),
    )
    with pytest.raises(ValueError, match="list head"):
        bad.all_target_columns
