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
