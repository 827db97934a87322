"""Local-index storage: partitionBy layout, Catalyst partition pruning of
consumed Eq restrictions (R4), dynamic-overwrite partition lifecycle (W4),
and identical ANN results through the persisted index."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.registry import det_query_vector
from vector_store_spark.sources.index_store import (
    prune_report,
    read_index,
    write_local_index,
)


@pytest.fixture(scope="module")
def local_index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ix") / "emb_by_label")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    write_local_index(emb, path, ["label"])
    return path


def test_partition_pruning_of_consumed_eq(spark, local_index_path):
    ix = read_index(spark, local_index_path)
    q = det_query_vector(7, 64)
    topk = ann_topk(
        ix.where(F.col("label") == 3), "embedding", q, 5,
        tie_break=["vec_id"], select_cols=["vec_id", "label"],
    )
    rep = prune_report(topk)
    # the Eq restriction must reach the scan as a PARTITION filter
    assert any("label" in s for s in rep["partition_filters"]), rep["partition_filters"]
    rows = topk.collect()
    assert rows and all(r.label == 3 for r in rows)


def test_persisted_index_matches_source_ann(spark, sf_dir, local_index_path):
    q = det_query_vector(13, 64)
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ix = read_index(spark, local_index_path)
    a = ann_topk(src, "embedding", q, 10, tie_break=["vec_id"],
                 select_cols=["vec_id"], round_to=6).collect()
    b = ann_topk(ix, "embedding", q, 10, tie_break=["vec_id"],
                 select_cols=["vec_id"], round_to=6).collect()
    assert [(r.vec_id, r.distance) for r in a] == [(r.vec_id, r.distance) for r in b]


def test_dynamic_overwrite_partition_lifecycle(spark, tmp_path):
    path = str(tmp_path / "ix")
    df1 = spark.createDataFrame(
        [(1, "p1", [1.0, 0.0]), (2, "p2", [0.0, 1.0])], ["id", "pk", "v"]
    )
    write_local_index(df1, path, ["pk"])
    assert {r.pk for r in read_index(spark, path).collect()} == {"p1", "p2"}
    # rewrite only p1 (p2's directory untouched), then p1 with new content
    df2 = spark.createDataFrame([(3, "p1", [0.5, 0.5])], ["id", "pk", "v"])
    write_local_index(df2, path, ["pk"])
    got = {(r.id, r.pk) for r in read_index(spark, path).collect()}
    assert got == {(3, "p1"), (2, "p2")}
