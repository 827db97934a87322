"""Wire-format tests: every restriction tag, request validation failure modes
(mirrors httproutes.rs:1586-1800 conversion tests), response pivot + ±inf
saturation, and an end-to-end request -> engine -> JSON round trip plus the
CDC-maintained-index -> ANN integration (the reference's core loop)."""

import json
import math

import pytest

from vector_store_spark.api import (
    F32_MAX,
    parse_ann_request,
    parse_filter,
    parse_restriction,
    response_to_json,
    saturate_wire,
)
from vector_store_spark.engine import AnnResponse
from vector_store_spark.plans.restrictions import FilterError
from vector_store_spark.types import RestrictionOp


def test_every_single_column_tag():
    assert parse_restriction({"==": ["a", 1]}).op == RestrictionOp.EQ
    r = parse_restriction({"IN": ["a", [1, 2]]})
    assert r.op == RestrictionOp.IN and r.values == (1, 2)
    assert parse_restriction({"<": ["a", 1]}).op == RestrictionOp.LT
    assert parse_restriction({"<=": ["a", 1]}).op == RestrictionOp.LTE
    assert parse_restriction({">": ["a", 1]}).op == RestrictionOp.GT
    assert parse_restriction({">=": ["a", 1]}).op == RestrictionOp.GTE


def test_every_tuple_tag():
    assert parse_restriction({"()==()": [["a", "b"], [1, 2]]}).op == RestrictionOp.EQ_TUPLE
    r = parse_restriction({"()IN()": [["a", "b"], [[1, 2], [3, 4]]]})
    assert r.op == RestrictionOp.IN_TUPLE and r.values == ((1, 2), (3, 4))
    assert parse_restriction({"()<()": [["a", "b"], [1, 2]]}).op == RestrictionOp.LT_TUPLE
    assert parse_restriction({"()<=()": [["a", "b"], [1, 2]]}).op == RestrictionOp.LTE_TUPLE
    assert parse_restriction({"()>()": [["a", "b"], [1, 2]]}).op == RestrictionOp.GT_TUPLE
    assert parse_restriction({"()>=()": [["a", "b"], [1, 2]]}).op == RestrictionOp.GTE_TUPLE


@pytest.mark.parametrize(
    "bad",
    [
        {"~=": ["a", 1]},                      # unknown tag
        {"==": ["a"]},                          # not [lhs, rhs]
        {"==": [1, 2]},                         # lhs not a column name
        {"IN": ["a", 3]},                       # IN without list
        {"()==()": [["a", "b"], [1]]},          # tuple arity mismatch (P4)
        {"()IN()": [["a", "b"], [[1, 2], [3]]]},  # arity inside IN list
    ],
)
def test_conversion_failures(bad):
    with pytest.raises(FilterError):
        parse_restriction(bad)


def test_parse_request_defaults_and_validation():
    v, k, flt = parse_ann_request(json.dumps({"vector": [1.0, 2.0]}))
    assert v == [1.0, 2.0] and k == 1 and flt.restrictions == ()
    v, k, flt = parse_ann_request(
        {"vector": [1], "limit": 5,
         "filter": {"restrictions": [{"==": ["a", 1]}], "allow_filtering": True}}
    )
    assert k == 5 and flt.allow_filtering and len(flt.restrictions) == 1
    with pytest.raises(FilterError):
        parse_ann_request({"vector": []})
    with pytest.raises(FilterError):
        parse_ann_request({"vector": [1.0], "limit": 0})  # NonZero (lib.rs:499)


def test_saturation():
    assert saturate_wire(math.inf) == F32_MAX
    assert saturate_wire(-math.inf) == -F32_MAX
    assert saturate_wire(1.5) == 1.5 and saturate_wire(None) is None
    out = json.loads(response_to_json(AnnResponse(
        primary_keys={"id": [1]}, distances=[-math.inf], similarity_scores=[math.inf]
    )))
    assert out["distances"] == [-F32_MAX]
    assert out["similarity_scores"] == [F32_MAX]


def test_request_to_engine_to_json_roundtrip(spark):
    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.types import IndexKind, IndexMetadata

    df = spark.createDataFrame(
        [(1, 1, [1.0, 0.0]), (1, 2, [0.6, 0.8]), (2, 1, [0.0, 1.0])],
        ["pk", "ck", "v"],
    )
    eng = VectorStoreEngine()
    eng.register(df, IndexMetadata(
        keyspace="ks", index="ix", table="t", primary_key_columns=("pk", "ck"),
        partition_key_count=1, target_column="v", dimensions=2,
        kind=IndexKind.VECTOR,
    ))
    # a global index cannot consume the pk Eq -> the wire request must carry
    # allow_filtering (the reference's rejection matrix, httproutes.rs:751-758)
    with pytest.raises(FilterError):
        eng.ann("ks", "t", "v", [1.0, 0.0], 2, parse_filter(
            {"restrictions": [{"==": ["pk", 1]}], "allow_filtering": False}))
    vec, k, flt = parse_ann_request(
        {"vector": [1.0, 0.0], "limit": 2,
         "filter": {"restrictions": [{"==": ["pk", 1]}], "allow_filtering": True}}
    )
    out = json.loads(response_to_json(eng.ann("ks", "t", "v", vec, k, flt)))
    assert out["primary_keys"]["pk"] == [1, 1]
    assert out["primary_keys"]["ck"] == [1, 2]
    assert out["distances"][0] < out["distances"][1]
    assert out["similarity_scores"][0] > out["similarity_scores"][1]


def test_cdc_maintained_index_answers_ann(spark, tmp_path):
    """The reference's core loop end-to-end: CDC events -> LWW snapshot ->
    live view -> ANN query reflects upserts, updates, and deletes."""
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.streaming.cdc import CdcSnapshotSink
    import pyarrow as pa
    import pyarrow.parquet as pq

    src, snap, ckpt = tmp_path / "src", tmp_path / "snap", tmp_path / "ckpt"
    src.mkdir()

    def emit(name, rows):
        cols = list(zip(*rows))
        pq.write_table(pa.table({
            "id": pa.array(cols[0], "int64"),
            "v": pa.array(cols[1], pa.list_(pa.float64())),
            "ts": pa.array(cols[2], "int64"),
            "seq": pa.array(cols[3], "int64"),
            "op": pa.array(cols[4], "string"),
        }), str(src / name))

    sink = CdcSnapshotSink(spark, str(snap), ["id"], ["v"], num_buckets=4)
    stream = lambda: spark.readStream.schema(
        "id long, v array<double>, ts long, seq long, op string"
    ).parquet(str(src))

    emit("b1.parquet", [
        (1, [1.0, 0.0], 100, 1, "upsert"),
        (2, [0.0, 1.0], 100, 2, "upsert"),
        (3, [0.9, 0.1], 100, 3, "upsert"),
    ])
    sink.start(stream(), str(ckpt)).awaitTermination(120)
    top = ann_topk(sink.live_view("v"), "v", [1.0, 0.0], 1, tie_break=["id"]).first()
    assert top.id == 1

    # delete the best match + move id=2 toward the query; late stale write ignored
    emit("b2.parquet", [
        (1, None, 200, 4, "delete"),
        (2, [0.99, 0.01], 200, 5, "upsert"),
        (3, [0.0, 0.0], 50, 6, "upsert"),  # stale: ts 50 < 100
    ])
    sink.start(stream(), str(ckpt)).awaitTermination(120)
    rows = ann_topk(sink.live_view("v"), "v", [1.0, 0.0], 2, tie_break=["id"]).collect()
    assert [r.id for r in rows] == [2, 3]
    assert rows[1].v == [0.9, 0.1]  # stale write did not clobber


def test_admin_surface_matches_reference_routes(spark):
    """The non-query routes (httproutes.rs): /indexes listing, per-index
    describe (the full CREATE INDEX option set), per-index status
    (state + live count + build progress), /info, and /status (node enum
    with the two bootstrap phases folded, httproutes.rs:1497-1530)."""
    from vector_store_spark.api import info_response, node_status_wire
    from vector_store_spark.engine import VectorStoreEngine
    from vector_store_spark.plans.catalog import NodeStatus
    from vector_store_spark.types import IndexMetadata, IndexStatus

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(7)],
        "vec_id long, emb array<float>")
    eng = VectorStoreEngine()
    meta = IndexMetadata(
        keyspace="ks", index="ix1", table="t", primary_key_columns=("vec_id",),
        partition_key_count=1, target_column="emb", dimensions=2,
        filtering_columns=("lbl",), version="v2",
    )
    eng.register(df, meta, strategy="exact")
    assert eng.list_indexes() == [{
        "keyspace": "ks", "index": "ix1", "table": "t",
        "target_columns": ["emb"],
    }]
    desc = eng.describe_index("ks", "ix1")
    assert desc["dimensions"] == 2 and desc["version"] == "v2"
    assert desc["space_type"] == "cosine" and desc["filtering_columns"] == ["lbl"]
    st = eng.index_status("ks", "ix1")
    assert st == {"status": "SERVING", "count": 7, "build_progress": 100.0}
    # a bootstrapping index reports its scan progress, not 100
    meta2 = IndexMetadata(
        keyspace="ks", index="ix2", table="t", primary_key_columns=("vec_id",),
        partition_key_count=1, target_column="emb", dimensions=2,
    )
    eng.register(df, meta2, status=IndexStatus.FULL_SCANNING)
    eng.indexes["ix2"].state.scan_progress_pct = 42.5
    assert eng.index_status("ks", "ix2")["build_progress"] == 42.5
    assert eng.index_status("ks", "ix2")["status"] == "FULL_SCANNING"
    with pytest.raises(KeyError):
        eng.describe_index("ks", "nope")  # 404

    info = info_response()
    assert info["service"] == "vector-store-spark" and "engine" in info
    assert node_status_wire(NodeStatus.DISCOVERING_INDEXES) == "BOOTSTRAPPING"
    assert node_status_wire(NodeStatus.INDEXING_EMBEDDINGS) == "BOOTSTRAPPING"
    assert node_status_wire(NodeStatus.SERVING) == "SERVING"
