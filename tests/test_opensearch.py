"""OpenSearch backend adapter (vs_index/opensearch.rs re-expression):
wire-format parity of the request builders / response parsers, the emulator's
REST contract, and the engine's "opensearch" strategy end-to-end."""

import math

import numpy as np
import pytest

from vector_store_spark.engine import VectorStoreEngine
from vector_store_spark.plans.restrictions import FilterError
from vector_store_spark.registry import det_query_vector
from vector_store_spark.sources.opensearch import (
    OpenSearchEmulator,
    add_vector_request,
    ann_search_request,
    bulk_bodies,
    count_request,
    create_index_request,
    opensearch_score,
    parse_ann_response,
    parse_count_response,
    remove_vector_request,
    space_type_name,
)
from vector_store_spark.types import Filter, IndexMetadata, Restriction, SpaceType


# -- wire-format parity (opensearch.rs literal JSON shapes) -----------------

def test_space_type_names():
    # opensearch.rs:78-87
    assert space_type_name(SpaceType.EUCLIDEAN) == "l2"
    assert space_type_name(SpaceType.COSINE) == "cosinesimil"
    assert space_type_name(SpaceType.DOT_PRODUCT) == "innerproduct"
    with pytest.raises(NotImplementedError):
        space_type_name(SpaceType.HAMMING)


def test_create_index_body_shape_and_defaults():
    # opensearch.rs:164-196: zero options fall back to ef_search=100,
    # ef_construction=100, m=16
    method, path, body = create_index_request("ks.ix", 64)
    assert (method, path) == ("PUT", "/ks.ix")
    assert body["settings"] == {"index.knn": True}
    vec = body["mappings"]["properties"]["vector"]
    assert vec["type"] == "knn_vector" and vec["dimension"] == 64
    assert vec["method"]["name"] == "hnsw"
    assert vec["method"]["space_type"] == "cosinesimil"
    assert vec["method"]["parameters"] == {
        "ef_search": 100, "ef_construction": 100, "m": 16,
    }
    # explicit options pass through 1:1
    _, _, body = create_index_request(
        "ix", 32, connectivity=24, expansion_add=200, expansion_search=150,
        space=SpaceType.EUCLIDEAN,
    )
    assert body["mappings"]["properties"]["vector"]["method"]["parameters"] == {
        "ef_search": 150, "ef_construction": 200, "m": 24,
    }


def test_doc_and_search_request_shapes():
    assert add_vector_request("ix", 7, [1.0, 2.0]) == (
        "PUT", "/ix/_doc/7", {"vector": [1.0, 2.0]})
    assert remove_vector_request("ix", 7) == ("DELETE", "/ix/_doc/7", None)
    m, p, b = ann_search_request("ix", [0.5, 0.5], 10)
    assert (m, p) == ("POST", "/ix/_search")
    assert b == {"query": {"knn": {"vector": {"vector": [0.5, 0.5], "k": 10}}}}
    assert count_request("ix") == ("GET", "/ix/_count", None)


def test_parse_ann_response_verbatim_score_and_ranges():
    body = {"hits": {"hits": [{"_id": "3", "_score": 0.75},
                              {"_id": "1", "_score": 0.5}]}}
    # the _score IS the distance (opensearch.rs:434-446)
    assert parse_ann_response(body, SpaceType.COSINE, 4) == [(3, 0.75), (1, 0.5)]
    # Distance::try_from range checks (distance.rs:61-105)
    bad = {"hits": {"hits": [{"_id": "1", "_score": 2.5}]}}
    with pytest.raises(ValueError):
        parse_ann_response(bad, SpaceType.COSINE, 4)
    neg = {"hits": {"hits": [{"_id": "1", "_score": -0.1}]}}
    with pytest.raises(ValueError):
        parse_ann_response(neg, SpaceType.EUCLIDEAN, 4)
    nan = {"hits": {"hits": [{"_id": "1", "_score": float("nan")}]}}
    with pytest.raises(ValueError):
        parse_ann_response(nan, SpaceType.DOT_PRODUCT, 4)
    with pytest.raises(ValueError):
        parse_ann_response({"hits": {}}, SpaceType.COSINE, 4)


def test_parse_count_degrades_to_zero():
    # opensearch.rs:466-493: malformed count bodies answer 0
    assert parse_count_response({"count": 5}) == 5
    assert parse_count_response({}) == 0
    assert parse_count_response({"count": "x"}) == 0


def test_published_score_formulas():
    q = np.array([1.0, 0.0]); v = np.array([0.0, 1.0])
    assert opensearch_score(SpaceType.EUCLIDEAN, q, v) == pytest.approx(1 / 3)
    assert opensearch_score(SpaceType.COSINE, q, v) == pytest.approx(0.5)
    assert opensearch_score(SpaceType.COSINE, q, q) == pytest.approx(1.0)
    assert opensearch_score(SpaceType.DOT_PRODUCT, q, 2 * q) == pytest.approx(3.0)
    assert opensearch_score(SpaceType.DOT_PRODUCT, q, -2 * q) == pytest.approx(1 / 3)


# -- emulator REST contract ---------------------------------------------------

def _client(dims=2, space=SpaceType.COSINE):
    c = OpenSearchEmulator()
    m, p, b = create_index_request("ix", dims, space=space)
    status, resp = c.request(m, p, b)
    assert status == 200 and resp["acknowledged"] is True
    return c


def test_emulator_create_rejects_duplicate_and_bad_mapping():
    c = _client()
    m, p, b = create_index_request("ix", 2)
    status, resp = c.request(m, p, b)
    assert status == 400
    assert resp["error"]["type"] == "resource_already_exists_exception"
    status, resp = c.request("PUT", "/other", {"settings": {}})
    assert status == 400 and resp["error"]["type"] == "mapper_parsing_exception"


def test_emulator_doc_lifecycle_and_count():
    c = _client()
    assert c.request(*add_vector_request("ix", 1, [1.0, 0.0]))[1]["result"] == "created"
    assert c.request(*add_vector_request("ix", 1, [0.0, 1.0]))[1]["result"] == "updated"
    status, resp = c.request("PUT", "/ix/_doc/2", {"vector": [1.0, 2.0, 3.0]})
    assert status == 400  # wrong dimension
    m, p, _ = count_request("ix")
    assert parse_count_response(c.request(m, p)[1]) == 1
    assert c.request(*remove_vector_request("ix", 1))[1]["result"] == "deleted"
    assert c.request(*remove_vector_request("ix", 1))[0] == 404
    assert parse_count_response(c.request(m, p)[1]) == 0
    assert c.request("GET", "/missing/_count")[0] == 404


def test_emulator_search_order_and_tiebreak():
    c = _client()
    for pid, vec in [(10, [1.0, 0.0]), (2, [0.0, 1.0]), (5, [1.0, 0.0])]:
        c.request(*add_vector_request("ix", pid, vec))
    m, p, b = ann_search_request("ix", [1.0, 0.0], 3)
    _, resp = c.request(m, p, b)
    hits = resp["hits"]["hits"]
    # score desc, equal scores tie-broken by numeric _id asc
    assert [h["_id"] for h in hits] == ["5", "10", "2"]
    assert hits[0]["_score"] == pytest.approx(1.0)
    assert hits[2]["_score"] == pytest.approx(0.5)


def test_emulator_bulk_roundtrip():
    c = _client()
    nd = (
        '{"index":{"_index":"ix","_id":"1"}}\n{"vector":[1.0,0.0]}\n'
        '{"index":{"_index":"ix","_id":"2"}}\n{"vector":[0.0,1.0]}\n'
    )
    status, resp = c.bulk(nd)
    assert status == 200 and resp["errors"] is False and len(resp["items"]) == 2
    m, p, _ = count_request("ix")
    assert parse_count_response(c.request(m, p)[1]) == 2


# -- engine integration -------------------------------------------------------

def _meta():
    return IndexMetadata(
        keyspace="ks", index="emb_os", table="embeddings",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64,
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def served(spark, emb):
    client = OpenSearchEmulator()
    m, p, b = create_index_request("emb_os", 64)
    assert client.request(m, p, b)[0] == 200
    n = client.ingest_bodies(
        bulk_bodies(emb, "vec_id", "embedding", "emb_os", batch_size=64).collect()
    )
    assert n == emb.count()
    eng = VectorStoreEngine()
    eng.register(emb, _meta(), strategy="opensearch",
                 strategy_opts={"client": client, "index_key": "emb_os"})
    return eng, client


def test_bulk_bodies_are_distributed_ndjson(emb):
    rows = bulk_bodies(emb, "vec_id", "embedding", "emb_os", batch_size=50).collect()
    assert sum(r["n"] for r in rows) == emb.count()
    first = rows[0]["body"].split("\n")
    assert first[0].startswith('{"index":{"_index":"emb_os","_id":"')
    assert first[1].startswith('{"vector":[')
    assert rows[0]["body"].endswith("\n")


def test_bulk_ingest_http_executor_side(emb):
    """The documented 100 TB ingest path, executed: the emulator served over
    a real localhost socket, NDJSON bodies built distributed and POSTed from
    foreachPartition — executor python workers, not the driver — with
    _count parity asserted afterwards. No bulk body is ever collected."""
    from vector_store_spark.sources.opensearch import (
        OpenSearchHttpEmulator,
        bulk_ingest_http,
    )

    srv = OpenSearchHttpEmulator()
    m, p, b = create_index_request("sock_os", 64)
    assert srv.emulator.request(m, p, b)[0] == 200
    srv.start()
    try:
        bulk_ingest_http(emb, "vec_id", "embedding", "sock_os",
                         srv.endpoint, batch_size=64)
    finally:
        srv.stop()
    m, p, _ = count_request("sock_os")
    assert parse_count_response(srv.emulator.request(m, p)[1]) == emb.count()
    # the ingested state is immediately servable: socket-path search answers
    # match the published score formula ordering
    status, body = srv.emulator.request(
        "POST", "/sock_os/_search",
        {"query": {"knn": {"vector": {"vector": det_query_vector(23, 64),
                                      "k": 3}}}},
    )
    assert status == 200 and len(body["hits"]["hits"]) == 3


def test_bulk_ingest_http_failed_item_fails_the_job(emb):
    """A bulk item rejected by the backend (dimension mismatch) must fail
    the Spark job loudly — ingest divergence is never silent."""
    from vector_store_spark.sources.opensearch import (
        OpenSearchHttpEmulator,
        bulk_ingest_http,
    )

    srv = OpenSearchHttpEmulator()
    m, p, b = create_index_request("bad_os", 32)  # wrong dims: 64-d corpus
    assert srv.emulator.request(m, p, b)[0] == 200
    srv.start()
    try:
        with pytest.raises(Exception, match="bulk ingest failed"):
            bulk_ingest_http(emb, "vec_id", "embedding", "bad_os",
                             srv.endpoint, batch_size=64)
    finally:
        srv.stop()


def test_opensearch_strategy_matches_exact_ranking(served, emb):
    eng, _ = served
    q = det_query_vector(23, 64)
    resp = eng.ann("ks", "embeddings", "embedding", q, limit=5)
    ids = resp.primary_keys["vec_id"]
    assert len(ids) == 5
    # score-as-distance: descending score == ascending true cosine distance,
    # so the ranking must equal the exact engine's
    exact = VectorStoreEngine()
    exact.register(emb, _meta(), strategy="exact")
    ref = exact.ann("ks", "embeddings", "embedding", q, limit=5)
    assert ids == ref.primary_keys["vec_id"]
    # distance IS the cosinesimil score: d_exact = 2*(1 - score)
    for score, d in zip(resp.distances, ref.distances):
        assert 2.0 * (1.0 - score) == pytest.approx(d, abs=1e-5)
    # similarity mapping applies to the score-valued distance: (2 - s) / 2
    for score, sim in zip(resp.distances, resp.similarity_scores):
        assert sim == pytest.approx((2.0 - score) / 2.0, abs=1e-9)
    assert all(not math.isnan(s) for s in resp.distances)


def test_opensearch_strategy_rejects_filtering(served):
    eng, _ = served
    q = det_query_vector(23, 64)
    flt = Filter(restrictions=(Restriction.lt("vec_id", 100),),
                 allow_filtering=True)
    with pytest.raises(FilterError, match="Filtering not supported"):
        eng.ann_df("ks", "embeddings", "embedding", q, 5, flt)


def test_opensearch_strategy_crud_visibility(spark, emb):
    client = OpenSearchEmulator()
    m, p, b = create_index_request("crud_os", 64)
    assert client.request(m, p, b)[0] == 200
    client.ingest_bodies(
        bulk_bodies(emb.limit(50), "vec_id", "embedding", "crud_os").collect()
    )
    eng = VectorStoreEngine()
    meta = IndexMetadata(
        keyspace="ks", index="crud_os", table="embeddings",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64,
    )
    eng.register(emb, meta, strategy="opensearch",
                 strategy_opts={"client": client, "index_key": "crud_os"})
    q = det_query_vector(23, 64)
    before = eng.ann("ks", "embeddings", "embedding", q, limit=1)
    top = before.primary_keys["vec_id"][0]
    # RemoveVector makes the former best invisible (opensearch.rs:340-355)
    assert client.request(*remove_vector_request("crud_os", top))[0] == 200
    after = eng.ann("ks", "embeddings", "embedding", q, limit=1)
    assert after.primary_keys["vec_id"][0] != top
