"""HTTP serving surface (httpserver.py re-expressing httproutes.rs's route
table): route shapes, status-code mapping, concurrent clients over real
sockets, and the /metrics exposition."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from vector_store_spark.engine import FtsEngine, VectorStoreEngine
from vector_store_spark.httpserver import VectorStoreHttpServer, serve
from vector_store_spark.plans.catalog import NodeState, NodeStatus
from vector_store_spark.registry import det_query_vector
from vector_store_spark.types import IndexMetadata, IndexState, IndexStatus


def _meta(index="emb_http", version="0"):
    return IndexMetadata(
        keyspace="ks", index=index, table="embeddings",
        primary_key_columns=("vec_id",), partition_key_count=1,
        target_column="embedding", dimensions=64, version=version,
        filtering_columns=("label",),
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def server(spark, emb, sf_dir):
    from vector_store_spark.operators.bm25 import build_fts_index

    eng = VectorStoreEngine()
    eng.register(emb, _meta(), strategy="exact")
    fts = FtsEngine()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fts.register("docs_fts", build_fts_index(docs, "doc_id", "text"))
    node = NodeState(NodeStatus.SERVING)
    srv = serve(eng, fts, node)
    host, port = srv._httpd.server_address[:2]
    yield f"http://{host}:{port}"
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read()) if "metrics" not in url else r.read().decode()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_get_indexes_listing(server):
    status, body = _get(f"{server}/api/v1/indexes")
    assert status == 200
    assert {"keyspace": "ks", "index": "emb_http", "table": "embeddings",
            "target_columns": ["embedding"]} in body
    # fulltext indexes appear in the same listing (httproutes.rs:290-363)
    assert {"index": "docs_fts", "options": {"type": "fulltext"}} in body


def test_get_index_info_and_404(server):
    status, body = _get(f"{server}/api/v1/indexes/ks/emb_http")
    assert status == 200
    assert body["dimensions"] == 64 and body["space_type"] == "cosine"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/api/v1/indexes/ks/nope")
    assert ei.value.code == 404


def test_get_index_status_counts(server, emb):
    status, body = _get(f"{server}/api/v1/indexes/ks/emb_http/status")
    assert status == 200
    assert body["status"] == "SERVING"
    assert body["count"] == emb.count()
    assert body["build_progress"] == 100.0


def test_info_and_node_status(server):
    status, body = _get(f"{server}/api/v1/info")
    assert status == 200 and body["service"] == "vector-store-spark"
    status, body = _get(f"{server}/api/v1/status")
    assert status == 200 and body == "SERVING"


def test_post_ann_roundtrip(server):
    q = det_query_vector(7, 64)
    status, body = _post(f"{server}/api/v1/indexes/ks/emb_http/ann",
                         {"vector": q, "limit": 5})
    assert status == 200
    assert set(body) == {"primary_keys", "distances", "similarity_scores"}
    assert len(body["primary_keys"]["vec_id"]) == 5
    assert body["distances"] == sorted(body["distances"])


def test_post_ann_wire_filter(server):
    q = det_query_vector(7, 64)
    status, body = _post(
        f"{server}/api/v1/indexes/ks/emb_http/ann",
        {"vector": q, "limit": 3,
         "filter": {"restrictions": [{"==": ["label", 1]}],
                    "allow_filtering": True}},
    )
    assert status == 200 and len(body["distances"]) == 3


def test_post_ann_status_codes(server):
    q = det_query_vector(7, 64)
    # 400: wrong dimensions (P9)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/api/v1/indexes/ks/emb_http/ann", {"vector": [1.0, 2.0]})
    assert ei.value.code == 400
    # 400: ALLOW FILTERING required (P5)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/api/v1/indexes/ks/emb_http/ann",
              {"vector": q, "filter": {"restrictions": [{"==": ["label", 1]}]}})
    assert ei.value.code == 400
    # 400: malformed body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/api/v1/indexes/ks/emb_http/ann", {"limit": 3})
    assert ei.value.code == 400
    # 404: unknown index
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/api/v1/indexes/ks/ghost/ann", {"vector": q})
    assert ei.value.code == 404


def test_post_ann_503_while_building(spark, emb):
    eng = VectorStoreEngine()
    eng.register(emb, _meta("emb_building"), status=IndexStatus.FULL_SCANNING,
                 strategy="exact")
    srv = VectorStoreHttpServer(eng)
    status, body = srv.handle(
        "POST", "/api/v1/indexes/ks/emb_building/ann",
        json.dumps({"vector": det_query_vector(7, 64)}).encode(),
    )
    assert status == 503 and "INDEX_BUILDING" in body


def test_post_bm25_roundtrip(server):
    status, body = _post(f"{server}/api/v1/indexes/fts/docs_fts/bm25",
                         {"query": "data", "limit": 5})
    assert status == 200
    assert len(body["scores"]) <= 5
    assert body["scores"] == sorted(body["scores"], reverse=True)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/api/v1/indexes/fts/ghost/bm25", {"query": "data"})
    assert ei.value.code == 404


def test_metrics_exposition(server):
    status, text = _get(f"{server}/metrics")
    assert status == 200
    assert "vector_store_requests_total" in text
    assert 'route="ann"' in text
    assert "vector_store_index_size" in text
    # the latency distribution is a real Prometheus histogram now
    assert "vector_store_request_latency_seconds_bucket" in text
    assert 'le="+Inf"' in text
    assert "vector_store_request_latency_seconds_count" in text


def test_openapi_document_matches_route_table(server):
    """GET /openapi.json (generate-openapi.rs analogue): the spec's paths
    set must exactly match the served route table, and every advertised
    route must actually dispatch (no unknown-route 404)."""
    from vector_store_spark.httpserver import ROUTES

    status, spec = _get(f"{server}/openapi.json")
    assert status == 200
    assert spec["openapi"].startswith("3.")
    expected = {}
    for method, pattern in ROUTES:
        expected.setdefault(pattern, set()).add(method)
    assert set(spec["paths"]) == set(expected)
    for pattern, methods in expected.items():
        assert set(spec["paths"][pattern]) == methods, pattern
    # POST operations document a request body and the 400 mapping;
    # parameterized routes document 404/503 (the status-code contract of
    # httproutes.rs:712-897)
    ann = spec["paths"]["/api/v1/indexes/{keyspace}/{index}/ann"]["post"]
    assert ann["requestBody"]["required"] is True
    assert {"400", "404", "503"} <= set(ann["responses"])
    # every advertised route dispatches against the live server (concrete
    # path params -> the registered index); none may fall through to the
    # unknown-route handler
    concrete = {"{keyspace}": "ks", "{index}": "emb_http"}
    for method, pattern in ROUTES:
        path = pattern
        for k, v in concrete.items():
            path = path.replace(k, v)
        if method == "get":
            st, _ = _get(f"{server}{path}")
            assert st == 200, (method, pattern)
        else:
            body = ({"vector": det_query_vector(3, 64), "limit": 1}
                    if path.endswith("/ann") else {"query": "data"})
            try:
                st, _ = _post(f"{server}{path}", body)
            except urllib.error.HTTPError as err:
                st = err.code  # bm25 on the vector index -> 404, still routed
            assert st in (200, 404), (method, pattern, st)


def test_metrics_label_escaping_and_percentiles():
    """Label values taken verbatim from URL path segments must be escaped
    per the exposition format (backslash, quote, newline), and the retained
    raw observations expose exact percentiles for bench parity."""
    from vector_store_spark.httpserver import _Metrics, _escape_label

    assert _escape_label('a"b\\c\nd') == 'a\\"b\\\\c\\nd'
    m = _Metrics()
    for i in range(100):
        m.observe("ann", 'ks"evil\n', "ix\\path", (i + 1) / 1000.0)
    text = m.render()
    assert 'keyspace="ks\\"evil\\n"' in text
    assert 'index="ix\\\\path"' in text
    assert "\nvector_store_requests_total{" in text
    # no raw (unescaped) newline may survive inside a label value
    for line in text.splitlines():
        assert line == line.strip("\r")
    pct = m.percentiles("ann")
    assert pct["count"] == 100
    assert pct["min"] == 0.001 and pct["max"] == 0.1
    assert 0.04 < pct["p50"] <= 0.06
    assert 0.09 <= pct["p95"] <= 0.1
    assert pct["p99"] >= pct["p95"] >= pct["p50"]
    # histogram bucket counts are cumulative and end at the total
    bucket_lines = [l for l in text.splitlines() if "_bucket" in l]
    counts = [int(l.rsplit(" ", 1)[1]) for l in bucket_lines]
    assert counts == sorted(counts) and counts[-1] == 100


def test_concurrent_clients(server):
    """N threads over real sockets against one SparkSession — the serving
    posture the reference's multi-client bench exercises."""
    q = det_query_vector(13, 64)
    results, errors = [], []

    def hit():
        try:
            status, body = _post(f"{server}/api/v1/indexes/ks/emb_http/ann",
                                 {"vector": q, "limit": 3})
            results.append((status, tuple(body["primary_keys"]["vec_id"])))
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert len(results) == 8
    assert len({r[1] for r in results}) == 1  # identical answers
