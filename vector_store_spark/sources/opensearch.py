"""OpenSearch index-backend adapter: wire-format parity + pluggable client.

The reference supports OpenSearch as a third ANN engine next to USearch and
DiskANN (`crates/vector-store/src/vs_index/opensearch.rs`): the adapter is a
thin HTTP client that (1) creates a knn_vector index with the HNSW method
options mapped 1:1 from the index metadata (opensearch.rs:152-208), (2) PUTs /
DELETEs one document per vector keyed by primary id (opensearch.rs:318-355),
(3) answers ANN with the `{"query": {"knn": ...}}` body and maps each hit's
``_id``/``_score`` back to (primary key, Distance) (opensearch.rs:357-452),
and (4) serves Count via ``_count`` (opensearch.rs:460-493). Filtered ANN is
NOT supported by the backend and errors out (opensearch.rs:456-458).

This module re-expresses that adapter Spark-first:

- **Request builders / response parsers are pure functions** producing and
  consuming exactly the JSON bodies the reference sends — they are the parity
  surface and are pinned by tests against the reference's literal shapes.
- **Bulk ingest is the scale path**: the reference's actor PUTs one doc per
  AddVector message; at 100 TB the same payloads go through OpenSearch's
  public ``_bulk`` NDJSON endpoint, one batched POST per Spark partition
  (``foreachPartition``). :func:`bulk_bodies` builds those NDJSON bodies
  DISTRIBUTED (Arrow-batched ``mapInPandas``) so the driver never holds the
  corpus; only the final POST is an executor-side network call against the
  configured endpoint.
- **A dict-backed in-process emulator** stands in for the external service
  (the container has no OpenSearch), implementing the same REST contract with
  the *published public scoring formulas* so the adapter's verbatim
  score-as-distance semantics (see below) are actually exercised.

Score semantics quirk (faithful to the reference): the adapter passes each
hit's ``_score`` VERBATIM into ``Distance::try_from`` (opensearch.rs:434-446
-> distance.rs:58-105) — i.e. for the OpenSearch backend the reported
"distance" is the OpenSearch score, range-checked against the space's
distance bounds (cosine [0,2]; euclidean >= 0; dot-product non-NaN). The
similarity mapping then applies to that score-valued distance like any other
(similarity.rs:26-37). We mirror both steps exactly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterable, Iterator

import numpy as np

from vector_store_spark.types import SpaceType

__all__ = [
    "space_type_name",
    "create_index_request",
    "add_vector_request",
    "remove_vector_request",
    "ann_search_request",
    "count_request",
    "parse_ann_response",
    "parse_count_response",
    "opensearch_score",
    "bulk_bodies",
    "bulk_ingest_http",
    "OpenSearchEmulator",
    "OpenSearchHttpEmulator",
]


def space_type_name(space: SpaceType) -> str:
    """SpaceType -> OpenSearch space_type string (opensearch.rs:78-87).

    Hamming is unsupported by the backend — the reference hits
    ``unimplemented!`` there; we raise the Python analogue."""
    if space == SpaceType.EUCLIDEAN:
        return "l2"
    if space == SpaceType.COSINE:
        return "cosinesimil"
    if space == SpaceType.DOT_PRODUCT:
        return "innerproduct"
    raise NotImplementedError("Hamming distance is not supported")


def create_index_request(
    index_key: str,
    dimensions: int,
    connectivity: int = 0,
    expansion_add: int = 0,
    expansion_search: int = 0,
    space: SpaceType = SpaceType.COSINE,
) -> tuple[str, str, dict]:
    """(method, path, body) for index creation (opensearch.rs:152-208).

    Option mapping is 1:1 with the reference: a zero (unset) option falls back
    to OpenSearch's defaults ef_search=100 / ef_construction=100 / m=16."""
    body = {
        "settings": {"index.knn": True},
        "mappings": {
            "properties": {
                "vector": {
                    "type": "knn_vector",
                    "dimension": dimensions,
                    "method": {
                        "name": "hnsw",
                        "space_type": space_type_name(space),
                        "parameters": {
                            "ef_search": expansion_search if expansion_search > 0 else 100,
                            "ef_construction": expansion_add if expansion_add > 0 else 100,
                            "m": connectivity if connectivity > 0 else 16,
                        },
                    },
                }
            }
        },
    }
    return ("PUT", f"/{index_key}", body)


def add_vector_request(index_key: str, primary_id: int, vector: list) -> tuple[str, str, dict]:
    """Single-doc upsert, the reference's AddVector (opensearch.rs:318-338):
    ``IndexParts::IndexId(index, primary_id)`` with the vector as the only
    field."""
    return ("PUT", f"/{index_key}/_doc/{primary_id}", {"vector": list(vector)})


def remove_vector_request(index_key: str, primary_id: int) -> tuple[str, str, None]:
    """RemoveVector (opensearch.rs:340-355)."""
    return ("DELETE", f"/{index_key}/_doc/{primary_id}", None)


def ann_search_request(index_key: str, embedding: list, k: int) -> tuple[str, str, dict]:
    """ANN search body (opensearch.rs:374-386)."""
    return (
        "POST",
        f"/{index_key}/_search",
        {"query": {"knn": {"vector": {"vector": list(embedding), "k": k}}}},
    )


def count_request(index_key: str) -> tuple[str, str, None]:
    """Count (opensearch.rs:460-464)."""
    return ("GET", f"/{index_key}/_count", None)


def parse_ann_response(
    body: dict, space: SpaceType, dimensions: int
) -> list[tuple[int, float]]:
    """hits -> [(primary_id, distance)] (opensearch.rs:410-446).

    The hit's ``_id`` is parsed as the integer primary id and the ``_score``
    is taken VERBATIM as the distance value, then range-checked exactly like
    ``Distance::try_from`` (distance.rs:61-105). A malformed body raises —
    the reference sends Err over the oneshot channel."""
    hits = body.get("hits", {}).get("hits")
    if not isinstance(hits, list):
        raise ValueError("ann: unable to search for embedding (malformed hits)")
    out = []
    for hit in hits:
        pid = int(hit["_id"])
        score = float(hit["_score"])
        if space == SpaceType.COSINE:
            if not (0.0 <= score <= 2.0):
                raise ValueError("Cosine distance must be in range [0.0, 2.0]")
        elif space == SpaceType.EUCLIDEAN:
            if score < 0.0:
                raise ValueError("Euclidean distance must be >= 0.0")
        elif space == SpaceType.DOT_PRODUCT:
            if np.isnan(score):
                raise ValueError("Dot Product distance must be a valid number, got NaN")
        else:
            raise NotImplementedError("Hamming distance is not supported")
        out.append((pid, score))
    return out


def parse_count_response(body: dict) -> int:
    """_count -> int; malformed bodies degrade to 0 (opensearch.rs:466-493)."""
    count = body.get("count")
    return int(count) if isinstance(count, (int, float)) else 0


def opensearch_score(space: SpaceType, q: np.ndarray, v: np.ndarray) -> float:
    """The published OpenSearch k-NN score for one (query, vector) pair.

    Public score translations (OpenSearch k-NN docs, "Spaces"):
      l2           : 1 / (1 + l2sq)                (l2sq = squared euclidean)
      cosinesimil  : (2 - d) / 2 = (1 + cos) / 2   (d = 1 - cosine similarity)
      innerproduct : ip + 1 if ip >= 0 else 1 / (1 - ip)

    The emulator uses these so the adapter's verbatim score-as-distance path
    sees realistic values; nothing here comes from the reference repo (it
    trusts the server for this math)."""
    q = np.asarray(q, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    if space == SpaceType.EUCLIDEAN:
        d = v - q
        return 1.0 / (1.0 + float(np.dot(d, d)))
    if space == SpaceType.COSINE:
        denom = float(np.linalg.norm(q) * np.linalg.norm(v))
        cos = float(np.dot(q, v)) / denom if denom else 0.0
        return (1.0 + cos) / 2.0
    if space == SpaceType.DOT_PRODUCT:
        ip = float(np.dot(q, v))
        return ip + 1.0 if ip >= 0.0 else 1.0 / (1.0 - ip)
    raise NotImplementedError("Hamming distance is not supported")


def bulk_bodies(df, id_col: str, vec_col: str, index_key: str, batch_size: int = 500):
    """DISTRIBUTED construction of ``_bulk`` NDJSON ingest bodies.

    Returns a DataFrame with one row per batch: (body STRING, n INT). Each
    body is OpenSearch's public bulk format — an ``{"index": {"_index": ...,
    "_id": ...}}`` action line followed by the ``{"vector": [...]}`` source
    line, newline-terminated. Built with Arrow-batched ``mapInPandas`` so the
    serialization cost is spread over executors; a production deployment POSTs
    each body from ``foreachPartition`` (network fan-out scales with the
    cluster), while tests/emulation apply the result-sized body frame on the
    driver. The reference ingests one PUT per vector through its actor
    channel (opensearch.rs:318-338); _bulk carries identical per-doc payloads
    in batches, which is the only way the same ingest survives 100 TB."""
    import pandas as pd

    def _to_bodies(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            bodies, counts = [], []
            ids = pdf[id_col].tolist()
            vecs = pdf[vec_col].tolist()
            for i in range(0, len(ids), batch_size):
                lines = []
                for pid, vec in zip(ids[i : i + batch_size], vecs[i : i + batch_size]):
                    lines.append(json.dumps(
                        {"index": {"_index": index_key, "_id": str(pid)}},
                        separators=(",", ":")))
                    lines.append(json.dumps(
                        {"vector": [float(x) for x in vec]}, separators=(",", ":")))
                bodies.append("\n".join(lines) + "\n")
                counts.append(min(batch_size, len(ids) - i))
            yield pd.DataFrame({"body": bodies, "n": counts})

    return (
        df.select(id_col, vec_col)
        .mapInPandas(_to_bodies, schema="body string, n int")
    )


@dataclass
class _EmulatedIndex:
    dimensions: int
    space: SpaceType
    params: dict
    docs: dict = field(default_factory=dict)  # id(str) -> np.ndarray


class OpenSearchEmulator:
    """In-process single-node OpenSearch stand-in for the adapter contract.

    Speaks exactly the request/response JSON the builders above produce:
    index creation validates the knn_vector mapping shape, ``_doc`` PUT/DELETE
    upsert/remove vectors (wrong dimension -> 400, OpenSearch's
    mapper_parsing_exception class), ``_search`` answers the knn query with
    the published score formulas over an exact scan (a recall-1 stand-in for
    the server's HNSW), and ``_count``/``_bulk`` follow the public API. Tie
    order between equal scores is ``_id`` ascending numerically — OpenSearch
    leaves ties unspecified; pinning them keeps oracles deterministic."""

    def __init__(self):
        self.indexes: dict[str, _EmulatedIndex] = {}

    # -- request dispatch ---------------------------------------------------
    def request(self, method: str, path: str, body: dict | None = None) -> tuple[int, dict]:
        parts = [p for p in path.split("/") if p]
        if method == "PUT" and len(parts) == 1:
            return self._create(parts[0], body or {})
        if method == "PUT" and len(parts) == 3 and parts[1] == "_doc":
            return self._put_doc(parts[0], parts[2], body or {})
        if method == "DELETE" and len(parts) == 3 and parts[1] == "_doc":
            return self._delete_doc(parts[0], parts[2])
        if method == "POST" and len(parts) == 2 and parts[1] == "_search":
            return self._search(parts[0], body or {})
        if method == "GET" and len(parts) == 2 and parts[1] == "_count":
            return self._count(parts[0])
        return 400, {"error": {"type": "illegal_argument_exception", "reason": path}}

    def _create(self, index: str, body: dict) -> tuple[int, dict]:
        if index in self.indexes:
            return 400, {"error": {"type": "resource_already_exists_exception"}}
        try:
            if body["settings"]["index.knn"] is not True:
                raise KeyError("index.knn")
            vec = body["mappings"]["properties"]["vector"]
            if vec["type"] != "knn_vector":
                raise KeyError("knn_vector")
            dims = int(vec["dimension"])
            method = vec["method"]
            if method["name"] != "hnsw":
                raise KeyError("hnsw")
            space = {"l2": SpaceType.EUCLIDEAN, "cosinesimil": SpaceType.COSINE,
                     "innerproduct": SpaceType.DOT_PRODUCT}[method["space_type"]]
            params = dict(method["parameters"])
        except (KeyError, TypeError, ValueError) as ex:
            return 400, {"error": {"type": "mapper_parsing_exception", "reason": str(ex)}}
        self.indexes[index] = _EmulatedIndex(dims, space, params)
        return 200, {"acknowledged": True, "index": index}

    def _put_doc(self, index: str, doc_id: str, body: dict) -> tuple[int, dict]:
        ix = self.indexes.get(index)
        if ix is None:
            return 404, {"error": {"type": "index_not_found_exception"}}
        vec = body.get("vector")
        if not isinstance(vec, list) or len(vec) != ix.dimensions:
            return 400, {"error": {"type": "mapper_parsing_exception",
                                   "reason": "vector dimension mismatch"}}
        existed = doc_id in ix.docs
        ix.docs[doc_id] = np.asarray(vec, dtype=np.float32)
        return 200, {"result": "updated" if existed else "created", "_id": doc_id}

    def _delete_doc(self, index: str, doc_id: str) -> tuple[int, dict]:
        ix = self.indexes.get(index)
        if ix is None:
            return 404, {"error": {"type": "index_not_found_exception"}}
        if doc_id not in ix.docs:
            return 404, {"result": "not_found", "_id": doc_id}
        del ix.docs[doc_id]
        return 200, {"result": "deleted", "_id": doc_id}

    def _search(self, index: str, body: dict) -> tuple[int, dict]:
        ix = self.indexes.get(index)
        if ix is None:
            return 404, {"error": {"type": "index_not_found_exception"}}
        try:
            knn = body["query"]["knn"]["vector"]
            q = np.asarray(knn["vector"], dtype=np.float64)
            k = int(knn["k"])
        except (KeyError, TypeError, ValueError) as ex:
            return 400, {"error": {"type": "parsing_exception", "reason": str(ex)}}
        if q.shape[0] != ix.dimensions:
            return 400, {"error": {"type": "illegal_argument_exception",
                                   "reason": "query vector dimension mismatch"}}
        scored = [(doc_id, opensearch_score(ix.space, q, v)) for doc_id, v in ix.docs.items()]
        scored.sort(key=lambda t: (-t[1], int(t[0])))
        hits = [{"_index": index, "_id": doc_id, "_score": score}
                for doc_id, score in scored[:k]]
        return 200, {"hits": {"total": {"value": len(hits)}, "hits": hits}}

    def _count(self, index: str) -> tuple[int, dict]:
        ix = self.indexes.get(index)
        if ix is None:
            return 404, {"error": {"type": "index_not_found_exception"}}
        return 200, {"count": len(ix.docs)}

    # -- public bulk API ----------------------------------------------------
    def bulk(self, ndjson: str) -> tuple[int, dict]:
        """Apply a ``_bulk`` NDJSON body (index actions only, matching what
        :func:`bulk_bodies` emits). Per-item statuses follow the public
        response shape."""
        lines = [ln for ln in ndjson.split("\n") if ln]
        items, errors = [], False
        i = 0
        while i < len(lines):
            action = json.loads(lines[i])
            if "index" not in action:
                return 400, {"error": {"type": "illegal_argument_exception",
                                       "reason": "only index actions supported"}}
            meta = action["index"]
            src = json.loads(lines[i + 1])
            status, resp = self._put_doc(meta["_index"], meta["_id"], src)
            errors = errors or status >= 300
            items.append({"index": {"_id": meta["_id"], "status": status,
                                    "result": resp.get("result")}})
            i += 2
        return 200, {"errors": errors, "items": items}

    def ingest_bodies(self, body_rows: Iterable) -> int:
        """Driver-side application of a collected ``bulk_bodies`` frame
        (result-sized: one string per batch). Returns docs ingested."""
        n = 0
        for row in body_rows:
            status, resp = self.bulk(row["body"] if not isinstance(row, str) else row)
            if status >= 300 or resp.get("errors"):
                raise ValueError(f"bulk ingest failed: {resp}")
            n += len(resp["items"])
        return n


class OpenSearchHttpEmulator:
    """The emulator behind a REAL localhost socket: the external-service
    stand-in a distributed ingest can actually POST to.

    Speaks the same REST contract as :class:`OpenSearchEmulator.request`
    plus ``POST /_bulk`` (NDJSON, the public bulk endpoint). Executor
    python workers are separate OS processes even on local[N], so a
    ``foreachPartition`` POST against this server exercises the genuine
    100 TB ingest topology — N concurrent network writers, zero driver-side
    body materialization — against an in-process state the driver can then
    serve searches from. A threading lock serializes document mutation
    (OpenSearch itself serializes per-doc writes through its primary
    shard)."""

    def __init__(self, emulator: OpenSearchEmulator | None = None):
        import threading

        self.emulator = emulator or OpenSearchEmulator()
        self._lock = threading.Lock()
        self._httpd = None
        self._thread = None

    def start(self, host: str = "127.0.0.1", port: int = 0) -> tuple[str, int]:
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _run(self, method):
                length = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(length) if length else b""
                path = self.path
                if method == "POST" and path.rstrip("/").endswith("_bulk"):
                    with outer._lock:
                        status, resp = outer.emulator.bulk(raw.decode("utf-8"))
                else:
                    body = json.loads(raw) if raw else None
                    with outer._lock:
                        status, resp = outer.emulator.request(method, path, body)
                data = json.dumps(resp).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._run("GET")

            def do_POST(self):
                self._run("POST")

            def do_PUT(self):
                self._run("PUT")

            def do_DELETE(self):
                self._run("DELETE")

            def log_message(self, fmt, *args):
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[:2]

    @property
    def endpoint(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def bulk_ingest_http(
    df,
    id_col: str,
    vec_col: str,
    index_key: str,
    endpoint: str,
    batch_size: int = 500,
    max_retries: int = 3,
    connection_timeout: float = 300.0,
) -> None:
    """EXECUTOR-SIDE bulk ingest: the documented 100 TB path, executed.

    Builds the ``_bulk`` NDJSON bodies distributed (:func:`bulk_bodies`,
    Arrow-batched) and POSTs each body from ``foreachPartition`` — the POST
    happens inside the executor python worker, so no body ever crosses to
    the driver; network fan-out scales with the cluster exactly as the
    module docstring promises (opensearch.py:18-26). Each worker POSTs
    through :class:`~vector_store_spark.httpclient.ResilientClient`, so a
    transient backend hiccup (connection reset, brief restart) rides the
    reconnect/backoff path instead of failing the task — the same client
    semantics the reference's validator asserts (reconnect.rs) — while a
    failed ITEM in a bulk response still raises in the task, failing the
    Spark job loudly (ingest divergence must never be silent — same posture
    as ivf_update's AdmissionError). Caller asserts ``_count`` parity
    afterwards. Bulk PUTs are idempotent per (_index, _id), so a retried
    body is safe to re-apply."""
    bodies = bulk_bodies(df, id_col, vec_col, index_key, batch_size=batch_size)
    base = endpoint.rstrip("/")

    def _post_partition(rows):
        from vector_store_spark.httpclient import ResilientClient

        client = ResilientClient(
            [base], connection_timeout=connection_timeout,
            max_retries=max_retries)
        for row in rows:
            status, resp = client.request_raw(
                "POST", "/_bulk", row.body.encode("utf-8"),
                content_type="application/x-ndjson")
            if status >= 300 or resp.get("errors"):
                bad = [it for it in resp.get("items", [])
                       if it.get("index", {}).get("status", 200) >= 300]
                raise ValueError(f"bulk ingest failed ({status}): {bad[:3]}")

    bodies.foreachPartition(_post_partition)
