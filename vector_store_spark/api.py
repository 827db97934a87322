"""Wire-format layer: the reference's HTTP/JSON request/response shapes
(SURVEY.md §2.1 S9, §2.2 P4, §2.7 F4).

Requests (httpapi/src/lib.rs:368-374, 462-471): ``{"vector": [...], "limit":
k, "filter": {"restrictions": [...], "allow_filtering": bool}}``. Restriction
wire tags (httpapi/src/lib.rs:320-366): ``==  IN  <  <=  >  >=`` on single
columns and ``()==()  ()IN()  ()<()  ()<=()  ()>()  ()>=()`` on column
tuples; conjunction only.

Responses (httpapi/src/lib.rs:376-381): column-oriented ``{"primary_keys":
{col: [v...]}, "distances": [...], "similarity_scores": [...]}``; non-finite
floats saturate to ±f32::MAX on the wire (httpapi/src/lib.rs:397-409).
"""

from __future__ import annotations

import json
import math
from typing import Any, Mapping

from vector_store_spark.plans.restrictions import FilterError
from vector_store_spark.types import Filter, Restriction, RestrictionOp

F32_MAX = 3.4028234663852886e38

_SINGLE_TAGS: dict[str, RestrictionOp] = {
    "==": RestrictionOp.EQ,
    "IN": RestrictionOp.IN,
    "<": RestrictionOp.LT,
    "<=": RestrictionOp.LTE,
    ">": RestrictionOp.GT,
    ">=": RestrictionOp.GTE,
}
_TUPLE_TAGS: dict[str, RestrictionOp] = {
    "()==()": RestrictionOp.EQ_TUPLE,
    "()IN()": RestrictionOp.IN_TUPLE,
    "()<()": RestrictionOp.LT_TUPLE,
    "()<=()": RestrictionOp.LTE_TUPLE,
    "()>()": RestrictionOp.GT_TUPLE,
    "()>=()": RestrictionOp.GTE_TUPLE,
}


def parse_restriction(obj: Mapping[str, Any]) -> Restriction:
    """One wire restriction ``{tag: [lhs, rhs]}`` → typed Restriction."""
    if not isinstance(obj, Mapping) or len(obj) != 1:
        raise FilterError(f"restriction must be a single-key object, got {obj!r}")
    tag, payload = next(iter(obj.items()))
    if not isinstance(payload, (list, tuple)) or len(payload) != 2:
        raise FilterError(f"restriction payload must be [lhs, rhs], got {payload!r}")
    lhs, rhs = payload
    if tag in _SINGLE_TAGS:
        if not isinstance(lhs, str):
            raise FilterError(f"column name must be a string, got {lhs!r}")
        op = _SINGLE_TAGS[tag]
        if op == RestrictionOp.IN and not isinstance(rhs, (list, tuple)):
            raise FilterError("IN requires a list of values")
        return Restriction(op, (lhs,), tuple(rhs) if op == RestrictionOp.IN else rhs)
    if tag in _TUPLE_TAGS:
        if not isinstance(lhs, (list, tuple)) or not all(isinstance(c, str) for c in lhs):
            raise FilterError(f"tuple lhs must be a list of column names, got {lhs!r}")
        op = _TUPLE_TAGS[tag]
        if op == RestrictionOp.IN_TUPLE:
            if not isinstance(rhs, (list, tuple)):
                raise FilterError("tuple IN requires a list of tuples")
            vals = tuple(tuple(t) for t in rhs)
            for t in vals:
                if len(t) != len(lhs):
                    raise FilterError("tuple arity mismatch")  # P4
        else:
            if not isinstance(rhs, (list, tuple)) or len(rhs) != len(lhs):
                raise FilterError("tuple arity mismatch")  # P4
            vals = tuple(rhs)
        return Restriction(op, tuple(lhs), vals)
    raise FilterError(f"unknown restriction tag {tag!r}")


def parse_filter(obj: Mapping[str, Any] | None) -> Filter:
    """Wire filter object → Filter (conjunction of restrictions + the
    ALLOW FILTERING opt-in)."""
    if obj is None:
        return Filter()
    restrictions = tuple(parse_restriction(r) for r in obj.get("restrictions", ()))
    return Filter(restrictions, bool(obj.get("allow_filtering", False)))


def parse_ann_request(body: str | Mapping[str, Any]) -> tuple[list[float], int, Filter]:
    """``PostIndexAnnRequest`` → (vector, limit, filter). limit defaults to 1
    and must be positive (lib.rs:499-505)."""
    obj = json.loads(body) if isinstance(body, str) else body
    vector = obj.get("vector")
    if not isinstance(vector, (list, tuple)) or not vector:
        raise FilterError("request requires a non-empty 'vector'")
    limit = obj.get("limit", 1)
    if not isinstance(limit, int) or limit <= 0:
        raise FilterError("limit must be a positive integer")
    return [float(x) for x in vector], limit, parse_filter(obj.get("filter"))


def saturate_wire(x: float | None) -> float | None:
    """±∞ → ±f32::MAX on the JSON wire (httpapi/src/lib.rs:397-409); NaN is
    never produced (distance domain validation rejects it upstream)."""
    if x is None or not math.isinf(x):
        return x
    return F32_MAX if x > 0 else -F32_MAX


def response_to_json(resp) -> str:
    """AnnResponse → the reference's column-oriented JSON."""
    return json.dumps(
        {
            "primary_keys": resp.primary_keys,
            "distances": [saturate_wire(d) for d in resp.distances],
            "similarity_scores": [saturate_wire(s) for s in resp.similarity_scores],
        }
    )


def info_response() -> dict:
    """``GET /api/v1/info`` (httproutes.rs:1481-1495): service
    identification — version, service name, and the index-engine version
    string (here: the Spark runtime standing in for the USearch/DiskANN
    engine id)."""
    import pyspark

    from vector_store_spark import __version__

    return {
        "version": __version__,
        "service": "vector-store-spark",
        "engine": f"spark-{pyspark.__version__}",
    }


def node_status_wire(status) -> str:
    """``GET /api/v1/status`` (httproutes.rs:1497-1530): the node state
    machine collapses to the wire enum — both DISCOVERING_INDEXES and
    INDEXING_EMBEDDINGS report as BOOTSTRAPPING (the reference folds the
    two internal phases into one public state)."""
    from vector_store_spark.plans.catalog import NodeStatus

    return {
        NodeStatus.INITIALIZING: "INITIALIZING",
        NodeStatus.CONNECTING_TO_DB: "CONNECTING_TO_DB",
        NodeStatus.DISCOVERING_INDEXES: "BOOTSTRAPPING",
        NodeStatus.INDEXING_EMBEDDINGS: "BOOTSTRAPPING",
        NodeStatus.SERVING: "SERVING",
    }[status]
