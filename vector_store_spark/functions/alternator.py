"""Alternator (DynamoDB-compatible) vector encodings — SURVEY.md §2.1 S6.

Reference: vector.rs:62-129, db_index_backend.rs:22-62. Alternator tables hold
all attributes in one ``map<utf8, blob>`` column ``":attrs"``; vector blobs
carry a 1-byte type tag:

- ``0x05``: packed big-endian f32 sequence (CBOR-ish tagged binary)
- ``0x04``: DynamoDB JSON document ``{"L": [{"N": "<number>"}, ...]}``

Dimensions come from index options, not the schema (db_index_backend.rs:167-193),
so decode validates length against the declared dims and yields null on
mismatch (null target ⇒ not indexed, P8).

Decode is an Arrow-batched pandas UDF (binary unpack is not expressible in
Catalyst); encode exists for tests/fixtures.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType

TAG_F32 = 0x05
TAG_DYNAMO_JSON = 0x04


def py_encode_f32(vec: list[float]) -> bytes:
    return bytes([TAG_F32]) + struct.pack(f">{len(vec)}f", *vec)


def py_encode_dynamo_json(vec: list[float]) -> bytes:
    doc = {"L": [{"N": repr(float(x))} for x in vec]}
    return bytes([TAG_DYNAMO_JSON]) + json.dumps(doc).encode("utf-8")


def py_decode_vector(blob: bytes | None, dims: int | None = None) -> list[float] | None:
    """Tagged-blob → vector; None for missing/corrupt/mismatched input
    (vector.rs:62-129 error paths become nulls: P8 null-target-not-indexed)."""
    if not blob:
        return None
    tag, body = blob[0], blob[1:]
    if tag == TAG_F32:
        if len(body) % 4:
            return None
        out = list(struct.unpack(f">{len(body) // 4}f", body))
    elif tag == TAG_DYNAMO_JSON:
        try:
            doc = json.loads(body.decode("utf-8"))
            out = [float(e["N"]) for e in doc["L"]]
        except (ValueError, KeyError, TypeError, UnicodeDecodeError):
            return None
    else:
        return None
    if dims is not None and len(out) != dims:
        return None
    return out


def decode_vector_udf(dims: int | None = None):
    """blob column → array<float> (null on corrupt/mismatch)."""
    import pandas as pd

    def batch(blobs):
        return pd.Series(
            [py_decode_vector(bytes(b) if b is not None else None, dims) for b in blobs]
        )

    return F.pandas_udf(batch, ArrayType(FloatType())).asNondeterministic()


def encode_vector_udf(tag: int = TAG_F32):
    """array<float> → tagged blob (fixture generator / write path)."""
    import pandas as pd

    enc = py_encode_f32 if tag == TAG_F32 else py_encode_dynamo_json

    def batch(vecs):
        return pd.Series([None if v is None else enc(list(v)) for v in vecs])

    return F.pandas_udf(batch, BinaryType()).asNondeterministic()


def attrs_vector(attrs: Column | str, attr_name: str, dims: int | None = None) -> Column:
    """``element_at(":attrs", name)`` → decoded vector — the Alternator scan
    projection (db_index_backend.rs:37-62)."""
    col = F.col(attrs) if isinstance(attrs, str) else attrs
    return decode_vector_udf(dims)(F.element_at(col, F.lit(attr_name)))


# --- non-vector (filtering) attributes ------------------------------------
# The reference reads EVERY indexed column from the ':attrs' map — targets
# AND filtering columns, each with its own writetime
# (db_index_backend.rs:37-62 builds `":attrs"[col], writetime(":attrs"[col])`
# per column). Scalar attribute values are DynamoDB-JSON documents behind
# the same 0x04 wire tag as JSON vectors: {"N": "12.5"} / {"S": "text"} /
# {"BOOL": true}.


def py_encode_attr(value) -> bytes | None:
    """Scalar attribute → 0x04-tagged DynamoDB-JSON blob (fixtures/writes)."""
    if value is None:
        return None
    if isinstance(value, bool):
        doc = {"BOOL": value}
    elif isinstance(value, (int, float)):
        doc = {"N": repr(value)}
    elif isinstance(value, str):
        doc = {"S": value}
    else:
        raise TypeError(f"unsupported Alternator attribute type {type(value)!r}")
    return bytes([TAG_DYNAMO_JSON]) + json.dumps(doc).encode("utf-8")


def py_decode_attr(blob: bytes | None) -> str | None:
    """Tagged scalar blob → the attribute's raw lexical value (N/S/BOOL
    payload as a string; the caller casts to its CQL type). None for
    missing/corrupt input — P8 null semantics, same as vectors."""
    if not blob or blob[0] != TAG_DYNAMO_JSON:
        return None
    try:
        doc = json.loads(blob[1:].decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None
    if not isinstance(doc, dict):
        return None
    if "N" in doc:
        return str(doc["N"])
    if "S" in doc:
        return str(doc["S"])
    if "BOOL" in doc:
        return "true" if doc["BOOL"] else "false"
    return None


def encode_attr_udf():
    """scalar column → tagged 0x04 blob (fixture generator / write path)."""
    import pandas as pd

    def batch(vals):
        return pd.Series([
            None if v is None or (isinstance(v, float) and v != v)
            else py_encode_attr(v.item() if hasattr(v, "item") else v)
            for v in vals
        ])

    return F.pandas_udf(batch, BinaryType()).asNondeterministic()


def attrs_scalar(attrs: Column | str, attr_name: str, dtype: str = "string") -> Column:
    """``element_at(":attrs", name)`` → decoded scalar filtering attribute,
    cast to its declared CQL type (the typed decode the reference does in
    db_index_backend.rs:37-62 for filtering columns — dims come from index
    options for vectors; types come from the index's filtering-column
    declarations here)."""
    import pandas as pd
    from pyspark.sql.types import StringType

    def batch(blobs):
        return pd.Series(
            [py_decode_attr(bytes(b) if b is not None else None) for b in blobs]
        )

    col = F.col(attrs) if isinstance(attrs, str) else attrs
    raw = F.pandas_udf(batch, StringType()).asNondeterministic()(F.element_at(col, F.lit(attr_name)))
    return raw.cast(dtype)


def attrs_writetime(attrs_wt: Column | str, attr_name: str) -> Column:
    """Per-attribute writetime lookup — the ``writetime(":attrs"[col])``
    projection: the scan carries a parallel map<attr, bigint> column and
    each indexed attribute resolves its own cell timestamp (per-column LWW
    feeds on this, W3)."""
    col = F.col(attrs_wt) if isinstance(attrs_wt, str) else attrs_wt
    return F.element_at(col, F.lit(attr_name)).cast("long")
