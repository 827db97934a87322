"""Alternator blob codec (S6) + timestamp conversion (F10) tests, pinned to
reference semantics: tag dispatch, corrupt-blob -> null, dims mismatch -> null,
100ns tick saturation, TimeUUID ordering."""

import struct
import uuid

import pytest
from pyspark.sql import functions as F

from vector_store_spark.functions.alternator import (
    TAG_DYNAMO_JSON,
    attrs_vector,
    decode_vector_udf,
    encode_vector_udf,
    py_decode_vector,
    py_encode_dynamo_json,
    py_encode_f32,
)
from vector_store_spark.functions.timestamps import (
    I64_MAX,
    py_timeuuid_ticks,
    ticks_from_millis,
    ticks_from_seconds,
    ticks_to_timestamp,
    timestamp_to_ticks,
    timeuuid_ticks,
)


def test_py_codec_roundtrip():
    v = [1.5, -2.25, 0.0, 3.125]
    assert py_decode_vector(py_encode_f32(v)) == v
    assert py_decode_vector(py_encode_dynamo_json(v)) == v


def test_py_decode_error_paths():
    assert py_decode_vector(None) is None
    assert py_decode_vector(b"") is None
    assert py_decode_vector(bytes([0x07]) + b"xxxx") is None  # unknown tag
    assert py_decode_vector(bytes([0x05]) + b"xxx") is None  # not /4
    assert py_decode_vector(bytes([TAG_DYNAMO_JSON]) + b"{nope") is None
    assert py_decode_vector(py_encode_f32([1.0, 2.0]), dims=3) is None  # P9


def test_spark_attrs_roundtrip(spark):
    df = spark.createDataFrame([(1, [1.5, -2.5]), (2, None)], ["id", "v"])
    attrs = df.select(
        "id", F.create_map(F.lit("v"), encode_vector_udf()(F.col("v"))).alias("attrs")
    )
    out = {r.id: r.dec for r in attrs.select(
        "id", attrs_vector("attrs", "v", dims=2).alias("dec")).collect()}
    assert out[1] == [1.5, -2.5]
    assert out[2] is None


def test_spark_dynamo_json_decode(spark):
    blob = py_encode_dynamo_json([0.5, 1.0])
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, b binary")
    r = df.select(decode_vector_udf(2)(F.col("b")).alias("v")).first()
    assert r.v == [0.5, 1.0]


def test_tick_conversions(spark):
    df = spark.createDataFrame([(1, 2, 1_700_000_000)], ["s_small", "ms", "s"])
    r = df.select(
        ticks_from_seconds("s").alias("t"),
        ticks_from_millis(F.lit(I64_MAX)).alias("sat"),
        timestamp_to_ticks(ticks_to_timestamp(ticks_from_seconds("s"))).alias("rt"),
    ).first()
    assert r.t == 1_700_000_000 * 10_000_000
    assert r.sat == I64_MAX  # saturating_mul semantics
    assert r.rt == r.t  # whole-second values survive the µs round-trip


def test_timeuuid_ticks(spark):
    u1 = uuid.uuid1(node=0x123456789ABC, clock_seq=0x1234)
    u2 = uuid.uuid1(node=0x123456789ABC, clock_seq=0x1234)
    t1, t2 = py_timeuuid_ticks(u1), py_timeuuid_ticks(u2)
    assert t2 >= t1  # version ordering (lib.rs:580-590)
    df = spark.createDataFrame([(str(u1),), (str(u2),)], ["u"])
    got = [r.t for r in df.select(timeuuid_ticks("u").alias("t")).collect()]
    assert got == [t1, t2]
    with pytest.raises(ValueError):
        py_timeuuid_ticks(uuid.uuid4())


def test_alternator_scalar_attrs_and_writetimes(spark):
    """Filtering attributes from ':attrs' (db_index_backend.rs:37-62): the
    reference reads EVERY indexed column from the map with a per-attr
    writetime. Scalar attrs are 0x04 DynamoDB-JSON docs; decode is typed
    and corrupt blobs null out (P8)."""
    from vector_store_spark.functions.alternator import (
        TAG_DYNAMO_JSON,
        attrs_scalar,
        attrs_writetime,
        py_decode_attr,
        py_encode_attr,
    )

    assert py_decode_attr(py_encode_attr(12.5)) == "12.5"
    assert py_decode_attr(py_encode_attr("abc")) == "abc"
    assert py_decode_attr(py_encode_attr(True)) == "true"
    assert py_decode_attr(None) is None
    assert py_decode_attr(bytes([0x05]) + b"junk") is None  # vector tag
    assert py_decode_attr(bytes([TAG_DYNAMO_JSON]) + b"{nope") is None

    rows = [
        (1, {"lbl": py_encode_attr(7), "cat": py_encode_attr("news")},
         {"lbl": 100, "cat": 200}),
        (2, {"lbl": py_encode_attr(9)}, {"lbl": 300}),
        (3, {"cat": bytes([TAG_DYNAMO_JSON]) + b"broken"}, {}),
    ]
    df = spark.createDataFrame(
        rows, "id long, attrs map<string,binary>, wt map<string,bigint>")
    got = {
        r.id: (r.lbl, r.cat, r.lbl_wt)
        for r in df.select(
            "id",
            attrs_scalar("attrs", "lbl", "int").alias("lbl"),
            attrs_scalar("attrs", "cat", "string").alias("cat"),
            attrs_writetime("wt", "lbl").alias("lbl_wt"),
        ).collect()
    }
    assert got[1] == (7, "news", 100)
    assert got[2] == (9, None, 300)   # absent attr -> null
    assert got[3] == (None, None, None)  # corrupt -> null (P8)
