"""Quantization function tests: b1 bit-pack exactness vs a Python reference,
packed-Hamming vs unpacked sign-Hamming, i8 round-trip bounds, f16/bf16
round-trip semantics."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.functions.distance import hamming_distance, vector_lit
from vector_store_spark.functions.quantize import (
    b1_pack,
    dequantize_i8,
    hamming_packed,
    quantize_f16_udf,
    quantize_bf16_udf,
    quantize_i8,
)

VECS = [
    (1, [0.5, -0.1, 0.0, 0.2, -0.9, 1.0, 0.1, -0.2, 0.7]),  # 9 dims -> 2 bytes
    (2, [-0.5, 0.1, 0.3, -0.2, 0.9, -1.0, -0.1, 0.2, -0.7]),
    (3, [1.0] * 9),
]


def py_pack(v):
    bits = [1 if x > 0 else 0 for x in v]
    bits += [0] * (-len(bits) % 8)
    return [int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(VECS, ["id", "v"])


def test_b1_pack_matches_python(df):
    rows = {r.id: r.p for r in df.select("id", b1_pack("v").alias("p")).collect()}
    for vid, v in VECS:
        assert rows[vid] == py_pack(v), vid


def test_hamming_packed_equals_sign_hamming(df):
    q = VECS[0][1]
    got = df.select(
        "id",
        hamming_packed(b1_pack("v"), b1_pack(vector_lit(q))).alias("hp"),
        hamming_distance("v", vector_lit(q)).alias("hs"),
    ).collect()
    for r in got:
        assert r.hp == r.hs, r.id
    assert {r.id: r.hp for r in got}[1] == 0.0


def test_i8_roundtrip(spark):
    df = spark.createDataFrame([(1, [0.0, 1.0, -1.0, 0.5, 2.0, -2.0])], ["id", "v"])
    r = df.select(dequantize_i8(quantize_i8("v")).alias("d")).first()
    assert r.d[0] == 0.0 and r.d[1] == 1.0 and r.d[2] == -1.0
    assert abs(r.d[3] - 64 / 127) < 1e-12  # round(63.5) -> 64 (half-up)
    assert r.d[4] == 1.0 and r.d[5] == -1.0  # clamped


def test_f16_bf16_roundtrip(spark):
    import numpy as np

    v = [0.1, -0.333, 1.5, 1e-5]
    df = spark.createDataFrame([(1, v)], ["id", "v"])
    r = df.select(
        quantize_f16_udf()(F.col("v")).alias("h"),
        quantize_bf16_udf()(F.col("v")).alias("b"),
    ).first()
    exp16 = np.asarray(v, dtype=np.float64).astype(np.float16).astype(np.float64)
    assert r.h == exp16.tolist()
    f32 = np.asarray(v, dtype=np.float32)
    expbf = (f32.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32).astype(np.float64)
    assert r.b == expbf.tolist()
    assert r.h[2] == 1.5 and r.b[2] == 1.5  # exactly representable survives both


def test_hamming_b1_udf_matches_expr(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.functions.quantize import b1_pack, hamming_b1_udf, hamming_packed
    from vector_store_spark.functions.distance import vector_lit
    from vector_store_spark.registry import det_query_vector

    q = det_query_vector(7, 64)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    both = emb.select(
        hamming_b1_udf(q)(F.col("embedding")).alias("udf_d"),
        hamming_packed(
            b1_pack(F.col("embedding").cast("array<double>")), b1_pack(vector_lit(q))
        ).alias("expr_d"),
    )
    assert both.where(F.col("udf_d") != F.col("expr_d")).count() == 0
