"""Quantization registry entries (reference: quantization index option +
rescoring CQL option, crates/validator/src/quantization_and_rescoring.rs):

- B1 sign binarization: Spark genuinely bit-packs (array<tinyint>, MSB-first)
  and scores with popcount(xor); the oracle computes the same Hamming count
  semantically over sign bits — a PASS proves the pack/popcount round-trip.
- i8 + rescoring: candidates ranked by quantized dot product, then the
  survivor set re-ranked at full precision (rescoring=true semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.functions.distance import cosine_distance, vector_lit
from vector_store_spark.functions.quantize import (
    b1_pack,
    dequantize_i8,
    hamming_b1_udf,
    hamming_packed,
    quantize_i8,
)
from vector_store_spark.registry import ROUND, det_query_vector, load, register, sql_vec

DIMS = 64
Q7 = det_query_vector(7, DIMS)
Q13 = det_query_vector(13, DIMS)

_SIGN_HAMMING = (
    "list_sum(list_transform(list_zip(e, {q}), "
    "p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END))"
)


@register(
    "ann_hamming_b1_topk",
    f"""
WITH scored AS (
  SELECT vec_id, label,
         CAST({_SIGN_HAMMING.format(q=sql_vec(Q7))} AS DOUBLE) AS distance
  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
)
SELECT vec_id, label, distance,
       round(1.0 - distance / {DIMS}, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "B1 quantization: sign bit-pack (MSB-first bytes) + popcount-XOR Hamming top-k",
)
def ann_hamming_b1_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = emb.select(
        "vec_id", "label", hamming_b1_udf(Q7)(F.col("embedding")).alias("distance")
    )
    return (
        out.orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(10)
        .select(
            "vec_id", "label", "distance",
            F.round(F.lit(1.0) - F.col("distance") / DIMS, ROUND).alias("similarity"),
        )
    )


@register(
    "knn_batch_hamming",
    f"""
WITH queries(query_id, qv) AS (VALUES
  ('q7', {sql_vec(Q7)}), ('q13', {sql_vec(Q13)})
),
base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
  SELECT q.query_id, b.vec_id,
         CAST(list_sum(list_transform(list_zip(b.e, q.qv),
              p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END)) AS DOUBLE) AS distance
  FROM queries q CROSS JOIN base b
)
SELECT query_id, vec_id, distance
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn FROM scored)
WHERE rn <= 5
""",
    "J3 in Hamming space: batch kNN over sign-binarized vectors — packed-B1 "
    "XOR + popcount-LUT per Arrow batch (usearch.rs:480-487 first-class Hamming)",
)
def knn_batch_hamming(spark, sf_dir):
    from vector_store_spark.operators.topk import knn_join
    from vector_store_spark.types import SpaceType

    return knn_join(
        load(spark, sf_dir, "embeddings"), "embedding",
        [("q7", Q7), ("q13", Q13)], k=5,
        space=SpaceType.HAMMING, id_cols=["vec_id"],
    ).select("query_id", "vec_id", "distance")


_I8 = "list_transform(e, x -> greatest(-127, least(127, CAST(round(x * 127) AS INT))) / 127.0)"
_CAND = 30


@register(
    "ann_i8_rescored_topk",
    f"""
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT {_I8.replace("(e,", f"({sql_vec(Q13)},")} AS qi),
quant AS (
  SELECT vec_id, label, e,
         1.0 - list_inner_product({_I8}, (SELECT qi FROM q)) AS qdist
  FROM base
),
cand AS (
  SELECT * FROM quant ORDER BY qdist, vec_id LIMIT {_CAND}
)
SELECT vec_id, label,
       round(1.0 - list_inner_product(e, {sql_vec(Q13)}) /
             (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(Q13)}, {sql_vec(Q13)}))), {ROUND}) AS distance
FROM cand
ORDER BY distance, vec_id LIMIT 10
""",
    "i8 quantization + rescoring: quantized-dot candidates, full-precision re-rank",
)
def ann_i8_rescored_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    qi8 = dequantize_i8(quantize_i8(vector_lit(Q13)))
    vi8 = dequantize_i8(quantize_i8(e))
    from vector_store_spark.functions.distance import dot_product

    quant = emb.select(
        "vec_id", "label", F.col("embedding"),
        (F.lit(1.0) - dot_product(vi8, qi8)).alias("qdist"),
    )
    cand = quant.orderBy(F.col("qdist").asc(), F.col("vec_id").asc()).limit(_CAND)
    rescored = cand.withColumn(
        "distance",
        F.round(cosine_distance(F.col("embedding").cast("array<double>"), vector_lit(Q13)), ROUND),
    )
    return (
        rescored.orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", "distance")
    )


# ---------------------------------------------------------------------------
# f16 / bf16 + rescoring, mirroring the i8 entry (validator
# quantization_and_rescoring.rs:117-256 covers all scalar kinds). The oracle
# re-derives the IEEE round-trips in pure SQL, bit-exactly:
#   f16  = round-half-even of the f32 value at ulp 2^(e-10), e clamped to
#          >= -14 (subnormal range);
#   bf16 = truncation of the f32 value at ulp 2^(e-7) (bit-mask semantics).
# Both formulas were validated value-for-value against numpy's
# float16/bf16 round-trips over every embedding element and query literal.
# ---------------------------------------------------------------------------

Q17 = det_query_vector(17, DIMS)
Q23 = det_query_vector(23, DIMS)


def _f16_sql(x: str) -> str:
    y = f"CAST(CAST({x} AS FLOAT) AS DOUBLE)"
    ulp = f"power(2.0, greatest(floor(log2(abs({y}))), -14) - 10)"
    sc = f"(abs({y}) / {ulp})"
    fl = f"floor({sc})"
    return (
        f"CASE WHEN {y} = 0 THEN 0.0 ELSE sign({y}) * ({fl} + "
        f"CASE WHEN {sc} - {fl} > 0.5 THEN 1 "
        f"WHEN {sc} - {fl} = 0.5 THEN CAST({fl} AS BIGINT) % 2 "
        f"ELSE 0 END) * {ulp} END"
    )


def _bf16_sql(x: str) -> str:
    y = f"CAST(CAST({x} AS FLOAT) AS DOUBLE)"
    ulp = f"power(2.0, floor(log2(abs({y}))) - 7)"
    return (
        f"CASE WHEN {y} = 0 THEN 0.0 "
        f"ELSE sign({y}) * floor(abs({y}) / {ulp}) * {ulp} END"
    )


def _np_f16(vals):
    import numpy as np

    return [float(v) for v in
            np.asarray(vals, dtype=np.float32).astype(np.float16).astype(np.float64)]


def _np_bf16(vals):
    import numpy as np

    f32 = np.asarray(vals, dtype=np.float32)
    return [float(v) for v in
            (f32.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32).astype(np.float64)]


def _rescored_entry(name, q, quant_udf_factory, quant_sql, q_quant):
    oracle = f"""
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
quant AS (
  SELECT vec_id, label, e,
         1.0 - list_inner_product(list_transform(e, x -> {quant_sql('x')}),
                                  {sql_vec(q_quant)}) AS qdist
  FROM base
),
cand AS (
  SELECT * FROM quant ORDER BY qdist, vec_id LIMIT {_CAND}
)
SELECT vec_id, label,
       round(1.0 - list_inner_product(e, {sql_vec(q)}) /
             (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(q)}, {sql_vec(q)}))), {ROUND}) AS distance
FROM cand
ORDER BY distance, vec_id LIMIT 10
"""

    def fn(spark, sf_dir):
        from vector_store_spark.functions.distance import dot_product

        emb = load(spark, sf_dir, "embeddings")
        qv = quant_udf_factory()(F.col("embedding").cast("array<double>"))
        quant = emb.select(
            "vec_id", "label", F.col("embedding"),
            (F.lit(1.0) - dot_product(qv, vector_lit(q_quant))).alias("qdist"),
        )
        cand = quant.orderBy(F.col("qdist").asc(), F.col("vec_id").asc()).limit(_CAND)
        rescored = cand.withColumn(
            "distance",
            F.round(cosine_distance(F.col("embedding").cast("array<double>"), vector_lit(q)), ROUND),
        )
        return (
            rescored.orderBy(F.col("distance").asc(), F.col("vec_id").asc())
            .limit(10)
            .select("vec_id", "label", "distance")
        )

    fn.__name__ = name
    kind = name.split("_")[1]
    register(
        name, oracle,
        f"{kind} quantization + rescoring: quantized-dot candidates (oracle "
        f"re-derives the IEEE {kind} round-trip in SQL), full-precision re-rank",
    )(fn)
    return fn


from vector_store_spark.functions.quantize import quantize_bf16_udf, quantize_f16_udf  # noqa: E402

ann_f16_rescored_topk = _rescored_entry(
    "ann_f16_rescored_topk", Q17, quantize_f16_udf, _f16_sql, _np_f16(Q17)
)
ann_bf16_rescored_topk = _rescored_entry(
    "ann_bf16_rescored_topk", Q23, quantize_bf16_udf, _bf16_sql, _np_bf16(Q23)
)


def _i8_x(x: str) -> str:
    """per-element i8 round-trip (the list body of _I8)"""
    return f"greatest(-127, least(127, CAST(round({x} * 127) AS INT))) / 127.0"


def _err_leg_sql(scheme: str, roundtrip_x: str) -> str:
    return f"""
SELECT '{scheme}' AS scheme,
       round(sum(list_sum(errs)) / (count(*) * {DIMS}), {ROUND}) AS mean_abs_err,
       round(max(list_max(errs)), {ROUND}) AS max_abs_err
FROM (
  SELECT list_transform(e, x -> abs(x - ({roundtrip_x}))) AS errs
  FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id % 10 = 0)
)"""


@register(
    "emb_quantization_error_profile",
    # reconstruction-error audit per quantization scheme over a deterministic
    # 10% sample (the audit posture: a sample answers "which scheme fits this
    # corpus"; the full-corpus sweep is the same plan at 10x the rows). The
    # oracle re-derives each IEEE round-trip per element in SQL — the same
    # twins the rescored-ANN oracles use — so every |x - dq(q(x))| is
    # bit-identical before the only rounding at the corpus rollup.
    _err_leg_sql("bf16", _bf16_sql("x"))
    + "\nUNION ALL" + _err_leg_sql("f16", _f16_sql("x"))
    + "\nUNION ALL" + _err_leg_sql("i8", _i8_x("x")),
    "Quantization reconstruction-error profile (mean/max abs error for "
    "i8 / f16 / bf16 round-trips) — the corpus audit behind choosing a "
    "memory tier; per-vector error reductions stay in the scan, the rollup "
    "is 3 rows",
)
def emb_quantization_error_profile(spark, sf_dir):
    from vector_store_spark.functions.quantize import quantize_bf16_udf, quantize_f16_udf

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    e = F.col("embedding").cast("array<double>")
    schemes = [
        ("bf16", quantize_bf16_udf()(e)),
        ("f16", quantize_f16_udf()(e)),
        ("i8", dequantize_i8(quantize_i8(e))),
    ]
    parts = []
    for name, qe in schemes:
        errs = F.zip_with(e, qe, lambda x, y: F.abs(x - y))
        parts.append(
            emb.select(
                F.lit(name).alias("scheme"),
                F.aggregate(errs, F.lit(0.0), lambda a, x: a + x).alias("sum_err"),
                F.array_max(errs).alias("max_err"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    dims = F.lit(DIMS)
    return u.groupBy("scheme").agg(
        F.round(F.sum("sum_err") / (F.count("*") * dims), ROUND).alias("mean_abs_err"),
        F.round(F.max("max_err"), ROUND).alias("max_abs_err"),
    )
