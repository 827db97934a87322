"""ANN / top-k query registry entries (SURVEY.md §2.5 T1/T2, §2.3 J1/J3,
§2.4 A1/A3).

Each Spark query is an exact filtered top-k — ``WHERE pred ORDER BY dist LIMIT k``
— which Catalyst executes as partition-local k-heaps (TakeOrderedAndProject):
no full shuffle, predicate pushed to the scan, linear scale-out. The oracle SQL
recomputes the same math in DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vector_store_spark.operators.topk import ann_topk, knn_join
from vector_store_spark.registry import ROUND, det_query_vector, load, register, sql_vec
from vector_store_spark.types import SpaceType

DIMS = 64
Q7 = det_query_vector(7, DIMS)
Q13 = det_query_vector(13, DIMS)
Q21 = det_query_vector(21, DIMS)

_BASE = "(SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"


def _cos_sql(qlit: str) -> str:
    return (
        f"1.0 - list_inner_product(e, {qlit}) / "
        f"(sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({qlit}, {qlit})))"
    )


def _topk_sql(dist_sql: str, sim_sql: str, k: int, where: str = "") -> str:
    return f"""
WITH scored AS (
  SELECT vec_id, label, round({dist_sql}, {ROUND}) AS distance
  FROM {_BASE} {where}
)
SELECT vec_id, label, distance, round({sim_sql}, {ROUND}) AS similarity
FROM scored
ORDER BY distance, vec_id
LIMIT {k}
"""


@register(
    "ann_cosine_topk",
    _topk_sql(_cos_sql(sql_vec(Q7)), "(2.0 - distance) / 2.0", 10),
    "T1: exact top-10 by cosine distance, default space (lib.rs:443)",
)
def ann_cosine_topk(spark, sf_dir):
    return ann_topk(
        load(spark, sf_dir, "embeddings"), "embedding", Q7, 10,
        space=SpaceType.COSINE, tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_l2sq_topk",
    _topk_sql(
        f"list_inner_product(list_transform(list_zip(e, {sql_vec(Q13)}), x -> (x[1] - x[2])), "
        f"list_transform(list_zip(e, {sql_vec(Q13)}), x -> (x[1] - x[2])))",
        "1.0 / (1.0 + distance)",
        10,
    ),
    "T1: top-10 by squared L2 (the reference's 'euclidean', usearch.rs:483)",
)
def ann_l2sq_topk(spark, sf_dir):
    return ann_topk(
        load(spark, sf_dir, "embeddings"), "embedding", Q13, 10,
        space=SpaceType.EUCLIDEAN, tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_dot_topk",
    _topk_sql(f"1.0 - list_inner_product(e, {sql_vec(Q21)})", "(2.0 - distance) / 2.0", 10),
    "T1: top-10 by inner-product distance 1-<a,b> (USearch IP)",
)
def ann_dot_topk(spark, sf_dir):
    return ann_topk(
        load(spark, sf_dir, "embeddings"), "embedding", Q21, 10,
        space=SpaceType.DOT_PRODUCT, tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_filtered_topk",
    _topk_sql(_cos_sql(sql_vec(Q7)), "(2.0 - distance) / 2.0", 8, where="WHERE label IN (2, 5, 7)"),
    "T2: filtered ANN — top-k OF the filtered set (usearch.rs:224-248)",
)
def ann_filtered_topk(spark, sf_dir):
    return ann_topk(
        load(spark, sf_dir, "embeddings"), "embedding", Q7, 8,
        space=SpaceType.COSINE, predicate=F.col("label").isin(2, 5, 7),
        tie_break=["vec_id"], select_cols=["vec_id", "label"], round_to=ROUND,
    )


_KNN_QUERIES = [("q7", Q7), ("q13", Q13), ("q21", Q21)]


@register(
    "knn_batch",
    f"""
WITH queries(query_id, qv) AS (VALUES
  {", ".join(f"('{name}', {sql_vec(vec)})" for name, vec in _KNN_QUERIES)}
),
base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
  SELECT q.query_id, b.vec_id,
         round(1.0 - list_inner_product(b.e, q.qv) /
               (sqrt(list_inner_product(b.e, b.e)) * sqrt(list_inner_product(q.qv, q.qv))), {ROUND}) AS distance
  FROM queries q CROSS JOIN base b
)
SELECT query_id, vec_id, distance
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn FROM scored)
WHERE rn <= 5
""",
    "J3: batch brute-force kNN join — broadcast query matrix, per-partition GEMM top-k",
)
def knn_batch(spark, sf_dir):
    return knn_join(
        load(spark, sf_dir, "embeddings"), "embedding",
        [(n, v) for n, v in _KNN_QUERIES], k=5,
        id_cols=["vec_id"], round_to=ROUND,
    ).select("query_id", "vec_id", "distance")


@register(
    "alternator_ann_topk",
    _topk_sql(_cos_sql(sql_vec(Q13)), "(2.0 - distance) / 2.0", 10),
    "S6: Alternator ':attrs' map scan — 0x05-tagged BE-f32 blob decode, then ANN "
    "(oracle scores the raw vectors: a PASS proves the encode->decode byte round-trip)",
)
def alternator_ann_topk(spark, sf_dir):
    from vector_store_spark.functions.alternator import attrs_vector, encode_vector_udf

    emb = load(spark, sf_dir, "embeddings")
    attrs_tbl = emb.select(
        "vec_id", "label",
        F.create_map(F.lit("v"), encode_vector_udf()(F.col("embedding"))).alias("attrs"),
    )
    decoded = attrs_tbl.withColumn("embedding", attrs_vector("attrs", "v", dims=64))
    return ann_topk(
        decoded, "embedding", Q13, 10,
        space=SpaceType.COSINE, tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "alternator_filtered_ann_topk",
    # the oracle scores raw vectors + raw label: a PASS proves BOTH wire
    # round-trips (vector 0x05 blob AND the 0x04 DynamoDB-JSON scalar attr
    # the filter consumes)
    _topk_sql(_cos_sql(sql_vec(Q13)), "(2.0 - distance) / 2.0", 10,
              where="WHERE label IN (1, 3) AND vec_id % 2 = 0"),
    "S6 filtering attributes: the reference reads EVERY indexed column from "
    "':attrs' — targets AND filtering columns, each with its own writetime "
    "(db_index_backend.rs:37-62). Here the filter column is itself a "
    "0x04-tagged DynamoDB-JSON attr, typed-decoded (attrs_scalar) and "
    "evaluated BEFORE the top-k (T2: top-k OF the filtered set)",
)
def alternator_filtered_ann_topk(spark, sf_dir):
    from vector_store_spark.functions.alternator import (
        attrs_scalar,
        attrs_vector,
        encode_attr_udf,
        encode_vector_udf,
    )

    emb = load(spark, sf_dir, "embeddings")
    attrs_tbl = emb.select(
        "vec_id",
        F.create_map(
            F.lit("v"), encode_vector_udf()(F.col("embedding")),
            F.lit("lbl"), encode_attr_udf()(F.col("label")),
            F.lit("parity"), encode_attr_udf()(
                F.when(F.col("vec_id") % 2 == 0, F.lit("even")).otherwise(F.lit("odd"))),
        ).alias("attrs"),
    )
    decoded = (
        attrs_tbl
        .withColumn("embedding", attrs_vector("attrs", "v", dims=64))
        .withColumn("label", attrs_scalar("attrs", "lbl", "int"))
        .withColumn("parity", attrs_scalar("attrs", "parity", "string"))
    )
    return ann_topk(
        decoded, "embedding", Q13, 10,
        space=SpaceType.COSINE,
        predicate=F.col("label").isin(1, 3) & (F.col("parity") == "even"),
        tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "agg_label_counts",
    "SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label ORDER BY label",
    "A1/A3: per-partition index size counters (usearch.rs:1020-1049, table/mod.rs:112-158)",
)
def agg_label_counts(spark, sf_dir):
    return (
        load(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("label")
    )


Q29 = det_query_vector(29, DIMS)


@register(
    "ann_sql_topk",
    _topk_sql(_cos_sql(sql_vec(Q29)), "(2.0 - distance) / 2.0", 10),
    "The CQL `ORDER BY v ANN OF [...] LIMIT k` surface as pure Spark SQL over "
    "the vs_* SQL UDF macros (sql.py) — inlined by the analyzer, still "
    "TakeOrderedAndProject",
)
def ann_sql_topk(spark, sf_dir):
    from vector_store_spark.sql import register_sql_functions

    register_sql_functions(spark)
    load(spark, sf_dir, "embeddings").createOrReplaceTempView("vs_embeddings")
    qsql = "array(" + ", ".join(repr(float(v)) + "D" for v in Q29) + ")"
    return spark.sql(f"""
        WITH scored AS (
          SELECT vec_id, label,
                 round(vs_cosine_distance(CAST(embedding AS ARRAY<DOUBLE>), {qsql}),
                       {ROUND}) AS distance
          FROM vs_embeddings
        )
        SELECT vec_id, label, distance,
               round(vs_cosine_similarity(distance), {ROUND}) AS similarity
        FROM scored ORDER BY distance, vec_id LIMIT 10
    """)


Q37 = det_query_vector(37, DIMS)


@register(
    "ann_topk_per_partition",
    f"""
WITH scored AS (
  SELECT vec_id, label, round({_cos_sql(sql_vec(Q37))}, {ROUND}) AS distance
  FROM {_BASE}
),
ranked AS (
  SELECT vec_id, label, distance,
         row_number() OVER (PARTITION BY label ORDER BY distance, vec_id) AS rn
  FROM scored
)
SELECT label, vec_id, distance, rn AS rank
FROM ranked WHERE rn <= 3
""",
    "Every local index answered in ONE query: top-3 per partition key via a "
    "single window — the batch analogue of fanning out over all local "
    "sub-indexes (lib.rs:677-680)",
)
def ann_topk_per_partition(spark, sf_dir):
    from pyspark.sql import Window

    from vector_store_spark.functions.distance import cosine_distance, vector_lit

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id", "label",
        F.round(cosine_distance("embedding", vector_lit(Q37)), ROUND).alias("distance"),
    )
    w = Window.partitionBy("label").orderBy(F.asc("distance"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("label", "vec_id", "distance", "rank")
    )


@register(
    "alternator_json_ann_topk",
    _topk_sql(_cos_sql(sql_vec(Q21)), "(2.0 - distance) / 2.0", 10),
    "S6 second wire tag: 0x04 DynamoDB-JSON list-of-numbers codec - encode ->"
    " ':attrs' map -> decode -> ANN (a PASS proves the JSON number round-trip)",
)
def alternator_json_ann_topk(spark, sf_dir):
    from vector_store_spark.functions.alternator import (
        TAG_DYNAMO_JSON,
        attrs_vector,
        encode_vector_udf,
    )

    emb = load(spark, sf_dir, "embeddings")
    attrs_tbl = emb.select(
        "vec_id", "label",
        F.create_map(
            F.lit("v"), encode_vector_udf(TAG_DYNAMO_JSON)(F.col("embedding"))
        ).alias("attrs"),
    )
    decoded = attrs_tbl.withColumn("embedding", attrs_vector("attrs", "v", dims=64))
    return ann_topk(
        decoded, "embedding", Q21, 10,
        space=SpaceType.COSINE, tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "emb_norm_profile",
    f"""
WITH e AS (
  SELECT label, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
       round(min(nrm), {ROUND}) AS min_norm,
       round(max(nrm), {ROUND}) AS max_norm,
       round(quantile_cont(nrm, 0.5), {ROUND}) AS p50_norm
FROM e GROUP BY label
""",
    "Embedding hygiene profile: per-label vector-norm distribution "
    "(count/min/p50/max) - the sanity scan before index build",
)
def emb_norm_profile(spark, sf_dir):
    from vector_store_spark.functions.distance import vector_norm

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", vector_norm(F.col("embedding").cast("array<double>")).alias("nrm")
    )
    return e.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.min("nrm"), ROUND).alias("min_norm"),
        F.round(F.max("nrm"), ROUND).alias("max_norm"),
        F.round(F.percentile("nrm", 0.5), ROUND).alias("p50_norm"),
    )


# ---------------------------------------------------------------------------
# Benchmark dataset layouts (crates/benchmark/src/data/{parquet,fbin}.rs):
# the embeddings table exported once into each shipped layout (a
# benchmark-sized fixture, memoized like the persisted indexes), then read
# back EXCLUSIVELY through sources/bench_datasets readers and ranked
# exactly. Ids are the layouts' implicit/explicit row positions, so the
# oracle re-derives them with a row_number over the export order.
# ---------------------------------------------------------------------------

_DATASET_TOPK_SQL = f"""
WITH e AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
)
SELECT vec_id,
       round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
FROM e ORDER BY distance, vec_id LIMIT 10
"""


def _dataset_export(spark, sf_dir: str, kind: str) -> str:
    """Memoized export of the embeddings table into a benchmark layout dir."""
    import numpy as np

    from vector_store_spark.queries_ivf import _built
    from vector_store_spark.sources import bench_datasets as bd

    def build(p):
        rows = (
            load(spark, sf_dir, "embeddings")
            .select("embedding").orderBy("vec_id").collect()
        )
        train = np.array([r.embedding for r in rows], dtype="f4")
        queries = np.array([Q7], dtype="f4")
        gt = np.zeros((1, 1), dtype="i4")  # GT unused here; exactness is the oracle
        if kind == "fbin":
            bd.write_fbin_dataset(p, train, queries, gt)
        elif kind == "fvecs":
            os.makedirs(p, exist_ok=True)
            bd.write_fvecs(os.path.join(p, "train.fvecs"), train)
            bd.write_fvecs(os.path.join(p, "query.fvecs"), queries)
            bd.write_ivecs(os.path.join(p, "gt.ivecs"), gt)
        else:
            bd.write_parquet_dataset(p, train, queries, gt)

    return _built(spark, sf_dir, f"dataset_{kind}", build)


@register(
    "dataset_fbin_roundtrip_topk",
    _DATASET_TOPK_SQL,
    "big-ann fbin layout round-trip: export -> header-framed dense f32 file "
    "-> distributed per-slice memory-mapped read (fbin_dataframe) -> exact "
    "cosine top-k; value-hash-equal to ranking the source table",
)
def dataset_fbin_roundtrip_topk(spark, sf_dir):
    from vector_store_spark.sources import bench_datasets as bd

    path = _dataset_export(spark, sf_dir, "fbin")
    tdf = bd.train_dataframe(spark, path)
    return ann_topk(
        tdf, "embedding", Q7, 10, tie_break=["vec_id"],
        select_cols=["vec_id"], round_to=ROUND,
    ).drop("similarity")


@register(
    "dataset_vdbbench_roundtrip_topk",
    _DATASET_TOPK_SQL,
    "VectorDBBench parquet layout round-trip: export -> train/test/neighbors "
    "files -> train_dataframe (native parquet scan, pushdown intact) -> "
    "exact cosine top-k; value-hash-equal to ranking the source table",
)
def dataset_vdbbench_roundtrip_topk(spark, sf_dir):
    from vector_store_spark.sources import bench_datasets as bd

    path = _dataset_export(spark, sf_dir, "parquet")
    tdf = bd.train_dataframe(spark, path)
    return ann_topk(
        tdf, "embedding", Q7, 10, tie_break=["vec_id"],
        select_cols=["vec_id"], round_to=ROUND,
    ).drop("similarity")


@register(
    "dataset_fvecs_roundtrip_topk",
    _DATASET_TOPK_SQL,
    "TEXMEX fvecs layout round-trip (the SIFT/GIST corpus format: per-row "
    "[i32 dim][dim f32], no global header): export -> distributed per-slice "
    "memory-mapped read with per-row dim validation (fvecs_dataframe) -> "
    "exact cosine top-k; value-hash-equal to ranking the source table",
)
def dataset_fvecs_roundtrip_topk(spark, sf_dir):
    from vector_store_spark.sources import bench_datasets as bd

    path = _dataset_export(spark, sf_dir, "fvecs")
    tdf = bd.fvecs_dataframe(spark, os.path.join(path, "train.fvecs"))
    return ann_topk(
        tdf, "embedding", Q7, 10, tie_break=["vec_id"],
        select_cols=["vec_id"], round_to=ROUND,
    ).drop("similarity")


@register(
    "knn_label_vote",
    # kNN classification: each query point takes the majority label of its
    # 10 nearest neighbors (rounded-distance ranks, ties by vec_id — the
    # cross-engine-stable ordering); vote ties break by smallest label
    f"""
WITH queries(query_id, qv) AS (VALUES
  {", ".join(f"('{name}', {sql_vec(vec)})" for name, vec in _KNN_QUERIES)}
),
base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
  SELECT q.query_id, b.vec_id, b.label,
         round(1.0 - list_inner_product(b.e, q.qv) /
               (sqrt(list_inner_product(b.e, b.e)) * sqrt(list_inner_product(q.qv, q.qv))), {ROUND}) AS distance
  FROM queries q CROSS JOIN base b
),
nn AS (
  SELECT query_id, label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn
    FROM scored
  ) WHERE rn <= 10
),
votes AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes FROM nn GROUP BY query_id, label
)
SELECT query_id, label AS predicted_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS vr
  FROM votes
) WHERE vr = 1
""",
    "kNN classification (semi-supervised label propagation): majority vote "
    "of the 10 nearest labeled neighbors per query — the label rides the "
    "kNN join as payload, voting is a result-sized aggregation",
)
def knn_label_vote(spark, sf_dir):
    from vector_store_spark.operators.topk import knn_label_vote as _klv

    emb = load(spark, sf_dir, "embeddings")
    return _klv(
        emb, "embedding", "label", [(n, v) for n, v in _KNN_QUERIES], k=10,
        round_to=ROUND,
    )


_RANGE_TAU, _RANGE_CAP = 0.72, 100


@register(
    "ann_range_cosine",
    # range search (all matches within a distance budget, result-capped):
    # standard vector-store surface beyond the reference's fixed-k ANN.
    # filter-then-cap == cap-then-filter for an ascending-distance ordering,
    # so the engine reuses the exact top-k kernel (per-partition k-heaps,
    # TakeOrderedAndProject) and drops the out-of-range tail — no second
    # scoring path to maintain
    f"""
WITH scored AS (
  SELECT vec_id, label, round({_cos_sql(sql_vec(Q7))}, {ROUND}) AS distance
  FROM {_BASE}
)
SELECT vec_id, label, distance
FROM scored WHERE distance <= {_RANGE_TAU}
ORDER BY distance, vec_id
LIMIT {_RANGE_CAP}
""",
    "Range similarity search: every vector within cosine-distance 0.72 of "
    "the query (capped at 100, distance-ascending) — the 'all near matches' "
    "dual of top-k, served by the same GEMM + k-heap plan",
)
def ann_range_cosine(spark, sf_dir):
    out = ann_topk(
        load(spark, sf_dir, "embeddings"), "embedding", Q7, _RANGE_CAP,
        space=SpaceType.COSINE, tie_break=["vec_id"],
        select_cols=["vec_id", "label"], round_to=ROUND,
    )
    return out.where(F.col("distance") <= _RANGE_TAU).drop("similarity")
