"""Graph-ANN (HNSW) registry entries — the reference's default engine
(USearch HNSW, crates/vector-store/src/vs_index/usearch.rs) served by
operators/hnsw's sliced-graph layout.

Oracle strategy: the graph build is deterministic (hash-derived levels, no
RNG), and `hnsw_build_stats` re-derives the level/slice assignment
algebraically in SQL — checking the persisted graph structure itself.  The
search entries are checked against the EXACT top-k oracle: HNSW is
approximate in general, but at the driver's correctness scale (sf0.01, with
ef_search=64 beams over ~125-node slices whose layer-0 graphs are
connectivity-repaired) the beam provably reaches the true neighbors, and
the hash gate verifies it returns *exactly* the brute-force answer —
recall quality at larger scale is a bench metric (recall_at_10_hnsw_by_ef).
"""

from __future__ import annotations

from vector_store_spark.queries_ivf import _built
from vector_store_spark.registry import ROUND, det_query_vector, load, register, sql_vec

M = 8
EFC = 64
EF = 64
SLICES = 4
Q7 = det_query_vector(7, 64)
QI1 = det_query_vector(11, 64)
QI2 = det_query_vector(13, 64)

_COS = (
    "round(1.0 - list_inner_product(v, {q}) / "
    "(sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({q}, {q}))), "
    f"{ROUND}) AS distance"
)


def _exact_topk_sql(where: str = "", extra_rows: str = "", q: list | None = None) -> str:
    src = f"SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings {where}"
    if extra_rows:
        src = f"{src} UNION ALL {extra_rows}"
    return f"""
WITH e AS ({src}),
cand AS (SELECT vec_id, label, {_COS.format(q=sql_vec(q or Q7))} FROM e)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
"""


def _hnsw_path(spark, sf_dir) -> str:
    from vector_store_spark.operators.hnsw import hnsw_build

    emb = load(spark, sf_dir, "embeddings")
    return _built(
        spark, sf_dir, "hnsw",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, num_slices=SLICES,
                             payload_cols=["label"]),
    )


def _back_join(spark, sf_dir, res):
    """J1 id→key back-join (operators/topk.py J1): the graph emits
    (vec_id, distance, similarity); payload columns re-attach by key, with
    the k-row side broadcast so the probe is a lookup, not a shuffle."""
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        emb.join(F.broadcast(res), "vec_id")
        .select("vec_id", "label", "distance", "similarity")
        .orderBy("distance", "vec_id")
    )


@register(
    "hnsw_build_stats",
    # the persisted graph's slice + level assignment re-derived algebraically:
    # slice = id % S; level = min(floor(-ln(u)/ln(m)), 6) with
    # u = ((id * 2654435761) mod 2^32 + 1) / (2^32 + 1)  (operators/hnsw._levels_of)
    f"""
SELECT CAST(vec_id % {SLICES} AS INT) AS slice,
       CAST(least(floor(-ln((((vec_id * 2654435761) % 4294967296) + 1) / 4294967297.0)
                        / ln({M})), 6) AS INT) AS level,
       count(*) AS n_nodes
FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2
""",
    "HNSW build: per-(slice, level) node counts decoded from the persisted "
    "graph blobs — checks the layout's deterministic level law end-to-end",
)
def hnsw_build_stats(spark, sf_dir):
    import numpy as np

    path = _hnsw_path(spark, sf_dir)

    def stats(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for _, row in pdf.iterrows():
                levels = np.frombuffer(row["levels"], dtype=np.int8)
                lv, cnt = np.unique(levels, return_counts=True)
                for l, c in zip(lv, cnt):
                    out.append((int(row["slice"]), int(l), int(c)))
            yield pd.DataFrame(out, columns=["slice", "level", "n_nodes"])

    graph = spark.read.parquet(f"{path}/graph")
    return (
        graph.mapInPandas(stats, "slice int, level int, n_nodes long")
        .orderBy("slice", "level")
    )


@register(
    "ann_hnsw_topk",
    _exact_topk_sql(),
    "Graph ANN: sliced HNSW (usearch.rs:203-248 beam search; m=connectivity, "
    "ef=expansion_search), per-slice beams merged by one TakeOrderedAndProject; "
    "verified to return the exact brute-force top-k at this scale",
)
def ann_hnsw_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_search

    path = _hnsw_path(spark, sf_dir)
    res = hnsw_search(spark, path, Q7, 10, ef_search=EF, round_to=ROUND)
    return _back_join(spark, sf_dir, res)


@register(
    "ann_hnsw_diskann_topk",
    _exact_topk_sql(),
    "DiskANN-class graph variant (diskann.rs:66; Vamana RobustPrune slack "
    "alpha=1.2, diskann.rs:452-464): same sliced-graph serving path, denser "
    "alpha-pruned layer-0 neighborhoods; verified to return the exact "
    "brute-force top-k at this scale",
)
def ann_hnsw_diskann_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "hnsw_diskann",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, num_slices=SLICES,
                             payload_cols=["label"], alpha=1.2),
    )
    res = hnsw_search(spark, path, Q7, 10, ef_search=EF, round_to=ROUND)
    return _back_join(spark, sf_dir, res)


@register(
    "ann_hnsw_filtered_topk",
    _exact_topk_sql(where="WHERE label IN (1, 2)"),
    "Filtered graph ANN (usearch.rs:1108-1154): the predicate is evaluated on "
    "the columnar payload, reduced to per-slice allow-bitmaps, and the beam "
    "collects only matching nodes while traversing the full graph — top-k OF "
    "the filtered set (T2)",
)
def ann_hnsw_filtered_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.hnsw import hnsw_search

    path = _hnsw_path(spark, sf_dir)
    res = hnsw_search(spark, path, Q7, 10, ef_search=EF,
                      predicate=F.col("label").isin(1, 2), round_to=ROUND)
    return _back_join(spark, sf_dir, res)


@register(
    "ann_hnsw_filtered_adaptive_topk",
    # HIGHLY selective predicate (~5 % of rows) with the adaptive guard
    # armed: the payload count lands under min_candidates, so every allowed
    # node is scored directly (exact top-k OF the filtered set, even for
    # graph-unreachable nodes) — the restricted-search guarantee
    # (usearch.rs:224-248) on the graph engine, where an unguarded beam is
    # the canonical filtered-HNSW failure mode. Oracle = exact filtered
    # top-k; similarity dropped (derived-from-rounded-distance is checked
    # by the other graph oracles).
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 290)
SELECT vec_id, label, {_COS.format(q=sql_vec(Q7))}
FROM e ORDER BY distance, vec_id LIMIT 10
""",
    "Adaptive T2 on the graph engine: one payload aggregation resolves the "
    "live total and the filtered count, then the filtered set (under "
    "min_candidates) is scored exhaustively instead of beam-searched — a "
    "selective predicate cannot starve the beam's result heap",
)
def ann_hnsw_filtered_adaptive_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.hnsw import hnsw_search

    path = _hnsw_path(spark, sf_dir)
    res = hnsw_search(spark, path, Q7, 10, ef_search=EF,
                      predicate=F.col("vec_id") < 290,
                      min_candidates=320, round_to=ROUND)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        emb.join(F.broadcast(res.drop("similarity")), "vec_id")
        .select("vec_id", "label", "distance")
        .orderBy("distance", "vec_id")
    )


@register(
    "local_partition_ann_hnsw_adaptive",
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE label = 3 AND vec_id < 2500)
SELECT vec_id, label, {_COS.format(q=sql_vec(Q7))}
FROM e ORDER BY distance, vec_id LIMIT 10
""",
    "Adaptive restricted search on ONE partition's HNSW sub-graph: "
    "count-then-tier over the partition's payload (slice Eq composed into "
    "the aggregation), exhaustive scoring under min_candidates",
)
def local_partition_ann_hnsw_adaptive(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "hnsw_local",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, part_col="label",
                             payload_cols=["label"]),
    )
    res = hnsw_search_local(spark, path, 3, Q7, 10, ef_search=EF,
                            predicate=F.col("vec_id") < 2500,
                            min_candidates=320, round_to=ROUND)
    emb2 = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        emb2.join(F.broadcast(res.drop("similarity")), "vec_id")
        .select("vec_id", "label", "distance")
        .orderBy("distance", "vec_id")
    )


@register(
    "ann_hnsw_dot_topk",
    # USearch "IP": distance = 1 - <a,b> on RAW vectors (magnitudes matter);
    # similarity = (2 - d) / 2 (similarity.rs:26-37)
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cand AS (SELECT vec_id, label,
                round(1.0 - list_inner_product(v, {sql_vec(Q7)}), {ROUND}) AS distance
         FROM e)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "Graph ANN in DOT_PRODUCT space (usearch.rs 'IP' metric: dist = 1-<a,b> "
    "over raw magnitudes — the graph scores the UN-normalized matrix, unlike "
    "cosine's unit-normalized prep); exhaustive beam at this scale",
)
def ann_hnsw_dot_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_search
    from vector_store_spark.types import SpaceType

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "hnsw_dot",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, num_slices=SLICES,
                             space=SpaceType.DOT_PRODUCT),
    )
    res = hnsw_search(spark, path, Q7, 10, ef_search=256, round_to=ROUND)
    return _back_join(spark, sf_dir, res)


_SIGN_HAMMING = (
    "list_sum(list_transform(list_zip(e, {q}), "
    "p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END))"
)


@register(
    "ann_hnsw_hamming_topk",
    # Hamming over sign bits (the B1 storage's metric): distance = count of
    # differing sign bits; similarity = 1 - d/dims (similarity.rs:26-37)
    f"""
WITH scored AS (
  SELECT vec_id, label,
         CAST({_SIGN_HAMMING.format(q=sql_vec(Q7))} AS DOUBLE) AS distance
  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
)
SELECT vec_id, label, distance,
       round(1.0 - distance / 64, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "Graph ANN in Hamming/B1 space (USearch's B1↦Hamming coupling, "
    "usearch.rs:1179-1205): blobs store sign-packed bits (~32x smaller), the "
    "beam XOR-popcounts packed rows against the sign-packed QUERY; exhaustive "
    "at this scale so the hash gate proves pack/score parity bit-for-bit",
)
def ann_hnsw_hamming_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_search
    from vector_store_spark.types import SpaceType

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "hnsw_b1",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, num_slices=SLICES,
                             space=SpaceType.HAMMING, quantization="b1"),
    )
    res = hnsw_search(spark, path, Q7, 10, ef_search=512, round_to=ROUND)
    return _back_join(spark, sf_dir, res)


Q23 = det_query_vector(23, 64)
_KNN_Q = [("q7", Q7), ("q13", det_query_vector(13, 64)), ("q21", det_query_vector(21, 64))]


@register(
    "knn_batch_hnsw",
    f"""
WITH queries(query_id, qv) AS (VALUES
  {", ".join(f"('{name}', {sql_vec(vec)})" for name, vec in _KNN_Q)}
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
    "J3 through the graph engine: every query beams through each slice's "
    "sub-graph (O(Q·ef·log n) vs the brute GEMM's O(Q·n)); only slices·Q·k "
    "candidate rows reach the per-query merge — same output contract as "
    "knn_batch, exact at this scale's exhaustive beam",
)
def knn_batch_hnsw(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_knn_batch

    path = _hnsw_path(spark, sf_dir)
    return hnsw_knn_batch(spark, path, _KNN_Q, 5, ef_search=256, round_to=ROUND)


@register(
    "ann_hnsw_i8_rescored_topk",
    _exact_topk_sql(q=Q23),
    "Quantized graph ANN (the USearch quantization index option composed "
    "with the graph engine, usearch.rs:503-513 + "
    "quantization_and_rescoring.rs): the graph stores int8 vectors with a "
    "per-slice scale (4x smaller blobs), the beam scores dequantized values "
    "to collect a rescore·k candidate pool, and the ORIGINAL vectors are "
    "re-read from the base table for the exact final top-k — quantized "
    "recall, full-precision values",
)
def ann_hnsw_i8_rescored_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "hnsw_i8",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, num_slices=SLICES,
                             quantization="i8"),
    )
    # ef=256, not the family EF=64: this entry's oracle is the EXACT top-k
    # (its point is the quantize→rescore semantics, not beam recall), and
    # the i8-quantized beam reorders candidates enough that ef=64 dropped
    # the true best at the sf1 stretch scale (8000 nodes) while the f32
    # graph's ef=64 beam stayed exhaustive-equivalent. Quantized-beam
    # recall-vs-ef is a bench metric (recall_at_10_*), not an oracle claim.
    res = hnsw_search(spark, path, Q23, 10, ef_search=256, rescore=4,
                      rescore_with=(emb, "embedding"), round_to=ROUND)
    return _back_join(spark, sf_dir, res)


@register(
    "local_partition_ann_hnsw",
    _exact_topk_sql(where="WHERE label = 3"),
    "Local per-partition HNSW sub-graphs (lib.rs:677-680; usearch.rs:815-864 "
    "builds one USearch index per partition): the partition Eq prunes the "
    "blob read to ONE graph directory, and the beam searches only that "
    "sub-graph — completing the local sub-index matrix (exact/IVF/LSH/PQ/"
    "HNSW)",
)
def local_partition_ann_hnsw(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_build, hnsw_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "hnsw_local",
        lambda p: hnsw_build(emb, "vec_id", "embedding", p, m=M,
                             ef_construction=EFC, part_col="label",
                             payload_cols=["label"]),
    )
    res = hnsw_search_local(spark, path, 3, Q7, 10, ef_search=256, round_to=ROUND)
    return _back_join(spark, sf_dir, res)


@register(
    "ann_hnsw_updated_topk",
    # CRUD: remove ids < 25, insert two literal vectors (stored as FLOAT32 —
    # the oracle casts through FLOAT[] so both sides score the same rounded
    # values); the graph serves the final set natively (usearch.rs add/remove)
    _exact_topk_sql(
        where="WHERE vec_id >= 25",
        extra_rows=(
            f"SELECT CAST(1000001 AS BIGINT) AS vec_id, CAST(7 AS INTEGER) AS label, "
            f"CAST(CAST({sql_vec(QI1)} AS FLOAT[]) AS DOUBLE[]) AS v "
            f"UNION ALL SELECT CAST(1000002 AS BIGINT), CAST(8 AS INTEGER), "
            f"CAST(CAST({sql_vec(QI2)} AS FLOAT[]) AS DOUBLE[])"
        ),
    ),
    "Incremental CRUD on the persisted graph: native HNSW insertion "
    "(descend-then-beam link, only touched slice blobs rewritten) + tombstone "
    "deletes skipped during traversal (the USearch remove model)",
)
def ann_hnsw_updated_topk(spark, sf_dir):
    from vector_store_spark.operators.hnsw import hnsw_delete, hnsw_insert, hnsw_search

    emb = load(spark, sf_dir, "embeddings")

    def build(p):
        import time as _t

        from vector_store_spark import phases
        from vector_store_spark.operators.hnsw import hnsw_build, hnsw_upsert

        t0 = _t.perf_counter()
        hnsw_build(emb, "vec_id", "embedding", p, m=M, ef_construction=EFC,
                   num_slices=SLICES, payload_cols=["label"])
        t0 = phases.mark("build", t0)
        new = spark.createDataFrame(
            [(1000001, QI1, 7), (1000002, QI2, 8)],
            "vec_id long, embedding array<float>, label int",
        )
        # ONE fused tombstone-and-reinsert pass (the CDC maintenance shape)
        # instead of separate insert + delete jobs
        hnsw_upsert(spark, p, items=new, ids_removed=list(range(25)))
        phases.mark("crud", t0)

    path = _built(spark, sf_dir, "hnsw_crud", build)
    res = hnsw_search(spark, path, Q7, 10, ef_search=EF, round_to=ROUND)

    # back-join against the POST-CRUD id space (base minus removed, plus the
    # two inserted rows' payloads from the index's own payload table)
    from pyspark.sql import functions as F

    pay = spark.read.parquet(f"{path}/payload").select("vec_id", "label")
    return (
        pay.join(F.broadcast(res), "vec_id")
        .select("vec_id", "label", "distance", "similarity")
        .orderBy("distance", "vec_id")
    )
