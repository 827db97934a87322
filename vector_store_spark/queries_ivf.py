"""Approximate-ANN strategy registry entries (IVF + sign-LSH): build
artifacts and probe searches, each re-derived in oracle SQL so the driver
checks the *algorithm* (assignment argmax, bucket folding, candidate top-k),
not just the output shape. Recall vs. brute force is a bench metric, not a
correctness one.
"""

from __future__ import annotations

from vector_store_spark.operators.ivf import ivf_assign, ivf_centroids, ivf_topk
from vector_store_spark.operators.lsh import lsh_hyperplanes, lsh_topk
from vector_store_spark.registry import ROUND, det_query_vector, load, register, sql_vec

K_CENTROIDS = 16
NPROBE = 4
Q7 = det_query_vector(7, 64)

# Persisted indexes are standing artifacts queried many times (the reference
# builds once, serves from the committed layout); memoize the build per
# (session, corpus) so repeated queries measure serving, not rebuilds — the
# same precedent as queries_fts._INDEX_CACHE. Builds are deterministic, so
# reuse cannot change results.
_BUILD_CACHE: dict[str, str] = {}


def _built(spark, sf_dir, kind: str, build_fn) -> str:
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:{kind}"
    if key not in _BUILD_CACHE:
        import tempfile

        path = tempfile.mkdtemp(prefix=f"{kind}_ix_")
        build_fn(path)
        _BUILD_CACHE[key] = path
    return _BUILD_CACHE[key]

# assignment CTEs shared by both oracles: centroids = K smallest vec_ids;
# every vector goes to argmax cosine (ties -> smallest cid), exactly as
# operators/ivf.ivf_assign computes with its ordered argmax.
_ASG = f"""
c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY vec_id LIMIT {K_CENTROIDS}),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(v, cv) /
         (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS sim
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
)
"""


@register(
    "ivf_build_stats",
    f"WITH {_ASG} SELECT cid AS cluster, count(*) AS n_vectors FROM asg GROUP BY cid",
    "IVF build: per-cluster inverted-list sizes (assignment checked end-to-end)",
)
def ivf_build_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, "vec_id", "embedding", K_CENTROIDS)
    assigned = ivf_assign(emb, "vec_id", "embedding", cents)
    return assigned.groupBy("cluster").agg(F.count("*").alias("n_vectors"))


@register(
    "ann_ivf_topk",
    f"""
WITH {_ASG},
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM e JOIN asg USING (vec_id)
  WHERE asg.cid IN (SELECT cid FROM probe)
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "IVF-Flat ANN: probe nprobe nearest clusters, exact top-k within candidates",
)
def ann_ivf_topk(spark, sf_dir):
    return ivf_topk(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", Q7, 10,
        k_centroids=K_CENTROIDS, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_ivf_persisted_topk",
    # identical result contract to ann_ivf_topk: the persisted round-trip
    # (build -> partitionBy(cluster) parquet -> probe-pruned scan) must not
    # change a single value
    f"""
WITH {_ASG},
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM e JOIN asg USING (vec_id)
  WHERE asg.cid IN (SELECT cid FROM probe)
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "Persisted IVF serving path: build -> partitionBy(cluster) parquet with a "
    "centroid sidecar -> probe reads ONLY the nprobe cluster directories "
    "(Catalyst partition pruning) -> exact re-rank",
)
def ann_ivf_persisted_topk(spark, sf_dir):
    from vector_store_spark.operators.ivf import ivf_build, ivf_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivf",
        lambda p: ivf_build(emb, "vec_id", "embedding", p, k_centroids=K_CENTROIDS),
    )
    return ivf_search(
        spark, path, "vec_id", "embedding", Q7, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_ivf_updated_topk",
    # incremental CRUD on the persisted layout: build on vec_id<800 (fixed
    # centroids = 16 smallest ids of THAT set — they stay the trained
    # artifacts through CRUD, as USearch never re-trains), then remove
    # ids<50 and add 800..999; the oracle assigns the FINAL set against the
    # BUILD-time centroids and probes/ranks identically
    f"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id < 800 ORDER BY vec_id LIMIT {K_CENTROIDS}),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id >= 50),
sims AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(v, cv) /
         (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS sim
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM e JOIN asg USING (vec_id)
  WHERE asg.cid IN (SELECT cid FROM probe)
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "Incremental CRUD on the persisted IVF layout (usearch.rs add/remove "
    "surface): removals anti-joined, additions assigned against the build's "
    "fixed centroids, ONLY touched cluster directories rewritten",
)
def ann_ivf_updated_topk(spark, sf_dir):
    from pyspark.sql import functions as SF

    from vector_store_spark.operators.ivf import ivf_build, ivf_search, ivf_update

    emb = load(spark, sf_dir, "embeddings")

    def build(p):
        ivf_build(
            emb.where(SF.col("vec_id") < 800), "vec_id", "embedding", p,
            k_centroids=K_CENTROIDS,
        )
        ivf_update(
            spark, p, "vec_id", "embedding",
            items_added=emb.where(SF.col("vec_id") >= 800),
            ids_removed=list(range(50)),
        )

    path = _built(spark, sf_dir, "ivf_crud", build)
    return ivf_search(
        spark, path, "vec_id", "embedding", Q7, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


_K_LOC, _NPROBE_LOC, _PART = 4, 2, 3


@register(
    "local_partition_ann_ivf",
    # one sub-index per partition (lib.rs:677-680): centroids are the K
    # smallest vec_ids WITHIN the partition; probe + assignment + re-rank all
    # happen inside the partition, exactly as the Spark side prunes to the
    # (label, cluster) directories
    f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE label = {_PART}
),
c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {_K_LOC}),
sims AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(v, cv) /
         (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS sim
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {_NPROBE_LOC}
),
cand AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM e JOIN asg USING (vec_id)
  WHERE asg.cid IN (SELECT cid FROM probe)
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "Local APPROXIMATE sub-indexes (lib.rs:677-680, usearch.rs:815-864): one "
    "IVF sub-index per partition, partitionBy(label, cluster) storage — the "
    "partition Eq AND the cluster probe are both Catalyst partition pruning",
)
def local_partition_ann_ivf(spark, sf_dir):
    from vector_store_spark.operators.ivf import ivf_build_local, ivf_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivf_local",
        lambda p: ivf_build_local(emb, "label", "vec_id", "embedding", p, k_centroids=_K_LOC),
    )
    return ivf_search_local(
        spark, path, _PART, "vec_id", "embedding", Q7, 10, nprobe=_NPROBE_LOC,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


# --- sign-LSH (random hyperplane) strategy -------------------------------
_BITS, _LSH_BANDS = 16, 4
_R = _BITS // _LSH_BANDS
_PLANES = lsh_hyperplanes(64, _BITS)


def _py_buckets(v):
    bits = [1 if sum(x * y for x, y in zip(v, p)) > 0 else 0 for p in _PLANES]
    return [
        int("".join(map(str, bits[b * _R : (b + 1) * _R])), 2) for b in range(_LSH_BANDS)
    ]


_QBUCKETS = _py_buckets(Q7)

_BIT_SQL = [
    f"(CASE WHEN list_inner_product(e, {sql_vec(p)}) > 0 THEN 1 ELSE 0 END)"
    for p in _PLANES
]
_BUCKET_SQL = [
    " + ".join(f"{_BIT_SQL[b * _R + j]} * {1 << (_R - 1 - j)}" for j in range(_R))
    for b in range(_LSH_BANDS)
]
_CAND_COND = " OR ".join(
    f"({_BUCKET_SQL[b]}) = {_QBUCKETS[b]}" for b in range(_LSH_BANDS)
)


@register(
    "ann_lsh_topk",
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (SELECT * FROM e WHERE {_CAND_COND}),
scored AS (
  SELECT vec_id, label,
         round(1.0 - list_inner_product(e, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM cand
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "Sign-LSH ANN: random-hyperplane band buckets, bucket-match candidates, exact re-rank",
)
def ann_lsh_topk(spark, sf_dir):
    return lsh_topk(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", Q7, 10,
        num_bits=_BITS, bands=_LSH_BANDS,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_lsh_persisted_topk",
    # identical result contract to ann_lsh_topk: the persisted round-trip
    # (build -> partitionBy(band, bucket) parquet -> probe-pruned scan ->
    # cross-band dedupe) must not change a single value
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (SELECT * FROM e WHERE {_CAND_COND}),
scored AS (
  SELECT vec_id, label,
         round(1.0 - list_inner_product(e, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM cand
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "Persisted LSH serving path: build -> partitionBy(band, bucket) parquet "
    "-> a probe reads ONLY the matching band/bucket directories (Catalyst "
    "partition pruning, like the IVF cluster layout) -> exact re-rank",
)
def ann_lsh_persisted_topk(spark, sf_dir):
    from vector_store_spark.operators.lsh import lsh_build, lsh_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "lsh",
        lambda p: lsh_build(emb, "vec_id", "embedding", p, num_bits=_BITS, bands=_LSH_BANDS),
    )
    return lsh_search(
        spark, path, "vec_id", "embedding", Q7, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


# ---------------------------------------------------------------------------
# Product quantization (operators/pq.py): deterministic codebook = subvector
# slices of the K_CODES smallest-id rows; encode = per-subspace argmin L2sq
# (ties -> lowest code); ADC = ordered sum of per-subspace LUT entries.
# ---------------------------------------------------------------------------

M_SUB, D_SUB, K_CODES = 8, 8, 16
Q31 = det_query_vector(31, 64)

_L2S = (
    "list_inner_product(list_transform(list_zip({a}, {b}), p -> p[1] - p[2]), "
    "list_transform(list_zip({a}, {b}), p -> p[1] - p[2]))"
)


@register(
    "ann_pq_adc_topk",
    f"""
WITH cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CODES}
),
subs AS (SELECT unnest(range(0, {M_SUB})) AS s),
cbsub AS (
  SELECT s, j, cv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS cvs
  FROM cb CROSS JOIN subs
),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
esub AS (
  SELECT vec_id, s, v[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS vs
  FROM e CROSS JOIN subs
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY {_L2S.format(a="vs", b="cvs")}, j) AS rn
    FROM esub JOIN cbsub USING (s)
  ) WHERE rn = 1
),
lut AS (
  SELECT s, j,
         {_L2S.format(a=f"({sql_vec(Q31)})[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}]", b="cvs")} AS qd
  FROM cbsub
),
adc AS (
  SELECT vec_id, round(list_sum(list(qd ORDER BY s)), {ROUND}) AS distance
  FROM codes JOIN lut USING (s, j)
  GROUP BY vec_id
)
SELECT e.vec_id, e.label, adc.distance
FROM adc JOIN e ON e.vec_id = adc.vec_id
ORDER BY distance, e.vec_id LIMIT 10
""",
    "PQ+ADC search (Jegou et al. 2011): 8x8 subspaces, 16 codes, asymmetric "
    "LUT scoring over codes only -- the memory-compression scale path",
)
def ann_pq_adc_topk(spark, sf_dir):
    from vector_store_spark.operators.pq import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, "vec_id", "embedding", Q31, 10,
        m_sub=M_SUB, k_codes=K_CODES,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


# ---------------------------------------------------------------------------
# IVF-PQ composition (operators/ivfpq.py): L2 centroid assignment prunes to
# nprobe clusters, ADC scores only the candidates — pruning × compression,
# the reference's quantized-engine shape (usearch.rs:503-513).
# ---------------------------------------------------------------------------

_QSUB = f"({sql_vec(Q31)})[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}]"


@register(
    "ann_ivfpq_topk",
    f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CENTROIDS}
),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
l2 AS (
  SELECT e.vec_id, c.cid, {_L2S.format(a="v", b="cv")} AS d
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM l2
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY {_L2S.format(a="cv", b=sql_vec(Q31))}, cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT vec_id FROM asg WHERE cid IN (SELECT cid FROM probe)
),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CODES}
),
subs AS (SELECT unnest(range(0, {M_SUB})) AS s),
cbsub AS (
  SELECT s, j, cv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS cvs
  FROM cb CROSS JOIN subs
),
esub AS (
  SELECT vec_id, s, v[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS vs
  FROM e CROSS JOIN subs
  WHERE vec_id IN (SELECT vec_id FROM cand)
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY {_L2S.format(a="vs", b="cvs")}, j) AS rn
    FROM esub JOIN cbsub USING (s)
  ) WHERE rn = 1
),
lut AS (
  SELECT s, j, {_L2S.format(a=_QSUB, b="cvs")} AS qd
  FROM cbsub
),
adc AS (
  SELECT vec_id, round(list_sum(list(qd ORDER BY s)), {ROUND}) AS distance
  FROM codes JOIN lut USING (s, j)
  GROUP BY vec_id
)
SELECT e.vec_id, e.label, adc.distance
FROM adc JOIN e ON e.vec_id = adc.vec_id
ORDER BY distance, e.vec_id LIMIT 10
""",
    "IVF-PQ composition: L2 centroid pruning to nprobe clusters, then PQ/ADC "
    "scoring over candidates only -- pruning x compression, the 100 TB memory tier",
)
def ann_ivfpq_topk(spark, sf_dir):
    from vector_store_spark.operators.ivfpq import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, "vec_id", "embedding", Q31, 10,
        k_centroids=K_CENTROIDS, nprobe=NPROBE, m_sub=M_SUB, k_codes=K_CODES,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_ivfpq_persisted_topk",
    # identical result contract to ann_ivfpq_topk: the persisted round-trip
    # (build -> partitionBy(cluster) parquet of (id, pq_code) ONLY -> probe-
    # pruned ADC over stored codes -> back-join payload) must not change a
    # single value
    f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CENTROIDS}
),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
l2 AS (
  SELECT e.vec_id, c.cid, {_L2S.format(a="v", b="cv")} AS d
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM l2
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY {_L2S.format(a="cv", b=sql_vec(Q31))}, cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT vec_id FROM asg WHERE cid IN (SELECT cid FROM probe)
),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CODES}
),
subs AS (SELECT unnest(range(0, {M_SUB})) AS s),
cbsub AS (
  SELECT s, j, cv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS cvs
  FROM cb CROSS JOIN subs
),
esub AS (
  SELECT vec_id, s, v[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS vs
  FROM e CROSS JOIN subs
  WHERE vec_id IN (SELECT vec_id FROM cand)
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY {_L2S.format(a="vs", b="cvs")}, j) AS rn
    FROM esub JOIN cbsub USING (s)
  ) WHERE rn = 1
),
lut AS (
  SELECT s, j, {_L2S.format(a=_QSUB, b="cvs")} AS qd
  FROM cbsub
),
adc AS (
  SELECT vec_id, round(list_sum(list(qd ORDER BY s)), {ROUND}) AS distance
  FROM codes JOIN lut USING (s, j)
  GROUP BY vec_id
)
SELECT e.vec_id, e.label, adc.distance
FROM adc JOIN e ON e.vec_id = adc.vec_id
ORDER BY distance, e.vec_id LIMIT 10
""",
    "Persisted IVF-PQ memory tier: partitionBy(cluster) parquet of (id, "
    "pq_code) ONLY (~64x narrower rows) -> probe-pruned ADC over stored "
    "codes -> back-join payload (J1 point lookup)",
)
def ann_ivfpq_persisted_topk(spark, sf_dir):
    from vector_store_spark.operators.ivfpq import ivfpq_build, ivfpq_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivfpq",
        lambda p: ivfpq_build(
            emb, "vec_id", "embedding", p,
            k_centroids=K_CENTROIDS, m_sub=M_SUB, k_codes=K_CODES,
        ),
    )
    return ivfpq_search(
        spark, path, emb, "vec_id", "embedding", Q31, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ (IVFADC, Jegou et al. 2011 SIV): codes encode residuals
# v - centroid(v); the query builds one LUT per probed cluster from its own
# residual. The oracle re-derives residuals, the residual codebook, encoding
# and per-cluster ADC entirely in SQL.
# ---------------------------------------------------------------------------


@register(
    "ann_ivfpq_residual_topk",
    f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CENTROIDS}
),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
l2 AS (
  SELECT e.vec_id, c.cid, {_L2S.format(a="v", b="cv")} AS d
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM l2
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY {_L2S.format(a="cv", b=sql_vec(Q31))}, cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
res AS (
  SELECT a.vec_id, a.cid,
         list_transform(list_zip(e.v, c.cv), p -> p[1] - p[2]) AS rv
  FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN c ON c.cid = a.cid
),
cbres AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, rv
  FROM res
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {K_CODES})
),
subs AS (SELECT unnest(range(0, {M_SUB})) AS s),
cbsub AS (
  SELECT s, j, rv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS cvs
  FROM cbres CROSS JOIN subs
),
cand AS (SELECT vec_id, cid FROM asg WHERE cid IN (SELECT cid FROM probe)),
esub AS (
  SELECT r.vec_id, s, rv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS vs
  FROM res r JOIN cand USING (vec_id) CROSS JOIN subs
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY {_L2S.format(a="vs", b="cvs")}, j) AS rn
    FROM esub JOIN cbsub USING (s)
  ) WHERE rn = 1
),
qres AS (
  SELECT cid, list_transform(list_zip({sql_vec(Q31)}, cv), p -> p[1] - p[2]) AS qr
  FROM c WHERE cid IN (SELECT cid FROM probe)
),
lut AS (
  SELECT q.cid, cb.s, cb.j,
         {_L2S.format(a=f"qr[cb.s * {D_SUB} + 1 : cb.s * {D_SUB} + {D_SUB}]", b="cvs")} AS qd
  FROM qres q CROSS JOIN cbsub cb
),
adc AS (
  SELECT codes.vec_id, round(list_sum(list(qd ORDER BY codes.s)), {ROUND}) AS distance
  FROM codes
  JOIN cand USING (vec_id)
  JOIN lut ON lut.cid = cand.cid AND lut.s = codes.s AND lut.j = codes.j
  GROUP BY codes.vec_id
)
SELECT e.vec_id, e.label, adc.distance
FROM adc JOIN e ON e.vec_id = adc.vec_id
ORDER BY distance, e.vec_id LIMIT 10
""",
    "Residual IVF-PQ (IVFADC): PQ codes encode v - centroid(v), query LUT "
    "per probed cluster from q - centroid_c -- finer quantization at the "
    "same code budget, the composition real systems ship",
)
def ann_ivfpq_residual_topk(spark, sf_dir):
    from vector_store_spark.operators.ivfpq import ivfpq_residual_topk

    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(
        emb, "vec_id", "embedding", Q31, 10,
        k_centroids=K_CENTROIDS, nprobe=NPROBE, m_sub=M_SUB, k_codes=K_CODES,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


# ---------------------------------------------------------------------------
# Batched kNN through IVF pruning: one scan, every query scores only its own
# nprobe clusters (the pruned counterpart of knn_batch).
# ---------------------------------------------------------------------------

_IVF_KNN_QUERIES = [("q7", Q7), ("q13", det_query_vector(13, 64))]
_QVALS = ", ".join(f"('{n}', {sql_vec(v)})" for n, v in _IVF_KNN_QUERIES)


@register(
    "knn_batch_ivf",
    f"""
WITH {_ASG},
queries(query_id, qv) AS (VALUES {_QVALS}),
probe AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid, row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY list_inner_product(cv, qv) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(qv, qv))) DESC,
        cid
    ) AS rn FROM queries q CROSS JOIN c
  ) WHERE rn <= {NPROBE}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(1.0 - list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))), {ROUND}) AS distance
  FROM queries q
  JOIN probe p ON p.query_id = q.query_id
  JOIN asg ON asg.cid = p.cid
  JOIN e ON e.vec_id = asg.vec_id
)
SELECT query_id, vec_id, distance
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn FROM scored)
WHERE rn <= 5
""",
    "Batched kNN through IVF pruning: one scan answers all queries, each "
    "scoring only its own nprobe clusters (per-query cluster mask inside the "
    "batch GEMM) -- the pruned counterpart of knn_batch",
)
def knn_batch_ivf(spark, sf_dir):
    from vector_store_spark.operators.ivf import ivf_knn_join

    emb = load(spark, sf_dir, "embeddings")
    return ivf_knn_join(
        emb, "vec_id", "embedding", _IVF_KNN_QUERIES, 5,
        k_centroids=K_CENTROIDS, nprobe=NPROBE, round_to=ROUND,
    )


# T2 through the approximate strategy: the filter applies BEFORE candidate
# generation (engine.py filters df, then the strategy builds/probes on the
# filtered set) — top-k OF the filtered set, reference usearch.rs:224-248.
_FILT = "label IN (2, 5, 7)"


@register(
    "ann_ivf_filtered_topk",
    f"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE {_FILT} ORDER BY vec_id LIMIT {K_CENTROIDS}),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE {_FILT}),
sims AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(v, cv) /
         (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS sim
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM e JOIN asg USING (vec_id)
  WHERE asg.cid IN (SELECT cid FROM probe)
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "T2 through the approximate strategy: filter BEFORE candidate generation "
    "(build + probe on the filtered set) - top-k OF the filtered set, "
    "matching the engine's predicate-then-strategy dispatch",
)
def ann_ivf_filtered_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings").where(F.col("label").isin(2, 5, 7))
    return ivf_topk(
        emb, "vec_id", "embedding", Q7, 10,
        k_centroids=K_CENTROIDS, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_ivf_filtered_adaptive_topk",
    # a highly selective predicate (~5 % of rows) with the adaptive probe
    # armed: the filtered count lands under min_candidates, so the engine
    # ranks the filtered set EXACTLY — the oracle is the exact filtered
    # top-k, the reference's restricted-search guarantee (top-k OF the
    # filtered set, usearch.rs:224-248) rather than the probe S-curve
    f"""
SELECT vec_id, label,
       round(1.0 - list_inner_product(CAST(embedding AS DOUBLE[]), {sql_vec(Q7)}) /
             (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
              sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
FROM embeddings WHERE vec_id < 290
ORDER BY distance, vec_id LIMIT 10
""",
    "T2 under a HIGHLY selective predicate: the adaptive probe counts the "
    "filtered set (one pushed scan), sees it below min_candidates, and falls "
    "back to exact ranking — a fixed nprobe here would starve the candidate "
    "pool below k (the round-8 recall hole at the 2-5 pct buckets)",
)
def ann_ivf_filtered_adaptive_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 290)
    # similarity is derived from the ROUNDED distance (F2 contract), whose
    # halved value sits exactly on a rounding boundary — covered by the
    # other ANN oracles; dropped here to keep this oracle mode-independent
    return ivf_topk(
        emb, "vec_id", "embedding", Q7, 10,
        k_centroids=K_CENTROIDS, nprobe=NPROBE, min_candidates=320,
        select_cols=["vec_id", "label"], round_to=ROUND,
    ).drop("similarity")


# T2 on the PERSISTED serving layouts (the reference's bread-and-butter
# `WHERE ... ANN OF` against a committed index, usearch.rs:1108-1154): the
# index is built on the FULL set, the probe prunes cluster/bucket
# directories, and the residual predicate filters the candidate scan — a
# pushed parquet filter composing with partition pruning. Top-k OF the
# filtered candidates.


@register(
    "ann_ivf_persisted_filtered_topk",
    f"""
WITH {_ASG},
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_inner_product(cv, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))) DESC,
        cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT e.vec_id, e.label,
         round(1.0 - list_inner_product(v, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM e JOIN asg USING (vec_id)
  WHERE asg.cid IN (SELECT cid FROM probe) AND {_FILT}
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM cand ORDER BY distance, vec_id LIMIT 10
""",
    "Filtered ANN on the persisted IVF serving layout (usearch.rs:1108-1154 "
    "restricted traversal): full-set build, probe prunes cluster dirs, the "
    "residual predicate is a pushed filter over the candidate scan",
)
def ann_ivf_persisted_filtered_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.ivf import ivf_build, ivf_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivf",
        lambda p: ivf_build(emb, "vec_id", "embedding", p, k_centroids=K_CENTROIDS),
    )
    return ivf_search(
        spark, path, "vec_id", "embedding", Q7, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
        predicate=F.col("label").isin(2, 5, 7),
    )


@register(
    "local_partition_ann_lsh",
    # one LSH sub-index per partition (lib.rs:677-680, engine-agnostic local
    # tier): hyperplanes are the deterministic global family, so the oracle
    # re-derives banding inside the partition with the same bucket SQL
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE label = {_PART}),
cand AS (SELECT * FROM e WHERE {_CAND_COND}),
scored AS (
  SELECT vec_id, label,
         round(1.0 - list_inner_product(e, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM cand
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "Local LSH sub-indexes (lib.rs:677-680 engine-agnostic local tier): "
    "partitionBy(label, band, bucket) storage — the partition Eq AND the "
    "band/bucket probe are BOTH Catalyst partition pruning, the same "
    "two-level proof as local_partition_ann_ivf",
)
def local_partition_ann_lsh(spark, sf_dir):
    from vector_store_spark.operators.lsh import lsh_build_local, lsh_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "lsh_local",
        lambda p: lsh_build_local(
            emb, "label", "vec_id", "embedding", p, num_bits=_BITS, bands=_LSH_BANDS,
        ),
    )
    return lsh_search_local(
        spark, path, _PART, "vec_id", "embedding", Q7, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_lsh_persisted_filtered_topk",
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (SELECT * FROM e WHERE ({_CAND_COND}) AND {_FILT}),
scored AS (
  SELECT vec_id, label,
         round(1.0 - list_inner_product(e, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM cand
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "Filtered ANN on the persisted LSH serving layout: band/bucket partition "
    "pruning AND a pushed residual predicate on the candidate scan, exact "
    "re-rank of the filtered candidates",
)
def ann_lsh_persisted_filtered_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.lsh import lsh_build, lsh_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "lsh",
        lambda p: lsh_build(emb, "vec_id", "embedding", p, num_bits=_BITS, bands=_LSH_BANDS),
    )
    return lsh_search(
        spark, path, "vec_id", "embedding", Q7, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
        predicate=F.col("label").isin(2, 5, 7),
    )


@register(
    "ann_ivfpq_persisted_filtered_topk",
    # restricted ANN on the persisted memory tier: the codes layout stores
    # the declared filtering column next to (id, pq_code), the probe prunes
    # cluster dirs, and the predicate filters the code scan BEFORE ADC —
    # top-k OF the filtered candidates (usearch.rs:1108-1154 restricted
    # traversal at the quantized tier)
    f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CENTROIDS}
),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
l2 AS (
  SELECT e.vec_id, c.cid, {_L2S.format(a="v", b="cv")} AS d
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM l2
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY {_L2S.format(a="cv", b=sql_vec(Q31))}, cid
    ) AS rn FROM c
  ) WHERE rn <= {NPROBE}
),
cand AS (
  SELECT a.vec_id FROM asg a JOIN e USING (vec_id)
  WHERE a.cid IN (SELECT cid FROM probe) AND {_FILT}
),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings ORDER BY vec_id LIMIT {K_CODES}
),
subs AS (SELECT unnest(range(0, {M_SUB})) AS s),
cbsub AS (
  SELECT s, j, cv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS cvs
  FROM cb CROSS JOIN subs
),
esub AS (
  SELECT vec_id, s, v[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS vs
  FROM e CROSS JOIN subs
  WHERE vec_id IN (SELECT vec_id FROM cand)
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY {_L2S.format(a="vs", b="cvs")}, j) AS rn
    FROM esub JOIN cbsub USING (s)
  ) WHERE rn = 1
),
lut AS (
  SELECT s, j, {_L2S.format(a=_QSUB, b="cvs")} AS qd
  FROM cbsub
),
adc AS (
  SELECT vec_id, round(list_sum(list(qd ORDER BY s)), {ROUND}) AS distance
  FROM codes JOIN lut USING (s, j)
  GROUP BY vec_id
)
SELECT e.vec_id, e.label, adc.distance
FROM adc JOIN e ON e.vec_id = adc.vec_id
ORDER BY distance, e.vec_id LIMIT 10
""",
    "Filtered ANN on the persisted IVF-PQ memory tier: filtering columns "
    "stored next to the codes, predicate pushed into the pruned code scan "
    "before ADC, top-k of the filtered candidates",
)
def ann_ivfpq_persisted_filtered_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.ivfpq import ivfpq_build, ivfpq_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivfpq_filt",
        lambda p: ivfpq_build(
            emb, "vec_id", "embedding", p,
            k_centroids=K_CENTROIDS, m_sub=M_SUB, k_codes=K_CODES,
            filtering_cols=["label"],
        ),
    )
    return ivfpq_search(
        spark, path, emb, "vec_id", "embedding", Q31, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
        predicate=F.col("label").isin(2, 5, 7),
    )


# --- adaptive filtered search on PERSISTED + LOCAL layouts -----------------
# The r9 adaptive guard (count-then-tier, ivf.adaptive_nprobe /
# lsh.adaptive_multiprobe) extended to every serving layout: a HIGHLY
# selective predicate (~5 % of rows, under min_candidates) makes each engine
# rank the filtered set EXACTLY, so the oracle is the exact filtered top-k —
# the reference's restricted-search guarantee (top-k OF the filtered set,
# usearch.rs:224-248) on the committed index, not the probe S-curve.

# ABSOLUTE id bound, not a modulus: the adaptive entries' oracle contract is
# "the filtered set is UNDER min_candidates=320, so the engine ranks it
# exactly" — a modular filter grows with the corpus (sf1: 8000/19 = 421 > 320
# flipped the engine into the escalated approximate tier while the oracle
# stayed exact; caught by the sf1 stretch gate). vec_id < 290 is under the
# floor at EVERY SF.
_ADAPT_FILT = "vec_id < 290"
_ADAPT_COS_ORACLE = f"""
SELECT vec_id, label,
       round(1.0 - list_inner_product(CAST(embedding AS DOUBLE[]), {sql_vec(Q7)}) /
             (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
              sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
FROM embeddings WHERE {_ADAPT_FILT}
ORDER BY distance, vec_id LIMIT 10
"""


@register(
    "ann_ivf_persisted_filtered_adaptive_topk",
    _ADAPT_COS_ORACLE,
    "Adaptive T2 on the persisted IVF layout: one pushed, column-pruned "
    "count of the filtered index decides the tier — here the set is under "
    "min_candidates, so the engine ranks it exactly instead of probing",
)
def ann_ivf_persisted_filtered_adaptive_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.ivf import ivf_build, ivf_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivf",
        lambda p: ivf_build(emb, "vec_id", "embedding", p, k_centroids=K_CENTROIDS),
    )
    return ivf_search(
        spark, path, "vec_id", "embedding", Q7, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
        predicate=F.col("vec_id") < 290, min_candidates=320,
    ).drop("similarity")


@register(
    "ann_lsh_persisted_filtered_adaptive_topk",
    _ADAPT_COS_ORACLE,
    "Adaptive T2 on the persisted LSH layout: the filtered count (band-0 "
    "scan = one full copy of the items) lands under min_candidates, so the "
    "engine ranks the filtered rows exactly instead of probing buckets",
)
def ann_lsh_persisted_filtered_adaptive_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.lsh import lsh_build, lsh_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "lsh",
        lambda p: lsh_build(emb, "vec_id", "embedding", p, num_bits=_BITS, bands=_LSH_BANDS),
    )
    return lsh_search(
        spark, path, "vec_id", "embedding", Q7, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
        predicate=F.col("vec_id") < 290, min_candidates=320,
    ).drop("similarity")


@register(
    "ann_ivfpq_persisted_filtered_adaptive_topk",
    # exact tier at the quantized layout: the filtered ids back-join to the
    # source vectors and rank by TRUE L2² — no ADC error in the result
    f"""
SELECT vec_id, label,
       round({_L2S.format(a="CAST(embedding AS DOUBLE[])", b=sql_vec(Q31))}, {ROUND}) AS distance
FROM embeddings WHERE {_ADAPT_FILT}
ORDER BY distance, vec_id LIMIT 10
""",
    "Adaptive T2 on the persisted IVF-PQ memory tier: the filtered code "
    "count lands under min_candidates, so the engine back-joins the "
    "filtered ids to the source vectors and ranks by exact L2 — the "
    "restricted-search guarantee without ADC error",
)
def ann_ivfpq_persisted_filtered_adaptive_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.ivfpq import ivfpq_build, ivfpq_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivfpq_filt",
        lambda p: ivfpq_build(
            emb, "vec_id", "embedding", p,
            k_centroids=K_CENTROIDS, m_sub=M_SUB, k_codes=K_CODES,
            filtering_cols=["label"],
        ),
    )
    return ivfpq_search(
        spark, path, emb, "vec_id", "embedding", Q31, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
        predicate=F.col("vec_id") < 290, min_candidates=320,
    )


_ADAPT_LOCAL_ORACLE = f"""
SELECT vec_id, label,
       round(1.0 - list_inner_product(CAST(embedding AS DOUBLE[]), {sql_vec(Q7)}) /
             (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
              sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
FROM embeddings WHERE label = {_PART} AND vec_id < 2500
ORDER BY distance, vec_id LIMIT 10
"""


@register(
    "local_partition_ann_ivf_adaptive",
    _ADAPT_LOCAL_ORACLE,
    "Adaptive restricted search on ONE partition's IVF sub-index: the "
    "partition Eq composes into the count scan and the exact fallback — "
    "the partition's filtered rows are under min_candidates, so the "
    "sub-index ranks them exactly",
)
def local_partition_ann_ivf_adaptive(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.ivf import ivf_build_local, ivf_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivf_local",
        lambda p: ivf_build_local(emb, "label", "vec_id", "embedding", p, k_centroids=_K_LOC),
    )
    return ivf_search_local(
        spark, path, _PART, "vec_id", "embedding", Q7, 10, nprobe=_NPROBE_LOC,
        select_cols=["vec_id", "label"], round_to=ROUND,
        # absolute bound (same rationale as _ADAPT_FILT): the partition-
        # local filtered set is label-Eq ∩ vec_id < 2500 ≈ 250 rows at
        # EVERY SF ≥ 1 (a modulus would outgrow the 320 floor at sf3+)
        predicate=F.col("vec_id") < 2500, min_candidates=320,
    ).drop("similarity")


@register(
    "local_partition_ann_lsh_adaptive",
    _ADAPT_LOCAL_ORACLE,
    "Adaptive restricted search on ONE partition's LSH sub-index: "
    "count-then-tier over the partition's filtered rows (partition Eq + "
    "band-0 scan), exact ranking under min_candidates",
)
def local_partition_ann_lsh_adaptive(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.lsh import lsh_build_local, lsh_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "lsh_local",
        lambda p: lsh_build_local(
            emb, "label", "vec_id", "embedding", p, num_bits=_BITS, bands=_LSH_BANDS,
        ),
    )
    return lsh_search_local(
        spark, path, _PART, "vec_id", "embedding", Q7, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
        # absolute bound (same rationale as _ADAPT_FILT): the partition-
        # local filtered set is label-Eq ∩ vec_id < 2500 ≈ 250 rows at
        # EVERY SF ≥ 1 (a modulus would outgrow the 320 floor at sf3+)
        predicate=F.col("vec_id") < 2500, min_candidates=320,
    ).drop("similarity")


@register(
    "local_partition_ann_pq",
    # one PQ sub-index per partition (lib.rs:677-680): the codebook is the
    # K_CODES smallest-id rows WITHIN the partition; encode + LUT + ADC all
    # re-derived in SQL inside the partition, as the Spark side prunes to
    # the label directory of m_sub-byte code rows
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE label = {_PART}),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS cv
  FROM e ORDER BY vec_id LIMIT {K_CODES}
),
subs AS (SELECT unnest(range(0, {M_SUB})) AS s),
cbsub AS (
  SELECT s, j, cv[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS cvs
  FROM cb CROSS JOIN subs
),
esub AS (
  SELECT vec_id, s, v[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}] AS vs
  FROM e CROSS JOIN subs
),
codes AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY {_L2S.format(a="vs", b="cvs")}, j) AS rn
    FROM esub JOIN cbsub USING (s)
  ) WHERE rn = 1
),
lut AS (
  SELECT s, j,
         {_L2S.format(a=f"({sql_vec(Q31)})[s * {D_SUB} + 1 : s * {D_SUB} + {D_SUB}]", b="cvs")} AS qd
  FROM cbsub
),
adc AS (
  SELECT vec_id, round(list_sum(list(qd ORDER BY s)), {ROUND}) AS distance
  FROM codes JOIN lut USING (s, j)
  GROUP BY vec_id
)
SELECT e.vec_id, e.label, adc.distance
FROM adc JOIN e ON e.vec_id = adc.vec_id
ORDER BY distance, e.vec_id LIMIT 10
""",
    "Local PQ sub-indexes (lib.rs:677-680): one codebook per partition, "
    "codes stored partitionBy(label) — the partition Eq prunes to one "
    "directory of m_sub-byte rows, ADC against that partition's own "
    "codebook, back-join payload; completes the local engine matrix "
    "(exact/IVF/LSH/PQ)",
)
def local_partition_ann_pq(spark, sf_dir):
    from vector_store_spark.operators.pq import pq_build_local, pq_search_local

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "pq_local",
        lambda p: pq_build_local(
            emb, "label", "vec_id", "embedding", p, m_sub=M_SUB, k_codes=K_CODES,
        ),
    )
    return pq_search_local(
        spark, path, _PART, emb, "vec_id", "embedding", Q31, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


@register(
    "ann_lsh_updated_topk",
    # incremental CRUD on the persisted LSH layout: build on vec_id<800,
    # remove ids<50, add 800..; hyperplanes are data-independent, so the
    # updated index must serve EXACTLY the full-set banding over the final
    # row set (the strongest possible CRUD oracle)
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id >= 50),
cand AS (SELECT * FROM e WHERE {_CAND_COND}),
scored AS (
  SELECT vec_id, label,
         round(1.0 - list_inner_product(e, {sql_vec(Q7)}) /
               (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product({sql_vec(Q7)}, {sql_vec(Q7)}))), {ROUND}) AS distance
  FROM cand
)
SELECT vec_id, label, distance, round((2.0 - distance) / 2.0, {ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 10
""",
    "Incremental CRUD on the persisted LSH layout: removals anti-joined, "
    "additions banded against the sidecar hyperplanes, ONLY touched "
    "(band, bucket) leaves rewritten, emptied leaves deleted — the "
    "add/remove surface on the append-friendly engine",
)
def ann_lsh_updated_topk(spark, sf_dir):
    from pyspark.sql import functions as SF

    from vector_store_spark.operators.lsh import lsh_build, lsh_search, lsh_update

    emb = load(spark, sf_dir, "embeddings")

    def build(p):
        import time as _t

        from vector_store_spark import phases

        t0 = _t.perf_counter()
        lsh_build(
            emb.where(SF.col("vec_id") < 800), "vec_id", "embedding", p,
            num_bits=_BITS, bands=_LSH_BANDS,
        )
        t0 = phases.mark("build", t0)
        lsh_update(
            spark, p, "vec_id", "embedding",
            items_added=emb.where(SF.col("vec_id") >= 800),
            ids_removed=list(range(50)),
        )
        phases.mark("crud", t0)

    path = _built(spark, sf_dir, "lsh_crud", build)
    return lsh_search(
        spark, path, "vec_id", "embedding", Q7, 10,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


# Persisted residual IVFADC: the SAME algorithm contract as the in-memory
# ann_ivfpq_residual_topk (deterministic centroids, residual codebook,
# per-cluster query LUTs), served from the committed partitionBy(cluster)
# codes layout — so the oracle is shared verbatim.
from vector_store_spark.registry import _REGISTRY as _REG  # noqa: E402


@register(
    "ann_ivfpq_residual_persisted_topk",
    _REG["ann_ivfpq_residual_topk"].oracle,
    "Residual IVFADC on the persisted memory tier: codes encode v - "
    "centroid(v) and live partitionBy(cluster); probes prune cluster dirs, "
    "per-cluster LUTs ADC-score the residual codes, the back-join fetches "
    "payload by id — completing the persisted layout matrix at the "
    "residual-quantized tier",
)
def ann_ivfpq_residual_persisted_topk(spark, sf_dir):
    from vector_store_spark.operators.ivfpq import ivfpq_build, ivfpq_search

    emb = load(spark, sf_dir, "embeddings")
    path = _built(
        spark, sf_dir, "ivfpq_res",
        lambda p: ivfpq_build(
            emb, "vec_id", "embedding", p,
            k_centroids=K_CENTROIDS, m_sub=M_SUB, k_codes=K_CODES,
            residual=True,
        ),
    )
    return ivfpq_search(
        spark, path, emb, "vec_id", "embedding", Q31, 10, nprobe=NPROBE,
        select_cols=["vec_id", "label"], round_to=ROUND,
    )
