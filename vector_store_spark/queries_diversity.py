"""Diversified serving + embedding-graph registry entries: MMR re-ranking,
per-group capped top-k, blocked all-pairs kNN graph, and label-centroid
outlier ranking.

The reference serves raw nearest-neighbor lists; these are the standard
post-processing / audit layers production retrieval and training-data
pipelines put on top of the same (id, vector, label) model. Each entry
carries a full DuckDB re-derivation — the MMR oracle re-runs the greedy
selection itself with a recursive CTE, so the driver checks the iterative
algorithm, not just output shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.operators.diversify import ann_topk_capped, mmr_rerank
from vector_store_spark.operators.knn_graph import knn_graph, label_outliers
from vector_store_spark.registry import (
    ROUND,
    det_query_vector,
    load,
    memo_cached_frame,
    register,
    sql_vec,
)

DIMS = 64
Q7 = det_query_vector(7, DIMS)
Q13 = det_query_vector(13, DIMS)

_POOL, _MMR_K, _LAM = 20, 5, 0.7
_Q7SQL = sql_vec(Q7)


def _cos_sim(a: str, b: str) -> str:
    return (
        f"list_inner_product({a}, {b}) / "
        f"(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"
    )


def _mmr_internal_plan(spark, sf_dir):
    """Internal-plan probe: ann_mmr_topk's returned frame is the driver-side
    greedy's result (pool-sized createDataFrame), so the suite-wide plan
    audit sees only a local scan — the distributed work is the top-POOL
    shortlist, exposed here lazily (same call mmr_rerank makes before its
    result-sized collect)."""
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.types import SpaceType

    return ann_topk(
        load(spark, sf_dir, "embeddings"), "embedding", Q7, _POOL,
        space=SpaceType.COSINE, tie_break=["vec_id"],
        select_cols=["vec_id", "embedding"], round_to=ROUND,
    )


@register(
    "ann_mmr_topk",
    # The oracle replays the GREEDY itself: a recursive CTE carries the
    # picked-id list; each step appends the argmax of the rounded MMR
    # objective (ties -> smallest id) among unpicked shortlist rows.
    # Engine/oracle float parity: every dot product on the Spark side is a
    # sequential float64 sum (operators/diversify._seq_dot), bit-identical
    # to DuckDB's list_inner_product on DOUBLE[].
    f"""
WITH RECURSIVE base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
rels AS (
  SELECT vec_id, v, {_cos_sim("v", _Q7SQL)} AS rel FROM base
),
cand AS (
  SELECT vec_id, v, rel FROM rels
  ORDER BY round(1.0 - rel, {ROUND}) ASC, vec_id ASC LIMIT {_POOL}
),
sel(step, picked) AS (
  SELECT 0, CAST([] AS BIGINT[])
  UNION ALL
  SELECT step + 1, list_append(picked, (
    SELECT c.vec_id FROM cand c
    WHERE coalesce(list_position(sel.picked, c.vec_id), 0) = 0
    ORDER BY round({_LAM} * c.rel - {1.0 - _LAM} * coalesce((
        SELECT max({_cos_sim("c.v", "p.v")})
        FROM cand p WHERE list_position(sel.picked, p.vec_id) > 0), 0.0), {ROUND}) DESC,
      c.vec_id ASC
    LIMIT 1))
  FROM sel WHERE step < {_MMR_K}
),
final_picked AS (SELECT picked FROM sel WHERE step = {_MMR_K})
SELECT CAST(list_position(fp.picked, c.vec_id) AS INTEGER) AS rank,
       c.vec_id,
       round(c.rel, {ROUND}) AS relevance,
       round({_LAM} * c.rel - {1.0 - _LAM} * coalesce((
         SELECT max({_cos_sim("c.v", "p.v")})
         FROM cand p
         WHERE list_position(fp.picked, p.vec_id) > 0
           AND list_position(fp.picked, p.vec_id) < list_position(fp.picked, c.vec_id)), 0.0), {ROUND}) AS mmr_score
FROM cand c, final_picked fp
WHERE list_position(fp.picked, c.vec_id) > 0
""",
    "MMR-diversified top-k (Carbonell & Goldstein '98): distributed top-pool "
    "shortlist, driver-side greedy over the result-sized pool; oracle replays "
    "the greedy with a recursive CTE",
    internal_plan_fn=_mmr_internal_plan,
)
def ann_mmr_topk(spark, sf_dir):
    return mmr_rerank(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", Q7,
        k=_MMR_K, pool=_POOL, lam=_LAM, round_to=ROUND,
    )


_CAP = 2


@register(
    "ann_capped_topk",
    f"""
WITH scored AS (
  SELECT vec_id, label,
         round(1.0 - {_cos_sim("CAST(embedding AS DOUBLE[])", sql_vec(Q13))}, {ROUND}) AS distance
  FROM embeddings
),
ranked AS (
  SELECT vec_id, label, distance,
         row_number() OVER (PARTITION BY label ORDER BY distance, vec_id) AS rn
  FROM scored
)
SELECT vec_id, label, distance FROM ranked WHERE rn <= {_CAP}
ORDER BY distance, vec_id LIMIT 10
""",
    "Diversity-capped top-k: global top-10 with <= 2 results per label "
    "(greedy cap == per-group-top-cap -> global top-k; Arrow-batch pruning "
    "keeps the window input result-sized)",
)
def ann_capped_topk(spark, sf_dir):
    return ann_topk_capped(
        load(spark, sf_dir, "embeddings"), "embedding", Q13, 10,
        cap_col="label", cap=_CAP, id_col="vec_id",
        select_cols=["vec_id", "label"], round_to=ROUND,
    )


_KG_CENTROIDS, _KG_ASSIGN, _KG_M = 8, 2, 3

# same deterministic assignment CTE family as queries_ivf._ASG, with
# rn <= n_assign (FLANN multiple assignment) instead of rn = 1
_KG_ASG = f"""
c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY vec_id LIMIT {_KG_CENTROIDS}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS (
  SELECT e.vec_id, c.cid, {_cos_sim("v", "cv")} AS sim
  FROM e CROSS JOIN c
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn <= {_KG_ASSIGN}
)
"""


@register(
    "knn_graph_blocked",
    f"""
WITH {_KG_ASG},
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
d AS (
  SELECT p.src, p.dst,
         round(1.0 - {_cos_sim("ea.v", "eb.v")}, {ROUND}) AS distance
  FROM pairs p JOIN e ea ON ea.vec_id = p.src JOIN e eb ON eb.vec_id = p.dst
),
ranked AS (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
  FROM d
)
SELECT src AS vec_id, dst AS nbr_id, distance FROM ranked WHERE rn <= {_KG_M}
""",
    "Blocked all-pairs kNN graph: IVF multiple-assignment blocking, exact "
    "per-block GEMM, per-id top-m merge — Sigma |block|^2 work instead of n^2",
)
def knn_graph_blocked(spark, sf_dir):
    return _graph(spark, sf_dir)


# the graph is a standing corpus artifact consumed by several queries
# (edge listing, label propagation) — memoize per (session, corpus) like
# queries_dedup._PAIRS_CACHE; the build is deterministic, so reuse cannot
# change results. Cached frame is m·N edges (narrow).
_GRAPH_CACHE: dict[str, object] = {}


def _graph(spark, sf_dir):
    key = f"{spark.sparkContext.applicationId}:{sf_dir}"

    def _build():
        # max_block: the grid skew guard is LOSSLESS (pinned by
        # test_knn_graph_grid_subblocking_is_lossless), so unlike the dedup
        # salting cap it can stay armed in the oracle-checked query
        return knn_graph(
            load(spark, sf_dir, "embeddings"), "vec_id", "embedding", _KG_M,
            k_centroids=_KG_CENTROIDS, n_assign=_KG_ASSIGN, round_to=ROUND,
            max_block=256,
        )

    # self-heals after clearCache (see registry.memo_cached_frame)
    return memo_cached_frame(_GRAPH_CACHE, key, _build)


@register(
    "emb_label_outliers",
    f"""
WITH cent AS (
  SELECT label, g AS pos, round(avg(CAST(embedding[g] AS DOUBLE)), {ROUND}) AS c
  FROM embeddings, generate_series(1, {DIMS}) t(g)
  GROUP BY label, g
),
d AS (
  SELECT e.vec_id, e.label,
         sum((CAST(e.embedding[c.pos] AS DOUBLE) - c.c)
             * (CAST(e.embedding[c.pos] AS DOUBLE) - c.c)) AS d2
  FROM embeddings e JOIN cent c ON e.label = c.label
  GROUP BY e.vec_id, e.label
)
SELECT vec_id, label, round(d2, {ROUND}) AS dist_sq FROM d
ORDER BY dist_sq DESC, vec_id LIMIT 15
""",
    "Embedding-space label audit: top-15 vectors farthest (L2^2) from their "
    "own label centroid — the CLIP-filtering-style mislabel/outlier sweep",
)
def emb_label_outliers(spark, sf_dir):
    return label_outliers(
        load(spark, sf_dir, "embeddings"), "vec_id", "label", "embedding",
        top_n=15, round_to=ROUND, centroid_round_to=ROUND,
    )


@register(
    "knn_graph_label_prop",
    # one label-propagation step over the blocked kNN graph: every node in
    # the synthetic "unlabeled" stratum (vec_id % 5 == 0) takes the majority
    # label of its labeled graph neighbors (ties -> smallest label); nodes
    # whose neighborhood is entirely unlabeled get no row. The oracle chains
    # the graph CTE with the vote window.
    f"""
WITH {_KG_ASG},
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
d AS (
  SELECT p.src, p.dst,
         round(1.0 - {_cos_sim("ea.v", "eb.v")}, {ROUND}) AS distance
  FROM pairs p JOIN e ea ON ea.vec_id = p.src JOIN e eb ON eb.vec_id = p.dst
),
graph AS (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
    FROM d
  ) WHERE rn <= {_KG_M}
),
votes AS (
  SELECT g.src AS vec_id, l.label, count(*) AS n_votes
  FROM graph g
  JOIN embeddings l ON l.vec_id = g.dst AND l.vec_id % 5 <> 0
  WHERE g.src % 5 = 0
  GROUP BY g.src, l.label
)
SELECT vec_id, label AS predicted_label, CAST(n_votes AS BIGINT) AS n_votes
FROM (
  SELECT vec_id, label, n_votes,
         row_number() OVER (PARTITION BY vec_id ORDER BY n_votes DESC, label ASC) AS rn
  FROM votes
) WHERE rn = 1
""",
    "Label propagation over the kNN graph: unlabeled stratum nodes take the "
    "majority label of their labeled graph neighbors — the graph-consuming "
    "half of semi-supervised corpus labeling (knn_graph_blocked builds, "
    "this votes)",
)
def knn_graph_label_prop(spark, sf_dir):
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    graph = _graph(spark, sf_dir)
    unlabeled = graph.where(F.col("vec_id") % 5 == 0)
    # edges and labels are BOTH fact-sized (m rows per doc vs one per doc):
    # shuffle-hash — Catalyst would broadcast the label side at test SF
    labeled_nbrs = unlabeled.join(
        emb.select(F.col("vec_id").alias("nbr_id"), "label")
        .where(F.col("nbr_id") % 5 != 0).hint("SHUFFLE_HASH"),
        "nbr_id",
    )
    votes = labeled_nbrs.groupBy("vec_id", "label").agg(
        F.count("*").cast("long").alias("n_votes")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", F.col("label").alias("predicted_label"), "n_votes")
    )


@register(
    "contrastive_triplets",
    # triplet mining on the blocked candidate set: per anchor the nearest
    # same-label (positive) and nearest different-label (hard negative)
    # neighbor among all block-sharing pairs; anchors missing either side
    # drop (inner join) — the corpus-wide, deterministic version of
    # in-batch hard-negative selection
    f"""
WITH {_KG_ASG},
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
d AS (
  SELECT p.src, p.dst, la.label AS src_label, lb.label AS dst_label,
         round(1.0 - {_cos_sim("ea.v", "eb.v")}, {ROUND}) AS distance
  FROM pairs p
  JOIN e ea ON ea.vec_id = p.src JOIN e eb ON eb.vec_id = p.dst
  JOIN embeddings la ON la.vec_id = p.src
  JOIN embeddings lb ON lb.vec_id = p.dst
),
pos AS (
  SELECT src, dst, distance FROM (
    SELECT src, dst, distance,
           row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
    FROM d WHERE src_label = dst_label
  ) WHERE rn = 1
),
neg AS (
  SELECT src, dst, distance FROM (
    SELECT src, dst, distance,
           row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
    FROM d WHERE src_label <> dst_label
  ) WHERE rn = 1
)
SELECT p.src AS anchor_id, p.dst AS positive_id, p.distance AS pos_distance,
       n.dst AS negative_id, n.distance AS neg_distance
FROM pos p JOIN neg n ON p.src = n.src
""",
    "Contrastive triplet mining: per anchor its nearest same-label "
    "(positive) and nearest different-label (hard negative) neighbor over "
    "the IVF-blocked candidate set — corpus-wide deterministic hard-negative "
    "selection for metric learning",
)
def contrastive_triplets_q(spark, sf_dir):
    from vector_store_spark.operators.knn_graph import contrastive_triplets

    return contrastive_triplets(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", "label",
        k_centroids=_KG_CENTROIDS, n_assign=_KG_ASSIGN, round_to=ROUND,
    )


def _pr_iter_sql(i: int) -> str:
    """One power-iteration CTE pair: fan-out contributions along the graph,
    then teleport-mix back onto the full node set (LEFT JOIN keeps
    contribution-less nodes at pure teleport mass). Constants are written as
    ``(1.0 - 0.85)`` / ``0.85`` so both engines evaluate the IDENTICAL IEEE
    expressions the Spark operator uses."""
    return f"""
c{i} AS (
  SELECT e2.dst, sum(r.rank / e2.outdeg) AS contrib
  FROM ed e2 JOIN r{i - 1} r ON r.vec_id = e2.src GROUP BY e2.dst
),
r{i} AS (
  SELECT n2.vec_id,
         (1.0 - 0.85) / (SELECT n FROM nn)
         + 0.85 * coalesce(c.contrib, 0.0) AS rank
  FROM nodes n2 LEFT JOIN c{i} c ON c.dst = n2.vec_id
)"""


#: stretch-SF memo (r14): DuckDB INLINES non-recursive CTEs per reference, so
#: the pagerank chain re-derived the whole blocked-kNN graph (cell pairs +
#: distances + per-src window) once per power iteration — at 24k vectors the
#: tripled intermediate spilled past box disk. The memoized variant
#: materializes the EDGE LIST once per gate run (m·N rows, narrow) and the
#: iterations run over the temp table; identical math, identical result.
_KG_GRAPH_MEMO_SETUP = [(
    "__memo_knn_graph",
    f"""WITH {_KG_ASG},
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
d AS (
  SELECT p.src, p.dst,
         round(1.0 - {_cos_sim("ea.v", "eb.v")}, {ROUND}) AS distance
  FROM pairs p JOIN e ea ON ea.vec_id = p.src JOIN e eb ON eb.vec_id = p.dst
)
SELECT src, dst FROM (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
  FROM d
) WHERE rn <= {_KG_M}""",
)]

_PR_MEMO = f"""
WITH deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
             FROM __memo_knn_graph GROUP BY src),
ed AS (SELECT g.src, g.dst, dg.outdeg
       FROM __memo_knn_graph g JOIN deg dg ON dg.src = g.src),
nodes AS (SELECT vec_id FROM embeddings),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
r0 AS (SELECT vec_id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{_pr_iter_sql(1)},
{_pr_iter_sql(2)},
{_pr_iter_sql(3)}
SELECT vec_id, round(rank * (SELECT n FROM nn), {ROUND}) AS pagerank
FROM r3 ORDER BY pagerank DESC, vec_id LIMIT 15
"""


@register(
    "knn_graph_pagerank",
    # the graph CTE is the same blocked-kNN derivation as knn_graph_blocked /
    # knn_graph_label_prop; on top of it: out-degree, uniform start, three
    # teleport-only power iterations (dangling mass evaporates — the Spark
    # operator documents the same contract), normalized *N for a mean-1.0
    # scale before the rounded top-15 cut
    f"""
WITH {_KG_ASG},
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
d AS (
  SELECT p.src, p.dst,
         round(1.0 - {_cos_sim("ea.v", "eb.v")}, {ROUND}) AS distance
  FROM pairs p JOIN e ea ON ea.vec_id = p.src JOIN e eb ON eb.vec_id = p.dst
),
graph AS (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
    FROM d
  ) WHERE rn <= {_KG_M}
),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM graph GROUP BY src),
ed AS (SELECT g.src, g.dst, dg.outdeg FROM graph g JOIN deg dg ON dg.src = g.src),
nodes AS (SELECT vec_id FROM embeddings),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
r0 AS (SELECT vec_id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{_pr_iter_sql(1)},
{_pr_iter_sql(2)},
{_pr_iter_sql(3)}
SELECT vec_id, round(rank * (SELECT n FROM nn), {ROUND}) AS pagerank
FROM r3 ORDER BY pagerank DESC, vec_id LIMIT 15
""",
    "PageRank over the blocked kNN graph (3 teleport-only power iterations, "
    "d=0.85): the graph-centrality half of embedding-corpus curation — "
    "high-rank nodes are dense-region representatives, the complement of "
    "emb_label_outliers. Each iteration is a SHUFFLE_HASH fan-out join + "
    "dst-keyed partial-combined sum; no driver collection, bounded lineage",
    memo_setup=_KG_GRAPH_MEMO_SETUP,
    memo_sql=_PR_MEMO,
)
def knn_graph_pagerank(spark, sf_dir):
    from vector_store_spark.operators.knn_graph import pagerank

    emb = load(spark, sf_dir, "embeddings")
    n = float(emb.count())
    pr = pagerank(
        _graph(spark, sf_dir), emb, "vec_id", "nbr_id", n,
        iterations=3, damping=0.85,
    )
    return (
        pr.withColumn("pagerank", F.round(F.col("rank") * F.lit(n), ROUND))
        .orderBy(F.col("pagerank").desc(), F.col("vec_id").asc())
        .limit(15)
        .select("vec_id", "pagerank")
    )


@register(
    "emb_cluster_profile",
    # one Lloyd assignment pass against fixed seed centroids (vec_id < 8 —
    # deterministic, so the oracle can re-derive them from the same table;
    # the trained-centroid path is operators/ivf.py). Engine distances are a
    # per-dim sequential numpy fold = bit-identical to list_inner_product on
    # the diff vector, so argmin ties cannot diverge across engines.
    f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
d AS (
  SELECT e.vec_id, e.label, c.cid,
         list_inner_product(list_transform(list_zip(e.v, c.cv), x -> (x[1] - x[2])),
                            list_transform(list_zip(e.v, c.cv), x -> (x[1] - x[2]))) AS l2sq
  FROM e CROSS JOIN c
),
a AS (
  SELECT vec_id, label, cid, l2sq,
         row_number() OVER (PARTITION BY vec_id ORDER BY l2sq, cid) AS rn
  FROM d
),
m AS (SELECT vec_id, label, cid, l2sq FROM a WHERE rn = 1),
prof AS (
  SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         round(avg(l2sq), {ROUND}) AS mean_l2sq
  FROM m GROUP BY cid
),
lab AS (
  SELECT cid, label, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY cid ORDER BY count(*) DESC, label) AS rn
  FROM m GROUP BY cid, label
)
SELECT cluster_id, n_members, mean_l2sq,
       lab.label AS top_label, lab.n AS top_label_n
FROM prof JOIN lab ON lab.cid = prof.cluster_id AND lab.rn = 1
""",
    "Unsupervised corpus bucketing profile: one k-means assignment pass "
    "against deterministic seed centroids (closure-shipped k x dims matrix, "
    "no join/shuffle for assignment), per-cluster size + mean squared-L2 + "
    "majority label — the domain-discovery audit a training pipeline runs "
    "before mixing; cluster-bounded rollups only",
)
def emb_cluster_profile(spark, sf_dir):
    from pyspark.sql import Window

    from vector_store_spark.operators.clustering import kmeans_assign

    emb = load(spark, sf_dir, "embeddings")
    cents = sorted(
        emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )  # k-bounded metadata collect (8 rows)
    assigned = kmeans_assign(
        emb, "vec_id", "embedding", [r.embedding for r in cents], keep_cols=("label",)
    )
    # argmin INDEX -> seed vec_id, explicitly: the two coincide on this data
    # (seed ids 0..7 contiguous) but the oracle keys clusters by vec_id, so
    # the mapping must not rely on that coincidence
    cid_lookup = F.array(*[F.lit(int(r.vec_id)) for r in cents])
    assigned = assigned.withColumn(
        "cluster_id",
        F.element_at(cid_lookup, F.col("cluster_id").cast("int") + 1).cast("long"),
    )
    # ONE fact-table pass: the (cluster, label) rollup carries the l2sq mass,
    # and the per-cluster profile re-aggregates the cluster-bounded rollup
    # (deriving both branches from `assigned` directly would run the
    # assignment UDF scan twice — the two groupBys partition differently)
    lab = assigned.groupBy("cluster_id", "label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("l2sq").alias("sum_l2sq"),
    )
    prof = lab.groupBy("cluster_id").agg(
        F.sum("n").cast("long").alias("n_members"),
        F.round(F.sum("sum_l2sq") / F.sum("n"), ROUND).alias("mean_l2sq"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("n").desc(), F.col("label"))
    top = (
        lab.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col("label").alias("top_label"), F.col("n").alias("top_label_n"))
    )
    return prof.join(F.broadcast(top), "cluster_id")


_KM_DIFF1 = "list_transform(list_zip(e.v, c0.cv), x -> (x[1] - x[2]))"
_KM_DIFF2 = "list_transform(list_zip(e.v, c1.cv), x -> (x[1] - x[2]))"


@register(
    "emb_kmeans_refined_profile",
    # TWO Lloyd iterations, oracle-unrolled: seed assignment -> per-dim mean
    # centroids ROUNDED to 6 dp (the rounding erases the ~1e-15 relative
    # accumulation-order drift between Spark's partial-aggregated avg and
    # DuckDB's sequential avg, so pass-2 inputs are bit-identical) -> final
    # assignment + profile. Distances on both passes are the established
    # bit-identical pair (per-dim sequential fold == list_inner_product on
    # the diff vector), so argmin ties cannot diverge.
    f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
d1 AS (
  SELECT e.vec_id, c0.cid,
         list_inner_product({_KM_DIFF1}, {_KM_DIFF1}) AS l2sq
  FROM e CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY l2sq, cid) AS rn
    FROM d1) WHERE rn = 1
),
cent AS (
  SELECT a1.cid, g AS pos, round(avg(e.v[g]), {ROUND}) AS c
  FROM a1 JOIN e USING (vec_id), generate_series(1, {DIMS}) t(g)
  GROUP BY a1.cid, g
),
c1 AS (SELECT cid, array_agg(c ORDER BY pos) AS cv FROM cent GROUP BY cid),
d2 AS (
  SELECT e.vec_id, c1.cid,
         list_inner_product({_KM_DIFF2}, {_KM_DIFF2}) AS l2sq
  FROM e CROSS JOIN c1
),
a2 AS (
  SELECT vec_id, cid, l2sq FROM (
    SELECT vec_id, cid, l2sq,
           row_number() OVER (PARTITION BY vec_id ORDER BY l2sq, cid) AS rn
    FROM d2) WHERE rn = 1
)
SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       round(avg(l2sq), {ROUND}) AS mean_l2sq
FROM a2 GROUP BY cid
""",
    "Iterated distributed k-means, oracle-checked end to end: seed assignment "
    "-> per-dim mean centroids (rounded, cross-engine-stable) -> refined "
    "assignment -> per-cluster profile. Each pass is one closure-shipped "
    "GEMM-free mapInPandas sweep (no join/shuffle to assign); the centroid "
    "update is a (k x dims)-bounded aggregate; nothing iterates on the driver "
    "but the k-bounded centroid collect",
)
def emb_kmeans_refined_profile(spark, sf_dir):
    from vector_store_spark.operators.clustering import kmeans_assign

    emb = load(spark, sf_dir, "embeddings")
    seeds = sorted(
        emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    a1 = kmeans_assign(
        emb, "vec_id", "embedding", [r.embedding for r in seeds],
        keep_cols=("embedding",),
    )
    # argmin INDEX -> seed vec_id explicitly (index == vec_id only while the
    # seed ids happen to be 0..k-1 contiguous; the oracle keys by vec_id)
    seed_lookup = F.array(*[F.lit(int(r.vec_id)) for r in seeds])
    a1 = a1.withColumn(
        "cluster_id",
        F.element_at(seed_lookup, F.col("cluster_id").cast("int") + 1).cast("long"),
    )
    cent_rows = (
        a1.select("cluster_id", F.posexplode("embedding").alias("pos0", "val"))
        .groupBy("cluster_id", "pos0")
        .agg(F.round(F.avg(F.col("val").cast("double")), ROUND).alias("c"))
        .collect()
    )  # (k x dims)-bounded metadata collect (<= 512 rows)
    by_cid: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        by_cid.setdefault(r.cluster_id, {})[r.pos0] = r.c
    cids = sorted(by_cid)
    c1 = [[by_cid[cid][p] for p in sorted(by_cid[cid])] for cid in cids]
    a2 = kmeans_assign(emb, "vec_id", "embedding", c1)
    # map argmin INDEX back to the surviving cluster ids (order-preserved)
    cid_lookup = F.array(*[F.lit(int(c)) for c in cids])
    return (
        a2.withColumn("cluster_id", F.element_at(cid_lookup, F.col("cluster_id").cast("int") + 1).cast("long"))
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(F.avg("l2sq"), ROUND).alias("mean_l2sq"),
        )
    )


# graph-edge CTE shared by the three graph-analysis oracles below — the same
# blocked-kNN derivation as knn_graph_blocked, wrapped as `g(src, dst,
# distance)` so the analyses can never drift from the graph query itself
_KG_G = f"""{_KG_ASG},
pairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
d AS (
  SELECT p.src, p.dst,
         round(1.0 - {_cos_sim("ea.v", "eb.v")}, {ROUND}) AS distance
  FROM pairs p JOIN e ea ON ea.vec_id = p.src JOIN e eb ON eb.vec_id = p.dst
),
ranked AS (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rn
  FROM d
),
g AS (SELECT src, dst, distance FROM ranked WHERE rn <= {_KG_M})
"""


@register(
    "knn_graph_indegree_hist",
    # Hubness audit: in high dimensions a few "hub" points appear in MANY
    # other points' kNN lists while anti-hubs appear in none (Radovanović et
    # al. 2010) — skewed in-degree distorts retrieval and graph-ANN quality.
    # The histogram of in-degrees (including the 0 bucket for anti-hubs) is
    # the standard diagnostic. Out-degree is fixed at m, so in-degree is the
    # only informative side.
    f"""
WITH {_KG_G},
ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS in_degree FROM g GROUP BY dst),
hist AS (
  SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes FROM ind GROUP BY in_degree
),
zero AS (
  SELECT CAST(0 AS BIGINT) AS in_degree,
         CAST((SELECT count(*) FROM embeddings) - (SELECT count(*) FROM ind) AS BIGINT) AS n_nodes
)
SELECT in_degree, n_nodes FROM hist
UNION ALL
SELECT in_degree, n_nodes FROM zero WHERE n_nodes > 0
""",
    "Hubness diagnostic over the kNN graph: in-degree histogram incl. the "
    "anti-hub 0 bucket (out-degree is fixed at m; skewed in-degree is the "
    "high-dimensional pathology that degrades retrieval)",
)
def knn_graph_indegree_hist(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    g = _graph(spark, sf_dir)
    ind = g.groupBy("nbr_id").agg(F.count("*").cast("long").alias("in_degree"))
    hist = ind.groupBy("in_degree").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    # anti-hub bucket: nodes referenced by NO kNN list. Two metadata-sized
    # counts (driver ints), appended as a literal row — no extra join.
    n_zero = emb.count() - ind.count()
    if n_zero <= 0:
        return hist
    zero = spark.createDataFrame([(0, n_zero)], "in_degree long, n_nodes long")
    return hist.unionByName(zero)


@register(
    "knn_graph_edge_stats",
    # Edge-level graph quality: reciprocity (fraction of directed kNN edges
    # whose reverse edge also exists — low reciprocity marks asymmetric
    # neighborhoods/hubs) and the mean edge distance. The mean uses the
    # integer-sum recipe: distances are 6dp-rounded, so sum their 1e6
    # scalings as BIGINT (order-independent in both engines) and divide
    # once — a double sum's association drift could flip the 6dp mean.
    f"""
WITH {_KG_G},
rev AS (SELECT dst AS src, src AS dst FROM g),
m AS (
  SELECT gr.distance, CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS is_rec
  FROM g gr LEFT JOIN rev r ON gr.src = r.src AND gr.dst = r.dst
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(is_rec) AS BIGINT) AS n_reciprocal,
       round(CAST(sum(is_rec) AS DOUBLE) / count(*), 6) AS reciprocity,
       round(sum(CAST(round(distance * 1000000) AS BIGINT)) / (count(*) * 1000000.0), 6) AS mean_distance
FROM m
""",
    "kNN-graph edge stats: reciprocity rate (mutual-neighbor fraction — the "
    "symmetry health check before mutual-kNN clustering) and mean edge "
    "distance via an order-independent integer sum",
)
def knn_graph_edge_stats(spark, sf_dir):
    g = _graph(spark, sf_dir)
    rev = g.select(
        F.col("nbr_id").alias("vec_id"), F.col("vec_id").alias("nbr_id"),
        F.lit(1).alias("_rev"),
    )
    # edge ⋈ reversed-edge is fact-fact on the edge keys: SHUFFLE_HASH, the
    # m·N edge frame must never broadcast. (src,dst) is unique in g, so the
    # left join cannot fan out.
    marked = g.join(rev.hint("SHUFFLE_HASH"), ["vec_id", "nbr_id"], "left")
    # coalesce: sum over an ALL-null column is NULL on Spark but the oracle's
    # sum(CASE...ELSE 0) is 0 — a corpus with zero reciprocal edges must
    # yield 0/0.0 on both sides, not NULL
    n_rec = F.coalesce(F.sum("_rev"), F.lit(0))
    return marked.agg(
        F.count("*").cast("long").alias("n_edges"),
        n_rec.cast("long").alias("n_reciprocal"),
        F.round(
            n_rec.cast("double") / F.count("*"), 6
        ).alias("reciprocity"),
        F.round(
            F.sum(F.round(F.col("distance") * 1000000).cast("long"))
            / (F.count("*") * 1000000.0),
            6,
        ).alias("mean_distance"),
    )


@register(
    "emb_knn_dist_outliers",
    # Density outliers: the 15 vectors whose mean distance TO THEIR OWN kNN
    # list is largest — the kNN-distance outlier detector (Ramaswamy et al.
    # 2000 'Efficient algorithms for mining outliers'), complementary to the
    # label-centroid audit (emb_label_outliers scores against a class mean;
    # this scores local density, labels unseen). Same integer-sum mean.
    f"""
WITH {_KG_G},
s AS (
  SELECT src AS vec_id, CAST(count(*) AS BIGINT) AS n_neighbors,
         round(sum(CAST(round(distance * 1000000) AS BIGINT)) / (count(*) * 1000000.0), 6) AS mean_nbr_distance
  FROM g GROUP BY src
)
SELECT vec_id, n_neighbors, mean_nbr_distance FROM s
ORDER BY mean_nbr_distance DESC, vec_id LIMIT 15
""",
    "kNN-distance outliers: top-15 by mean distance to own neighbor list — "
    "the density-based outlier sweep over the memoized kNN graph",
)
def emb_knn_dist_outliers(spark, sf_dir):
    g = _graph(spark, sf_dir)
    s = g.groupBy(F.col("vec_id")).agg(
        F.count("*").cast("long").alias("n_neighbors"),
        F.round(
            F.sum(F.round(F.col("distance") * 1000000).cast("long"))
            / (F.count("*") * 1000000.0),
            6,
        ).alias("mean_nbr_distance"),
    )
    return s.orderBy(
        F.col("mean_nbr_distance").desc(), F.col("vec_id").asc()
    ).limit(15)
