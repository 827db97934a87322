"""T1/T2/J1/J3 operator tests over the driver's embeddings table plus the
reference's 2-row quick-start example (docs/examples/quick-start.cql)."""

import numpy as np
import pytest


def test_gemm_path_equals_expression_path(spark, sf_dir):
    from vector_store_spark.operators.topk import ann_topk
    from vector_store_spark.registry import det_query_vector
    from vector_store_spark.types import SpaceType

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = det_query_vector(3, 64)
    for space in (SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT):
        a = ann_topk(emb, "embedding", q, 12, space=space, tie_break=["vec_id"],
                     select_cols=["vec_id"], round_to=6, gemm=True).collect()
        b = ann_topk(emb, "embedding", q, 12, space=space, tie_break=["vec_id"],
                     select_cols=["vec_id"], round_to=6, gemm=False).collect()
        assert [(r.vec_id, r.distance) for r in a] == [(r.vec_id, r.distance) for r in b], space
from pyspark.sql import functions as F

from vector_store_spark.operators.topk import ann_topk, knn_join
from vector_store_spark.types import SpaceType


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _numpy_topk(rows, q, k, space):
    X = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    ids = np.asarray([r.vec_id for r in rows])
    q = np.asarray(q, dtype=np.float64)
    if space == SpaceType.COSINE:
        d = 1 - X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    elif space == SpaceType.EUCLIDEAN:
        d = ((X - q) ** 2).sum(axis=1)
    else:
        d = 1 - X @ q
    order = np.lexsort((ids, d))
    return list(ids[order[:k]])


@pytest.mark.parametrize("space", [SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT])
def test_ann_topk_matches_numpy(spark, embeddings, space):
    rows = embeddings.collect()
    q = list(np.asarray(rows[7].embedding, dtype=float))
    got = ann_topk(embeddings, "embedding", q, 10, space=space, tie_break=["vec_id"]).collect()
    assert [r.vec_id for r in got] == _numpy_topk(rows, q, 10, space)
    # distances ascending ⇔ similarity descending (vs_index.rs:1751)
    dists = [r.distance for r in got]
    sims = [r.similarity for r in got]
    assert dists == sorted(dists)
    assert sims == sorted(sims, reverse=True)


def test_ann_topk_filtered_is_topk_of_filtered_set(spark, embeddings):
    rows = embeddings.collect()
    q = list(np.asarray(rows[3].embedding, dtype=float))
    pred = F.col("label") == 2
    got = ann_topk(embeddings, "embedding", q, 5, predicate=pred, tie_break=["vec_id"]).collect()
    assert all(r.label == 2 for r in got)
    expect = _numpy_topk([r for r in rows if r.label == 2], q, 5, SpaceType.COSINE)
    assert [r.vec_id for r in got] == expect


def test_ann_topk_empty_filter(spark, embeddings):
    q = [0.0] * 64
    got = ann_topk(embeddings, "embedding", q, 5, predicate=F.col("label") == -1)
    assert got.count() == 0  # empty index / nothing-matches (vs_index.rs:1893)


def test_ann_topk_limit_validation(embeddings):
    with pytest.raises(ValueError):
        ann_topk(embeddings, "embedding", [0.0] * 64, 0)


def test_quickstart_two_rows(spark):
    # docs/examples/quick-start.cql:5-28 — ANN OF [0.12,0.34,0.56,0.78,0.91] LIMIT 1
    df = spark.createDataFrame(
        [
            ("c1", "first comment", [0.1, 0.3, 0.5, 0.8, 0.9]),
            ("c2", "other comment", [-0.9, 0.2, -0.4, 0.1, -0.7]),
        ],
        "id string, comment string, comment_vector array<float>",
    )
    got = ann_topk(df, "comment_vector", [0.12, 0.34, 0.56, 0.78, 0.91], 1).collect()
    assert len(got) == 1 and got[0].id == "c1"


def test_knn_join_matches_single_query_topk(spark, embeddings):
    rows = embeddings.collect()
    queries = [(f"q{i}", list(np.asarray(rows[i].embedding, dtype=float))) for i in range(3)]
    got = knn_join(embeddings, "embedding", queries, k=4, id_cols=["vec_id"]).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    for i in range(3):
        expect = _numpy_topk(rows, queries[i][1], 4, SpaceType.COSINE)
        assert by_q[f"q{i}"] == expect


def test_knn_join_hamming_matches_single_query_udf(spark, embeddings):
    """Packed-B1 XOR-popcount batch path vs the single-query Arrow twin
    (hamming_b1_udf): identical integer distances and ordering."""
    from pyspark.sql import functions as F

    from vector_store_spark.functions.quantize import hamming_b1_udf
    from vector_store_spark.registry import det_query_vector

    queries = [("a", det_query_vector(7, 64)), ("b", det_query_vector(13, 64))]
    got = knn_join(
        embeddings, "embedding", queries, k=5,
        space=SpaceType.HAMMING, id_cols=["vec_id"],
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.distance))
    for qid, qv in queries:
        single = (
            embeddings.select(
                "vec_id", hamming_b1_udf(qv)(F.col("embedding")).alias("distance")
            )
            .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
            .limit(5)
            .collect()
        )
        assert by_q[qid] == [(r.vec_id, r.distance) for r in single]


def test_rrf_fuse_combines_result_lists(spark):
    """Reciprocal-rank fusion: ids on both legs outrank single-leg ids with
    comparable ranks; an absent leg contributes 0; the fused frame is
    result-sized (no fact-table work)."""
    from pyspark.sql import functions as F

    from vector_store_spark.operators.topk import ranked_top_n, rrf_fuse

    lex = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double")
    vec = spark.createDataFrame(
        [(2, 0.1), (4, 0.2), (1, 0.3)], "doc_id long, distance double")
    l = ranked_top_n(lex, [F.col("score").desc(), F.col("doc_id").asc()], 10)
    v = ranked_top_n(vec, [F.col("distance").asc(), F.col("doc_id").asc()], 10)
    assert [r.doc_id for r in l.orderBy("rank").collect()] == [1, 2, 3]
    assert [r.doc_id for r in v.orderBy("rank").collect()] == [2, 4, 1]

    fused = rrf_fuse([l.select("doc_id", "rank"), v.select("doc_id", "rank")],
                     "doc_id", k_const=60, limit=10).collect()
    order = [r.doc_id for r in fused]
    scores = {r.doc_id: r.rrf_score for r in fused}
    # both-leg ids first: 1 (ranks 1,3), 2 (ranks 2,1); then single-leg
    assert set(order[:2]) == {1, 2}
    assert order[2:] == sorted(scores, key=lambda d: (-scores[d], d))[2:]
    assert abs(scores[2] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(scores[3] - 1 / 63) < 1e-12  # lex-only: vec leg contributes 0
    assert abs(scores[4] - 1 / 62) < 1e-12  # vec-only

    import pytest

    from vector_store_spark.operators.topk import rrf_fuse as _fuse
    with pytest.raises(ValueError, match="at least one ranked input"):
        _fuse([], "doc_id")


def test_knn_label_vote(spark):
    """kNN classification: the majority label of the k nearest neighbors
    wins; vote ties break by smallest label."""
    from vector_store_spark.operators.topk import knn_label_vote

    # cluster A near (1,0), labels mostly 1; cluster B near (0,1), label 2
    rows = [(i, [1.0, 0.01 * i], 1) for i in range(6)]
    rows += [(10 + i, [1.0, 0.01 * i + 0.002], 3) for i in range(4)]
    rows += [(20 + i, [0.01 * i, 1.0], 2) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.query_id: (r.predicted_label, r.votes) for r in knn_label_vote(
        df, "embedding", "label", [("qa", [1.0, 0.0]), ("qb", [0.0, 1.0])],
        k=10, round_to=6,
    ).collect()}
    assert out["qa"] == (1, 6)  # 6 of the 10 nearest carry label 1
    assert out["qb"] == (2, 10)
    # vote tie: 5 of each -> smallest label wins
    tie = spark.createDataFrame(
        [(i, [1.0, 0.0], 7) for i in range(5)]
        + [(10 + i, [1.0, 0.0], 4) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    got = knn_label_vote(tie, "embedding", "label", [("q", [1.0, 0.0])],
                         k=10, round_to=6).collect()[0]
    assert got.predicted_label == 4 and got.votes == 5


def test_knn_join_keeps_boundary_ties_across_partitions(spark):
    """The batch-local partial top-k must keep EVERY row tied at its
    k-boundary: with integer (Hamming) distances, the global smallest-id
    winner of a tie group can live in any partition, and a bare
    argpartition[:k] cut used to drop it (surfaced at sf0.1)."""
    from vector_store_spark.operators.topk import knn_join
    from vector_store_spark.types import SpaceType

    # 64 vectors, ALL at hamming distance 1 from the all-positive query
    # (one sign flipped per row) — every row ties; ids deliberately
    # descending so naive batch order favors large ids
    dims = 16
    rows = []
    for i in range(64):
        v = [1.0] * dims
        v[i % dims] = -1.0
        rows.append((63 - i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)
    got = knn_join(
        df, "embedding", [("q", [1.0] * dims)], k=5,
        space=SpaceType.HAMMING, id_cols=["vec_id"],
    ).orderBy("vec_id").collect()
    assert [r.vec_id for r in got] == [0, 1, 2, 3, 4]
    assert all(r.distance == 1.0 for r in got)
