"""Diversified serving + embedding-graph operators: MMR greedy correctness
vs an independent numpy reference, capped-top-k greedy equivalence, blocked
kNN-graph exactness (single block) and block-respecting semantics
(multi-block), label-centroid outlier ranking.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.diversify import ann_topk_capped, mmr_rerank
from vector_store_spark.operators.knn_graph import (
    knn_graph,
    label_centroids,
    label_outliers,
)
from vector_store_spark.operators.topk import _round_half_up
from vector_store_spark.registry import ROUND

N, DIMS = 120, 8


def _vec(i):
    # multiples of 1/16: exactly representable in float32, so the table's
    # array<float> storage and the float64 test reference see identical values
    return [(((i * 17 + j * 11) % 33) - 16) / 16.0 for j in range(DIMS)]


@pytest.fixture(scope="module")
def items(spark):
    rows = [(i, _vec(i), i % 4) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def _cos_matrix(X):
    n = np.linalg.norm(X, axis=1)
    n[n == 0] = 1.0
    return (X @ X.T) / np.outer(n, n)


def _mmr_reference(ids, X, q, k, pool, lam, rnd):
    """Independent matrix-based MMR (numpy throughout, vs the operator's
    sequential-sum scalar loops)."""
    qn = np.linalg.norm(q) or 1.0
    xn = np.linalg.norm(X, axis=1)
    xn[xn == 0] = 1.0
    rel = (X @ q) / (xn * qn)
    dist = _round_half_up(1.0 - rel, rnd)
    order = np.lexsort((ids, dist))[:pool]
    cids, crel = ids[order], rel[order]
    S = _cos_matrix(X[order])
    picked = []
    for _ in range(k):
        best = None
        for i in range(len(cids)):
            if i in picked:
                continue
            div = max((S[i][j] for j in picked), default=0.0)
            score = float(_round_half_up(np.float64(lam * crel[i] - (1 - lam) * div), rnd))
            key = (-score, cids[i])
            if best is None or key < best[0]:
                best = (key, i, score)
        picked.append(best[1])
    return [(r + 1, int(cids[i])) for r, i in enumerate(picked)]


def test_mmr_matches_reference_and_diversifies(spark, items):
    q = [1.0, 0.5, 0.0, -0.5, 0.25, 0.0, 0.5, -0.25]
    got = mmr_rerank(items, "vec_id", "embedding", q, k=6, pool=25,
                     lam=0.6, round_to=ROUND).collect()
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    ids = np.arange(N, dtype=np.int64)
    ref = _mmr_reference(ids, X, np.asarray(q), 6, 25, 0.6, ROUND)
    assert [(r["rank"], r["vec_id"]) for r in got] == ref
    # rank 1 is the pure-relevance argmax; its score is exactly lam*rel
    assert abs(got[0]["mmr_score"] - round(0.6 * got[0]["relevance"], ROUND)) <= 1e-6
    # diversification engaged: picks differ from the plain top-6
    top6 = [ref2[1] for ref2 in _mmr_reference(ids, X, np.asarray(q), 6, 25, 1.0, ROUND)]
    assert [r["vec_id"] for r in got] != top6


def test_mmr_rejects_nonpositive_k(spark, items):
    with pytest.raises(ValueError, match="positive"):
        mmr_rerank(items, "vec_id", "embedding", [0.0] * DIMS, k=0)


def test_capped_topk_equals_greedy_scan(spark, items):
    q = [0.3, -0.7, 0.2, 0.9, -0.1, 0.4, 0.0, 0.6]
    k, cap = 8, 2
    got = [(r["vec_id"], r["label"], r["distance"]) for r in ann_topk_capped(
        items, "embedding", q, k, cap_col="label", cap=cap,
        id_col="vec_id", select_cols=["vec_id", "label"], round_to=ROUND,
    ).collect()]
    # greedy reference: scan in (rounded distance, id) order, skip label-full
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    qv = np.asarray(q)
    xn = np.linalg.norm(X, axis=1)
    xn[xn == 0] = 1.0
    d = _round_half_up(1.0 - (X @ qv) / (xn * (np.linalg.norm(qv) or 1.0)), ROUND)
    order = np.lexsort((np.arange(N), d))
    taken, per_label = [], {}
    for i in order:
        lbl = i % 4
        if per_label.get(lbl, 0) >= cap:
            continue
        per_label[lbl] = per_label.get(lbl, 0) + 1
        taken.append((int(i), lbl, float(d[i])))
        if len(taken) == k:
            break
    assert got == taken
    labels = [t[1] for t in got]
    assert all(labels.count(x) <= cap for x in set(labels))


def test_knn_graph_single_block_is_exact(spark, items):
    """k_centroids=1 puts everything in one block: the graph must equal the
    exact brute-force kNN graph."""
    m = 3
    got = {(r["vec_id"], r["nbr_id"]): r["distance"] for r in knn_graph(
        items, "vec_id", "embedding", m, k_centroids=1, n_assign=1,
        round_to=ROUND,
    ).collect()}
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    D = _round_half_up(1.0 - _cos_matrix(X), ROUND)
    expect = {}
    for i in range(N):
        d = D[i].copy()
        d[i] = np.inf
        for j in np.lexsort((np.arange(N), d))[:m]:
            expect[(i, int(j))] = float(d[j])
    assert got == expect


def test_knn_graph_blocked_respects_block_semantics(spark, items):
    """Multi-block: every edge's pair shares >= 1 assigned cluster, <= m
    edges per id, distances exact for the emitted pairs."""
    from vector_store_spark.operators.ivf import ivf_assign, ivf_centroids

    m, kc, na = 3, 5, 2
    out = knn_graph(items, "vec_id", "embedding", m, k_centroids=kc,
                    n_assign=na, round_to=ROUND).collect()
    cents = ivf_centroids(items, "vec_id", "embedding", kc)
    asg = ivf_assign(items, "vec_id", "embedding", cents, n_assign=na)
    clusters = {}
    for r in asg.collect():
        clusters.setdefault(r["vec_id"], set()).add(r["cluster"])
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    D = _round_half_up(1.0 - _cos_matrix(X), ROUND)
    per_id = {}
    for r in out:
        s, t = r["vec_id"], r["nbr_id"]
        assert s != t
        assert clusters[s] & clusters[t], "edge pair shares no block"
        assert r["distance"] == pytest.approx(D[s][t], abs=1e-12)
        per_id[s] = per_id.get(s, 0) + 1
    assert max(per_id.values()) <= m
    # and it matches the blocked reference exactly: per-src top-m over
    # all in-block pairs under (distance, nbr) order
    expect = {}
    for s in range(N):
        cand = [t for t in range(N)
                if t != s and clusters[s] & clusters[t]]
        cand.sort(key=lambda t: (D[s][t], t))
        for t in cand[:m]:
            expect[(s, t)] = float(D[s][t])
    assert {(r["vec_id"], r["nbr_id"]): r["distance"] for r in out} == expect


def test_knn_graph_grid_subblocking_is_lossless(spark, items):
    """The skew guard (max_block grid sub-blocking) must return the
    IDENTICAL graph: same edges, same distances — including on the
    pathological shape it exists for (k_centroids=1 ⇒ one mega-cluster,
    which unsplit would be a single |n|² task)."""
    for kc, na in ((1, 1), (5, 2)):
        base = {(r["vec_id"], r["nbr_id"]): r["distance"] for r in knn_graph(
            items, "vec_id", "embedding", 3, k_centroids=kc, n_assign=na,
            round_to=ROUND,
        ).collect()}
        grid = {(r["vec_id"], r["nbr_id"]): r["distance"] for r in knn_graph(
            items, "vec_id", "embedding", 3, k_centroids=kc, n_assign=na,
            round_to=ROUND, max_block=17,
        ).collect()}
        assert grid == base
    with pytest.raises(ValueError, match="max_block"):
        knn_graph(items, "vec_id", "embedding", 3, max_block=0)


def test_label_centroids_and_outliers(spark, items):
    cents = {r["label"]: r["centroid"] for r in
             label_centroids(items, "label", "embedding").collect()}
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    labels = np.arange(N) % 4
    for lbl in range(4):
        ref = X[labels == lbl].mean(axis=0)
        assert np.allclose(cents[lbl], ref, atol=1e-12)
    top = label_outliers(items, "vec_id", "label", "embedding",
                         top_n=5, round_to=ROUND).collect()
    d2 = {}
    for i in range(N):
        c = np.asarray(cents[labels[i]])
        d2[i] = float(_round_half_up(((X[i] - c) ** 2).sum(), ROUND))
    expect = sorted(d2, key=lambda i: (-d2[i], i))[:5]
    assert [r["vec_id"] for r in top] == expect
    assert all(math.isclose(r["dist_sq"], d2[r["vec_id"]], abs_tol=1e-9)
               for r in top)


def test_contrastive_triplets_reference(spark, items):
    """Triplets equal the blocked reference: per anchor the min-(distance,
    nbr) same-label and different-label neighbor among block-sharing pairs;
    anchors lacking either side are absent."""
    from vector_store_spark.operators.ivf import ivf_assign, ivf_centroids
    from vector_store_spark.operators.knn_graph import contrastive_triplets

    kc, na = 5, 2
    out = {r["anchor_id"]: r for r in contrastive_triplets(
        items, "vec_id", "embedding", "label",
        k_centroids=kc, n_assign=na, round_to=ROUND,
    ).collect()}
    cents = ivf_centroids(items, "vec_id", "embedding", kc)
    asg = ivf_assign(items, "vec_id", "embedding", cents, n_assign=na)
    clusters = {}
    for r in asg.collect():
        clusters.setdefault(r["vec_id"], set()).add(r["cluster"])
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    D = _round_half_up(1.0 - _cos_matrix(X), ROUND)
    for s in range(N):
        cand = [t for t in range(N) if t != s and clusters[s] & clusters[t]]
        same = sorted((t for t in cand if t % 4 == s % 4),
                      key=lambda t: (D[s][t], t))
        diff = sorted((t for t in cand if t % 4 != s % 4),
                      key=lambda t: (D[s][t], t))
        if same and diff:
            r = out[s]
            assert (r["positive_id"], r["negative_id"]) == (same[0], diff[0])
            assert r["pos_distance"] == pytest.approx(D[s][same[0]], abs=1e-12)
            assert r["neg_distance"] == pytest.approx(D[s][diff[0]], abs=1e-12)
        else:
            assert s not in out
    # positive and negative are distinct by label, hence distinct ids
    for r in out.values():
        assert r["positive_id"] != r["negative_id"]


def test_pagerank_two_node_cycle_is_stationary(spark):
    """A 2-cycle's uniform distribution is the PageRank fixed point: ranks
    stay exactly 0.5 each through any number of iterations."""
    from vector_store_spark.operators.knn_graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["vec_id", "nbr_id"])
    nodes = spark.createDataFrame([(1,), (2,)], ["vec_id"])
    got = {r["vec_id"]: r["rank"] for r in
           pagerank(edges, nodes, "vec_id", "nbr_id", 2.0, iterations=4).collect()}
    assert got[1] == pytest.approx(0.5, abs=1e-12)
    assert got[2] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_teleport_only_dangling_and_sink(spark):
    """Hand-computed single iteration on 1 -> 2 with an isolated node 3:
    node 2 gets teleport + damped full rank of 1; nodes 1 and 3 (no inbound)
    drop to pure teleport; dangling mass (from 2 and 3) evaporates."""
    from vector_store_spark.operators.knn_graph import pagerank

    edges = spark.createDataFrame([(1, 2)], ["vec_id", "nbr_id"])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["vec_id"])
    got = {r["vec_id"]: r["rank"] for r in
           pagerank(edges, nodes, "vec_id", "nbr_id", 3.0, iterations=1).collect()}
    tele = (1.0 - 0.85) / 3.0
    assert got[1] == pytest.approx(tele, abs=1e-15)
    assert got[3] == pytest.approx(tele, abs=1e-15)
    assert got[2] == pytest.approx(tele + 0.85 * (1.0 / 3.0), abs=1e-15)

    with pytest.raises(ValueError):
        pagerank(edges, nodes, "vec_id", "nbr_id", 3.0, iterations=0)


def test_kmeans_assign_nearest_and_tie_break(spark):
    """Assignment picks the true nearest centroid; exact-tie rows go to the
    SMALLEST centroid index (the oracle's (l2sq, cid) tie-break)."""
    from vector_store_spark.operators.clustering import kmeans_assign

    rows = [
        (1, [0.0, 0.0], 10),   # on centroid 0
        (2, [10.0, 10.0], 20), # on centroid 1
        (3, [5.0, 5.0], 30),   # equidistant -> cluster 0
        (4, [9.0, 10.0], 40),  # nearer centroid 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        r.vec_id: (r.cluster_id, r.l2sq, r.label)
        for r in kmeans_assign(
            df, "vec_id", "embedding", [[0.0, 0.0], [10.0, 10.0]], keep_cols=("label",)
        ).collect()
    }
    assert got == {
        1: (0, 0.0, 10),
        2: (1, 0.0, 20),
        3: (0, 50.0, 30),
        4: (1, 1.0, 40),
    }


def test_kmeans_assign_can_carry_the_vector_column(spark):
    """keep_cols may include vec_col itself (the refine pass re-reads the
    vectors for the centroid update) — the projection must dedupe."""
    from vector_store_spark.operators.clustering import kmeans_assign

    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [10.0, 9.0])], ["vec_id", "embedding"]
    )
    got = {
        r.vec_id: (r.cluster_id, list(r.embedding))
        for r in kmeans_assign(
            df, "vec_id", "embedding", [[0.0, 0.0], [10.0, 10.0]],
            keep_cols=("embedding",),
        ).collect()
    }
    assert got == {1: (0, [0.0, 1.0]), 2: (1, [10.0, 9.0])}
