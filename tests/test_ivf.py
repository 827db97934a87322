"""IVF ANN tests: assignment argmax + tie-break, probe ranking, nprobe=K
equivalence with brute force (recall=1), recall monotonicity in nprobe."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.ivf import ivf_assign, ivf_centroids, ivf_probe, ivf_topk
from vector_store_spark.operators.topk import ann_topk
from vector_store_spark.registry import det_query_vector


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_assignment_is_nearest_centroid(spark):
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r.cluster for r in ivf_assign(df, "vec_id", "embedding", cents).collect()}
    assert got[10] == 0 and got[11] == 1
    assert got[12] == 0  # exact tie -> smallest cid


def test_probe_ranking():
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7])]
    assert ivf_probe(cents, [1.0, 0.05], 2) == [0, 2]
    assert ivf_probe(cents, [0.0, 1.0], 1) == [1]


def test_nprobe_full_equals_brute_force(emb):
    q = det_query_vector(7, 64)
    brute = ann_topk(emb, "embedding", q, 10, tie_break=["vec_id"],
                     select_cols=["vec_id"], round_to=9)
    ivf = ivf_topk(emb, "vec_id", "embedding", q, 10,
                   k_centroids=8, nprobe=8, select_cols=["vec_id"], round_to=9)
    assert [r.vec_id for r in ivf.collect()] == [r.vec_id for r in brute.collect()]


def test_lsh_bucket_match_and_recall(emb):
    from vector_store_spark.operators.lsh import lsh_hyperplanes, lsh_topk
    from vector_store_spark.registry import det_query_vector

    q = det_query_vector(7, 64)
    truth = {r.vec_id for r in
             ann_topk(emb, "embedding", q, 10, tie_break=["vec_id"],
                      select_cols=["vec_id"]).collect()}
    got = lsh_topk(emb, "vec_id", "embedding", q, 10, num_bits=16, bands=4,
                   select_cols=["vec_id"]).collect()
    assert len(got) == 10
    # LSH with 4 bands of 4 bits: near vectors collide with high probability;
    # require non-trivial recall on the synthetic corpus (deterministic setup)
    recall = len({r.vec_id for r in got} & truth) / 10
    assert recall >= 0.5


def test_lsh_multiprobe_widens_candidates_and_recall(emb):
    """Query-aware multiprobe (Lv et al.): t=0 probes are exactly the
    primary buckets; t>0 candidate sets are supersets, so recall never
    drops and the primary bucket is always probed first."""
    from vector_store_spark.operators.lsh import (
        lsh_hyperplanes,
        lsh_multiprobe_buckets,
        lsh_query_buckets,
        lsh_topk,
    )
    from vector_store_spark.registry import det_query_vector

    q = det_query_vector(19, 64)
    planes = lsh_hyperplanes(64, 16)
    primary = lsh_query_buckets(q, planes, 4)
    mp0 = lsh_multiprobe_buckets(q, planes, 4, 0)
    assert [p[0] for p in mp0] == primary and all(len(p) == 1 for p in mp0)
    mp2 = lsh_multiprobe_buckets(q, planes, 4, 2)
    assert all(len(p) == 3 and p[0] == primary[b] for b, p in enumerate(mp2))
    # each perturbation flips exactly one bit of the 4-bit band bucket
    for p in mp2:
        for alt in p[1:]:
            assert bin(alt ^ p[0]).count("1") == 1

    truth = {r.vec_id for r in
             ann_topk(emb, "embedding", q, 10, tie_break=["vec_id"],
                      select_cols=["vec_id"]).collect()}
    plain = {r.vec_id for r in
             lsh_topk(emb, "vec_id", "embedding", q, 10, num_bits=16,
                      bands=4, select_cols=["vec_id"]).collect()}
    mp = {r.vec_id for r in
          lsh_topk(emb, "vec_id", "embedding", q, 10, num_bits=16, bands=4,
                   select_cols=["vec_id"], multiprobe=2).collect()}
    assert len(mp & truth) >= len(plain & truth)


def test_lsh_query_is_own_nearest_candidate(spark):
    from vector_store_spark.operators.lsh import lsh_topk

    # a vector always shares all bands with itself -> always a candidate
    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    target = rows[13][1]
    got = lsh_topk(df, "vec_id", "embedding", target, 1, num_bits=8, bands=2)
    assert got.first().vec_id in {i for i, v in rows if v == target}


def test_recall_monotone_in_nprobe(emb):
    q = det_query_vector(13, 64)
    truth = {r.vec_id for r in
             ann_topk(emb, "embedding", q, 10, tie_break=["vec_id"],
                      select_cols=["vec_id"]).collect()}
    recalls = []
    for nprobe in (1, 4, 8):
        got = {r.vec_id for r in
               ivf_topk(emb, "vec_id", "embedding", q, 10, k_centroids=8,
                        nprobe=nprobe, select_cols=["vec_id"]).collect()}
        recalls.append(len(got & truth) / 10)
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # nprobe=K scans everything


def test_ivf_assign_expr_matches_arrow_twin(emb):
    from vector_store_spark.operators.ivf import ivf_assign_expr
    from vector_store_spark.types import SpaceType

    cents = ivf_centroids(emb, "vec_id", "embedding", 8)
    for space in (SpaceType.COSINE, SpaceType.EUCLIDEAN, SpaceType.DOT_PRODUCT):
        arrow = {r.vec_id: r.cluster for r in
                 ivf_assign(emb, "vec_id", "embedding", cents, space=space).collect()}
        expr = {r.vec_id: r.cluster for r in
                ivf_assign_expr(emb, "vec_id", "embedding", cents, space=space).collect()}
        assert arrow == expr, f"space={space}"


def test_multiprobe_flip_sets_bounded_and_ordered():
    """The heap-expansion perturbation generator must (a) match the full
    2^r enumeration's (margin-sum, size, subset) order exactly on small
    bands and (b) stay O(t·r) on wide bands where enumeration is ~4B
    subsets (the multiprobe-disabled default must do no work at all)."""
    import itertools
    import random
    import time

    from vector_store_spark.operators.lsh import (
        _cheapest_flip_sets,
        lsh_hyperplanes,
        lsh_multiprobe_buckets,
        lsh_query_buckets,
    )

    rng = random.Random(7)
    for _ in range(50):
        r = rng.randint(1, 9)
        costs = [rng.random() for _ in range(r)]
        t = rng.randint(0, 2**r - 1)
        ref = sorted(
            (s for size in range(1, r + 1)
             for s in itertools.combinations(range(r), size)),
            key=lambda s: (sum(costs[i] for i in s), len(s), s),
        )[:t]
        assert _cheapest_flip_sets(costs, t) == ref

    # wide band: num_bits=64, bands=2 -> r=32; t=0 and small t must be instant
    planes = lsh_hyperplanes(64, 64, seed=7)
    q = [rng.gauss(0, 1) for _ in range(64)]
    t0 = time.perf_counter()
    mp0 = lsh_multiprobe_buckets(q, planes, 2, 0)
    mp3 = lsh_multiprobe_buckets(q, planes, 2, 3)
    assert time.perf_counter() - t0 < 1.0
    assert [p[0] for p in mp0] == lsh_query_buckets(q, planes, 2)
    assert all(len(p) == 1 for p in mp0) and all(len(p) == 4 for p in mp3)


def test_adaptive_floor_scales_with_selectivity():
    """VERDICT r15 #7: the absolute candidate floor stops escalating exactly
    where the filtered set is largest (recall@10 measured 0.90 at n=1000
    with base probes). The k-sqrt(n) floor keeps escalation alive through
    the mid range and decays for large corpora."""
    from vector_store_spark.operators.ivf import adaptive_floor, adaptive_nprobe
    from vector_store_spark.operators.lsh import adaptive_multiprobe

    # floor values (k=10): mid-size sets get a scaled floor, big sets decay
    # to the absolute one relative to n
    assert adaptive_floor(320, 1000, 10) == 633
    assert adaptive_floor(320, 400, 10) == 400
    assert adaptive_floor(320, 1000, None) == 320  # legacy absolute floor
    # the measured 0.90 cell (n=1000, trained-16, nprobe 8, min 320):
    # the old floor left nprobe at 8; the scaled floor escalates to 11,
    # which measures >= 0.95
    assert adaptive_nprobe(1000, 16, 8, 320) == 8           # old behavior
    assert adaptive_nprobe(1000, 16, 8, 320, k=10) == 11    # scaled
    # LSH analogue at the same shape: the absolute floor widened to 1
    # probe; the scaled floor widens to 2 (measured 0.975 vs 0.90 at mp=0)
    assert adaptive_multiprobe(1000, 16, 4, 0, 320) == 1
    assert adaptive_multiprobe(1000, 16, 4, 0, 320, k=10) == 2
    # exact tier widens only marginally (n <= 4k^2), big sets untouched
    assert adaptive_nprobe(400, 16, 8, 320, k=10) is None
    assert adaptive_nprobe(4000, 16, 8, 320, k=10) == 8
