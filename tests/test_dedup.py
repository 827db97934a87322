"""Dedup operator tests (SURVEY.md training-data pipeline ops).

Mirrors the reference's tier-1 strategy: small, semantically sharp cases per
operator — exact-group membership, Jaccard math, LSH banding guarantees,
SimHash blocking losslessness (max_hamming < bands ⇒ no candidate missed).
"""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.functions.hashing import P31, POLY_MULT, poly_hash
from vector_store_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the QUICK brown fox -- jumps over the lazy dog!!"),  # normalizes to ==1
    (3, "The quick brown fox jumps over the sleepy dog"),  # near-dup of 1
    (4, "Completely unrelated text about spark query engines and parquet files"),
    (5, "Completely unrelated text about spark query engines and parquet files"),  # ==4
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_poly_hash_matches_python(spark):
    def py_hash(s):
        h = 0
        for c in s:
            h = (h * POLY_MULT + ord(c)) % P31
        return h

    rows = spark.createDataFrame([("abc",), ("The quick",), ("",)], ["s"]).select(
        poly_hash("s").alias("h")
    ).collect()
    assert [r.h for r in rows] == [py_hash("abc"), py_hash("The quick"), 0]


def test_udf_hashes_match_column_expressions(spark, docs):
    # the Arrow-batched hot path must produce the IDENTICAL integers as the
    # Column-expression spec (functions/hashing module docstring)
    from vector_store_spark.functions.hashing import (
        shingle_hashes_udf, simhash_expr, simhash_udf,
    )
    from vector_store_spark.functions.text import tokenize
    from vector_store_spark.operators.dedup import shingle_hashes

    rows = docs.select(
        F.sort_array(shingle_hashes("text", 3)).alias("expr_hs"),
        F.sort_array(shingle_hashes_udf(3)(F.col("text"))).alias("udf_hs"),
        simhash_expr(F.transform(tokenize("text"), lambda t: poly_hash(t))).alias("expr_fp"),
        simhash_udf()(F.col("text")).alias("udf_fp"),
    ).collect()
    for r in rows:
        assert r.expr_hs == r.udf_hs
        assert r.expr_fp == r.udf_fp


def test_exact_dedup_groups(docs):
    rows = exact_dedup(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert [(r.keep_id, r.group_size, r.member_ids) for r in rows] == [
        (1, 2, [1, 2]),
        (4, 2, [4, 5]),
    ]


def test_ngram_jaccard_finds_near_dup(docs):
    rows = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.4).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    # 1≈2 (identical after tokenize), 1≈3 and 2≈3 (one word differs), 4==5
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}
    jac = {(r.id_a, r.id_b): r.jaccard for r in rows}
    assert jac[(1, 2)] == 1.0 and jac[(4, 5)] == 1.0
    assert 0.4 <= jac[(1, 3)] < 1.0


def test_minhash_lsh_identical_docs_always_candidates(docs):
    # identical shingle sets ⇒ identical signatures ⇒ same bucket in every band
    rows = minhash_lsh_pairs(docs, "doc_id", "text", n=2, num_hashes=12, bands=4,
                             threshold=0.99).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    assert {(1, 2), (4, 5)} <= got


def test_minhash_jaccard_matches_exact(docs):
    # where LSH surfaces a candidate, its verified jaccard equals the exact one
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.0).collect()}
    lsh = minhash_lsh_pairs(docs, "doc_id", "text", n=2, num_hashes=12, bands=6,
                            threshold=0.0).collect()
    for r in lsh:
        assert abs(r.jaccard - exact[(r.id_a, r.id_b)]) < 1e-12


def test_simhash_blocking_is_lossless(spark, docs):
    # max_hamming=2 < bands=3 ⇒ banding must find every pair the exhaustive
    # O(n²) scan finds (pigeonhole: ≤2 differing bits can't hit all 3 chunks)
    from vector_store_spark.functions.hashing import hamming64_expr, simhash_expr
    from vector_store_spark.functions.text import tokenize

    th = F.transform(tokenize("text"), lambda t: poly_hash(t))
    fp = docs.select(F.col("doc_id").alias("id"), simhash_expr(th).alias("fp"))
    brute = (
        fp.alias("a").join(fp.alias("b"), F.col("a.id") < F.col("b.id"))
        .where(hamming64_expr(F.col("a.fp"), F.col("b.fp")) <= 2)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .collect()
    )
    banded = simhash_pairs(docs, "doc_id", "text", max_hamming=2, bands=3).collect()
    assert {(r.id_a, r.id_b) for r in banded} == {(r.id_a, r.id_b) for r in brute}


def test_embedding_neardup_lsh_finds_gemm_pairs(spark, sf_dir):
    # LSH candidate gen + exact verify must surface the strong pairs the
    # exhaustive blocked-GEMM path finds (near-identical vectors share all
    # band buckets with overwhelming probability)
    from vector_store_spark.operators.dedup import embedding_neardup_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in
             embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.45).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           embedding_neardup_pairs_lsh(emb, "vec_id", "embedding", threshold=0.45).collect()}
    assert lsh <= exact  # precision 1 (exact verify)
    if exact:
        assert len(lsh) / len(exact) >= 0.3  # S-curve recall at cos>=0.45 is partial
    # 1-bit multiprobe: still precision 1, and recall must dominate the
    # plain band S-curve (Hamming-distance-1 band codes now collide too)
    probed = {(r.id_a, r.id_b) for r in
              embedding_neardup_pairs_lsh(emb, "vec_id", "embedding",
                                          threshold=0.45, probes=1).collect()}
    assert probed <= exact
    assert probed >= lsh
    if exact:
        assert len(probed) / len(exact) >= 0.7


def test_embedding_neardup(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    rows = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.95).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].cosine > 0.999


def test_connected_components_multi_hop(spark):
    from vector_store_spark.operators.dedup import dedup_connected_components

    # chain 1-2-3-4 (diameter 3) + pair 10-11 + triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {r.group_id: (r.group_size, r.member_ids) for r in
           dedup_connected_components(pairs).collect()}
    assert got == {
        1: (4, [1, 2, 3, 4]),
        10: (2, [10, 11]),
        20: (3, [20, 21, 22]),
    }


def test_decontaminate_flags_embedded_eval_doc(spark):
    from vector_store_spark.operators.dedup import decontaminate_ngram

    # train doc 1 embeds the whole eval prompt inside a longer text: the
    # eval-relative containment must be 1.0 even though symmetric Jaccard
    # would dilute; train doc 2 shares nothing.
    prompt = "the quick brown fox jumps over the lazy dog"
    train = spark.createDataFrame(
        [
            (1, "intro words before " + prompt + " and plenty of trailing filler text here"),
            (2, "completely different content with no overlap at all whatsoever today"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, prompt)], "doc_id long, text string")
    rows = decontaminate_ngram(train, ev, "doc_id", "text",
                               n=3, threshold=0.5).collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 1 and rows[0]["eval_id"] == 100
    assert rows[0]["containment"] == 1.0


def test_hot_bucket_identical_mass_bounded_candidates(spark):
    """The hot-bucket pathology: 1 000 identical docs (mass-duplicated
    boilerplate) + a near-dup pair + distinct filler. The exact-dup pre-pass
    must (a) return the SAME verified pair set the semantics demand — every
    intra-group pair at jaccard 1.0 plus the near-dup pair — while (b) the
    banded candidate stage sees one representative per distinct set, so its
    row count is bounded by C(n_distinct, 2), not C(1000, 2)·bands."""
    from vector_store_spark.operators.dedup import (
        identical_set_members,
        minhash_band_candidates,
        shingle_sets,
    )

    boiler = "subscribe to our newsletter for updates and offers every week"
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
             "oscar", "papa", "quebec", "romeo", "sierra", "tango"]
    near_a = " ".join(words) + " end today"     # jaccard 10/11 with near_b —
    near_b = " ".join(words) + " end tonight"   # candidate w.p. ≈1 at r=3,b=4
    filler = [f"unique document number {i} about topic {i * 17} and subject {i * 31}"
              for i in range(20)]
    rows = [(i, boiler) for i in range(1000)]
    rows += [(2000, near_a), (2001, near_b)]
    rows += [(2100 + i, t) for i, t in enumerate(filler)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=2, num_hashes=12,
                              bands=4, threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    intra = {(a, b) for a in range(1000) for b in range(a + 1, 1000)}
    assert set(got) >= intra
    assert all(got[p] == 1.0 for p in intra)
    assert (2000, 2001) in got and abs(got[(2000, 2001)] - 10 / 11) < 1e-12
    # nothing else: fillers are pairwise distinct and dissimilar
    extra = set(got) - intra - {(2000, 2001)}
    assert not extra, extra

    # candidate-stage row count is representative-bounded
    sets = shingle_sets(docs, "doc_id", "text", 2)
    members = identical_set_members(sets)
    assert members.count() == 1000  # the boilerplate group; nothing else
    drop_ids = members.where(F.col("id") != F.col("rep")).select("id")
    n_reps = docs.count() - drop_ids.count()
    assert n_reps == 23  # 1 boilerplate rep + 2 near-dups + 20 fillers
    n_cands = minhash_band_candidates(sets, 12, 4, 4096, drop_ids=drop_ids).count()
    assert n_cands <= n_reps * (n_reps - 1) // 2


def test_hot_bucket_salting_keeps_precision(spark):
    """Force the salt to engage (tiny max_bucket_width) on a corpus of many
    DISTINCT near-dup docs: every returned pair must still verify at the
    exact threshold (precision 1 by construction), and pairs found must be a
    subset of the exhaustive (uncapped) run."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" tail{i % 7}") for i in range(120)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=12, bands=4,
        threshold=0.5, max_bucket_width=None).collect()}
    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=12, bands=4,
        threshold=0.5, max_bucket_width=10).collect()
    assert {(r.id_a, r.id_b) for r in capped} <= uncapped
    assert all(r.jaccard >= 0.5 for r in capped)
    # the pre-pass already routed identical docs (same i%7 tail) out, so the
    # capped run still finds every identical-content pair
    same_tail = {(a, b) for a in range(120) for b in range(a + 1, 120)
                 if a % 7 == b % 7}
    assert same_tail <= {(r.id_a, r.id_b) for r in capped}


def test_simhash_identical_mass_routed_out(spark):
    """SimHash twin of the hot-bucket guard: identical fingerprints collapse
    to a representative; all intra pairs return at hamming 0."""
    rows = [(i, "repeated boilerplate text appears many many times") for i in range(200)]
    rows += [(500, "completely different content about other things entirely")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=2, bands=3,
                          ngram=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    intra = {(a, b) for a in range(200) for b in range(a + 1, 200)}
    assert set(got) >= intra
    assert all(got[p] == 0 for p in intra)


def test_connected_components_mega_component_capped(spark):
    """A degenerate mega-component (one big clique chain) must not build an
    unbounded member array: member_ids is capped, group_size is exact, and
    the row form keeps every member."""
    from vector_store_spark.operators.dedup import (
        dedup_component_members,
        dedup_connected_components,
    )

    n = 5000
    # star around id 0 — the shallow shape dedup components actually take
    # (label propagation is O(diameter); a 5000-deep chain is out of model)
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, n)], ["id_a", "id_b"]
    )
    groups = dedup_connected_components(pairs, max_members=64).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.group_id == 0 and g.group_size == n
    assert len(g.member_ids) == 64 and g.member_ids == list(range(64))
    assert g.truncated is True  # capped rows are explicitly marked
    # an under-cap group is complete and says so
    small = dedup_connected_components(
        spark.createDataFrame([(10, 11)], ["id_a", "id_b"]), max_members=64
    ).collect()[0]
    assert small.truncated is False and small.member_ids == [10, 11]
    members = dedup_component_members(pairs)
    assert members.count() == n
    assert members.agg(F.min("group_id"), F.max("group_id")).collect()[0] == (0, 0)


def test_embedding_lsh_multibit_probing_widens_recall(spark, sf_dir):
    """probes=2 must probe Hamming distance ≤ 2 (superset of probes=1
    candidates), and every extra pair still verifies at the exact
    threshold. probes capped at r behaves like full band enumeration."""
    from vector_store_spark.operators.dedup import embedding_neardup_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sets = {}
    for p in (0, 1, 2):
        rows = embedding_neardup_pairs_lsh(
            emb, "vec_id", "embedding", threshold=0.45,
            num_bits=16, bands=4, dims=64, probes=p,
        ).collect()
        sets[p] = {(r.id_a, r.id_b) for r in rows}
        assert all(r.cosine >= 0.45 for r in rows)
    assert sets[0] <= sets[1] <= sets[2]
    with pytest.raises(ValueError):
        embedding_neardup_pairs_lsh(
            emb, "vec_id", "embedding", dims=64, probes=-1)


def test_auto_lsh_params_derivation():
    """VERDICT r15 #2 — corpus-size-derived banding. Pins: (1) the
    integer-exact band-width rule (smallest r with occ·2^r ≥ n — the same
    arithmetic the oracle SQL runs on COUNT(*)), (2) the probe radius as
    the smallest h whose analytic recall clears 0.99 at tau, (3) the
    resulting recall really clearing 0.99 across the derivation range, and
    (4) candidate work per band staying ≤ occupancy·N (linear in N) instead
    of the N²/2^r of a pinned config."""
    from vector_store_spark.operators.dedup import (
        LSH_POOL_STRIDE,
        auto_lsh_params,
        auto_lsh_planes,
        lsh_recall_at,
        probes_for_recall,
    )

    # the pinned derivation table (bands=8, tau=0.45, occ=128)
    assert auto_lsh_params(200) == (16, 1)       # r=2  (sf0.01 shape)
    assert auto_lsh_params(2_000) == (32, 1)     # r=4  (sf0.1 shape)
    assert auto_lsh_params(8_000) == (48, 2)     # r=6  (sf1 shape)
    assert auto_lsh_params(24_000) == (64, 3)    # r=8  (sf3 shape)
    assert auto_lsh_params(80_000) == (80, 3)    # r=10 (sf10 shape)
    assert auto_lsh_params(10**6) == (96, 4)     # r capped at the pool stride
    for n in (200, 2_000, 8_000, 24_000, 80_000, 10**6):
        num_bits, h = auto_lsh_params(n)
        r = num_bits // 8
        # integer-exact band-width rule, occupancy bound, recall bound
        assert 128 << r >= min(n, 128 << LSH_POOL_STRIDE)
        if r > 2 and r < LSH_POOL_STRIDE:
            assert 128 << (r - 1) < n  # smallest such r
        assert h == probes_for_recall(r, 8, 0.45)
        assert lsh_recall_at(r, 8, 0.45, h) >= 0.99
    # pooled planes: a band's bit-j plane is INDEPENDENT of r (prefix
    # stability — r+1 refines buckets instead of reshuffling planes)
    p64 = auto_lsh_planes(64, 8, 64)   # r=8
    p48 = auto_lsh_planes(64, 8, 48)   # r=6
    for b in range(8):
        for j in range(6):
            assert p48[b * 6 + j] == p64[b * 8 + j]


def test_embedding_lsh_auto_scaled_recall(spark, sf_dir):
    """num_bits=None end-to-end: params derived from the corpus count,
    pooled planes, auto probe radius — empirical recall vs the exhaustive
    GEMM pairs must clear the 0.99 the derivation promises, at precision 1
    (exact verify)."""
    from vector_store_spark.operators.dedup import embedding_neardup_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in
             embedding_neardup_pairs(emb, "vec_id", "embedding",
                                     threshold=0.45).collect()}
    auto = {(r.id_a, r.id_b) for r in
            embedding_neardup_pairs_lsh(emb, "vec_id", "embedding",
                                        threshold=0.45, num_bits=None,
                                        probes=None).collect()}
    assert auto <= exact  # precision 1
    assert exact, "test corpus must contain near-dup pairs"
    assert len(auto) / len(exact) >= 0.99


def test_split_leakage_query_flags_cross_split_neardups(spark):
    """split_leakage_cosine semantics on a planted corpus: an eval vector
    near-identical to a train vector is flagged with its argmax train
    neighbor; same-split near-dups are NOT flagged."""
    from vector_store_spark.operators.dedup import embedding_neardup_pairs
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # ids % 4 == 0 are "eval". 4 ~ 1 (cross-split, cosine ~1); 8 ~ 12
    # (BOTH eval -> must not flag); 2 ~ 3 (both train -> must not flag).
    base = [1.0, 0.5, -0.25, 0.125]
    far = [-1.0, 0.5, 0.25, -0.125]
    mid = [0.0, 1.0, 0.5, 0.25]
    rows = [
        (1, base), (4, [x * 1.001 for x in base]),
        (8, mid), (12, [x * 1.001 for x in mid]),
        (2, far), (3, [x * 1.001 for x in far]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    a_eval = F.col("id_a") % 4 == 0
    b_eval = F.col("id_b") % 4 == 0
    cross = pairs.where(a_eval != b_eval).select(
        F.when(a_eval, F.col("id_a")).otherwise(F.col("id_b")).alias("eval_id"),
        F.when(a_eval, F.col("id_b")).otherwise(F.col("id_a")).alias("train_id"),
        F.round("cosine", 6).alias("cosine"),
    )
    w = Window.partitionBy("eval_id").orderBy(
        F.col("cosine").desc(), F.col("train_id").asc())
    got = {(r["eval_id"], r["train_id"]) for r in
           cross.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).collect()}
    assert (4, 1) in got
    assert all(e % 4 == 0 and t % 4 != 0 for e, t in got)
    assert not any(e in (8, 12) and t in (8, 12) for e, t in got)


# ---------------------------------------------------------------------------
# duplicated_ngram_spans (Lee et al. exact-substring dedup, n-gram marking)
# ---------------------------------------------------------------------------


def _spans(spark, rows, n=3):
    from vector_store_spark.operators.dedup import duplicated_ngram_spans

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = duplicated_ngram_spans(df, "doc_id", "text", n=n).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in got)


def test_spans_marks_shared_run_in_both_docs(spark):
    # docs 1 and 2 share the 5-token run "a b c d e"; with n=3 the duplicated
    # 3-gram start positions are 1..3, merging into ONE span of 5 tokens
    rows = [
        (1, "a b c d e x1 y1 z1"),
        (2, "a b c d e x2 y2 z2"),
        (3, "p q r s t u v w"),
    ]
    assert _spans(spark, rows) == [(1, 1, 5, 5), (2, 1, 5, 5)]


def test_spans_merges_overlap_but_breaks_on_gap(spark):
    # doc 1 has TWO shared runs separated by a unique middle longer than n:
    # positions re-mark as two distinct islands, not one merged span
    rows = [
        (1, "a b c m1 m2 m3 m4 d e f"),
        (2, "a b c n1 n2 n3 n4 d e f"),
    ]
    got = _spans(spark, rows)
    assert got == [
        (1, 1, 3, 3), (1, 8, 10, 3),
        (2, 1, 3, 3), (2, 8, 10, 3),
    ]


def test_spans_adjacent_islands_merge(spark):
    # duplicated 3-gram starts at pos 1 and pos 4 (gap == n): token ranges
    # [1,3] and [4,6] are adjacent and must merge into one 6-token span
    rows = [
        (1, "a b c d e f u1 u2 u3"),
        (2, "a b c w1 w2 w3 w4 w5"),
        (3, "z1 z2 z3 d e f z4 z5"),
    ]
    got = _spans(spark, rows)
    assert (1, 1, 6, 6) in got  # merged in doc 1
    assert (2, 1, 3, 3) in got and (3, 4, 6, 3) in got


def test_spans_within_doc_repeat_is_not_duplicated(spark):
    # the same 3-gram twice in ONE doc does not cross the min_docs=2 bar
    rows = [
        (1, "a b c q1 q2 a b c"),
        (2, "r1 r2 r3 r4 r5 r6 r7"),
    ]
    assert _spans(spark, rows) == []


# --- SemDeDup (cluster-bounded semantic dedup) ---------------------------

def _semdedup_assigned(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_store_spark.operators.clustering import kmeans_assign
    from vector_store_spark.registry import load

    emb = load(spark, sf_dir, "embeddings")
    cents = sorted(
        emb.where(F.col("vec_id") < 4).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    return kmeans_assign(
        emb, "vec_id", "embedding", [r.embedding for r in cents],
        keep_cols=("embedding",),
    )


def test_semantic_dup_pairs_grid_is_lossless(spark, sf_dir):
    """The per-cluster grid sub-blocking (skew guard) must return the
    IDENTICAL pair set — same pairs, same cosines — as the unsplit
    one-task-per-cluster shape, including when max_block forces many
    chunks per cluster."""
    from vector_store_spark.operators.dedup import semantic_dup_pairs

    assigned = _semdedup_assigned(spark, sf_dir).cache()
    try:
        base = {
            (r["id_a"], r["id_b"]): (r["cluster"], round(r["cosine"], 9))
            for r in semantic_dup_pairs(
                assigned, "vec_id", "embedding", threshold=0.3,
                max_block=10**9,
            ).collect()
        }
        grid = {
            (r["id_a"], r["id_b"]): (r["cluster"], round(r["cosine"], 9))
            for r in semantic_dup_pairs(
                assigned, "vec_id", "embedding", threshold=0.3, max_block=7,
            ).collect()
        }
    finally:
        assigned.unpersist()
    assert base and grid == base
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_block"):
        semantic_dup_pairs(assigned, "vec_id", "embedding", 0.3, max_block=0)


def test_semantic_dup_pairs_orientation_and_threshold(spark, sf_dir):
    from vector_store_spark.operators.dedup import semantic_dup_pairs

    assigned = _semdedup_assigned(spark, sf_dir)
    rows = semantic_dup_pairs(
        assigned, "vec_id", "embedding", threshold=0.3, max_block=64,
    ).collect()
    assert rows, "threshold 0.3 should yield pairs on the test corpus"
    cluster_of = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= 0.3
        # pairs only ever form WITHIN a cluster
        assert cluster_of[r["id_a"]] == r["cluster"] == cluster_of[r["id_b"]]


def test_components_deep_path_converges_via_pointer_doubling(spark):
    """r14 sf3 regression: a component whose DIAMETER exceeds max_iter used
    to return silently-unconverged labels (rep 109 where the true min was
    9). With the label-of-label contraction a 300-hop path needs ~log2
    rounds, far under the default bound."""
    from vector_store_spark.operators.dedup import dedup_component_members

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a int, id_b int"
    )
    labels = dedup_component_members(pairs).collect()
    assert len(labels) == 301
    assert {r.group_id for r in labels} == {0}  # ONE component, min id 0


def test_components_fused_lookup_matches_union_find(spark):
    """r17 loop rewrite: each round is ONE lookup join (neighbor labels and
    label-of-label united into a single key frame) with sum-monotonicity
    convergence. Pin the labels against a driver union-find on a seeded
    random graph — every (node → component-min) assignment must match."""
    import random

    from vector_store_spark.operators.dedup import dedup_component_members

    rng = random.Random(1729)
    n = 400
    edges = sorted({
        tuple(sorted(rng.sample(range(n), 2))) for _ in range(300)
    })
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for x in (a, b):
            expected[x] = find(x)

    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r.member_id: r.group_id
           for r in dedup_component_members(pairs).collect()}
    assert got == expected


def test_components_raise_instead_of_wrong_labels(spark):
    """Non-convergence at the bound must be an ERROR, never a result."""
    import pytest

    from vector_store_spark.operators.dedup import dedup_component_members

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a int, id_b int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_component_members(pairs, max_iter=1)


def test_embedding_neardup_lsh_cell_verify_matches_pairwise(spark, sf_dir):
    """r17 cell-local verify: pairs are now verified inside each
    (band, bucket) cell with a per-pair einsum over the cell's vectors
    (one cogroup, no global DISTINCT + vector re-join). The emitted
    (id_a, id_b) set AND the cosine doubles must equal the exhaustive
    verify of the same candidate set — cosine is computed by the same
    per-row einsum, so values are bit-identical, and the max() dedupe
    across cells must collapse Hamming-probe duplicates to ONE row."""
    import numpy as np

    from vector_store_spark.operators.dedup import embedding_neardup_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = embedding_neardup_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.45, probes=1).collect()
    # one row per pair (the cross-cell dedupe)
    keys = [(r.id_a, r.id_b) for r in rows]
    assert len(keys) == len(set(keys))
    # cosines equal the direct einsum over the raw vectors, bit for bit
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}
    for r in rows:
        a, b = vecs[r.id_a], vecs[r.id_b]
        num = np.einsum("ij,ij->i", a[None, :], b[None, :])[0]
        den = np.linalg.norm(a[None, :], axis=1)[0] * np.linalg.norm(b[None, :], axis=1)[0]
        assert r.cosine == num / (den if den else 1.0)
        assert r.cosine >= 0.45


def test_minhash_signature_arrow_twin_exact(docs, spark):
    """r17: minhash_signature runs as an Arrow int64-matrix UDF. Integer
    modular arithmetic ⇒ the signature arrays must equal the interpreted
    expression path ELEMENT-FOR-ELEMENT (no ulp story here — any diff is
    a bug), including the all-null signature of an empty shingle set."""
    from vector_store_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_expr,
        shingle_sets,
    )

    sets = shingle_sets(docs, "doc_id", "text", 3)
    # include an empty-set row (filtered out by shingle_sets) via raw select
    raw = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") == 1, F.array().cast("array<long>"))
        .otherwise(F.array(F.col("doc_id") * 17 % 1000, F.col("doc_id") + 3))
        .alias("hs"),
    )
    for frame in (sets, raw):
        got = {r.id: r.sig for r in frame.select(
            "id", minhash_signature(F.col("hs"), 12).alias("sig")).collect()}
        want = {r.id: r.sig for r in frame.select(
            "id", minhash_signature_expr(F.col("hs"), 12).alias("sig")).collect()}
        assert got == want


def test_minhash_signature_size_dispatch(spark, sf_dir):
    """r18: the banded paths pick between the exact twins by source input
    bytes (tiny corpus -> expression form, big/unknown -> Arrow form). The
    twins are element-for-element equal (test above), so the dispatch can
    only change WHICH engine computes the integers, never the integers."""
    from vector_store_spark.operators.dedup import (
        _SIG_ARROW_MIN_INPUT_BYTES,
        minhash_signature_sized,
    )

    small = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"))
    col_small = minhash_signature_sized(small, F.col("hs"), 12)
    # the expression twin is an array of array_min(transform(...)) calls
    assert "array_min" in str(col_small)

    mem = spark.createDataFrame([(1,)], ["id"])  # no file scan -> unknown size
    col_unknown = minhash_signature_sized(mem, F.col("hs"), 12)
    assert "array_min" not in str(col_unknown)  # Arrow form (scale posture)

    import vector_store_spark.operators.dedup as dd
    orig = dd._SIG_ARROW_MIN_INPUT_BYTES
    try:
        dd._SIG_ARROW_MIN_INPUT_BYTES = 0  # force "big corpus"
        col_big = minhash_signature_sized(small, F.col("hs"), 12)
        assert "array_min" not in str(col_big)
    finally:
        dd._SIG_ARROW_MIN_INPUT_BYTES = orig
    assert orig == _SIG_ARROW_MIN_INPUT_BYTES
