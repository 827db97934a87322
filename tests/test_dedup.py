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
