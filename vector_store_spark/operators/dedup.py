"""Deduplication operators for large-scale training-data pipelines.

Five strategies, each a DataFrame program designed for 100 TB shapes:

- ``exact_dedup``      — hash-groupBy on (normalized) content. One shuffle on
  the content hash; duplicate groups never leave the reducers.
- ``ngram_jaccard_pairs`` — exact set-similarity via an inverted index on
  shingles: only pairs sharing ≥1 shingle are generated (no cross join), then
  Jaccard from exact set sizes.
- ``minhash_lsh_pairs``  — the scale path: per-doc MinHash signature → banded
  bucket keys → candidate pairs from bucket self-join → exact-Jaccard verify.
  Shuffles are on (band, bucket-hash) keys; signature width and banding tune
  the recall/cost curve.
- ``simhash_pairs``     — 30-bit SimHash + banded blocking (Hamming ≤ k).
- ``embedding_neardup_pairs`` — cosine-similar embedding pairs; candidate
  generation via LSH-style sign buckets is left to ``similarity`` operators,
  this one does the exact verify for moderate candidate sets.

All hashing uses the portable polynomial family from functions/hashing (exact
integer math, replicated in oracle SQL). Normalization/tokenization reuses the
FTS analyzer chain so "duplicate" means the same thing across the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_store_spark.functions.distance import dot_product, vector_norm
from vector_store_spark.functions.hashing import (
    P31,
    hamming64_expr,
    minhash_coeffs,
    minhash_expr,
    poly_hash,
    simhash_expr,
)
from vector_store_spark.functions.text import tokenize, word_ngrams


def normalized_text(text: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse runs of non-alphanumerics to a
    single space, trim."""
    col = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def exact_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups after normalization: one row per duplicated
    content with the keeper (min id), group size, and member ids."""
    norm = docs.select(F.col(id_col), normalized_text(text_col).alias("norm"))
    return (
        norm.groupBy("norm")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("group_size"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("group_size") > 1)
        .drop("norm")
    )


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct word-n-gram hashes (the MinHash/Jaccard item set)."""
    grams = word_ngrams(tokenize(text), n)
    return F.array_distinct(F.transform(grams, lambda g: poly_hash(g)))


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold, generated via inverted-index join:
    explode shingles → self-join on shingle (id_a < id_b) → count shared →
    |A∩B| / (|A| + |B| − |A∩B|). No cross join; candidate count is bounded by
    shingle co-occurrence."""
    sets = docs.select(F.col(id_col).alias("id"), shingle_hashes(text_col, n).alias("hs"))
    sets = sets.where(F.size("hs") > 0).withColumn("sz", F.size("hs")).cache()
    inv = sets.select("id", "sz", F.explode("hs").alias("h"))
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(hash_set: Column, num_hashes: int) -> Column:
    coeffs = minhash_coeffs(num_hashes)
    return F.array(*[minhash_expr(hash_set, a, b) for a, b in coeffs])


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding + exact verify. rows-per-band = num_hashes/bands
    sets the S-curve: P(candidate) = 1 − (1 − s^r)^b for true Jaccard s.

    Plan shape: signatures (narrow map) → explode bands (b rows/doc) → groupBy
    bucket (shuffle on band keys) → pairs within buckets → distinct →
    broadcast-join signatures back? No: exact verify re-joins the (small
    relative to corpus) candidate set against the shingle sets, keeping the
    big table traversals to two scans."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    sets = docs.select(F.col(id_col).alias("id"), shingle_hashes(text_col, n).alias("hs"))
    sets = sets.where(F.size("hs") > 0).cache()
    sig = sets.select("id", "hs", minhash_signature(F.col("hs"), num_hashes).alias("sig"))

    band_rows = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws("_", *[F.element_at("sig", bi * r + j + 1) for j in range(r)]).alias("bucket"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    cands = (
        band_rows.alias("a")
        .join(
            band_rows.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verify on the candidate set
    verified = (
        cands.join(sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .withColumn("shared", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.size("hs_a") + F.size("hs_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: 30-bit fingerprint over token hashes (duplicate
    tokens vote with their multiplicity), banded blocking (a pair within
    Hamming ≤ max_hamming shares at least one of ``bands`` equal 10-bit chunks
    when max_hamming < bands), exact Hamming verify."""
    bits_per_band = 30 // bands
    th = F.transform(tokenize(text_col), lambda t: poly_hash(t))
    fp = docs.select(F.col(id_col).alias("id"), simhash_expr(th).alias("fp"))
    fp = fp.cache()
    chunks = fp.select(
        "id", "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    (F.shiftright("fp", bi * bits_per_band) % F.lit(1 << bits_per_band)).alias("chunk"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "fp", "bb.band", "bb.chunk")
    cands = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = hamming64_expr(F.col("fp_a"), F.col("fp_b"))
    return (
        cands.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    items: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact cosine-similarity pairs ≥ threshold (i < j). This is the verify
    stage; at 100 TB generate candidates first (sign-LSH buckets or the IVF
    routing in operators/similarity) and feed them here instead of the full
    self-join."""
    left = items.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = items.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    cos = dot_product(F.col("va"), F.col("vb")) / (
        vector_norm(F.col("va")) * vector_norm(F.col("vb"))
    )
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
