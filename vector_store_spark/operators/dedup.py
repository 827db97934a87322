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

# Performance note (measured on local[32], sf0.1): a Filter whose predicate
# references a projected heavy higher-order-function expression gets pushed
# below the Project, and the whole nested-lambda tree is re-evaluated per row
# in interpreted mode — a ~170× cliff (0.17 s → 29 s for shingle sets). Every
# operator here therefore materializes the expensive projection (cache())
# BEFORE any filter/join touches it, so predicates run against stored columns.

from vector_store_spark.functions.hashing import (
    P31,
    hamming64_expr,
    minhash_coeffs,
    minhash_expr,
    poly_hash,
    shingle_hashes_udf,
    simhash_udf,
)
from vector_store_spark.functions.text import split_ngram_hashes, tokenize, word_ngrams


def normalized_text(text: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse runs of non-alphanumerics to a
    single space, trim."""
    col = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def content_fingerprint(text: Column | str) -> Column:
    """128-bit fingerprint of the normalized content (JVM-side MD5). The
    dedup grouping key: shuffle bytes are 32 hex chars per row regardless of
    document length; at 128 bits an accidental collision over even 10^12
    documents is ~10^-14 — the standard content-addressing tradeoff."""
    return F.md5(normalized_text(text).cast("binary"))


def exact_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups after normalization: one row per duplicated
    content with the keeper (min id), group size, and member ids.

    Groups by the 128-bit content fingerprint, not the text itself: the
    shuffle carries (fingerprint, id) pairs only, so shuffle volume is
    independent of document length (the full normalized text never leaves
    the map side)."""
    keyed = docs.select(F.col(id_col), content_fingerprint(text_col).alias("fp"))
    return (
        keyed.groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("group_size"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("group_size") > 1)
        .drop("fp")
    )


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct word-n-gram hashes (the MinHash/Jaccard item set)."""
    grams = word_ngrams(tokenize(text), n)
    return F.array_distinct(F.transform(grams, lambda g: poly_hash(g)))


def shingle_sets(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, hs) with hs = distinct shingle hashes, materialized (cached) before
    any downstream filter — see the module perf note. Shared by the Jaccard and
    MinHash operators; identical (n-equal) plans hit the same cache entry.

    Hashing runs as an Arrow-batched pandas UDF (~50× the interpreted-HOF
    Column expression; same integers — see functions/hashing)."""
    sets = docs.select(
        F.col(id_col).alias("id"), shingle_hashes_udf(n)(F.col(text_col)).alias("hs")
    ).cache()
    return sets.where(F.size("hs") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold, generated via inverted-index join:
    explode shingles → self-join on shingle (id_a < id_b) → count shared →
    |A∩B| / (|A| + |B| − |A∩B|). No cross join; candidate count is bounded by
    shingle co-occurrence."""
    sets = shingle_sets(docs, id_col, text_col, n).withColumn("sz", F.size("hs"))
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


def decontaminate_ngram(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: flag training docs whose n-gram overlap
    CONTAINS an eval/benchmark doc at ≥ threshold —
    containment = |shingles(train) ∩ shingles(eval)| / |shingles(eval)|,
    the asymmetric overlap used for test-set leakage: it is relative to the
    EVAL doc, so a short benchmark prompt embedded verbatim in a long
    training doc scores 1.0 where symmetric Jaccard would dilute to ~0.

    Same inverted-index shape as ngram_jaccard_pairs: explode both sides'
    shingles, equi-join on the shingle hash, count shared per (train, eval)
    pair — no cross join; work is bounded by shingle co-occurrence.  The
    eval set is benchmark-sized (thousands of docs), so its exploded side is
    small; the train side streams through the join at corpus scale.

    Returns (id, eval_id, containment) for every flagged (train, eval) pair."""
    tsets = shingle_sets(train, id_col, text_col, n)
    esets = shingle_sets(eval_docs, id_col, text_col, n).withColumn(
        "esz", F.size("hs"))
    tinv = tsets.select("id", F.explode("hs").alias("h"))
    einv = esets.select(F.col("id").alias("eval_id"), "esz",
                        F.explode("hs").alias("h"))
    pairs = (
        tinv.join(einv, "h")
        .groupBy("id", "eval_id", "esz")
        .agg(F.count("*").alias("shared"))
    )
    return (
        pairs.withColumn("containment", F.col("shared") / F.col("esz"))
        .where(F.col("containment") >= threshold)
        .select("id", "eval_id", "containment")
    )


def minhash_signature_expr(hash_set: Column, num_hashes: int) -> Column:
    """Column-expression signature (num_hashes interpreted array_min/transform
    HOFs per row — CodegenFallback). The executable spec the Arrow twin below
    is cross-validated against; oracle SQL mirrors this form."""
    coeffs = minhash_coeffs(num_hashes)
    return F.array(*[minhash_expr(hash_set, a, b) for a, b in coeffs])


#: below this much source input, the interpreted-HOF expression signature
#: beats the Arrow matrix form: the pandas-UDF serialization fixed cost
#: exceeds the per-row saving on tiny corpora (r18 A/B, noop-sink signature
#: stage: 500 docs expr 0.08s vs arrow 0.20s; 5k docs 0.17 vs 0.25;
#: 50k docs expr 1.25 vs arrow 0.86 — crossover between 5k and 50k docs).
#: Both forms produce EXACTLY the same int64s (pinned by
#: test_minhash_signature_arrow_twin_exact), so the dispatch can never
#: change a result — only which engine computes it.
_SIG_ARROW_MIN_INPUT_BYTES = 2 << 20


def minhash_signature_sized(df: DataFrame, hash_set: Column, num_hashes: int) -> Column:
    """Size-gated dispatch between the exact signature twins (guide §4.1:
    prefer built-ins when the Python boundary's fixed cost would dominate).
    ``df`` is the frame the signature column will be selected from; its
    source input bytes (scan file sizes — metadata, no job) pick the form.
    Unknown size (no file scan, e.g. a memory-backed test frame) defaults
    to the Arrow form — the 100 TB posture."""
    import os
    from urllib.parse import urlparse

    total: int | None = 0
    try:
        files = df.inputFiles()
        if not files:  # no file scan (memory/stream relation): size unknown
            total = None
        for uri in files:
            p = urlparse(uri).path or uri
            if not os.path.exists(p):
                total = None
                break
            total += os.path.getsize(p)
    except Exception:
        total = None
    if total is not None and total < _SIG_ARROW_MIN_INPUT_BYTES:
        return minhash_signature_expr(hash_set, num_hashes)
    return minhash_signature(hash_set, num_hashes)


def minhash_signature(hash_set: Column, num_hashes: int) -> Column:
    """Arrow twin of :func:`minhash_signature_expr`: one |hs|×num_hashes
    int64 matrix per row instead of num_hashes interpreted HOF evaluations.
    All arithmetic is int64 modular ((a·x + b) mod P31 with a, x < 2³¹ so
    products stay < 2⁶²) — the integers are EXACTLY the expression path's,
    not merely close (no float anywhere). Null/empty sets yield the same
    all-null signature as array_min over an empty/null transform."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    coeffs = minhash_coeffs(num_hashes)
    a = np.asarray([c[0] for c in coeffs], dtype=np.int64)[None, :]
    b = np.asarray([c[1] for c in coeffs], dtype=np.int64)[None, :]
    nulls = [None] * num_hashes

    def batch(hs_series):
        out = []
        for hs in hs_series:
            if hs is None or len(hs) == 0:
                out.append(nulls)
                continue
            x = np.asarray(hs, dtype=np.int64)[:, None]
            out.append(((a * x + b) % P31).min(axis=0))
        return pd.Series(out)

    udf = F.pandas_udf(batch, ArrayType(LongType())).asNondeterministic()
    return udf(hash_set)


def identical_set_members(sets: DataFrame) -> DataFrame:
    """(id, rep) rows for every doc in a DUPLICATE group — docs whose
    shingle SET is identical (fingerprint of the sorted hash array) to at
    least one other doc's; rep = the group's min id. Docs with a unique set
    do not appear (they are implicitly their own representative), so on a
    dup-free corpus this frame is EMPTY and every downstream join against
    it is a no-op.

    The exact-duplicate pre-pass of the banded dedup paths: mass-duplicated
    boilerplate (the hot-bucket pathology — k identical docs put k rows in
    every band bucket, k²/2 candidates per band) collapses to one
    representative per distinct set BEFORE banding, so duplicate mass costs
    one groupBy + one hash-join instead of a quadratic bucket self-join.
    Identical sets have identical signatures, so collapsing them changes no
    candidate decision — pairs are reconstructed exactly afterwards.

    Shuffle posture: only (id, fp) pairs move (fixed 24 bytes/row — the
    shingle arrays never enter the pre-pass), and the join's build side is
    duplicate-GROUPS-sized, not corpus-sized."""
    # 128-bit effective fingerprint (two independently-seeded xxhash64 legs):
    # a grouped pair here is emitted at jaccard 1.0 WITHOUT exact verify, so
    # the collision budget must match content_fingerprint's 128-bit standard
    # (one 64-bit leg expects ~n²/2⁶⁵ false merges at the 10¹²-doc posture)
    sorted_hs = F.sort_array("hs")
    fps = sets.select(
        "id",
        F.xxhash64(sorted_hs).alias("fp_a"),
        F.xxhash64(F.lit(101), sorted_hs).alias("fp_b"),
    )
    dup_groups = (
        fps.groupBy("fp_a", "fp_b")
        .agg(F.min("id").alias("rep"), F.count("*").alias("_c"))
        .where(F.col("_c") > 1)
        .drop("_c")
    )
    # fact-fact equi-join on the fingerprint; AQE splits a skewed (mega-dup)
    # fingerprint if one appears
    return (
        fps.join(dup_groups.hint("SHUFFLE_HASH"), ["fp_a", "fp_b"])
        .select("id", "rep")
    )


def _intra_group_pairs(members: DataFrame, score: Column, score_name: str) -> DataFrame:
    """All (id_a < id_b) pairs within each identical-content group, scored by
    a constant (jaccard 1.0 / hamming 0). Output-bounded: the join result IS
    the required pair set; groups of size 1 (the overwhelming majority)
    contribute nothing because the non-rep side is empty for them."""
    nonreps = members.where(F.col("id") != F.col("rep"))
    return (
        members.alias("a")
        .join(
            nonreps.alias("b").hint("SHUFFLE_HASH"),
            (F.col("a.rep") == F.col("b.rep")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias(score_name),
        )
    )


def _expand_rep_pairs(rep_pairs: DataFrame, members: DataFrame, score_name: str) -> DataFrame:
    """Expand verified representative pairs to member pairs. Exact: every
    member has the same set/fingerprint as its rep, so the score carries
    over unchanged. ``members`` holds duplicate groups only, so the joins
    are LEFT (an endpoint with no duplicates expands to itself) and their
    build side is duplicate-members-sized; output-bounded."""
    return (
        rep_pairs.join(
            members.select(F.col("rep").alias("id_a"), F.col("id").alias("_ma"))
            .hint("SHUFFLE_HASH"),
            "id_a",
            "left",
        )
        .join(
            members.select(F.col("rep").alias("id_b"), F.col("id").alias("_mb"))
            .hint("SHUFFLE_HASH"),
            "id_b",
            "left",
        )
        .withColumn("_ma", F.coalesce(F.col("_ma"), F.col("id_a")))
        .withColumn("_mb", F.coalesce(F.col("_mb"), F.col("id_b")))
        .select(
            F.least("_ma", "_mb").alias("id_a"),
            F.greatest("_ma", "_mb").alias("id_b"),
            score_name,
        )
    )


def _salted_band_rows(band_rows: DataFrame, max_bucket_width: int | None) -> DataFrame:
    """Split band buckets wider than ``max_bucket_width`` into ceil(w/W)
    hash-derived sub-buckets (the hot-bucket guard). Buckets at or under the
    cap get salt 0, so the common case is untouched. A pair split apart in
    one band's oversized bucket can still collide in every other band, so
    the recall loss is bounded by the band S-curve with one band removed —
    and only for pairs inside pathological buckets. Exact-duplicate mass
    never reaches here (identical_set_members routes it out first)."""
    if not max_bucket_width:
        return band_rows.withColumn("salt", F.lit(0))
    from pyspark.sql import Window

    # one exchange on (band, bucket) — the width count is a whole-partition
    # window over the same key the self-join clusters on, so the join can
    # reuse this partitioning instead of a separate agg + join-back
    w = Window.partitionBy("band", "bucket")
    return (
        band_rows.withColumn("_w", F.count("*").over(w))
        .withColumn(
            "_nsub", F.ceil(F.col("_w") / F.lit(max_bucket_width)).cast("int")
        )
        .withColumn(
            # the salt hash includes the band so sub-bucket assignment is
            # independent across bands: a pair split apart in one oversized
            # bucket still collides in another band with prob 1/n_sub there,
            # instead of being split identically everywhere
            "salt",
            F.when(F.col("_nsub") <= 1, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("band", "id"), F.col("_nsub")).cast("int")
            ),
        )
        .drop("_w", "_nsub")
    )


def _bucket_self_join_candidates(band_rows: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) candidates from the (band, bucket, salt)
    self-join — the shared candidate stage of the MinHash and SimHash paths;
    factored out so tests can count its rows directly."""
    return (
        band_rows.alias("a")
        .join(
            band_rows.alias("b").hint("SHUFFLE_HASH"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_band_candidates(
    sets: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket_width: int | None,
    drop_ids: DataFrame | None = None,
    size_probe_df: DataFrame | None = None,
) -> DataFrame:
    """Banded MinHash candidate generation over (id, hs) rows: signatures →
    explode bands → salted bucket self-join → distinct (id_a, id_b).

    ``drop_ids`` (single ``id`` column) removes rows AFTER the signature
    projection — the exact-dup pre-pass drops non-representative duplicates
    here, on the narrow fixed-width signature frame, so the fat shingle
    arrays never shuffle through the filter.

    ``size_probe_df``: the PRE-CACHE source frame for the signature-form
    dispatch — ``sets`` is cached (shingle_sets), and a cached frame's
    ``inputFiles()`` is empty (InMemoryRelation leaf), which would always
    pick the Arrow form; callers pass the raw docs frame so tiny corpora
    get the expression twin."""
    sig = sets.select(
        "id",
        minhash_signature_sized(
            size_probe_df if size_probe_df is not None else sets,
            F.col("hs"), num_hashes,
        ).alias("sig"),
    )
    if drop_ids is not None:
        sig = sig.join(drop_ids.hint("SHUFFLE_HASH"), "id", "left_anti")
    # cached because the bucket self-join consumes the banded rows twice
    # (sides a and b); caller owns the cache lifetime, as with shingle_sets
    # — unpersist via spark.catalog.clearCache() or let LRU evict it after
    # the returned plan is materialized
    sig = sig.cache()
    band_rows = minhash_band_rows(sig, num_hashes, bands)
    return _bucket_self_join_candidates(_salted_band_rows(band_rows, max_bucket_width))


def minhash_band_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bucket) rows from an (id, sig) frame — one row per band,
    bucket = the band's signature slice joined with '_'. Shared by the batch
    candidate stage above and the streaming near-dup index
    (streaming/neardup.py), so the on-disk bucket encoding can never drift
    between the two."""
    r = num_hashes // bands
    return sig.select(
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


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_width: int | None = 4096,
) -> DataFrame:
    """MinHash + LSH banding + exact verify. rows-per-band = num_hashes/bands
    sets the S-curve: P(candidate) = 1 − (1 − s^r)^b for true Jaccard s.

    Plan shape (hot-bucket hardened):
    1. exact-duplicate pre-pass — identical shingle sets collapse to one
       representative (identical_set_members); their pairs are emitted
       directly with jaccard 1.0, output-bounded, never entering a bucket
       self-join. This removes the k²-per-bucket pathology of
       mass-duplicated boilerplate at the root.
    2. representatives only: signatures (narrow map) → explode bands →
       salted bucket self-join (_salted_band_rows caps residual hot buckets
       at ``max_bucket_width``) → distinct candidates → exact-Jaccard verify
       against the shingle sets (two scans of the big table total).
    3. verified representative pairs expand back to member pairs — exact,
       since members share their rep's set.

    With ``max_bucket_width=None`` the candidate stage is exhaustive (the
    oracle shape); the default cap only engages on buckets wider than 4096
    distinct (non-identical) sets, which the pre-pass makes pathological by
    construction."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    sets = shingle_sets(docs, id_col, text_col, n)
    members = identical_set_members(sets).cache()
    # one narrow driver-side probe on the cached membership frame decides
    # the plan: a duplicate-free corpus (the common clean-data case) skips
    # the intra/drop/expand joins entirely — the hardening then costs this
    # probe and nothing else
    has_dups = bool(members.head(1))
    if not has_dups:
        members.unpersist()
        cands = minhash_band_candidates(sets, num_hashes, bands,
                                        max_bucket_width, size_probe_df=docs)
        return _verify_jaccard_pairs(cands, sets, threshold)
    intra = _intra_group_pairs(members, F.lit(1.0), "jaccard")
    # non-representative duplicates leave the banding path on the NARROW
    # signature frame (drop_ids inside minhash_band_candidates) — the fat
    # shingle arrays are never re-shuffled by the pre-pass
    drop_ids = members.where(F.col("id") != F.col("rep")).select("id")
    cands = minhash_band_candidates(
        sets, num_hashes, bands, max_bucket_width, drop_ids=drop_ids,
        size_probe_df=docs,
    )
    # exact verify on the (representative) candidate set; keying the full
    # sets frame is fine — candidate ids are representatives by construction
    rep_pairs = _verify_jaccard_pairs(cands, sets, threshold)
    # NB ``members`` stays cached: the returned plan consumes it in the
    # intra + expand joins. Caller owns the cache lifetime (same contract
    # as shingle_sets) — unpersist after materializing the result.
    return intra.unionByName(_expand_rep_pairs(rep_pairs, members, "jaccard"))


def _verify_jaccard_pairs(cands: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verify of (id_a, id_b) candidates against the shingle
    sets — the shared final stage of both minhash_lsh_pairs plans."""
    return (
        cands.join(sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .withColumn("shared", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.size("hs_a") + F.size("hs_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 3,
    ngram: int = 1,
    max_bucket_width: int | None = 4096,
) -> DataFrame:
    """SimHash near-dup pairs: 30-bit fingerprint over word-n-gram feature
    hashes (duplicate features vote with their multiplicity), banded blocking
    (a pair within Hamming ≤ max_hamming shares at least one of ``bands``
    equal 10-bit chunks when max_hamming < bands), exact Hamming verify.
    ``ngram=3`` is the Manku-et-al. web-dedup feature choice — on small
    vocabularies unigram features saturate the bit votes and everything
    collides.

    Hot-bucket hardened like minhash_lsh_pairs: docs with an IDENTICAL
    fingerprint (the exact-dup mass that floods every chunk bucket) collapse
    to one representative before banding — their pairs are emitted directly
    with Hamming 0 and reconstructed exactly afterwards (Hamming depends
    only on the fingerprints, which group members share) — and residual
    oversized chunk buckets are salted at ``max_bucket_width``."""
    bits_per_band = 30 // bands
    fp = docs.select(F.col(id_col).alias("id"), simhash_udf(ngram)(F.col(text_col)).alias("fp"))
    fp = fp.cache()
    # cached: both the duplicate-membership join and the banding input (rfp)
    # consume this distinct-fingerprint-sized aggregate
    groups = fp.groupBy("fp").agg(
        F.min("id").alias("rep"), F.count("*").alias("_c")
    ).cache()
    # one narrow driver-side probe on the cached groups frame decides the
    # plan: a collision-free corpus (no two docs share a fingerprint) skips
    # the membership/intra/expand joins entirely
    dup_groups = groups.where(F.col("_c") > 1).drop("_c")
    has_dups = bool(dup_groups.head(1))
    members = None
    if has_dups:
        members = (
            fp.join(dup_groups.hint("SHUFFLE_HASH"), "fp")
            .select("id", "rep")
            .cache()
        )
        intra = _intra_group_pairs(members, F.lit(0), "hamming")
    rfp = groups.select(F.col("rep").alias("id"), "fp")
    chunks = rfp.select(
        "id", "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    (F.shiftright("fp", bi * bits_per_band) % F.lit(1 << bits_per_band)).alias("bucket"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "fp", "bb.band", "bb.bucket")
    salted = _salted_band_rows(chunks, max_bucket_width)
    cands = (
        salted.alias("a")
        .join(
            salted.alias("b").hint("SHUFFLE_HASH"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = hamming64_expr(F.col("fp_a"), F.col("fp_b"))
    rep_pairs = (
        cands.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if members is None:
        return rep_pairs
    # ``fp``/``groups``/``members`` stay cached: the returned plan consumes
    # them (caller owns the cache lifetime, as with shingle_sets)
    return intra.unionByName(_expand_rep_pairs(rep_pairs, members, "hamming"))


def embedding_neardup_pairs(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (id_a < id_b) via **blocked GEMM**:
    rows are hashed into ``num_blocks`` blocks, the B(B+1)/2 unordered block
    pairs are formed with a cogrouped ``applyInPandas``, and each group runs
    one NumPy matrix multiply over Arrow-transferred batches.

    Why not a pair join with per-pair column expressions: N²/2 higher-order-
    function dot products run interpreted (~80 s for 2 k×2 k×64d); one BLAS
    GEMM on the same data is <0.1 s. Scale path: choose num_blocks so a block
    fits executor memory (work is B² groups, shuffle is 2·B·N rows); beyond
    that, LSH/IVF candidate generation replaces all-pairs entirely."""
    e = items.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(num_blocks)).alias("blk"),
    )
    blocks = F.array(*[F.lit(b) for b in range(num_blocks)])
    # left rows carry their block as ga and fan out to every gb ≥ ga;
    # right rows carry their block as gb and fan out to every ga ≤ gb,
    # so each unordered block pair (ga ≤ gb) meets exactly once.
    left = (
        e.withColumn("gb", F.explode(blocks))
        .where(F.col("blk") <= F.col("gb"))
        .select(F.col("blk").alias("ga"), "gb", "id", "v")
    )
    # NB the right branch re-aliases every column: both branches derive from
    # ``e``, and a self-cogroup with shared attribute ids gets its duplicate
    # attributes deduplicated — the UDF then receives only the grouping
    # columns on the right side. Fresh exprIds (Alias) prevent that.
    right = (
        e.withColumn("ga", F.explode(blocks))
        .where(F.col("ga") <= F.col("blk"))
        .select(
            F.col("ga").alias("ga"),
            F.col("blk").alias("gb"),
            F.col("id").alias("id"),
            F.col("v").alias("v"),
        )
    )
    thr = float(threshold)

    def gemm(key, la, rb):
        import numpy as np
        import pandas as pd

        if len(la) == 0 or len(rb) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        a = np.vstack(la["v"].to_numpy())
        b = np.vstack(rb["v"].to_numpy())
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        s = a @ b.T
        ia = la["id"].to_numpy()
        ib = rb["id"].to_numpy()
        if key[0] == key[1]:
            # diagonal block: every unordered pair appears twice — keep the
            # id_a < id_b orientation only.
            keep = (s >= thr) & (ia[:, None] < ib[None, :])
        else:
            # off-diagonal: each unordered pair appears exactly once, with
            # arbitrary id order — keep all, orient below.
            keep = s >= thr
        ai, bi = np.nonzero(keep)
        lo = np.minimum(ia[ai], ib[bi])
        hi = np.maximum(ia[ai], ib[bi])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": s[ai, bi]})

    return (
        left.groupBy("ga", "gb")
        .cogroup(right.groupBy("ga", "gb"))
        .applyInPandas(gemm, "id_a long, id_b long, cosine double")
    )


#: pooled-plane layout for AUTO-scaled banding (and the r cap): band ``b``
#: draws its bits from hyperplane indices [b·STRIDE, b·STRIDE + r), so a
#: corpus-size change (different r) REFINES each band's bucketing instead of
#: reshuffling the plane→band assignment — the bucket of a vector at r+1
#: bits is a sub-bucket of its bucket at r bits.
LSH_POOL_STRIDE = 12


def lsh_recall_at(r: int, bands: int, threshold: float, probes: int) -> float:
    """Analytic pair-recall of banded sign-LSH with Hamming≤probes
    multiprobe at cosine=threshold — the probed band S-curve.

    Per-bit agreement for a pair at angle θ=acos(threshold) is p = 1-θ/π
    (random-hyperplane collision probability, Charikar 2002); a band of r
    bits collides within Hamming h with probability Σ_{i≤h} C(r,i)
    p^(r-i)(1-p)^i, and any of the ``bands`` independent bands colliding
    yields the pair."""
    import math

    p = 1.0 - math.acos(threshold) / math.pi
    band_p = sum(
        math.comb(r, i) * p ** (r - i) * (1.0 - p) ** i
        for i in range(min(probes, r) + 1)
    )
    return 1.0 - (1.0 - band_p) ** bands


def auto_lsh_params(
    n: int,
    bands: int = 8,
    threshold: float = 0.45,
    target_occupancy: int = 128,
    min_recall: float = 0.99,
    r_max: int = LSH_POOL_STRIDE,
) -> tuple[int, int]:
    """Corpus-size-derived (num_bits, probes) for the embedding-LSH dedup —
    the 100 TB default when the caller pins nothing (VERDICT r15 #2: fixed
    num_bits=32/bands=8 gives Σ|bucket|² ≈ N²/128 candidate work, quadratic
    past ~10k vectors).

    - ``r`` (band width) = smallest integer in [2, r_max] with
      target_occupancy · 2^r ≥ n, i.e. expected bucket occupancy ≤ the
      target — candidate work per band stays ≈ N·occupancy, LINEAR in N.
      Integer-exact (no log2 float round-off) so the oracle SQL derives the
      SAME r from COUNT(*).
    - ``probes`` = smallest Hamming radius h with analytic pair-recall
      ≥ min_recall at the threshold (:func:`lsh_recall_at`), capped at
      min(r, 6) — finer buckets lose per-band collision probability;
      multiprobe buys it back at probe-row cost Σ_{i≤h} C(r,i) instead of
      the candidate blowup of coarser banding.
    """
    r = r_max
    for j in range(2, r_max + 1):
        if target_occupancy << j >= n:
            r = j
            break
    return r * bands, probes_for_recall(r, bands, threshold, min_recall)


def probes_for_recall(r: int, bands: int, threshold: float,
                      min_recall: float = 0.99, h_max: int = 6) -> int:
    """Smallest multiprobe Hamming radius holding the analytic pair-recall
    (:func:`lsh_recall_at`) ≥ min_recall at the threshold; capped at
    min(r, h_max). Shared by the operator's auto defaults AND the oracle
    SQL generator (the inlined r→probes lookup), so they cannot drift."""
    h_cap = min(r, h_max)
    for h in range(h_cap + 1):
        if lsh_recall_at(r, bands, threshold, h) >= min_recall:
            return h
    return h_cap


def auto_lsh_planes(dims: int, bands: int, num_bits: int) -> list[list[float]]:
    """The pooled-plane selection for auto-scaled banding: band b, bit j ←
    pool plane b·LSH_POOL_STRIDE + j. The pool formula is closed-form
    (operators/lsh.lsh_hyperplanes_mixed — the DECORRELATED generator; the
    legacy mod-97 lattice loses ~5 recall points at r=8 against the
    analytic S-curve the probe derivation relies on), so oracle SQL
    re-derives the identical planes from (band, bit) indices alone."""
    from vector_store_spark.operators.lsh import lsh_hyperplanes_mixed

    r = num_bits // bands
    if r > LSH_POOL_STRIDE:
        raise ValueError(f"band width {r} exceeds pool stride {LSH_POOL_STRIDE}")
    pool = lsh_hyperplanes_mixed(dims, bands * LSH_POOL_STRIDE)
    return [pool[b * LSH_POOL_STRIDE + j] for b in range(bands) for j in range(r)]


def embedding_neardup_pairs_lsh(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_bits: int | None = 16,
    bands: int = 4,
    dims: int | None = None,
    probes: int | None = 0,
) -> DataFrame:
    """Sign-LSH candidate generation for embedding near-dup at extreme scale:
    bucket on random-hyperplane bands (operators/lsh), self-join per (band,
    bucket), exact-cosine verify — the same candidate-join shape as the text
    MinHash path, replacing the blocked all-pairs GEMM when even B² blocks is
    too much. Recall follows the band S-curve; exact verify keeps precision 1.

    ``probes=p`` turns on Hamming-≤p multiprobe: ONE join side additionally
    emits every ≤p-bit-flip variant of each band bucket, so a pair collides
    when any band's codes are within Hamming distance p — the same trick
    the serving LSH's query-aware multiprobe uses, applied to the
    self-join. Flipping on one side covers the distance symmetrically: if
    codes differ exactly in bit set S (|S| ≤ p), a's flip of S lands in b's
    exact bucket. At a moderate threshold (e.g. cosine 0.45, where per-bit
    agreement is only ~0.65) the plain band S-curve tops out near 0.8
    recall; 1-flip probing lifts it to ~0.999. Probe-side rows grow by
    Σ_{{i≤p}} C(r, i)× (r = band width; 1+r for p=1, +C(r,2) more for p=2)
    — NOT the candidate blowup of halving band width; p is capped at r
    (all-bit flips = full band enumeration).

    Pass ``dims`` (index metadata always knows it) to keep the plan fully
    lazy; None falls back to peeking at one row.

    ``num_bits=None`` AUTO-SCALES the banding with the corpus size (one
    count job): band width from :func:`auto_lsh_params` (constant expected
    bucket occupancy — candidate work linear in N instead of N²/2^r) with
    pooled-plane selection (:func:`auto_lsh_planes`, r changes refine
    buckets instead of reshuffling planes), and ``probes=None`` then takes
    the derived Hamming radius holding pair-recall ≥ 0.99 at the
    threshold."""
    from vector_store_spark.operators.lsh import lsh_hyperplanes, with_lsh_buckets

    if num_bits is None:
        num_bits, auto_h = auto_lsh_params(
            items.count(), bands=bands, threshold=threshold)
        if probes is None:
            probes = auto_h
        if dims is None:
            dims = len(items.select(vec_col).first()[0])
        planes = auto_lsh_planes(dims, bands, num_bits)
    else:
        if probes is None:
            probes = 0
        if dims is None:
            dims = len(items.select(vec_col).first()[0])
        planes = lsh_hyperplanes(dims, num_bits)
    if probes < 0:
        raise ValueError(f"probes must be >= 0, got {probes}")
    e = items.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # corpus-wide bucketing is the job's dominant cost: one Arrow GEMM per
    # batch (with_lsh_buckets) instead of num_bits interpreted higher-order
    # aggregates per row
    bucketed = with_lsh_buckets(e, "v", planes, bands).cache()
    # band/probe rows carry the vector: each vector ships once per cell it
    # lands in (the cell-local verify below never re-joins the corpus)
    band_rows = bucketed.select(
        "id", "v",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"bucket_{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "v", "bb.band", "bb.bucket")
    probe_rows = band_rows
    if probes >= 1:
        # probe side only: exact bucket + every flip of up to `probes` bits
        # (r = band width) — Σ C(r, i) xor masks, enumerated at plan time
        import itertools

        r = num_bits // bands
        masks = [0]
        for nb in range(1, min(probes, r) + 1):
            for combo in itertools.combinations(range(r), nb):
                masks.append(sum(1 << j for j in combo))
        probe_rows = band_rows.select(
            "id", "v", "band",
            F.explode(F.array(
                *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
            )).alias("bucket"),
        )
    # ---- cell-local verify (guide §8: move the payload once) -------------
    # The former shape — candidate join on (band, bucket), global DISTINCT
    # over every colliding pair, then two joins re-attaching the 64-dim
    # vectors and an Arrow cosine pass — shipped each candidate pair's BOTH
    # vectors through the Python boundary (≈1.9 GB at 1.9M distinct pairs
    # from a 2k corpus; grows with N·occupancy). Verifying INSIDE each
    # (band, bucket) cell instead ships every vector once per cell it lands
    # in (probe+build rows ≈ N·bands·(1+masks) rows ≈ 50 MB here), the
    # Hamming-duplicate pairs collapse in a pair-level aggregate of three
    # small columns, and the per-cell pair count is bounded by the
    # constant-occupancy rule (≈ occupancy²·masks, independent of N).
    # Cosines are computed by the SAME per-pair einsum on the same float64
    # rows, so verified values are bit-identical to the former join path.
    import numpy as np
    import pandas as pd

    id_type = items.schema[id_col].dataType.simpleString()
    pair_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def _cell_pairs(key, probe_pdf, build_pdf):
        if len(probe_pdf) == 0 or len(build_pdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        pa_ids = probe_pdf["id"].to_numpy()
        pb_ids = build_pdf["id"].to_numpy()
        amat = np.vstack(probe_pdf["v"].to_numpy()).astype(np.float64)
        bmat = np.vstack(build_pdf["v"].to_numpy()).astype(np.float64)
        out_a, out_b, out_c = [], [], []
        # chunk the probe side so the expanded pair block stays ~tens of MB
        # (200k pairs × 64 dims × 8 B × 2 sides ≈ 200 MB peak per task)
        step = max(1, 200_000 // max(1, len(pb_ids)))
        for lo in range(0, len(pa_ids), step):
            hi = min(lo + step, len(pa_ids))
            ia = np.repeat(np.arange(lo, hi), len(pb_ids))
            ib = np.tile(np.arange(len(pb_ids)), hi - lo)
            keep = pa_ids[ia] < pb_ids[ib]
            ia, ib = ia[keep], ib[keep]
            if len(ia) == 0:
                continue
            a = amat[ia]
            b = bmat[ib]
            num = np.einsum("ij,ij->i", a, b)
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            den[den == 0.0] = 1.0
            cos = num / den
            sel = cos >= threshold
            out_a.append(pa_ids[ia[sel]])
            out_b.append(pb_ids[ib[sel]])
            out_c.append(cos[sel])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "cosine": np.concatenate(out_c),
        })

    cells = (
        probe_rows.groupBy("band", "bucket")
        .cogroup(band_rows.groupBy("band", "bucket"))
        .applyInPandas(_cell_pairs, pair_schema)
    )
    # the same pair can collide in several (band, probed-bucket) cells; its
    # cosine is bit-identical in each (same einsum over the same rows), so
    # max() is exactly the former distinct-then-verify value
    return cells.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))


def embedding_neardup_lsh_cell_audit(
    items: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    num_bits: int | None = 32,
    bands: int = 8,
    dims: int | None = None,
    probes: int | None = 1,
    sample_cells: tuple = ((0, 3), (3, 7), (6, 12)),
) -> DataFrame:
    """SF-robust audit of the sign-LSH near-dup contract — the oracle-sized
    twin of :func:`embedding_neardup_pairs_lsh` for stretch-SF gates where
    the exhaustive bucket self-join DISTINCT is infeasible (~N²/128 rows).

    Two DISTINCT-free probes of the same pipeline, one frame out:

    - **Global candidate mass** (row band=-1): Σ over every (band, probed
      bucket) cell of |probe rows in cell| · |build rows in cell| — an
      aggregate over per-cell COUNTS (bands·2^r cells total, metadata-sized),
      never a pair join. Any change to hyperplanes, banding or the probe
      expansion moves this number.
    - **Exact verification inside K deterministically-sampled cells** (one
      row per (band, bucket) in ``sample_cells``): the full candidate
      self-join restricted to one cell — each id contributes at most one
      probe row per cell (bucket ^ m1 = c = bucket ^ m2 ⇒ m1 = m2), so the
      per-cell pair set is DISTINCT-free by construction — then the exact
      cosine verify. Emitted as integer aggregates (pair/verified counts +
      a micro-quantized cosine sum), order-independent across engines.

    Work is Σ over sampled cells of |probe∩cell|·|build∩cell| ≈
    K·(p·N/2^r)·(N/2^r) — quadratic ONLY inside the K sampled cells, which
    is what makes the audit run at any SF.

    ``num_bits=None`` audits the AUTO-SCALED contract: banding and probe
    radius derived from the corpus size exactly as
    :func:`embedding_neardup_pairs_lsh` derives them (auto_lsh_params +
    pooled planes), so the audit pins the parameters a 100 TB run would
    actually use at this corpus's scale."""
    from vector_store_spark.operators.lsh import lsh_hyperplanes, with_lsh_buckets

    if dims is None:
        dims = len(items.select(vec_col).first()[0])
    if num_bits is None:
        num_bits, auto_h = auto_lsh_params(
            items.count(), bands=bands, threshold=threshold)
        if probes is None:
            probes = auto_h
        planes = auto_lsh_planes(dims, bands, num_bits)
    else:
        if probes is None:
            probes = 1
        planes = lsh_hyperplanes(dims, num_bits)
    e = items.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    bucketed = with_lsh_buckets(e, "v", planes, bands).cache()
    band_rows = bucketed.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"bucket_{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    import itertools

    r = num_bits // bands
    masks = [0]
    for nb in range(1, min(probes, r) + 1):
        for combo in itertools.combinations(range(r), nb):
            masks.append(sum(1 << j for j in combo))
    probe_rows = band_rows.select(
        "id", "band",
        F.explode(F.array(
            *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
        )).alias("bucket"),
    )
    # global mass: join of two cell-COUNT frames (≤ bands·2^r rows each)
    pcnt = probe_rows.groupBy("band", "bucket").agg(F.count("*").alias("p"))
    ncnt = band_rows.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    mass = (
        pcnt.join(ncnt, ["band", "bucket"])
        .agg(F.sum(F.col("p") * F.col("n")).alias("m"))
        .select(
            F.lit(-1).alias("band"), F.lit(-1).alias("bucket"),
            F.col("m").cast("long").alias("n_candidates"),
            F.lit(0).cast("long").alias("n_verified"),
            F.lit(0).cast("long").alias("cos_micro_sum"),
        )
    )
    # sampled cells: exact pipeline restricted to each cell
    cell_pred_probe = None
    cell_pred_build = None
    for b, c in sample_cells:
        pp = (F.col("band") == b) & (F.col("bucket") == c)
        cell_pred_probe = pp if cell_pred_probe is None else (cell_pred_probe | pp)
        cell_pred_build = pp if cell_pred_build is None else (cell_pred_build | pp)
    probe_cell = probe_rows.where(cell_pred_probe)
    build_cell = band_rows.where(cell_pred_build)
    # every join side here is corpus-proportional (cell membership ~ N/2^r,
    # vectors ~ N) — shuffle-hash throughout, never a fact-side broadcast
    cands = (
        probe_cell.alias("a")
        .join(
            build_cell.alias("b").hint("SHUFFLE_HASH"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.band").alias("band"), F.col("a.bucket").alias("bucket"),
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        )
    )
    vecs = bucketed.select("id", "v")
    pairs = (
        cands.join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
                   .hint("SHUFFLE_HASH"), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
              .hint("SHUFFLE_HASH"), "id_b")
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _cos_batch(va, vb):
        a = np.vstack(va.to_numpy()).astype(np.float64)
        b = np.vstack(vb.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        den[den == 0.0] = 1.0
        return pd.Series(num / den)

    cos_udf = F.pandas_udf(_cos_batch, DoubleType())
    cell_stats = (
        pairs.withColumn("cosine", cos_udf(F.col("va"), F.col("vb")))
        .groupBy("band", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum((F.col("cosine") >= threshold).cast("long")).alias("n_verified"),
            F.sum(
                F.when(F.col("cosine") >= threshold,
                       F.round(F.col("cosine") * 1e6).cast("long")).otherwise(0)
            ).alias("cos_micro_sum"),
        )
    )
    return cell_stats.unionByName(mass)


def dedup_connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    max_members: int = 128,
) -> DataFrame:
    """Duplicate GROUPS from near-dup pairs: connected components by min-label
    propagation — the step real dedup pipelines run between pair generation
    and the keep-set ("keep the smallest id of each component").

    Iterative joins over the PAIR GRAPH (candidate pairs, orders of magnitude
    smaller than the corpus), each iteration ``localCheckpoint``-materialized
    to keep lineage flat; converges in O(component diameter) iterations
    (near-dup components are shallow) and stops early when no label moves.
    Deterministic: the fixed point is min-id-per-component regardless of
    join/partition order.

    Returns (group_id = min member id, group_size, member_ids sorted and
    CAPPED at ``max_members`` — the cap bounds the widest row a degenerate
    mega-component (all-boilerplate corpus) can produce; group_size is
    always the true count, and ``truncated`` is true exactly on capped rows
    so a partial member list is never mistaken for a complete one. For the
    uncapped, unbounded-scale row form use ``dedup_component_members``."""
    members = dedup_component_members(pairs, id_a, id_b, max_iter)
    from pyspark.sql import Window

    w = Window.partitionBy("group_id").orderBy("member_id")
    ranked = members.withColumn("_rn", F.row_number().over(w))
    out = ranked.groupBy("group_id").agg(
        F.count("*").alias("group_size"),
        F.sort_array(
            F.collect_list(F.when(F.col("_rn") <= max_members, F.col("member_id")))
        ).alias("member_ids"),
    )
    return out.withColumn(
        "truncated", F.col("group_size") > F.size("member_ids")
    )


def dedup_component_members(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components in ROW form: one (group_id, member_id) row per
    member — the shape that survives any component size (no per-group array
    is ever materialized, so a degenerate mega-component costs rows, not one
    giant cell). Same min-label propagation as dedup_connected_components.

    Convergence: each round folds the neighbor-min hop AND the
    pointer-doubling contraction into ONE lookup join — new label(id) =
    min over {label(dst) for dst in N(id)} ∪ {label(label(id))}. Both
    legs are lookups of label[key] (key = a neighbor, or the node's own
    current label), so they union into a single key frame joined once
    against the label table, then a groupBy-min: 3 exchanges per round
    instead of the former two joins + label-self-join (~7 exchanges, 3
    separate query executions). label(label(id)) ≤ label(id) keeps the
    old pointer-doubling reach (≈2× per round, O(log diameter) rounds);
    the fixpoint — min reachable id — is unchanged. The r14 sf3 gate
    caught the plain-hop variant SILENTLY returning unconverged labels
    when a component's diameter outgrew ``max_iter`` (rep 109 where the
    true min was 9) — any fixed hop bound has a bigger-corpus
    counterexample, so non-convergence at the bound still RAISES instead
    of returning wrong groups.

    Quiescence is detected from label-sum monotonicity: every update is a
    min with values ≤ the current label, so labels are elementwise
    non-increasing and the exact decimal sum(label) strictly decreases iff
    any label moved — the per-round convergence probe is the same
    full-partition aggregate that materializes the round's lazy
    checkpoint, with no _moved flag or labels-vs-labels comparison."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.distinct().localCheckpoint()
    # no edges ⇒ no members: skip the label bootstrap and the propagation
    # loop outright (a threshold that verifies zero pairs otherwise still
    # paid ~5 empty jobs here); the probe scans the checkpointed partitions
    if not edges.head(1):
        return edges.select(
            F.col("src").alias("group_id"), F.col("dst").alias("member_id")
        )
    _DEC = "decimal(38,0)"  # exact sums: no int64 overflow at any corpus size
    labels = None
    prev_sum = None
    moved = True
    for _ in range(max_iter):
        if labels is None:
            # round 1, labels are the identity: label[key] = key, so the
            # lookup join vanishes — min(id, min neighbor id) is one
            # groupBy over (edges ∪ self-rows), a single exchange
            stepped = (
                edges.select(F.col("src").alias("id"), F.col("dst").alias("key"))
                .union(edges.select(F.col("src").alias("id"),
                                    F.col("src").alias("key")))
                .groupBy("id")
                .agg(F.min("key").alias("label"))
            )
        else:
            keys = edges.select(
                F.col("src").alias("id"), F.col("dst").alias("key")
            ).union(labels.select("id", F.col("label").alias("key")))
            # every key is a node id (labels are always member ids), so the
            # lookup is an inner join; label table is node-sized and
            # fact-classed — SHUFFLE_HASH build side, never broadcast
            lk = labels.select(
                F.col("id").alias("key"), F.col("label").alias("_klabel")
            )
            stepped = (
                keys.join(lk.hint("SHUFFLE_HASH"), "key")
                .groupBy("id")
                .agg(F.min("_klabel").alias("label"))
            )
        # LAZY: the convergence aggregate below scans every partition, so it
        # doubles as the checkpoint-materializing job; lineage still
        # truncates at job end, before the next round's plan builds on it
        stepped = stepped.localCheckpoint(eager=False)
        agg = stepped.agg(
            F.sum(F.col("label").cast(_DEC)).alias("s"),
            F.sum(F.col("id").cast(_DEC)).alias("sid"),
        ).collect()[0]
        if prev_sum is None:
            prev_sum = agg["sid"]  # identity-label sum (the node-id sum)
        labels = stepped
        moved = agg["s"] != prev_sum
        prev_sum = agg["s"]
        if not moved:
            break
    if moved:
        raise RuntimeError(
            f"connected components did not converge within max_iter={max_iter} "
            "rounds (label sum still decreasing) — with pointer doubling "
            "this needs ~log2(component diameter) rounds; raise max_iter"
        )
    return labels.select(
        F.col("label").alias("group_id"), F.col("id").alias("member_id")
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-substring spans (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): mark every word position whose length-``n`` n-gram
    occurs in >= ``min_docs`` distinct documents, then merge overlapping or
    adjacent marked positions into maximal per-document spans
    (gaps-and-islands over token positions).

    Scale shape: the n-gram STRING never shuffles — positions carry a 64-bit
    ``xxhash64`` key, so the duplicate-marking groupBy and the semi-join back
    onto the position frame exchange fixed-width rows. Both join sides are
    fact-sized (grow with the corpus), so the semi-join is SHUFFLE_HASH-hinted
    — never broadcast. The islands merge is one per-document window (document
    length is bounded, so per-partition window state is bounded), and the
    final span groupBy reuses the window's hash partitioning on ``id_col``
    (ClusteredDistribution on a superset of keys — no second exchange).

    The reference-scale formulation (exact suffix arrays) is a single-node
    construction; fixed-n n-gram marking is the standard distributed
    re-expression, missing only duplicated runs shorter than ``n`` tokens.

    Returns (id_col, span_start, span_end, span_tokens); token positions are
    1-based, span bounds inclusive.
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks")).where(
        F.size("toks") >= n
    )
    # sequence(1, m) requires m >= 1 (it DESCENDS for m < 1) — guaranteed by
    # the size filter above.
    grams = toks.select(
        F.col(id_col),
        F.posexplode(split_ngram_hashes("toks", n)).alias("pos0", "ngram_h"),
    ).select(F.col(id_col), (F.col("pos0") + 1).cast("long").alias("pos"), "ngram_h")
    dup_keys = (
        grams.groupBy("ngram_h")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("ngram_h")
    )
    marked = grams.join(dup_keys.hint("SHUFFLE_HASH"), "ngram_h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = marked.withColumn(
        "_brk", F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0)
    ).withColumn("_island", F.sum("_brk").over(run))
    return (
        islands.groupBy(F.col(id_col), F.col("_island"))
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).cast("long").alias("span_end"),
        )
        .select(
            F.col(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def semantic_dup_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    cluster_col: str = "cluster_id",
    max_block: int = 512,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication", arXiv:2303.09540):
    cosine-threshold pairs computed ONLY within k-means clusters — the
    cluster pass replaces the O(N²) all-pairs GEMM with Σ|cluster|² work,
    the standard semantic-dedup tier between MinHash (lexical) and
    embedding-LSH (geometric buckets).

    ``assigned`` is the k-means assignment output (``kmeans_assign``):
    one row per item with ``id_col``, ``vec_col``, ``cluster_col``.

    Skew guard: clusters are data-sized, so one hot cluster would otherwise
    become one giant task. Like ``knn_graph``'s grid (the LOSSLESS guard —
    unlike the dedup salting cap it can stay armed under an exhaustive
    oracle), each cluster is hash-chunked into ceil(|cluster|/max_block)
    chunks and the chunk-pair grid is processed cell-by-cell: per-task
    memory ≤ 2·max_block rows whatever the skew, every unordered pair meets
    exactly once (same chunk → diagonal cell, else exactly one (ca<cb)
    cell). The per-cluster chunk counts are a k-row aggregate and the cell
    map is metadata-sized — broadcast.

    Returns (id_a, id_b, cluster, cosine) with id_a < id_b, cosine ≥
    threshold; vectors are normalized inside the GEMM and the cosine is
    rounded to the 1e-6 grid (half-away-from-zero) before the threshold
    test, matching a round(list_inner_product/(|a|·|b|), 6) oracle.
    """
    import math

    if max_block <= 0:
        raise ValueError("max_block must be positive")
    e = assigned.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    sizes = {
        r["cluster"]: r["n"]
        for r in e.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    cell_rows = set()
    for c, n in sizes.items():
        nc = max(1, math.ceil(n / max_block))
        for chunk in range(nc):
            for other in range(nc):
                cell_rows.add((c, chunk, min(chunk, other), max(chunk, other)))
    cluster_type = dict(e.dtypes)["cluster"]
    cells = e.sparkSession.createDataFrame(
        sorted(cell_rows), f"cluster {cluster_type}, _chunk int, _ca int, _cb int"
    )
    nchunk_expr = F.create_map(*[
        x for c, n in sorted(sizes.items())
        for x in (F.lit(c), F.lit(max(1, math.ceil(n / max_block))))
    ])
    chunked = e.withColumn(
        "_chunk",
        F.pmod(F.xxhash64(F.col("id")), nchunk_expr[F.col("cluster")]).cast("int"),
    )
    gridded = chunked.join(F.broadcast(cells), ["cluster", "_chunk"])
    thr = float(threshold)

    def grid_cell(key, pdf):
        import numpy as np
        import pandas as pd

        cluster, ca, cb = key
        empty = pd.DataFrame({
            "id_a": pdf["id"][:0], "id_b": pdf["id"][:0],
            "cluster": pdf["cluster"][:0], "cosine": np.zeros(0),
        })
        A = pdf[pdf["_chunk"] == ca]
        B = pdf[pdf["_chunk"] == cb] if ca != cb else A
        if A.empty or B.empty:
            return empty
        XA = np.asarray([np.asarray(v, dtype=np.float64) for v in A["v"]])
        XB = XA if ca == cb else np.asarray(
            [np.asarray(v, dtype=np.float64) for v in B["v"]]
        )
        na = np.linalg.norm(XA, axis=1)
        na[na == 0.0] = 1.0
        nb = na if ca == cb else np.linalg.norm(XB, axis=1)
        if ca != cb:
            nb[nb == 0.0] = 1.0
        S = (XA / na[:, None]) @ (XB / nb[:, None]).T
        # grid-round BEFORE the tau test (half-away-from-zero, matching
        # DuckDB round()): the GEMM cosine and the oracle's
        # dot/(|a||b|) differ by ~1 ulp, so thresholding the raw value
        # could split a boundary pair across engines and change the
        # component set — the same 1e-6-grid discipline as the ANN
        # families (ADVICE r13)
        S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
        ia = A["id"].to_numpy()
        ib = B["id"].to_numpy()
        if ca == cb:
            # diagonal cell: each unordered pair appears twice — keep the
            # id_a < id_b orientation only
            keep = (S >= thr) & (ia[:, None] < ib[None, :])
        else:
            keep = S >= thr
        xi, yi = np.nonzero(keep)
        lo = np.minimum(ia[xi], ib[yi])
        hi = np.maximum(ia[xi], ib[yi])
        return pd.DataFrame({
            "id_a": lo, "id_b": hi,
            "cluster": np.full(len(lo), cluster),
            "cosine": S[xi, yi],
        })

    return gridded.groupBy("cluster", "_ca", "_cb").applyInPandas(
        grid_cell,
        f"id_a long, id_b long, cluster {cluster_type}, cosine double",
    )
