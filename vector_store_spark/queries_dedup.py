"""Deduplication registry entries — each strategy as a correctness-gated query
over the documents/embeddings tables, with the full pipeline (shingles →
MinHash → LSH bands → verify) re-derived in oracle SQL.

The synthetic corpus has planted near-duplicates (3-gram Jaccard ≈ 0.99,
SimHash Hamming ≤ 2) but no byte-identical pairs, so exact dedup runs over a
simulated re-ingestion (every 10th doc unioned back with shifted ids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.functions.hashing import minhash_coeffs, minhash_sql, poly_hash_sql, simhash_sql
from vector_store_spark.functions.text import (
    split_ngram_positions_sql,
    split_ngrams_sql,
    tokenize_sql,
    word_ngrams_sql,
)
from vector_store_spark.operators.dedup import (
    duplicated_ngram_spans,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from vector_store_spark.queries_text import quality_score_sql
from vector_store_spark.registry import ROUND, load, memo_cached_frame, register

_TOKS = f"SELECT doc_id AS id, {tokenize_sql('text')} AS toks FROM documents"
_SETS = (
    f"SELECT id, list_distinct(list_transform({word_ngrams_sql('toks', 3)}, "
    f"g -> {poly_hash_sql('g')})) AS hs FROM ({_TOKS})"
)

# Verified near-dup PAIRS are a standing artifact of the corpus — pair
# generation runs once, then every consumer (the pair listing, connected
# components, the drop list) reads the result, exactly how a real dedup
# pipeline stages it. Memoize per (session, corpus) like queries_fts's
# _INDEX_CACHE; the cached frame is candidate-pair-sized (verified pairs
# only), and the build is deterministic so reuse cannot change results.
_PAIRS_CACHE: dict[str, "object"] = {}


def _minhash_pairs(spark, sf_dir, num_hashes, bands):
    # keyed by applicationId, not id(spark): CPython reuses object ids after
    # GC, so a fresh session could collide with a dead one's key and hand
    # back a frame bound to a stopped SparkContext
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:{num_hashes}:{bands}"

    def _build():
        docs = load(spark, sf_dir, "documents")
        # max_bucket_width=None: the DuckDB oracles' banding is exhaustive,
        # so the engine side must be too — the hot-bucket salting cap could
        # otherwise silently drop candidate pairs at scale factors where a
        # band bucket exceeds the cap, breaking engine-vs-oracle parity
        return minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=num_hashes, bands=bands,
            threshold=0.8, max_bucket_width=None,
        )

    # self-heals after clearCache (see registry.memo_cached_frame)
    return memo_cached_frame(_PAIRS_CACHE, key, _build)


@register(
    "dedup_exact",
    """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT min(doc_id) AS keep_id, count(*) AS group_size,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
FROM all_docs
GROUP BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
HAVING count(*) > 1
""",
    "Exact dedup: hash-groupBy on normalized content (re-ingestion scenario)",
)
def dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    reingested = docs.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    groups = exact_dedup(docs.unionByName(reingested), "doc_id", "text")
    return groups.select(
        "keep_id", "group_size",
        F.concat_ws(",", F.col("member_ids")).alias("members"),
    )


@register(
    "dedup_ngram_jaccard",
    f"""
WITH sets AS ({_SETS}),
sets2 AS (SELECT id, hs, len(hs) AS sz FROM sets WHERE len(hs) > 0),
inv AS (SELECT id, sz, unnest(hs) AS h FROM sets2),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b, count(*) AS shared
  FROM inv a JOIN inv b ON a.h = b.h AND a.id < b.id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, round(shared / (sz_a + sz_b - shared), {ROUND}) AS jaccard
FROM pairs WHERE shared / (sz_a + sz_b - shared) >= 0.8
""",
    "Exact n-gram Jaccard near-dup via inverted-index join (no cross join)",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return pairs.withColumn("jaccard", F.round("jaccard", ROUND))


_NH, _BANDS, _R = 12, 4, 3
_COEFFS = minhash_coeffs(_NH)
_SIG_SQL = "[" + ", ".join(minhash_sql("hs", a, b) for a, b in _COEFFS) + "]"
_BUCKETS_SQL = ", ".join(
    "(" + " || '_' || ".join(f"CAST(sig[{bi * _R + j + 1}] AS VARCHAR)" for j in range(_R)) + ")"
    for bi in range(_BANDS)
)


#: the full batch MinHash+LSH pipeline in SQL — also the END-STATE oracle of
#: the streaming near-dup index (queries_streaming.stream_neardup_endstate):
#: the incremental index must accumulate exactly this pair set
MINHASH_PAIRS_SQL = f"""
WITH sets AS ({_SETS}),
sets2 AS (SELECT id, hs FROM sets WHERE len(hs) > 0),
sig AS (SELECT id, hs, {_SIG_SQL} AS sig FROM sets2),
bandrows AS (
  SELECT id, unnest([{", ".join(str(b) for b in range(_BANDS))}]) AS band,
         unnest([{_BUCKETS_SQL}]) AS bucket
  FROM sig
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bandrows a JOIN bandrows b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
ver AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.hs, sb.hs)) /
         (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS j
  FROM cand JOIN sets2 sa ON sa.id = cand.id_a JOIN sets2 sb ON sb.id = cand.id_b
)
SELECT id_a, id_b, round(j, {ROUND}) AS jaccard FROM ver WHERE j >= 0.8
"""


@register(
    "dedup_minhash_lsh",
    MINHASH_PAIRS_SQL,
    "MinHash+LSH: signature → banded buckets → candidate join → exact verify",
)
def dedup_minhash_lsh(spark, sf_dir):
    pairs = _minhash_pairs(spark, sf_dir, _NH, _BANDS)
    return pairs.withColumn("jaccard", F.round("jaccard", ROUND))




_GRAMS_SQL = f"SELECT id, {word_ngrams_sql('toks', 3)} AS grams FROM ({_TOKS})"
_GH_SQL = f"list_transform(grams, g -> {poly_hash_sql('g')})"


@register(
    "dedup_simhash",
    f"""
WITH fp AS (SELECT id, {simhash_sql(_GH_SQL)} AS f FROM ({_GRAMS_SQL}))
SELECT a.id AS id_a, b.id AS id_b, bit_count(xor(a.f, b.f)) AS hamming
FROM fp a JOIN fp b ON a.id < b.id
WHERE bit_count(xor(a.f, b.f)) <= 2
""",
    "SimHash near-dup: 30-bit fingerprint over 3-gram features, banded blocking, "
    "Hamming ≤ 2 (oracle = exhaustive pairs; banding with max_hamming < bands is lossless)",
)
def dedup_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # max_bucket_width=None: exhaustive banding to match the exhaustive oracle
    return simhash_pairs(
        docs, "doc_id", "text", max_hamming=2, bands=3, ngram=3,
        max_bucket_width=None,
    )


@register(
    "dedup_embedding_cosine",
    f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), {ROUND}) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.v, b.v) /
      (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.45
""",
    "Embedding-cosine near-dup pairs (exact verify stage)",
)
def dedup_embedding_cosine(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    return pairs.withColumn("cosine", F.round("cosine", ROUND))


# --- sign-LSH candidate generation (the 100 TB default) ------------------
_EB_BANDS = 8


#: the deterministically-sampled (band, bucket) cells of the audit entry —
#: one constant shared by the Spark side and the oracle SQL. Buckets ≤ 3 so
#: every cell is live at every auto-derived band width (r ≥ 2 ⇒ ≥ 4
#: buckets/band).
_EB_CELLS = ((0, 3), (3, 2), (6, 1))

# --- auto-scaled banding constants (r16, VERDICT #2) ----------------------
# The sampled audit now checks the AUTO-SCALED contract: band width r and
# probe radius h derived from the corpus size (operators/dedup.
# auto_lsh_params — constant expected bucket occupancy; probes hold
# analytic pair-recall ≥ 0.99 at tau). The oracle SQL re-derives r from
# COUNT(*) with the SAME integer arithmetic, reads h from an inlined
# lookup generated by the SAME probes_for_recall, and regenerates the
# pooled hyperplanes from their closed-form formula — so Spark and DuckDB
# auto-scale in lockstep at any SF with one static SQL string.
_EBA_OCC = 128          # target expected bucket occupancy (auto_lsh_params)
_EBA_TAU = 0.45


def _eba_prefix() -> str:
    """The lockstep auto-derivation CTE chain (e → pool → params → bandrows
    → proberows), shared by the sampled audit's oracle (_eba_sql) and the
    pair-emitting dedup_embedding_lsh oracle so the two entries cannot
    drift in how they re-derive r / probes / planes from COUNT(*)."""
    from vector_store_spark.operators.dedup import (
        LSH_POOL_STRIDE,
        probes_for_recall,
    )

    rmax = LSH_POOL_STRIDE
    stride = LSH_POOL_STRIDE
    probe_table = ", ".join(
        str(probes_for_recall(r, _EB_BANDS, _EBA_TAU)) for r in range(2, rmax + 1))
    bucket_exprs = ", ".join(
        f"""CAST(list_sum(list_transform(range(0, r), j ->
      CASE WHEN list_inner_product(v, pool[{b * stride} + j + 1]) > 0
           THEN (1::BIGINT << (r - 1 - j)) ELSE 0::BIGINT END)) AS BIGINT)"""
        for b in range(_EB_BANDS)
    )
    return f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
-- pooled hyperplanes from the closed-form two-round multiply-xor-shift hash
-- (operators/lsh.lsh_hyperplanes_mixed): BIGINT-exact, final division exact
pool3 AS (
  SELECT pl, i, xor(x2, x2 >> 13) AS x3 FROM (
    SELECT pl, i, (x1 * 1597334677) % 4294967296 AS x2 FROM (
      SELECT pl, i, xor(x0, x0 >> 16) AS x1 FROM (
        SELECT pl, i, ((pl * 1000003 + i) * 2654435761) % 4294967296 AS x0
        FROM (SELECT unnest(range(0, {_EB_BANDS * stride})) AS pl),
             (SELECT unnest(range(0, 64)) AS i))))
),
poolrows AS (
  SELECT pl, list((x3 / 4294967296.0) * 2.0 - 1.0 ORDER BY i) AS p
  FROM pool3 GROUP BY pl
),
params AS (
  SELECT r, ([{probe_table}])[r - 1] AS h,
         (SELECT list(p ORDER BY pl) FROM poolrows) AS pool
  FROM (SELECT COALESCE((SELECT min(j) FROM range(2, {rmax + 1}) t(j)
                         WHERE {_EBA_OCC} * (1::BIGINT << j) >= (SELECT count(*) FROM e)),
                        {rmax}) AS r)
),
bandrows AS (
  SELECT id, unnest([{", ".join(str(b) for b in range(_EB_BANDS))}]) AS band,
         unnest([{bucket_exprs}]) AS bucket
  FROM e, params
),
masks AS (
  SELECT m FROM (
    SELECT unnest(range(0, 1::BIGINT << r)) AS m, r, h FROM params
  ) WHERE list_sum(list_transform(range(0, r), j -> (m >> j) & 1)) <= h
),
proberows AS (
  SELECT id, band, xor(bucket, m) AS bucket FROM bandrows, masks
)"""


def _eba_sql() -> str:
    return f"""{_eba_prefix()},
pcnt AS (SELECT band, bucket, count(*) AS p FROM proberows GROUP BY 1, 2),
ncnt AS (SELECT band, bucket, count(*) AS n FROM bandrows GROUP BY 1, 2),
mass AS (
  SELECT -1 AS band, -1 AS bucket, CAST(sum(p * n) AS BIGINT) AS n_candidates,
         CAST(0 AS BIGINT) AS n_verified, CAST(0 AS BIGINT) AS cos_micro_sum
  FROM pcnt JOIN ncnt USING (band, bucket)
),
cells(band, bucket) AS (VALUES {", ".join(f"({b}, {c})" for b, c in _EB_CELLS)}),
cand AS (
  SELECT a.band, a.bucket, a.id AS id_a, b.id AS id_b
  FROM proberows a
  JOIN cells c ON a.band = c.band AND a.bucket = c.bucket
  JOIN bandrows b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
ver AS (
  SELECT cand.band, cand.bucket,
         list_inner_product(ea.v, eb.v) /
         (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))) AS cosine
  FROM cand JOIN e ea ON ea.id = cand.id_a JOIN e eb ON eb.id = cand.id_b
),
cellstats AS (
  SELECT band, bucket, CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN cosine >= {_EBA_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
         CAST(sum(CASE WHEN cosine >= {_EBA_TAU}
                       THEN CAST(round(cosine * 1000000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cos_micro_sum
  FROM ver GROUP BY 1, 2
)
SELECT * FROM cellstats UNION ALL SELECT * FROM mass
"""


@register(
    "dedup_embedding_lsh_sampled",
    # The SF-ROBUST second oracle form of the embedding-LSH contract
    # The SF-ROBUST second oracle form of the embedding-LSH contract
    # (closing the one sf3 gate exclusion): instead of the exhaustive
    # bucket-self-join DISTINCT (~N²/128 rows — infeasible past ~10k
    # vectors), verify (1) a DISTINCT-free GLOBAL candidate-mass aggregate
    # computed from per-cell COUNTS (bands·2^r cells, never a pair join)
    # and (2) the exact pipeline — candidate join + cosine verify — inside
    # K fixed sampled cells, where per-cell pairs are DISTINCT-free by
    # construction (one probe row per id per cell). Integer aggregates
    # only, so the compare is order- and float-summation-independent.
    # Since r16 the audited parameters are AUTO-SCALED from the corpus size
    # (see _eba_sql's lockstep derivation in SQL).
    _eba_sql(),
    "SF-robust audit of the AUTO-SCALED sign-LSH embedding near-dup "
    "contract (banding from corpus size at constant bucket occupancy; "
    "probe radius holding analytic recall >= 0.99): global DISTINCT-free "
    "candidate-mass aggregate (per-cell count products) + exact "
    "candidate-join-and-cosine-verify inside 3 deterministic sampled "
    "cells — quadratic work only within the sampled cells, so the oracle "
    "runs at any SF (the exhaustive twin tops out near 10k vectors)",
)
def dedup_embedding_lsh_sampled(spark, sf_dir):
    from vector_store_spark.operators.dedup import embedding_neardup_lsh_cell_audit

    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh_cell_audit(
        emb, "vec_id", "embedding", threshold=_EBA_TAU,
        num_bits=None, bands=_EB_BANDS, dims=64, probes=None,
        sample_cells=_EB_CELLS,
    )


@register(
    "dedup_embedding_lsh",
    # Full pair-emitting pipeline on the AUTO-SCALED parameters (r17,
    # VERDICT r16 #3: the former fixed num_bits=32/bands=8 + mod-97 lattice
    # planes was exactly the documented-quadratic configuration
    # auto_lsh_params replaced — no green entry should demonstrate the
    # anti-pattern). The oracle re-derives band width, probe radius, and
    # the pooled hyperplanes from COUNT(*) via the SAME lockstep CTE chain
    # as the sampled audit (_eba_prefix), then emits the verified pairs:
    # sign bits → auto-width band buckets → Hamming-≤h multiprobe on one
    # join side → per-(band,bucket) candidate self-join → exact-cosine
    # verify. Precision 1 (exact verify); recall follows the probed band
    # S-curve held ≥ 0.99 by the probe derivation.
    f"""{_eba_prefix()},
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM proberows a JOIN bandrows b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
ver AS (
  SELECT c.id_a, c.id_b,
         list_inner_product(ea.v, eb.v) /
         (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))) AS cosine
  FROM cand c JOIN e ea ON ea.id = c.id_a JOIN e eb ON eb.id = c.id_b
)
SELECT id_a, id_b, round(cosine, {ROUND}) AS cosine
FROM ver WHERE cosine >= {_EBA_TAU}
""",
    "Embedding near-dup at the 100 TB shape, AUTO-SCALED: band width from "
    "the constant-occupancy rule (candidate work LINEAR in N), probe "
    "radius from the analytic S-curve at recall >= 0.99, decorrelated "
    "pooled hyperplanes — bucketed candidate self-join + exact-cosine "
    "verify, precision 1 by construction; the oracle auto-scales in "
    "lockstep from COUNT(*)",
)
def dedup_embedding_lsh(spark, sf_dir):
    """The shipped default IS the auto path (num_bits=None, probes=None →
    operators/dedup.auto_lsh_params + lsh_hyperplanes_mixed): constant
    expected bucket occupancy at any corpus size, so the Σ|bucket|²
    candidate work stays ≈ N·occupancy — the parameterization that went
    quadratic with N (fixed 32-bit banding, r14 sf3 gate: ~10⁹-row oracle
    DISTINCT at 24k vectors) is no longer reachable from a green entry.
    The ≥sf3 check of the same contract is ``dedup_embedding_lsh_sampled``
    (this oracle's pair join is exhaustive over all cells, so it tops out
    around the sf1 gate; the audit's quadratic work is bounded to K
    sampled cells)."""
    from vector_store_spark.operators.dedup import embedding_neardup_pairs_lsh

    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs_lsh(
        emb, "vec_id", "embedding", threshold=_EBA_TAU,
        num_bits=None, bands=_EB_BANDS, dims=64, probes=None,
    )
    return pairs.withColumn("cosine", F.round("cosine", ROUND))


# transitive closure over verified MinHash near-dup pairs — the shared
# CTE chain of every group-consuming oracle (groups / drop list / keep-best)
_CLOSURE_CTES = f"""sets AS ({_SETS}),
sets2 AS (SELECT id, hs FROM sets WHERE len(hs) > 0),
sig AS (SELECT id, hs, {_SIG_SQL} AS sig FROM sets2),
bandrows AS (
  SELECT id, unnest([{", ".join(str(b) for b in range(_BANDS))}]) AS band,
         unnest([{_BUCKETS_SQL}]) AS bucket
  FROM sig
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bandrows a JOIN bandrows b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
ver AS (
  SELECT id_a, id_b
  FROM cand JOIN sets2 sa ON sa.id = cand.id_a JOIN sets2 sb ON sb.id = cand.id_b
  WHERE len(list_intersect(sa.hs, sb.hs)) /
        (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM ver
  UNION SELECT id_b, id_a FROM ver
),
reach AS (
  SELECT src, src AS dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (SELECT src AS id, min(dst) AS group_id FROM reach GROUP BY src)"""


# --- memoized-oracle plumbing for the closure trio ------------------------
# The chain above re-derives 50k-doc shingle sets + 12 minhash mins + the
# recursive closure PER CONSUMING ORACLE — 20-50 min each in DuckDB at sf1
# (CORRECTNESS_local_r13_sf1 needed dedicated 3300 s passes). The stretch
# gate (tools/check_correctness.py) materializes `labels` ONCE per run as a
# temp table and runs a memoized rewrite of each oracle instead. Both
# variants are assembled here from the SAME tail fragments, so they cannot
# drift; the driver always runs the self-contained variant.
_LABELS_MEMO = "__memo_dedup_labels"
_LABELS_MEMO_SETUP = [(
    _LABELS_MEMO,
    f"WITH RECURSIVE {_CLOSURE_CTES}\nSELECT id, group_id FROM labels",
)]


def _closure_variants(extra_cte: str, tail: str) -> tuple[str, str]:
    """(self_contained, memoized) oracle SQL pair for a labels-consuming
    query. ``extra_cte`` and ``tail`` reference the closure output via the
    literal placeholder ``{LABELS}``."""
    full_head = "WITH RECURSIVE " + _CLOSURE_CTES + (",\n" + extra_cte if extra_cte else "")
    memo_head = ("WITH " + extra_cte) if extra_cte else ""
    full = (full_head + "\n" + tail).replace("{LABELS}", "labels")
    memo = (memo_head + "\n" + tail).replace("{LABELS}", _LABELS_MEMO)
    return full, memo


_GROUPS_TAIL = """SELECT group_id,
       id AS member_id,
       CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
FROM {LABELS}
"""
_GROUPS_SQL, _GROUPS_MEMO = _closure_variants("", _GROUPS_TAIL)


def _groups_internal_plan(spark, sf_dir):
    """Internal-plan probe: dedup_component_members' label propagation roots
    at a localCheckpoint (Scan ExistingRDD), so the entry's visible plan
    hides the distributed pair pipeline — expose the banded candidate/verify
    pair generation lazily (the drop-list/keep-best entries pin the
    label-APPLY side of the same pipeline)."""
    return _minhash_pairs(spark, sf_dir, _NH, _BANDS)


@register(
    "dedup_groups_minhash",
    # WITH RECURSIVE: transitive closure over the verified near-dup pairs,
    # then min-reachable-id = component label (what the Spark side's
    # min-label propagation converges to)
    _GROUPS_SQL,
    "Near-dup GROUPS: connected components over verified MinHash pairs "
    "(min-label propagation / recursive-closure oracle) in ROW form — one "
    "(group_id, member_id) row per member plus the true group size, the "
    "shape that survives a degenerate mega-component (no per-group array)",
    memo_setup=_LABELS_MEMO_SETUP,
    memo_sql=_GROUPS_MEMO,
    internal_plan_fn=_groups_internal_plan,
)
def dedup_groups_minhash(spark, sf_dir):
    from pyspark.sql import Window

    from vector_store_spark.operators.dedup import dedup_component_members

    pairs = _minhash_pairs(spark, sf_dir, _NH, _BANDS)
    members = dedup_component_members(pairs)
    return members.withColumn(
        "group_size",
        F.count("*").over(Window.partitionBy("group_id")).cast("long"),
    )


_DROP_TAIL = """SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_dropped,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_dropped
FROM drops JOIN documents d ON d.doc_id = drops.id
GROUP BY d.source
"""
_DROP_SQL, _DROP_MEMO = _closure_variants(
    "drops AS (SELECT id FROM {LABELS} WHERE id <> group_id)", _DROP_TAIL)


@register(
    "dedup_drop_list",
    # keep-one-per-component: drop everything that is not its component's
    # min id; report the removal volume per source
    _DROP_SQL,
    "The dedup keep-set decision: drop every non-minimum member of each "
    "near-dup component; removal volume per source. The drop list scales "
    "with the duplicate count (NOT a constant), so it is applied as a "
    "shuffle-hash semi-join — never broadcast",
    memo_setup=_LABELS_MEMO_SETUP,
    memo_sql=_DROP_MEMO,
)
def dedup_drop_list(spark, sf_dir):
    from vector_store_spark.operators.dedup import dedup_component_members

    docs = load(spark, sf_dir, "documents")
    pairs = _minhash_pairs(spark, sf_dir, _NH, _BANDS)
    drops = (
        dedup_component_members(pairs)
        .where(F.col("member_id") != F.col("group_id"))
        .select(F.col("member_id").alias("doc_id"))
    )
    return (
        docs.join(drops.hint("SHUFFLE_HASH"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_dropped"),
            F.sum("n_chars").cast("long").alias("chars_dropped"),
        )
    )


@register(
    "text_decontaminate",
    # containment (asymmetric overlap, relative to the EVAL doc) of each
    # training doc against the benchmark set: |∩| / |eval_shingles|. The
    # eval set is a deterministic "leaked benchmark": 120-char excerpts of
    # every 37th doc — their source docs must flag at containment 1.0.
    # Same inverted-index join as dedup_ngram_jaccard — no cross join.
    f"""
WITH evdocs AS (
  SELECT doc_id + 900000 AS doc_id, substr(text, 1, 120) AS text
  FROM documents WHERE doc_id % 37 = 0
),
tsets AS ({_SETS}),
esets AS (
  SELECT id, list_distinct(list_transform({word_ngrams_sql('toks', 3)},
         g -> {poly_hash_sql('g')})) AS hs
  FROM (SELECT doc_id AS id, {tokenize_sql('text')} AS toks FROM evdocs)
),
train AS (SELECT id, hs FROM tsets WHERE len(hs) > 0),
ev AS (SELECT id AS eval_id, hs, len(hs) AS esz FROM esets WHERE len(hs) > 0),
tinv AS (SELECT id, unnest(hs) AS h FROM train),
einv AS (SELECT eval_id, esz, unnest(hs) AS h FROM ev),
pairs AS (
  SELECT tinv.id, einv.eval_id, einv.esz, count(*) AS shared
  FROM tinv JOIN einv USING (h)
  GROUP BY tinv.id, einv.eval_id, einv.esz
)
SELECT id, eval_id, round(CAST(shared AS DOUBLE) / esz, {ROUND}) AS containment
FROM pairs WHERE CAST(shared AS DOUBLE) / esz >= 0.5
""",
    "Benchmark decontamination (training-pipeline op, beyond the reference): "
    "flag training docs containing >= 50% of any eval doc's 3-grams — the "
    "asymmetric overlap (relative to the eval doc) that catches a short "
    "benchmark prompt embedded in a long training doc; inverted-index join, "
    "eval side benchmark-sized",
)
def text_decontaminate(spark, sf_dir):
    from vector_store_spark.operators.dedup import decontaminate_ngram

    docs = load(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.substring("text", 1, 120).alias("text"),
    )
    flagged = decontaminate_ngram(docs, ev, "doc_id", "text", n=3, threshold=0.5)
    return flagged.withColumn("containment", F.round("containment", ROUND))


_KB_CTES = f"""q AS ({quality_score_sql()}),
ranked AS (
  SELECT l.group_id, l.id AS member_id, q.q,
         row_number() OVER (PARTITION BY l.group_id ORDER BY q.q DESC, l.id ASC) AS rn,
         count(*) OVER (PARTITION BY l.group_id) AS gs
  FROM {{LABELS}} l JOIN q ON q.doc_id = l.id
)"""
_KB_TAIL = """SELECT group_id, member_id AS keep_id, q AS keep_quality, CAST(gs AS BIGINT) AS group_size
FROM ranked WHERE rn = 1
"""
_KEEP_BEST_SQL, _KEEP_BEST_MEMO = _closure_variants(_KB_CTES, _KB_TAIL)


@register(
    "dedup_keep_best",
    # canonical-by-QUALITY instead of min-id: real pipelines keep the best
    # member of each near-dup cluster, not an arbitrary one. The oracle
    # chains the shared transitive closure with the text_quality composite
    # (imported from queries_text so the formula cannot drift) and picks
    # rn = 1 per group under (quality DESC, id ASC).
    _KEEP_BEST_SQL,
    "Near-dup canonical selection by quality: per-component arg-max of the "
    "text_quality composite (ties -> smallest id), with group size",
    memo_setup=_LABELS_MEMO_SETUP,
    memo_sql=_KEEP_BEST_MEMO,
)
def dedup_keep_best(spark, sf_dir):
    from pyspark.sql import Window

    from vector_store_spark.operators.dedup import dedup_component_members
    from vector_store_spark.operators.textstats import quality_features

    docs = load(spark, sf_dir, "documents")
    pairs = _minhash_pairs(spark, sf_dir, _NH, _BANDS)
    members = dedup_component_members(pairs)  # (group_id, member_id)
    q = quality_features(docs, "doc_id", "text").select(
        F.col("doc_id").alias("member_id"),
        F.round("quality_score", ROUND).alias("q"),
    )
    # members is duplicate-volume-sized (NOT broadcastable — same contract
    # as dedup_drop_list); shuffle-hash keeps the fact-side join sort-free
    j = members.hint("SHUFFLE_HASH").join(q, "member_id")
    w = Window.partitionBy("group_id").orderBy(
        F.col("q").desc(), F.col("member_id").asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "group_size",
            F.count("*").over(Window.partitionBy("group_id")).cast("long"),
        )
        .where(F.col("_rn") == 1)
        .select(
            "group_id",
            F.col("member_id").alias("keep_id"),
            F.col("q").alias("keep_quality"),
            "group_size",
        )
    )


@register(
    "split_leakage_cosine",
    # SEMANTIC split leakage: an eval doc whose embedding near-duplicates a
    # training doc leaks even when no n-gram matches (paraphrase leakage) —
    # the embedding-space counterpart of text_decontaminate. Oracle is the
    # exhaustive cross-split pair scan; the engine reuses the blocked-GEMM
    # exact pair generator, so candidate work is B-bounded, never a crossJoin.
    f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
         list_inner_product(ev.v, tr.v) /
         (sqrt(list_inner_product(ev.v, ev.v)) * sqrt(list_inner_product(tr.v, tr.v))) AS c
  FROM e ev JOIN e tr
    ON ev.vec_id % 4 = 0 AND tr.vec_id % 4 <> 0
),
hits AS (SELECT eval_id, train_id, round(c, {ROUND}) AS cosine FROM pairs WHERE c >= 0.45),
ranked AS (
  SELECT eval_id, train_id, cosine,
         row_number() OVER (PARTITION BY eval_id ORDER BY cosine DESC, train_id) AS rn
  FROM hits
)
SELECT eval_id, train_id, cosine FROM ranked WHERE rn = 1
""",
    "Embedding-space split decontamination: for each eval-split doc, its "
    "nearest training-split near-duplicate (cosine >= 0.45) — catches "
    "paraphrase leakage that n-gram overlap misses",
)
def split_leakage_cosine(spark, sf_dir):
    from pyspark.sql import Window

    from vector_store_spark.operators.dedup import embedding_neardup_pairs

    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    a_eval = F.col("id_a") % 4 == 0
    b_eval = F.col("id_b") % 4 == 0
    cross = pairs.where(a_eval != b_eval).select(
        F.when(a_eval, F.col("id_a")).otherwise(F.col("id_b")).alias("eval_id"),
        F.when(a_eval, F.col("id_b")).otherwise(F.col("id_a")).alias("train_id"),
        F.round("cosine", ROUND).alias("cosine"),
    )
    w = Window.partitionBy("eval_id").orderBy(
        F.col("cosine").desc(), F.col("train_id").asc()
    )
    return (
        cross.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("eval_id", "train_id", "cosine")
    )


_SPAN_N = 8  # span-marking n-gram width (Lee et al. use 50 BPE tokens; the
# synthetic docs are ~30 words, so 8 keeps the operator shape while producing
# non-degenerate spans)


#: duplicated-span CTE chain + final select, shared by the span listing and
#: the per-source stats rollup so the two oracles cannot drift apart
_SPAN_CTES = f"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g0 AS (
  SELECT doc_id,
         unnest({split_ngram_positions_sql("toks", _SPAN_N)}) AS pos,
         unnest({split_ngrams_sql("toks", _SPAN_N)}) AS ng
  FROM t WHERE len(toks) >= {_SPAN_N}
),
d AS (SELECT ng FROM g0 GROUP BY ng HAVING count(DISTINCT doc_id) >= 2),
m AS (SELECT doc_id, pos FROM g0 JOIN d USING (ng)),
br AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_SPAN_N}
              THEN 1 ELSE 0 END AS brk
  FROM m
),
isl AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM br
)"""

_SPANS_SELECT = f"""SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {_SPAN_N} - 1 AS span_end,
       max(pos) - min(pos) + {_SPAN_N} AS span_tokens
FROM isl GROUP BY doc_id, island"""


@register(
    "dedup_substring_spans",
    # oracle marks duplicated positions by the n-gram STRING; the engine
    # shuffles xxhash64(ngram) instead (64-bit keys — collision odds ~2^-64
    # per pair, far below the float-rounding tolerance elsewhere in the gate)
    f"WITH {_SPAN_CTES}\n{_SPANS_SELECT}",
    "Cross-document duplicated-substring spans (Lee et al. 2021 exact-substring "
    "dedup, re-expressed as distributed n-gram marking + per-doc island merge): "
    "every maximal token span whose 8-grams all occur in >= 2 documents",
)
def dedup_substring_spans(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return duplicated_ngram_spans(docs, "doc_id", "text", n=_SPAN_N, min_docs=2)


@register(
    "dedup_substring_stats",
    # overlap-merged spans never double-count a token, so per-doc
    # sum(span_tokens) <= n_tokens and the fraction is a true removal ratio
    f"""
WITH {_SPAN_CTES},
spans AS ({_SPANS_SELECT}),
perdoc AS (
  SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
),
dt AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents),
j AS (SELECT dt.source, dt.n_tokens, perdoc.dup_tokens
      FROM dt LEFT JOIN perdoc USING (doc_id))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(dup_tokens) AS BIGINT) AS n_docs_affected,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(coalesce(dup_tokens, 0)) AS BIGINT) AS dup_tokens,
       round(CAST(sum(coalesce(dup_tokens, 0)) AS DOUBLE) / sum(n_tokens), {ROUND}) AS dup_token_frac
FROM j GROUP BY source
""",
    "Per-source duplicated-substring exposure report (the curation dashboard "
    "over dedup_substring_spans): how much of each source's token mass sits "
    "inside cross-document duplicated spans. Span totals are doc-bounded; "
    "the back-join onto the doc frame is shuffle-hash (both sides fact-sized)",
)
def dedup_substring_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    spans = duplicated_ngram_spans(docs, "doc_id", "text", n=_SPAN_N, min_docs=2)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").cast("long").alias("dup_tokens")
    )
    doc_tok = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    joined = doc_tok.join(per_doc.hint("SHUFFLE_HASH"), "doc_id", "left")
    dup = F.sum(F.coalesce(F.col("dup_tokens"), F.lit(0)))
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count("dup_tokens").cast("long").alias("n_docs_affected"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        dup.cast("long").alias("dup_tokens"),
        F.round(dup.cast("double") / F.sum("n_tokens"), ROUND).alias("dup_token_frac"),
    )


# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster the
# embeddings, find cosine-threshold pairs ONLY within clusters, then keep one
# representative per duplicate group — the paper keeps the member with LOW
# similarity to its cluster centroid (max squared-L2, preserving diversity),
# ties -> smallest id. Seed centroids are the first _SD_K vectors (vec_id <
# _SD_K), the same deterministic recipe as emb_cluster_profile, so the oracle
# re-derives them from the table itself. tau follows dedup_embedding_lsh's
# 0.45 (this synthetic corpus has no >=0.6 within-cluster cosine at shipped
# SFs). For unit vectors l2sq = 2 - 2*cos, so max-l2sq IS min-cos-to-centroid.
_SD_K, _SD_TAU = 16, 0.45


def _semantic_internal_plans(spark, sf_dir):
    """Internal-plan probe for the eager-localized registry entry: the
    distributed operators it drives — the cluster-grid cogrouped GEMM pair
    search and the fact-classed member-metadata join — exposed lazily so the
    suite-wide plan bans audit them (tests/test_plans.py)."""
    from vector_store_spark.operators.clustering import kmeans_assign
    from vector_store_spark.operators.dedup import (
        dedup_component_members,
        semantic_dup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = sorted(
        emb.where(F.col("vec_id") < _SD_K).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    assigned = kmeans_assign(
        emb, "vec_id", "embedding", [r.embedding for r in cents],
        keep_cols=("embedding",),
    )
    pairs = semantic_dup_pairs(
        assigned, "vec_id", "embedding",
        threshold=_SD_TAU, max_block=512,
    )
    members = dedup_component_members(pairs)
    meta = assigned.select(
        F.col("vec_id").alias("member_id"),
        F.round("l2sq", ROUND).alias("dist_sq"),
    )
    return [pairs, members.join(meta.hint("SHUFFLE_HASH"), "member_id")]


@register(
    "dedup_semantic_clusters",
    f"""
WITH RECURSIVE
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_SD_K}),
d AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(list_transform(list_zip(e.v, c.cv), x -> (x[1] - x[2])),
                            list_transform(list_zip(e.v, c.cv), x -> (x[1] - x[2]))) AS l2sq
  FROM e CROSS JOIN c
),
a AS (
  SELECT vec_id, cid, l2sq,
         row_number() OVER (PARTITION BY vec_id ORDER BY l2sq, cid) AS rn
  FROM d
),
m AS (SELECT vec_id, cid, l2sq FROM a WHERE rn = 1),
ver AS (
  SELECT ma.vec_id AS id_a, mb.vec_id AS id_b
  FROM m ma JOIN m mb ON ma.cid = mb.cid AND ma.vec_id < mb.vec_id
  JOIN e ea ON ea.vec_id = ma.vec_id JOIN e eb ON eb.vec_id = mb.vec_id
  WHERE round(list_inner_product(ea.v, eb.v) /
              (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))),
              {ROUND}) >= {_SD_TAU}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM ver UNION SELECT id_b, id_a FROM ver),
reach AS (
  SELECT src, src AS dst FROM edges
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
),
labels AS (SELECT src AS id, min(dst) AS group_id FROM reach GROUP BY src),
mem AS (
  SELECT l.group_id, l.id AS member_id, m.cid AS cluster_id,
         round(m.l2sq, {ROUND}) AS dist_sq
  FROM labels l JOIN m ON m.vec_id = l.id
),
rep AS (
  SELECT group_id, member_id,
         row_number() OVER (PARTITION BY group_id ORDER BY dist_sq DESC, member_id) AS rn
  FROM mem
)
SELECT mem.group_id, mem.member_id, mem.cluster_id, mem.dist_sq,
       rep.rn = 1 AS keep
FROM mem JOIN rep ON rep.group_id = mem.group_id AND rep.member_id = mem.member_id
""",
    "SemDeDup semantic dedup: k-means clusters bound the pair search "
    "(Sigma |cluster|^2, never all-pairs), within-cluster cosine >= tau "
    "pairs -> connected components -> keep the member FARTHEST from its "
    "cluster centroid per group (the paper's diversity-preserving pick); "
    "grid sub-blocking (lossless, knn_graph-style) caps per-task memory "
    "under cluster skew",
    internal_plan_fn=_semantic_internal_plans,
)
def dedup_semantic_clusters(spark, sf_dir):
    from pyspark.sql import Window

    from vector_store_spark.operators.clustering import kmeans_assign
    from vector_store_spark.operators.dedup import (
        dedup_component_members,
        semantic_dup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = sorted(
        emb.where(F.col("vec_id") < _SD_K).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )  # k-bounded metadata collect
    assigned = kmeans_assign(
        emb, "vec_id", "embedding", [r.embedding for r in cents],
        keep_cols=("embedding",),
    )
    # argmin INDEX -> seed vec_id (same explicit mapping as
    # emb_cluster_profile: the oracle keys clusters by vec_id)
    cid_lookup = F.array(*[F.lit(int(r.vec_id)) for r in cents])
    assigned = assigned.withColumn(
        "cluster_id",
        F.element_at(cid_lookup, F.col("cluster_id").cast("int") + 1).cast("long"),
    )
    # the assignment GEMM scan feeds BOTH the pair generation and the
    # member-metadata join — cache it, release after the (dup-member-sized)
    # result is materialized
    assigned = assigned.cache()
    try:
        pairs = semantic_dup_pairs(
            assigned, "vec_id", "embedding",
            threshold=_SD_TAU, cluster_col="cluster_id", max_block=512,
        )
        members = dedup_component_members(pairs)
        meta = assigned.select(
            F.col("vec_id").alias("member_id"),
            "cluster_id",
            F.round("l2sq", ROUND).alias("dist_sq"),
        )
        # members is dup-sized but fact-classed (corpus-proportional):
        # SHUFFLE_HASH, never broadcast
        mem = members.join(meta.hint("SHUFFLE_HASH"), "member_id")
        w = Window.partitionBy("group_id").orderBy(
            F.col("dist_sq").desc(), F.col("member_id")
        )
        out = mem.withColumn("keep", F.row_number().over(w) == 1).select(
            "group_id", "member_id", "cluster_id", "dist_sq", "keep"
        )
        rows = out.collect()  # dup-member-sized
        schema = out.schema
    finally:
        assigned.unpersist()
    return spark.createDataFrame(rows, schema)
