"""Full-text search: postings build + BM25 scoring + boolean/phrase query
execution (SURVEY.md §2.7 F6–F8, §2.5 T3).

Reference: fts_index/tantivy.rs — SimpleTokenizer→lowercase→stopwords analyzer
(:162-183), QueryParser with terms/AND/OR/NOT/grouping/phrases (:237-246),
TopDocs by BM25 score descending (:258-274). Scoring is Lucene-compatible BM25
(k1=1.2, b=0.75; docs/dev/fts/full-text-prd-snapshot.md "BM25 Scoring … same as
Apache Lucene"):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    score   = Σ_matching-clauses idf·tf_norm

Phrase clauses follow Lucene PhraseQuery: tf = number of phrase occurrences
(consecutive positions), idf = Σ idf of constituent terms.

Spark-first layout: the "index" is two DataFrames —
``postings(term, doc_id, tf, positions)`` and ``doclens(doc_id, dl)`` — both
hash-partitioned on ``doc_id`` at build time (the in-memory twin of doc_id
bucketing; the persisted layout additionally term-bucket-partitions postings
for pruned term lookups). Every scoring join (postings⋈doclens, AND/NOT
clause⋈clause, phrase per-term chains) is a co-partitioned shuffle-hash join:
a term's inverted list is O(df(term)) ≈ O(corpus) for common terms, so it is
NEVER broadcast — only metadata-sized sides (per-query-term df rows, the
one-row Σidf aggregate) are. Corpus stats (N, avgdl, per-term df) are tiny
aggregates. Everything is built-in expressions; no Python in the scan path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_store_spark.plans.fts_query import (
    AndNode, NotNode, OrNode, PhraseNode, QueryNode, TermNode, parse_query,
)

K1 = 1.2
B = 0.75


@dataclass
class FtsIndex:
    """A built full-text index over (id_col, text_col)."""

    postings: DataFrame  # term, doc_id, tf, positions array<int> [, term_bucket]
    doclens: DataFrame   # doc_id, dl
    n_docs: int
    avgdl: float
    id_col: str
    df_by_term: DataFrame  # term, df — per-term document frequency (cached)
    #: set on persisted indexes whose postings carry term_bucket: term lookups
    #: then add the bucket equality and prune to one directory
    num_buckets: int = 32

    def stats(self) -> dict:
        """A2: num_docs + size stats (tantivy.rs:303-317)."""
        return {"num_docs": self.n_docs, "avgdl": self.avgdl}


def _copartition(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-partition on the scoring-join key with an EXPLICIT partition count
    (an un-numbered repartition is AQE-coalescible, and two caches coalesced to
    different counts would put the Exchange back under every join)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, F.col(key))


def _postings_frame(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf, positions) from one Arrow-batched tokenize pass —
    the raw postings construction shared by the full build and the
    incremental add (which must not pay the build's eager stats jobs)."""
    from vector_store_spark.functions.text import tokens_udf

    toks = docs.select(id_col, tokens_udf()(F.col(text_col)).alias("toks"))
    exploded = toks.select(id_col, F.posexplode("toks").alias("pos", "term"))
    return (
        exploded.groupBy("term", id_col)
        .agg(F.count("*").alias("tf"), F.sort_array(F.collect_list("pos")).alias("positions"))
        .withColumnRenamed(id_col, "doc_id")
    )


def build_fts_index(docs: DataFrame, id_col: str, text_col: str) -> FtsIndex:
    """Tokenize ONCE (Arrow-batched), posexplode to (term, doc, position),
    aggregate postings; doclens then derive from the postings cache
    (dl = Σ tf per doc) instead of a second tokenize pass — the corpus text
    is scanned and tokenized exactly one time. Documents with zero tokens
    drop out of doclens, which is harmless (they can never match a term),
    but N for IDF still counts every document (a separate text-free count).
    Both caches are hash-partitioned on doc_id so every downstream scoring
    join is exchange-free on both sides (term filters and projections
    preserve the partitioning)."""
    postings = _copartition(_postings_frame(docs, id_col, text_col)).cache()
    # partitioning-preserving aggregation over the cache: no exchange, no
    # second Python pass
    doclens = postings.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl")).cache()
    n_docs = docs.select(id_col).count()  # all docs, incl. token-less (IDF's N)
    sum_dl = doclens.agg(F.sum("dl")).first()[0] or 0
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0
    df_by_term = postings.groupBy("term").agg(F.count("*").alias("df")).cache()
    return FtsIndex(postings, doclens, int(n_docs), avgdl, id_col, df_by_term)


def update_fts_index(
    index: FtsIndex,
    docs_added: DataFrame | None = None,
    doc_ids_removed: list | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> FtsIndex:
    """Incremental maintenance (the reference's CRUD visibility: added docs
    searchable after the periodic commit, removed docs gone —
    fts_index/tantivy.rs:383-443, validator fts.rs CRUD tests).

    Re-tokenizes ONLY the added docs; removed/overwritten doc ids are
    anti-joined out of the existing postings/doclens — the overwritten set
    comes straight from ``docs_added`` as a DataFrame (no driver-side
    collect of ids). Corpus stats (N, avgdl, per-term df) are re-aggregated —
    they are metadata-sized. An upsert is expressed as remove(id) + add(new
    doc). Work is O(changed docs + stats), not O(corpus)."""
    # a persisted index's postings carry term_bucket; the maintained result is
    # in-memory (re-bucketed on the next write_fts_index), so drop it before
    # unioning with freshly built postings
    postings, doclens = index.postings.drop("term_bucket"), index.doclens
    id_type = postings.schema["doc_id"].dataType.simpleString()
    gone_df = None
    if doc_ids_removed:
        spark = postings.sparkSession
        gone_df = spark.createDataFrame(
            [(g,) for g in doc_ids_removed], f"doc_id {id_type}"
        )
    if docs_added is not None:
        added_ids = docs_added.select(F.col(id_col).alias("doc_id"))
        gone_df = added_ids if gone_df is None else gone_df.unionByName(added_ids)
    if gone_df is not None:
        gone_df = F.broadcast(gone_df.distinct())
        postings = postings.join(gone_df, "doc_id", "left_anti")
        doclens = doclens.join(gone_df, "doc_id", "left_anti")
    if docs_added is not None:
        # raw postings for the added docs only — build_fts_index here would
        # eagerly run its two stats jobs and copartition+cache frames that
        # are immediately re-partitioned by the union below. One tokenize
        # pass, cached, feeds both the postings and doclens legs.
        add_postings = _postings_frame(docs_added, id_col, text_col).cache()
        add_doclens = add_postings.groupBy("doc_id").agg(
            F.sum("tf").cast("int").alias("dl"))
        postings = postings.unionByName(add_postings)
        doclens = doclens.unionByName(add_doclens)
    # union/anti-join drop the build-time doc_id partitioning; restore it so
    # the updated index serves exchange-free joins like a fresh build
    postings = _copartition(postings).cache()
    doclens = _copartition(doclens).cache()
    n_docs, sum_dl = doclens.agg(F.count("*"), F.sum("dl")).first()
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0
    df_by_term = postings.groupBy("term").agg(F.count("*").alias("df")).cache()
    return FtsIndex(postings, doclens, int(n_docs or 0), avgdl, index.id_col, df_by_term)


def idf_expr(df_col: Column, n_docs: int) -> Column:
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def tf_norm_expr(tf_col: Column, dl_col: Column, avgdl: float) -> Column:
    return (tf_col * (K1 + 1.0)) / (tf_col + F.lit(K1) * (1.0 - B + B * dl_col / F.lit(avgdl)))


def _phrase_tf(positions_cols: list[Column]) -> Column:
    """Count occurrences of the phrase: positions of term_i shifted by i must
    all align. positions arrays are small; forall/array_contains is O(len²)
    per row but rows are (doc, phrase-candidate) pairs only."""
    first = positions_cols[0]
    return F.size(
        F.filter(
            first,
            lambda p: reduce(
                lambda acc, ic: acc & F.array_contains(ic[1], p + F.lit(ic[0])),
                enumerate(positions_cols[1:], start=1),
                F.lit(True),
            ),
        )
    )


class Bm25Executor:
    """Compile a parsed query AST into a (doc_id, score) DataFrame."""

    def __init__(self, index: FtsIndex):
        self.ix = index
        # per-term document frequency — tiny, cached at build, broadcast into
        # term lookups
        self.df_by_term = index.df_by_term

    def _term_filter(self, term: str):
        """Term lookup predicate; on a persisted index whose postings carry
        ``term_bucket``, the bucket equality prunes the scan to one directory
        before the term filter applies (the executor composes with the
        write_fts_index layout for EVERY query shape, not just single terms).
        The bucket is resolved DRIVER-SIDE (functions/hashing.term_bucket, a
        bit-exact xxhash64 twin): plan construction launches zero Spark jobs,
        keeping the executor's composition fully lazy."""
        cond = F.col("term") == term
        if "term_bucket" in self.ix.postings.columns:
            from vector_store_spark.functions.hashing import term_bucket

            n = getattr(self.ix, "num_buckets", 32)
            cond = (F.col("term_bucket") == term_bucket(term, n)) & cond
        return cond

    def _term_postings(self, term: str) -> DataFrame:
        return self.ix.postings.where(self._term_filter(term)).drop("term_bucket")

    def _term_scores(self, term: str) -> DataFrame:
        # A term's inverted list is O(df(term)) — corpus-scaled for common
        # terms — so it must NOT be broadcast. Both postings and doclens are
        # cached hash-partitioned on doc_id, so this shuffle-hash join plans
        # with zero Exchange; only the ONE df row for the term broadcasts.
        p = self._term_postings(term)
        p = p.join(F.broadcast(self.df_by_term.where(F.col("term") == term)), "term")
        p = self.ix.doclens.join(p.hint("SHUFFLE_HASH"), "doc_id")
        score = idf_expr(F.col("df").cast("double"), self.ix.n_docs) * tf_norm_expr(
            F.col("tf").cast("double"), F.col("dl").cast("double"), self.ix.avgdl
        )
        return p.select("doc_id", score.alias("score"))

    def _phrase_scores(self, terms: list[str]) -> DataFrame:
        if len(terms) == 1:
            return self._term_scores(terms[0])
        # join per-term postings on doc_id, then count aligned positions —
        # co-partitioned SHJ chain (every per-term list is corpus-scaled)
        joined = None
        for i, t in enumerate(terms):
            p = self._term_postings(t).select(
                "doc_id", F.col("positions").alias(f"pos{i}")
            )
            joined = p if joined is None else joined.join(p.hint("SHUFFLE_HASH"), "doc_id")
        tf = _phrase_tf([F.col(f"pos{i}") for i in range(len(terms))])
        cand = joined.withColumn("tf", tf.cast("double")).where(F.col("tf") > 0)
        # Lucene PhraseQuery: idf = Σ term idfs; tf = phrase frequency.
        # Σidf stays IN the plan as a broadcast one-row aggregate (constant-key
        # equi-join → BroadcastHashJoin), not a driver-side .first(): no extra
        # action, and the phrase executor composes lazily like every other node.
        dfs = self.df_by_term.where(F.col("term").isin(terms))
        # the key must be computed from a column (x*0+1), not a literal:
        # a foldable key degrades the equi-join to BroadcastNestedLoopJoin
        sum_idf = dfs.agg(
            F.sum(idf_expr(F.col("df").cast("double"), self.ix.n_docs)).alias("_sum_idf")
        ).where(F.col("_sum_idf").isNotNull()).withColumn(
            "_k", (F.col("_sum_idf") * 0 + 1).cast("int")
        )
        cand = self.ix.doclens.join(cand.hint("SHUFFLE_HASH"), "doc_id")
        cand = cand.withColumn("_k", (F.col("tf") * 0 + 1).cast("int")).join(
            F.broadcast(sum_idf), "_k"
        )
        score = F.col("_sum_idf") * tf_norm_expr(
            F.col("tf"), F.col("dl").cast("double"), self.ix.avgdl
        )
        return cand.select("doc_id", score.alias("score"))

    def execute(self, node: QueryNode) -> DataFrame:
        """Returns (doc_id, score). Boolean scoring: sum of matching clause
        scores (AND = all required; OR = any; NOT = exclusion, contributes 0)."""
        if isinstance(node, TermNode):
            return self._term_scores(node.term)
        if isinstance(node, PhraseNode):
            return self._phrase_scores(list(node.terms))
        if isinstance(node, AndNode):
            # clause results are corpus-scaled (a clause can match most of the
            # corpus) and inherit doc_id partitioning — co-partitioned SHJ
            left = self.execute(node.left)
            right = self.execute(node.right)
            return (
                left.alias("l")
                .join(right.alias("r").hint("SHUFFLE_HASH"), "doc_id")
                .select("doc_id", (F.col("l.score") + F.col("r.score")).alias("score"))
            )
        if isinstance(node, OrNode):
            left, right = self.execute(node.left), self.execute(node.right)
            return (
                left.unionByName(right)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        if isinstance(node, NotNode):
            pos = self.execute(node.left)
            neg = self.execute(node.right).select("doc_id")
            return pos.join(neg.hint("SHUFFLE_HASH"), "doc_id", "left_anti")
        raise TypeError(f"unknown node {node!r}")


def bm25_search(
    index: FtsIndex, query: str, k: int, tie_break_asc: bool = True, round_to: int | None = None
) -> DataFrame:
    """T3: parse → execute → ORDER BY score DESC LIMIT k (tantivy.rs:272-274).
    Ties broken by doc_id for determinism (Tantivy breaks by internal doc id)."""
    ast = parse_query(query)
    scored = Bm25Executor(index).execute(ast)
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    order = [F.col("score").desc(), F.col("doc_id").asc() if tie_break_asc else F.col("doc_id").desc()]
    return scored.orderBy(*order).limit(k)


def _doclens_table(path: str) -> str:
    """Deterministic catalog name for a persisted index's bucketed doclens."""
    import hashlib

    return "fts_doclens_" + hashlib.md5(path.encode()).hexdigest()[:12]


def write_fts_index(index: FtsIndex, path: str, num_buckets: int = 32) -> None:
    """Persist the index in the serving layout: postings parquet partitioned
    by a term hash bucket (a term lookup prunes to ONE directory — the
    inverted-list locality Tantivy gets from its term dictionary), and doclens
    as a table BUCKETED on doc_id: the serving-time scoring join then
    exchanges ONLY the pruned inverted list, never the corpus-sized doclens —
    the disk-postings posture of the reference (tantivy.rs keeps postings and
    per-doc norms on disk; queries touch only the looked-up terms). Stats are
    re-aggregated on load (metadata-sized)."""
    import os

    from vector_store_spark.sources.index_store import fresh_dir, write_local_index

    postings = index.postings.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
    )
    spark = index.doclens.sparkSession
    tbl = _doclens_table(path)
    # directory/catalog prep stays serialized (idempotent persist: DROP on an
    # external table leaves its files, so clear the location too or the CTAS
    # below fails on a rewrite of the same path)
    fresh_dir(os.path.join(path, "postings"))  # full persist, not incremental
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    fresh_dir(os.path.join(path, "doclens_bucketed"))
    # the three layout legs are independent reads of the index's cached
    # frames (build_fts_index materializes postings/doclens before any
    # caller can persist) — submit them as CONCURRENT Spark jobs instead of
    # paying three sequential job latencies (local[n] schedules them onto
    # idle cores; on a cluster the scheduler interleaves stages the same way)
    from concurrent.futures import ThreadPoolExecutor

    def _w_postings():
        spark.sparkContext.setJobDescription("fts_persist: postings")
        write_local_index(postings, os.path.join(path, "postings"), ["term_bucket"])

    def _w_doclens():
        spark.sparkContext.setJobDescription("fts_persist: doclens CTAS")
        (
            index.doclens.repartition(num_buckets, F.col("doc_id"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "doc_id")
            .sortBy("doc_id")
            .option("path", os.path.join(path, "doclens_bucketed"))
            .saveAsTable(tbl)
        )

    # persist the corpus stats WITH the layout: N/avgdl to a sidecar
    # (metadata-sized) and per-term df as parquet (vocab-sized, term-pruned
    # lookups). Serving startup then reads a sidecar instead of re-scanning
    # corpus-sized postings/doclens — Tantivy likewise stores segment stats
    # in the committed index rather than recounting at open (tantivy.rs).
    import json

    def _w_df_by_term():
        spark.sparkContext.setJobDescription("fts_persist: df_by_term")
        index.df_by_term.write.mode("overwrite").parquet(
            os.path.join(path, "df_by_term"))

    with ThreadPoolExecutor(max_workers=3) as ex:
        for f in [ex.submit(w) for w in (_w_postings, _w_doclens, _w_df_by_term)]:
            f.result()  # propagate the first failure
    with open(os.path.join(path, "_fts_meta.json"), "w") as f:
        json.dump(
            {"n_docs": index.n_docs, "avgdl": index.avgdl,
             "num_buckets": num_buckets},
            f,
        )


def read_fts_index(spark, path: str, num_buckets: int = 32) -> FtsIndex:
    """Load a persisted index. Term lookups against ``postings`` carry the
    ``term_bucket`` column, so callers filtering on (term_bucket, term) get
    partition pruning; Bm25Executor's term filter composes with it. doclens
    comes back as the bucketed table (scans report HashPartitioning(doc_id),
    so scoring joins add no exchange on the corpus side); pre-bucketing
    layouts fall back to the plain parquet directory."""
    import os

    import json

    postings = spark.read.parquet(os.path.join(path, "postings"))
    tbl = _doclens_table(path)
    if spark.catalog.tableExists(tbl):
        doclens = spark.table(tbl)
    elif os.path.isdir(os.path.join(path, "doclens_bucketed")):
        # a NEW session reading a persisted dir: saveAsTable metadata is
        # session-scoped, so re-read the bucket files as plain parquet (the
        # values are identical; only the exchange-free partitioning report is
        # lost until re-registered)
        doclens = spark.read.parquet(os.path.join(path, "doclens_bucketed"))
    else:  # pre-bucketing layout
        doclens = spark.read.parquet(os.path.join(path, "doclens"))
    meta_path = os.path.join(path, "_fts_meta.json")
    if os.path.isfile(meta_path):
        # committed stats: open cost is a sidecar read + a vocab-sized scan,
        # NOT an O(corpus) re-aggregation of postings/doclens
        with open(meta_path) as f:
            meta = json.load(f)
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
        df_by_term = spark.read.parquet(os.path.join(path, "df_by_term")).cache()
    else:  # pre-sidecar layout: legacy re-aggregation
        n_docs, sum_dl = doclens.agg(F.count("*"), F.sum("dl")).first()
        avgdl = float(sum_dl) / n_docs if n_docs else 0.0
        df_by_term = postings.groupBy("term").agg(F.count("*").alias("df")).cache()
    # postings KEEP term_bucket: Bm25Executor's term lookups add the bucket
    # equality, so every query shape (term/AND/OR/NOT/phrase) scans only the
    # matching directories of the persisted layout
    return FtsIndex(
        postings, doclens, int(n_docs), avgdl, "doc_id", df_by_term,
        num_buckets=num_buckets,
    )


def persisted_term_postings(spark, path: str, term: str, num_buckets: int = 32):
    """The pruned single-term lookup: filter (term_bucket, term) so the scan
    reads one directory. Returns the matching postings DataFrame."""
    import pyspark.sql.functions as SF

    from vector_store_spark.functions.hashing import term_bucket

    postings = spark.read.parquet(f"{path}/postings")
    return postings.where(
        (SF.col("term_bucket") == term_bucket(term, num_buckets))
        & (SF.col("term") == term)
    )
