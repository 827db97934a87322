"""Streaming near-duplicate detection: an incrementally-maintained
MinHash/LSH band index over an append-only document stream.

The batch dedup path (operators/dedup.minhash_lsh_pairs) answers "which
pairs in this corpus are near-dups" in one pass. A training-data ingest
pipeline asks the incremental form: *as each batch of new documents
arrives, which of them duplicate anything already ingested?* — the shape
real crawl pipelines run, where re-scanning the standing corpus per batch
is not an option.

Per micro-batch (foreachBatch):

1. shingle-set + MinHash signature + band rows for the NEW docs only —
   per-batch work is batch-sized, never corpus-sized;
2. candidates = new band rows ⋈(band, bucket) (standing ∪ new) band rows —
   the standing side is read through the band-bucket parquet, so the join
   only touches buckets the new docs land in (a pair is discovered exactly
   once: when its LATER member arrives);
3. exact-Jaccard verify against the standing+new shingle sets (the same
   _verify_jaccard_pairs as the batch path — identical jaccard values);
4. verified pairs, the new sets, and the new band rows are committed under
   a ``_batch=<id>`` partition with dynamic partition overwrite, so a
   checkpoint-resume REPLAY of a batch overwrites its own output instead of
   duplicating it (same idempotence contract as streaming/fts).

End-state contract (pinned by the stream_neardup_endstate oracle): after
any batch split of the corpus, the accumulated pair set equals the batch
path's exhaustive-banding output on the full corpus — banding is
union-compatible, because a bucket co-occurrence exists iff the later
arrival's band row joins the earlier's standing row.

Reference: the reference maintains its ANN index incrementally from the CDC
stream (crates/vector-store/src/vs_index mod, index.rs add/remove); this
applies the same standing-index + micro-batch-delta shape to the dedup
operator family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_store_spark.functions.hashing import shingle_hashes_udf
from vector_store_spark.operators.dedup import (
    _verify_jaccard_pairs,
    minhash_band_rows,
    minhash_signature_sized,
)


class NearDupStreamSink:
    """foreachBatch sink maintaining the standing near-dup index at
    ``store_dir`` (sets/ bands/ pairs/, each partitioned by ``_batch``)."""

    def __init__(
        self,
        spark,
        store_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 12,
        bands: int = 4,
        threshold: float = 0.8,
    ) -> None:
        if num_hashes % bands != 0:
            raise ValueError("bands must divide num_hashes")
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_hashes, self.bands = n, num_hashes, bands
        self.threshold = threshold
        self.sets_dir = os.path.join(store_dir, "sets")
        self.bands_dir = os.path.join(store_dir, "bands")
        self.pairs_dir = os.path.join(store_dir, "pairs")

    def _read(self, d: str, schema: str) -> DataFrame:
        # the data lives under `_batch=<id>` partition dirs — only Spark's
        # own markers (_SUCCESS, _temporary, dotfiles) mean "no data yet"
        if os.path.isdir(d) and any(
            e.startswith("_batch=") or not e.startswith(("_", "."))
            for e in os.listdir(d)
        ):
            return self.spark.read.parquet(d)
        return self.spark.createDataFrame([], schema)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # replay idempotence wants DYNAMIC partition overwrite, but only for
        # THIS sink's commits — set per-write (DataFrameWriter option), never
        # session-wide, so unrelated overwrites in the same session keep the
        # default static semantics
        spark = self.spark
        # at-least-once source delivery: one row per id within the batch
        docs = batch.select(self.id_col, self.text_col).dropDuplicates(
            [self.id_col]
        )
        # NOT operators.dedup.shingle_sets: that helper caches internally
        # with no released handle — per-batch calls would leak one cache
        # entry per micro-batch over a long-running stream
        new_sets = (
            docs.select(
                F.col(self.id_col).alias("id"),
                shingle_hashes_udf(self.n)(F.col(self.text_col)).alias("hs"),
            )
            .where(F.size("hs") > 0)
            .cache()
        )
        # size-gated twin dispatch: micro-batches are batch-sized, so this
        # normally picks the expression form (same integers either way).
        # Probe the PRE-CACHE docs frame — new_sets is cached, and a cached
        # frame's inputFiles() is empty (would force the Arrow form).
        sig = new_sets.select(
            "id",
            minhash_signature_sized(
                docs, F.col("hs"), self.num_hashes
            ).alias("sig"),
        )
        new_bands = minhash_band_rows(sig, self.num_hashes, self.bands).cache()

        # a checkpoint-replay of a committed batch sees ITS OWN rows in the
        # standing store; without this exclusion the verify join would meet
        # each replayed id twice (standing + new) and fan pairs out 2×.
        # The anti-join's right side is batch-sized, so this is a bounded
        # exchange, not a corpus-wide dedupe.
        new_ids = new_sets.select("id")
        standing_sets = self._read(self.sets_dir, "id long, hs array<long>").join(
            new_ids.hint("SHUFFLE_HASH"), "id", "left_anti"
        )
        standing_bands = self._read(
            self.bands_dir, "id long, band int, bucket string"
        ).join(new_ids.hint("SHUFFLE_HASH"), "id", "left_anti")
        # the b side re-aliases EVERY column: it shares lineage with
        # new_bands (via the union), and a self-join with shared attribute
        # ids gets its duplicates deduplicated — `a.id != b.id` then
        # resolves both legs to the same attribute and is constant-false
        # (same trap documented at operators/dedup.embedding_neardup_pairs)
        all_bands = (
            standing_bands.select("id", "band", "bucket")
            .unionByName(new_bands)
            .select(
                F.col("id").alias("_oid"),
                F.col("band").alias("_oband"),
                F.col("bucket").alias("_obucket"),
            )
        )
        cand = (
            new_bands.join(
                all_bands,
                (F.col("band") == F.col("_oband"))
                & (F.col("bucket") == F.col("_obucket"))
                & (F.col("id") != F.col("_oid")),
            )
            .select(
                F.least("id", "_oid").alias("id_a"),
                F.greatest("id", "_oid").alias("id_b"),
            )
            .distinct()
        )
        all_sets = standing_sets.select("id", "hs").unionByName(new_sets)
        pairs = _verify_jaccard_pairs(cand, all_sets, self.threshold)

        # pairs FIRST: its plan reads the standing sets/bands directories,
        # which the two commits below overwrite (a parquet write invalidates
        # cached plans reading that path — order matters). It also
        # materializes the new_sets/new_bands caches (both feed the verify),
        # so the two store commits after it are independent cache-read +
        # write jobs — submit them concurrently
        from concurrent.futures import ThreadPoolExecutor

        def _commit(df: DataFrame, d: str) -> None:
            df.withColumn("_batch", F.lit(int(batch_id))).write.partitionBy(
                "_batch"
            ).option("partitionOverwriteMode", "dynamic").mode(
                "overwrite"
            ).parquet(d)

        _commit(pairs, self.pairs_dir)
        with ThreadPoolExecutor(max_workers=2) as ex:
            futs = [ex.submit(_commit, new_sets, self.sets_dir),
                    ex.submit(_commit, new_bands, self.bands_dir)]
            for f in futs:
                f.result()  # propagate the first failure
        new_sets.unpersist()
        new_bands.unpersist()

    def start(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def pairs(self) -> DataFrame:
        """The accumulated verified near-dup pairs (id_a < id_b, jaccard)."""
        return self._read(
            self.pairs_dir, "id_a long, id_b long, jaccard double"
        ).select("id_a", "id_b", "jaccard")


class QualityMonitorSink:
    """Streaming data-quality monitor: per micro-batch, per-source corpus
    statistics (doc count, char mass, mean composite quality) appended as a
    time series under ``_batch`` partitions — the ingest-health dashboard a
    crawl pipeline watches for drift (a source whose mean quality drops
    batch-over-batch is degrading upstream). Same idempotence contract as
    :class:`NearDupStreamSink`: a checkpoint replay overwrites its own
    partition, so the series never double-counts."""

    def __init__(self, spark, store_dir: str, id_col: str = "doc_id",
                 text_col: str = "text", source_col: str = "source",
                 round_to: int = 6) -> None:
        self.spark = spark
        self.stats_dir = os.path.join(store_dir, "quality_stats")
        self.id_col, self.text_col = id_col, text_col
        self.source_col, self.round_to = source_col, round_to

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from vector_store_spark.operators.textstats import quality_features

        docs = batch.select(
            self.id_col, self.text_col, self.source_col
        ).dropDuplicates([self.id_col])
        # quality_score is exact on the 1e-6 grid (integer construction), so
        # the per-source mean is an ORDER-INDEPENDENT integer sum divided
        # once — F.avg over doubles drifts under partial-agg association at
        # larger SFs (the sf1 stretch gate caught a 1e-6 mean split)
        q = quality_features(docs, self.id_col, self.text_col).select(
            self.id_col,
            F.round(F.col("quality_score") * 1000000).cast("long").alias("_q6"),
        )
        # per-doc quality ⋈ per-doc source: fact-fact within the batch
        stats = (
            docs.select(self.id_col, self.source_col,
                        F.length(self.text_col).alias("_len"))
            .join(q.hint("SHUFFLE_HASH"), self.id_col)
            .groupBy(self.source_col)
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("_len").cast("long").alias("n_chars"),
                F.round(
                    F.sum("_q6") / (F.count("*") * 1000000.0), self.round_to
                ).alias("mean_quality"),
            )
        )
        stats.withColumn("_batch", F.lit(int(batch_id))).write.partitionBy(
            "_batch"
        ).option("partitionOverwriteMode", "dynamic").mode(
            "overwrite"
        ).parquet(self.stats_dir)

    def start(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def series(self) -> DataFrame:
        """(batch, source, n_docs, n_chars, mean_quality) time series."""
        if os.path.isdir(self.stats_dir) and any(
            e.startswith("_batch=") or not e.startswith(("_", "."))
            for e in os.listdir(self.stats_dir)
        ):
            return self.spark.read.parquet(self.stats_dir).select(
                F.col("_batch").cast("int").alias("batch"),
                self.source_col, "n_docs", "n_chars", "mean_quality",
            )
        return self.spark.createDataFrame(
            [], f"batch int, {self.source_col} string, n_docs long, "
                "n_chars long, mean_quality double")
