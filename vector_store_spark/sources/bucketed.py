"""Bucketed index storage: shuffle-free co-located joins (100 TB posture).

The reference co-locates index entries with their rows by construction — the
in-memory Table maps PrimaryId -> row in the same process
(table/mod.rs:431-443), so its id->key back-join (J1, usearch.rs:1083-1101) is
a pointer lookup. The Spark equivalent at 100 TB is **bucketing**: write both
sides `bucketBy(N, key) sortBy(key)`, and every equi-join/aggregation on the
key runs bucket-to-bucket — SortMergeJoin with *zero Exchange and zero Sort*
in the plan. That is the difference between an O(data) shuffle per join and
none at all: enrichment joins (embeddings <-> documents), CDC read-back merges
(S5/J2), and LWW compaction (A5) all reuse the same layout.

Tested with plan assertions (no Exchange/Sort under the join) in
tests/test_bucketed.py. Bucket metadata lives in the session catalog
(`saveAsTable`); a deployment would back it with a shared metastore.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist as a bucketed+sorted parquet table. ``num_buckets`` should be
    sized so a bucket of the LARGEST table fits an executor (at 100 TB:
    thousands of buckets; here 32 matches local cores)."""
    # Align write tasks with buckets (repartition on the same hash): one file
    # per bucket. Catalyst only trusts sortBy when a bucket is a single file —
    # multi-file buckets put a Sort back under every downstream join.
    from pyspark.sql import functions as F

    df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Equi-join two tables bucketed on ``on``: bucket-to-bucket, no shuffle,
    and — because write_bucketed leaves one sorted file per bucket — no
    per-partition Sort either. The scan only *reports* its sort order under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (off by default
    since Spark 3.0, SPARK-28169), so enable it for the session: with
    single-file sorted buckets it is strictly beneficial."""
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(left_table).join(spark.table(right_table), list(on))
