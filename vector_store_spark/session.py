"""SparkSession factory for local development and tests.

The driver supplies its own session to ``__spark_entry__.entry``; this builder is
for tests and bench.py. Settings are chosen for local[32] but the engine code
itself never assumes a master — on a real cluster only partition counts change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector-store-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = shuffle_partitions or int(os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        # FAIR so concurrent client threads (bench topk_qps_concurrent_*;
        # any multi-tenant driver) timeshare the executor instead of
        # FIFO-queueing whole jobs; with one job at a time it schedules
        # identically to FIFO, so single-stream numbers are unaffected
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir_path: str, name: str):
    return spark.read.parquet(f"{sf_dir_path}/{name}.parquet")
