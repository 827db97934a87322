"""Raw-corpus ingestion: schema-enforced JSONL reading with corrupt-row
quarantine.

Crawl/export pipelines deliver JSONL with a real defect rate — truncated
lines, invalid escapes, type drift. The production posture is Spark's
PERMISSIVE mode with ``columnNameOfCorruptRecord``: well-formed rows parse
against the declared schema, every malformed line lands intact in the
quarantine column (one scan, no second pass, no job failure), and the
pipeline forks kept/quarantined from the same DataFrame. FAILFAST (abort
the 100 TB job on one bad line) and DROPMALFORMED (silently lose data, no
audit trail) are both wrong at scale; quarantine keeps the bad bytes
replayable.

The reference ingests via CDC rows already validated by the database
(crates/vector-store/src/db_cdc); a from-raw-files pipeline needs this
gate in front of everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(parsed, quarantined, handle) from a JSONL path: ``parsed`` carries
    only rows that satisfied ``schema``; ``quarantined`` carries the raw text
    of every malformed line (for audit/replay). One PERMISSIVE scan feeds
    both. ``handle`` is the internally-cached scan — the CALLER owns its
    lifetime and must ``handle.unpersist()`` once both forks are consumed
    (repeated calls would otherwise each leak a cache entry)."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark requires the corrupt-column branch to be materialized from a
        # checkpointed/cached plan when referenced with filters — caching the
        # narrow parsed frame once serves both forks
        .cache()
    )
    parsed = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return parsed, quarantined, df
