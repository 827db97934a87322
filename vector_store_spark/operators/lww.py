"""Last-write-wins merge with tombstones — the reference's ingestion heart
(SURVEY.md §2.8 W3/W4, §2.4 A5).

Reference: crates/vector-store/src/table/mod.rs:624-660 (per-column LWW: a write
replaces the current cell only when its writetime is strictly greater — equal
timestamps do NOT replace), :697-1003 (UpdateWork algebra: upsert/delete/
tombstone/partition-move), timestamp.rs:13-19 (Timestamped values).

Batch re-expression: the reference applies events one at a time to mutable
state; a batch engine computes the *fixed point* directly. For each (key,
column) the surviving cell is the arg-max of events by ``(writetime, -seq)``:

- max writetime wins (LWW);
- on equal writetimes the event processed *first* wins ("equal ts does not
  replace"), hence the descending-seq tie-break;
- a delete event contributes a NULL cell at the delete timestamp (tombstone);
- an upsert carrying NULL for a column is a cell tombstone at its writetime
  (null target ⇒ not indexed: db_index.rs:700-713, validator crud.rs:269).

Partition moves (W4) need no special algebra in batch: the snapshot is simply
re-partitioned by the merged current values — a row whose partition-key cell
changed lands in its new partition, and partitions with zero live rows
disappear, reproducing table/mod.rs:237-285 without per-event bookkeeping.

Scale notes: one hash aggregation, partial (map-side) combine applies since
max_by is an algebraic aggregate; no window, no sort, one shuffle on the key.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _arg_max(value: Column, order: Column) -> Column:
    """max_by that does NOT skip null values: the value is boxed in a struct so
    a tombstone (null cell) can win."""
    return F.max_by(F.struct(value.alias("v")), order)["v"]


def lww_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    seq_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """A5: plain arg-max-by-timestamp dedup (no tombstones). One row per key
    with the values of the winning event."""
    order = F.struct(F.col(ts_col), (-F.col(seq_col)).alias("negseq"))
    aggs = [_arg_max(F.col(c), order).alias(c) for c in value_cols]
    return df.groupBy(*key_cols).agg(*aggs)


def lww_merge(
    events: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_value: str = "delete",
    writetime_cols: Mapping[str, str] | None = None,
    target_col: str | None = None,
    emit_writetimes: bool = False,
) -> DataFrame:
    """W3: merge an upsert/delete event stream into the current snapshot.

    ``writetime_cols`` maps value column → its per-column writetime column
    (defaults to ``ts_col`` for all), supporting the reference's independent
    per-column timestamps (FIXTURES.md F3). Delete events tombstone every
    column at the event timestamp.

    If ``target_col`` is given, rows whose merged target cell is tombstoned are
    dropped (a row is only indexed while its target value is live).
    """
    wt = dict(writetime_cols or {})
    is_delete = F.col(op_col) == F.lit(delete_value)
    aggs = []
    for c in value_cols:
        wt_col = F.col(wt.get(c, ts_col))
        eff_wt = F.when(is_delete, F.col(ts_col)).otherwise(F.coalesce(wt_col, F.col(ts_col)))
        cell = F.when(is_delete, F.lit(None)).otherwise(F.col(c))
        order = F.struct(eff_wt.alias("wt"), (-F.col(seq_col)).alias("negseq"))
        aggs.append(_arg_max(cell, order).alias(c))
        if emit_writetimes:
            aggs.append(F.max(order)["wt"].alias(f"{c}_writetime"))
    merged = events.groupBy(*key_cols).agg(*aggs)
    if target_col is not None:
        merged = merged.where(F.col(target_col).isNotNull())
    return merged
