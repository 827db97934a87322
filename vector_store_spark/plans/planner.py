"""Index routing and query planning (SURVEY.md §2.10 R1–R4, §2.2 P5/P6).

Reference: crates/vector-store/src/indexes.rs:63-78 (routing groups), :203-238
(scoring), :272-289/:373-431 (best-index selection); httproutes.rs:615-646
(eq/range classification), :751-758 (ALLOW FILTERING gate);
table/mod.rs:1280-1316 (partition key assembly + predicate consumption).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from vector_store_spark.plans.restrictions import FilterError
from vector_store_spark.types import Filter, IndexMetadata, IndexState, IndexStatus, Restriction, RestrictionOp


class NeedsFiltering(enum.Enum):
    NO = 0
    YES = 1


@dataclass(frozen=True)
class IndexScore:
    needs_filtering: NeedsFiltering
    uncovered: int  # restrictions the index must post-filter (fewer = better)

    def better_than(self, other: "IndexScore") -> bool:
        if self.needs_filtering != other.needs_filtering:
            return self.needs_filtering == NeedsFiltering.NO
        return self.uncovered < other.uncovered


def classify_restrictions(flt: Filter) -> tuple[set[str], set[str]]:
    """Split restriction columns into equality vs range sets (P6,
    httproutes.rs:615-646)."""
    eq_cols: set[str] = set()
    range_cols: set[str] = set()
    for r in flt.restrictions:
        target = eq_cols if r.op.is_equality else range_cols
        target.update(r.columns)
    return eq_cols, range_cols


def score_index(meta: IndexMetadata, eq_cols: set[str], range_cols: set[str]) -> IndexScore | None:
    """R2 (indexes.rs:203-238). None ⇒ index cannot serve the query:
    a restriction column isn't covered, or a local index's partition-key
    columns aren't all equality-restricted."""
    covered = set(meta.primary_key_columns) | set(meta.filtering_columns)
    restricted = eq_cols | range_cols
    if not restricted <= covered:
        return None
    consumed: set[str] = set()
    if meta.is_local:
        part_cols = set(meta.partitioning or ())
        if not part_cols <= eq_cols:
            return None  # local index needs full partition key by equality
        consumed = part_cols
    uncovered = len(restricted - consumed)
    return IndexScore(NeedsFiltering.NO if uncovered == 0 else NeedsFiltering.YES, uncovered)


def best_index(candidates: list[IndexState], flt: Filter) -> tuple[IndexState, IndexScore]:
    """R3 (indexes.rs:272-289, 373-431): among Serving candidates pick the best
    score; ties broken by newest version. Raises FilterError mirroring the
    reference's NotFound / NotServing / NoGlobalIndex outcomes."""
    if not candidates:
        raise FilterError("index not found")
    eq_cols, range_cols = classify_restrictions(flt)
    serving = [c for c in candidates if c.status == IndexStatus.SERVING]
    if not serving:
        prog = max((c.scan_progress_pct for c in candidates), default=0.0)
        raise FilterError(f"INDEX_BUILDING: no serving index (progress {prog:.0f}%)")
    scored: list[tuple[IndexState, IndexScore]] = []
    for c in serving:
        s = score_index(c.metadata, eq_cols, range_cols)
        if s is not None:
            scored.append((c, s))
    if not scored:
        # distinguishes the reference's "no global index" 400 (httproutes.rs:768-777)
        if all(c.metadata.is_local for c in serving):
            raise FilterError("no global index: local index requires equality on its partition key")
        raise FilterError("no index covers the restricted columns")
    best = scored[0]
    for cand in scored[1:]:
        if cand[1].better_than(best[1]) or (
            not best[1].better_than(cand[1]) and cand[0].metadata.version > best[0].metadata.version
        ):
            best = cand
    return best


def check_allow_filtering(score: IndexScore, flt: Filter) -> None:
    """P5 (httproutes.rs:751-758)."""
    if score.needs_filtering == NeedsFiltering.YES and not flt.allow_filtering:
        raise FilterError("requires ALLOW FILTERING")


def consume_partition_restrictions(
    meta: IndexMetadata, flt: Filter
) -> tuple[list[Restriction], list[Restriction]]:
    """R4 (table/mod.rs:1280-1316): for a local index, split restrictions into
    (partition-key equality restrictions, residual). The partition restrictions
    are *consumed* — applied as partition pruning, not re-checked per row."""
    if not meta.is_local:
        return [], list(flt.restrictions)
    part_cols = set(meta.partitioning or ())
    consumed: list[Restriction] = []
    residual: list[Restriction] = []
    for r in flt.restrictions:
        if r.op in (RestrictionOp.EQ, RestrictionOp.IN) and r.columns[0] in part_cols:
            consumed.append(r)
        elif r.op in (RestrictionOp.EQ_TUPLE, RestrictionOp.IN_TUPLE) and set(r.columns) <= part_cols:
            consumed.append(r)
        else:
            residual.append(r)
    if {c for r in consumed for c in r.columns} != part_cols:
        raise FilterError("local index requires equality restrictions on all partition-key columns")
    return consumed, residual
