"""Core type vocabulary mirroring the reference's newtypes and options.

Reference: crates/vector-store/src/lib.rs:441-480 (SpaceType, Quantization),
lib.rs:499-505 (Limit), lib.rs:509-566 (Restriction), lib.rs:594-643
(IndexOptions / IndexMetadata), lib.rs:677-680 (partitioning).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Sequence


class SpaceType(enum.Enum):
    """Distance space. Reference lib.rs:441-447; parsed case-insensitively from the
    ``similarity_function`` index option (lib.rs:449-461)."""

    EUCLIDEAN = "euclidean"  # USearch L2sq — *squared* L2 (vs_index/usearch.rs:480-487)
    COSINE = "cosine"        # default
    DOT_PRODUCT = "dot_product"
    HAMMING = "hamming"

    @classmethod
    def parse(cls, s: str) -> "SpaceType":
        return cls(s.strip().lower())

    @classmethod
    def default(cls) -> "SpaceType":
        return cls.COSINE


class Quantization(enum.Enum):
    """Storage quantization. Reference lib.rs:468-480; B1 binarizes sign>0 into
    packed bits and forces Hamming (vs_index/usearch.rs:1179-1205, 450-487)."""

    F32 = "f32"
    F16 = "f16"
    BF16 = "bf16"
    I8 = "i8"
    B1 = "b1"

    @classmethod
    def default(cls) -> "Quantization":
        return cls.F32


class IndexKind(enum.Enum):
    """Vector vs full-text index. Reference lib.rs:609-612."""

    VECTOR = "vector"
    FTS = "fts"


# HNSW build defaults (moot for the exact strategy, kept for parity and for the
# LSH/IVF strategies' parameter plumbing). Reference lib.rs:394-438.
DEFAULT_CONNECTIVITY = 16
DEFAULT_EXPANSION_ADD = 128
DEFAULT_EXPANSION_SEARCH = 64
DEFAULT_LIMIT = 1  # lib.rs:501-505


class RestrictionOp(enum.Enum):
    """The 12 restriction forms. Reference lib.rs:509-558; wire tags
    httpapi/src/lib.rs:320-366. Conjunction-only (AND); no OR/NOT."""

    EQ = "=="
    IN = "IN"
    LT = "<"
    LTE = "<="
    GT = ">"
    GTE = ">="
    EQ_TUPLE = "()==()"
    IN_TUPLE = "()IN()"
    LT_TUPLE = "()<()"
    LTE_TUPLE = "()<=()"
    GT_TUPLE = "()>()"
    GTE_TUPLE = "()>=()"

    @property
    def is_tuple(self) -> bool:
        return self.name.endswith("_TUPLE")

    @property
    def is_equality(self) -> bool:
        """Eq-class ops (incl. IN) — used by routing classification
        (httproutes.rs:615-646)."""
        return self in (
            RestrictionOp.EQ,
            RestrictionOp.IN,
            RestrictionOp.EQ_TUPLE,
            RestrictionOp.IN_TUPLE,
        )


@dataclass(frozen=True)
class Restriction:
    """One predicate. ``columns`` has length 1 for scalar ops. ``values``:
    scalar ops hold one value (or a list for IN); tuple ops hold one tuple
    (or list of tuples for IN_TUPLE)."""

    op: RestrictionOp
    columns: tuple[str, ...]
    values: Any

    @staticmethod
    def eq(column: str, value: Any) -> "Restriction":
        return Restriction(RestrictionOp.EQ, (column,), value)

    @staticmethod
    def isin(column: str, values: Sequence[Any]) -> "Restriction":
        return Restriction(RestrictionOp.IN, (column,), tuple(values))

    @staticmethod
    def lt(column: str, value: Any) -> "Restriction":
        return Restriction(RestrictionOp.LT, (column,), value)

    @staticmethod
    def lte(column: str, value: Any) -> "Restriction":
        return Restriction(RestrictionOp.LTE, (column,), value)

    @staticmethod
    def gt(column: str, value: Any) -> "Restriction":
        return Restriction(RestrictionOp.GT, (column,), value)

    @staticmethod
    def gte(column: str, value: Any) -> "Restriction":
        return Restriction(RestrictionOp.GTE, (column,), value)

    @staticmethod
    def tuple_op(op: RestrictionOp, columns: Sequence[str], values: Any) -> "Restriction":
        return Restriction(op, tuple(columns), values)


@dataclass(frozen=True)
class IndexMetadata:
    """Reference lib.rs:632-643. ``partitioning`` None ⇒ global index; a tuple of
    column names ⇒ local (per-partition) index (lib.rs:677-680)."""

    keyspace: str
    index: str
    table: str
    primary_key_columns: tuple[str, ...]
    partition_key_count: int
    target_column: str
    kind: IndexKind = IndexKind.VECTOR
    partitioning: tuple[str, ...] | None = None
    filtering_columns: tuple[str, ...] = ()
    #: the reference's ``target_columns`` is a NON-EMPTY LIST (lib.rs:638):
    #: the first member is the scored column (monitor_indexes.rs:234 takes
    #: ``.first()`` for the vector), the remainder are additionally-indexed
    #: columns the CDC consumer reads and writetime-tracks
    #: (db_cdc/consumer.rs:95-110), and the ROUTING GROUP keys on the whole
    #: list (indexes.rs:70-78). Empty ⇒ just (target_column,).
    target_columns: tuple[str, ...] = ()
    version: str = "0"
    # vector options (lib.rs:594-601)
    dimensions: int | None = None
    space_type: SpaceType = SpaceType.COSINE
    quantization: Quantization = Quantization.F32
    connectivity: int = DEFAULT_CONNECTIVITY
    expansion_add: int = DEFAULT_EXPANSION_ADD
    expansion_search: int = DEFAULT_EXPANSION_SEARCH

    @property
    def partition_key_columns(self) -> tuple[str, ...]:
        return self.primary_key_columns[: self.partition_key_count]

    @property
    def all_target_columns(self) -> tuple[str, ...]:
        """The reference's non-empty target_columns list; the first member
        is the scored column."""
        if self.target_columns:
            if self.target_columns[0] != self.target_column:
                raise ValueError(
                    "target_columns[0] must equal target_column (the scored "
                    "column is the list head, monitor_indexes.rs:234)")
            return self.target_columns
        return (self.target_column,)

    @property
    def is_local(self) -> bool:
        return self.partitioning is not None


@dataclass(frozen=True)
class Filter:
    """A conjunction of restrictions plus the ALLOW FILTERING opt-in
    (httproutes.rs:751-758)."""

    restrictions: tuple[Restriction, ...] = ()
    allow_filtering: bool = False


class IndexStatus(enum.Enum):
    """Index lifecycle (node_state.rs:21-36, 107-165)."""

    INITIALIZING = "initializing"
    FULL_SCANNING = "full_scanning"   # bootstrapping; queries get 503 + progress
    SERVING = "serving"


@dataclass
class IndexState:
    metadata: IndexMetadata
    status: IndexStatus = IndexStatus.INITIALIZING
    scan_progress_pct: float = 0.0
