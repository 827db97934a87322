"""Index catalog: discovery diff + lifecycle state machine + progress
(SURVEY.md §2.1 S7, §2.10 R5, §2.8 W7/A4/W5).

Reference flow (monitor_indexes.rs:48-153): poll ``system_schema.indexes``,
parse metadata, diff discovered-vs-active (HashSet difference,
monitor_indexes.rs:112-128), add/remove index builds; a changed
``index_version`` (ALTER INDEX) means drop-and-rebuild. Node and index states
gate queries with 503-style errors carrying scan progress
(httproutes.rs:778-805, httpapi/src/lib.rs:130-140).

Spark re-expression: the catalog is a small DataFrame; the diff is a pair of
``left_anti`` joins on (keyspace, index) keys with a version comparison —
metadata-scale work that still runs as a declarative plan so it composes with
catalog sources of any size (e.g. a lakehouse information_schema).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_store_spark.types import IndexMetadata, IndexState, IndexStatus

CATALOG_SCHEMA = (
    "keyspace string, index_name string, table_name string, "
    "target_column string, version string, kind string, "
    # vector index options (lib.rs:594-601) — the full CREATE INDEX option
    # set round-trips through the catalog, including the graph-ANN knobs
    # (connectivity / expansion_add / expansion_search, usearch.rs:74-92).
    # With the hnsw strategy (operators/hnsw) all three are consumed
    # directly: connectivity ↦ build m, expansion_add ↦ ef_construction,
    # expansion_search ↦ the query beam width. For the IVF/LSH/PQ engines
    # expansion_search maps to the probe-breadth knob (engine.py nprobe
    # derivation) and the two build knobs have no analogue — recorded here
    # so registrations round-trip either way.
    "dimensions int, space_type string, quantization string, "
    "connectivity int, expansion_add int, expansion_search int, "
    # the full non-empty target-column LIST (lib.rs:638): head = the scored
    # column (duplicated in target_column for pre-list consumers), tail =
    # additionally-indexed columns the CDC consumer reads
    "target_columns array<string>"
)

_KEYS = ["keyspace", "index_name"]


def catalog_df(spark: SparkSession, metas: list[IndexMetadata]) -> DataFrame:
    rows = [
        (
            m.keyspace, m.index, m.table, m.target_column, m.version or "",
            m.kind.value, m.dimensions, m.space_type.value, m.quantization.value,
            m.connectivity, m.expansion_add, m.expansion_search,
            list(m.all_target_columns),
        )
        for m in metas
    ]
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def metas_from_catalog(df: DataFrame) -> list[IndexMetadata]:
    """Round-trip the catalog rows back into IndexMetadata (the CREATE
    INDEX-shaped registration surface): every stored option — including the
    graph-ANN knobs — survives df → metadata → df unchanged. Key/partition
    shape is not stored in the catalog (it lives on the table), so the
    reconstructed metadata carries the target column addressing only."""
    from vector_store_spark.types import IndexKind, Quantization, SpaceType

    return [
        IndexMetadata(
            keyspace=r.keyspace, index=r.index_name, table=r.table_name,
            primary_key_columns=(), partition_key_count=0,
            target_column=r.target_column, version=r.version,
            kind=IndexKind(r.kind), dimensions=r.dimensions,
            space_type=SpaceType(r.space_type),
            quantization=Quantization(r.quantization),
            connectivity=r.connectivity, expansion_add=r.expansion_add,
            expansion_search=r.expansion_search,
            # singleton list == the scored column collapses to the default
            # so single-target registrations stay a round-trip fixed point
            target_columns=(
                tc if (tc := tuple(r.target_columns or ())) != (r.target_column,)
                else ()
            ),
        )
        for r in df.collect()
    ]


@dataclass
class CatalogDiff:
    to_add: list[tuple[str, str]]      # (keyspace, index_name)
    to_remove: list[tuple[str, str]]
    to_rebuild: list[tuple[str, str]]  # version changed (ALTER INDEX, R5)


def diff_catalog(discovered: DataFrame, active: DataFrame) -> CatalogDiff:
    """discovered ∖ active → add; active ∖ discovered → remove; key-matched but
    version-changed → rebuild (drop + add). Two anti-joins + one equi-join,
    all broadcastable (catalogs are metadata-sized)."""
    d, a = discovered.alias("d"), active.alias("a")
    add = d.join(F.broadcast(a), _KEYS, "left_anti")
    remove = a.join(F.broadcast(d), _KEYS, "left_anti")
    rebuild = (
        d.join(F.broadcast(a.select(*_KEYS, F.col("version").alias("_av"))), _KEYS)
        .where(F.col("version") != F.col("_av"))
    )
    key = lambda df: [(r.keyspace, r.index_name) for r in df.select(*_KEYS).collect()]
    return CatalogDiff(key(add), key(remove), key(rebuild))


class NodeStatus(enum.Enum):
    """Node bootstrap state machine (node_state.rs:21-36)."""

    INITIALIZING = "initializing"
    CONNECTING_TO_DB = "connecting_to_db"
    DISCOVERING_INDEXES = "discovering_indexes"
    INDEXING_EMBEDDINGS = "indexing_embeddings"
    SERVING = "serving"


_NODE_ORDER = list(NodeStatus)


class NotServingError(Exception):
    """503-style gate: carries the machine-readable code + progress the
    reference returns (httpapi/src/lib.rs:130-140, 213-230)."""

    def __init__(self, code: str, progress_pct: float | None = None):
        self.code = code
        self.progress_pct = progress_pct
        msg = code if progress_pct is None else f"{code} ({progress_pct:.1f}%)"
        super().__init__(msg)


@dataclass
class NodeState:
    status: NodeStatus = NodeStatus.INITIALIZING

    def advance(self, to: NodeStatus) -> None:
        if _NODE_ORDER.index(to) < _NODE_ORDER.index(self.status):
            raise ValueError(f"cannot move backwards {self.status} -> {to}")
        self.status = to

    def check_serving(self) -> None:
        if self.status != NodeStatus.SERVING:
            raise NotServingError("NODE_BOOTSTRAPPING")


def check_index_serving(state: IndexState) -> None:
    """Index-level gate: 503 INDEX_BUILDING with scan progress % (A4:
    completed token-range fraction, db_index.rs:439-490) until Serving."""
    if state.status != IndexStatus.SERVING:
        raise NotServingError("INDEX_BUILDING", state.scan_progress_pct)


@dataclass
class ScanProgress:
    """A4: full-scan progress as completed-fraction of the input (the token
    ring in the reference; input rows/files here). Promotes the index to
    Serving when complete (db_index.rs:220-248)."""

    total: int
    done: int = 0

    def record(self, n: int) -> None:
        self.done = min(self.total, self.done + n)

    @property
    def pct(self) -> float:
        return 100.0 * self.done / self.total if self.total else 100.0

    def apply_to(self, state: IndexState) -> None:
        state.scan_progress_pct = self.pct
        if self.done >= self.total and state.status != IndexStatus.SERVING:
            state.status = IndexStatus.SERVING


@dataclass
class IndexingLagMetrics:
    """W5: CDC→searchable lag, the reference's AsyncInProgress histogram
    (async_in_progress.rs). Attach ``listener()`` to a SparkSession to record
    per-micro-batch durations and input counts from StreamingQueryProgress."""

    batch_durations_ms: list[float] = field(default_factory=list)
    rows_per_batch: list[int] = field(default_factory=list)

    def on_progress(self, progress) -> None:
        # accepts pyspark StreamingQueryProgress or a dict (tests)
        get = progress.get if isinstance(progress, dict) else lambda k: getattr(progress, k)
        dur = get("batchDuration")
        rows = get("numInputRows")
        if dur is not None:
            self.batch_durations_ms.append(float(dur))
        if rows is not None:
            self.rows_per_batch.append(int(rows))

    def summary(self) -> dict:
        ds = sorted(self.batch_durations_ms)
        n = len(ds)
        return {
            "batches": n,
            "rows": sum(self.rows_per_batch),
            "p50_ms": ds[n // 2] if n else None,
            "max_ms": ds[-1] if n else None,
        }

    def listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        metrics = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                metrics.on_progress(
                    {"batchDuration": p.batchDuration, "numInputRows": p.numInputRows}
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _L()
