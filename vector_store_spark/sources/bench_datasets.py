"""Benchmark dataset sources: VectorDBBench parquet layouts and big-ann
``.fbin``/``.ibin`` binary layouts, with the reference's selectivity-bucket
strata.

Reference behavior re-expressed (crates/benchmark/src/data/mod.rs:26-47,
data/parquet.rs, data/fbin.rs):

- A dataset is a DIRECTORY. An optional ``dataset.toml`` picks the format
  (``[parquet]`` / ``[fbin]`` table) and overrides file/column names; no
  file (or no format table) means the default parquet layout.
- Parquet layout (VectorDBBench): train vectors in every file whose name
  contains ``train`` (columns ``id``, ``emb``), query vectors in
  ``test.parquet`` (row order = query id), ground truth in
  ``neighbors.parquet`` (``id``, ``neighbors_id`` list). Only queries that
  have a ground-truth row are used (parquet.rs:425-427).
- fbin layout (big-ann): each file starts with two little-endian u32s
  (count, dimension) followed by count·dimension little-endian values —
  f32 for vector files (``data_fbin``, ``query_fbin``), i32 for the
  ground-truth file (``query_ibin``, dimension = neighbors per query).
  Vector ids are implicit 0..count-1 (fbin.rs:53-66). Reading k < stored
  neighbors truncates per row and skips the rest (fbin.rs:108-146).
- Selectivity buckets (mod.rs:128-162): ids in order feed nine counters
  with periods [2,5,10,20,50,100,200,500,1000] (≈ strata 50 % … 0.1 %); a
  counter reaching its period claims the id for its bucket (first
  unclaimed wins) and resets. Persisted as ``buckets.bin`` rows of
  big-endian i64 id + u8 bucket (mod.rs:164-173 tokio write_i64 is BE).

Spark-first posture: the TRAIN side (the 100 TB side) is always a
DataFrame — parquet via the native reader (predicate/column pushdown
intact), fbin via a mapInPandas range reader where each task memory-maps
its own row slice (no driver materialization, no full-file shuffle).
Query/ground-truth files are benchmark-sized and load driver-side, same
as the reference harness.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import DataFrame, SparkSession

DATASET_FILENAME = "dataset.toml"
BUCKETS_FILENAME = "buckets.bin"

#: bucket index -> claim period; index i ≈ selectivity 1/period
BUCKET_PERIODS = (2, 5, 10, 20, 50, 100, 200, 500, 1000)
NO_BUCKET = 255  # u8::MAX sentinel: id belongs to no stratum


@dataclass
class ParquetConfig:
    ext: str = "parquet"
    train_file_pattern: str = "train"
    test_file_name: str = "test.parquet"
    neighbors_file_name: str = "neighbors.parquet"
    id_column: str = "id"
    embedding_column: str = "emb"
    neighbors_id_column: str = "neighbors_id"


@dataclass
class FbinConfig:
    data_fbin: str = "base.fbin"
    query_fbin: str = "query.fbin"
    query_ibin: str = "groundtruth.ibin"


@dataclass
class DatasetConfig:
    kind: str = "parquet"  # "parquet" | "fbin"
    parquet: ParquetConfig = field(default_factory=ParquetConfig)
    fbin: FbinConfig = field(default_factory=FbinConfig)


def read_dataset_config(path: str) -> DatasetConfig:
    """Parse ``dataset.toml``; absent file or format table = default parquet
    (mod.rs:110-126)."""
    toml_path = os.path.join(path, DATASET_FILENAME)
    if not os.path.exists(toml_path):
        return DatasetConfig()
    import tomllib

    with open(toml_path, "rb") as f:
        raw = tomllib.load(f)
    if "parquet" in raw:
        return DatasetConfig(kind="parquet", parquet=ParquetConfig(**raw["parquet"]))
    if "fbin" in raw:
        return DatasetConfig(kind="fbin", fbin=FbinConfig(**raw["fbin"]))
    return DatasetConfig()


# ---------------------------------------------------------------------------
# fbin primitives
# ---------------------------------------------------------------------------

_HEADER = struct.Struct("<II")  # count, dimension — little-endian u32 pair


def fbin_header(path: str) -> tuple[int, int]:
    with open(path, "rb") as f:
        return _HEADER.unpack(f.read(_HEADER.size))


def write_fbin(path: str, arr: np.ndarray) -> None:
    """Write a (count, dim) float32 array in big-ann fbin layout."""
    arr = np.ascontiguousarray(arr, dtype="<f4")
    with open(path, "wb") as f:
        f.write(_HEADER.pack(arr.shape[0], arr.shape[1]))
        f.write(arr.tobytes())


def write_ibin(path: str, arr: np.ndarray) -> None:
    """Write a (count, k) int32 ground-truth array in big-ann ibin layout."""
    arr = np.ascontiguousarray(arr, dtype="<i4")
    with open(path, "wb") as f:
        f.write(_HEADER.pack(arr.shape[0], arr.shape[1]))
        f.write(arr.tobytes())


def read_fbin(path: str, dtype: str = "<f4") -> np.ndarray:
    """Driver-side full read (benchmark-sized files: queries, ground truth)."""
    count, dim = fbin_header(path)
    data = np.fromfile(path, dtype=dtype, offset=_HEADER.size, count=count * dim)
    return data.reshape(count, dim)


def fbin_dataframe(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_partition: int = 100_000,
) -> DataFrame:
    """Distributed fbin reader: ``spark.range`` drives one task per row
    slice; each task memory-maps ONLY its slice of the file (offset
    arithmetic, no seek-per-row, no driver materialization). At 100 TB the
    file lives on a shared store and each of 1000 executors maps its own
    byte range — the same partitioned-scan shape as a parquet read, minus
    the footer metadata."""
    count, dim = fbin_header(path)
    header_size = _HEADER.size
    n_parts = max(1, (count + rows_per_partition - 1) // rows_per_partition)

    def read_slice(iterator):
        import pandas as pd

        for pdf in iterator:
            for part in pdf["id"].to_numpy():
                lo = int(part) * rows_per_partition
                hi = min(lo + rows_per_partition, count)
                if lo >= hi:
                    continue
                mm = np.memmap(
                    path, dtype="<f4", mode="r",
                    offset=header_size + lo * dim * 4, shape=(hi - lo, dim),
                )
                yield pd.DataFrame({
                    id_col: np.arange(lo, hi, dtype="int64"),
                    vec_col: [row.astype("float32") for row in np.asarray(mm)],
                })

    return (
        spark.range(n_parts).toDF("id")
        .repartition(n_parts)
        .mapInPandas(read_slice, f"{id_col} long, {vec_col} array<float>")
    )


# ---------------------------------------------------------------------------
# dataset-level API
# ---------------------------------------------------------------------------


def dataset_dimension(path: str, cfg: DatasetConfig | None = None) -> int:
    cfg = cfg or read_dataset_config(path)
    if cfg.kind == "fbin":
        return fbin_header(os.path.join(path, cfg.fbin.data_fbin))[1]
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(path, cfg.parquet.test_file_name))
    batch = next(pf.iter_batches(batch_size=1, columns=[cfg.parquet.embedding_column]))
    return len(batch.column(0)[0].as_py())


def train_dataframe(
    spark: SparkSession,
    path: str,
    cfg: DatasetConfig | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The indexable corpus as a DataFrame with standardized
    (vec_id long, embedding array<float>) columns."""
    from pyspark.sql import functions as F

    cfg = cfg or read_dataset_config(path)
    if cfg.kind == "fbin":
        return fbin_dataframe(spark, os.path.join(path, cfg.fbin.data_fbin),
                              id_col=id_col, vec_col=vec_col)
    p = cfg.parquet
    files = sorted(
        os.path.join(path, e) for e in os.listdir(path)
        if p.train_file_pattern in os.path.splitext(e)[0]
        and e.endswith("." + p.ext)
    )
    if not files:
        raise FileNotFoundError(f"no *{p.train_file_pattern}*.{p.ext} files in {path}")
    return (
        spark.read.parquet(*files)
        .select(
            F.col(p.id_column).cast("long").alias(id_col),
            F.col(p.embedding_column).cast("array<float>").alias(vec_col),
        )
    )


def load_queries(
    path: str,
    limit: int,
    cfg: DatasetConfig | None = None,
) -> list[tuple[int, list[float], set[int]]]:
    """(query_id, query_vector, ground-truth neighbor ids truncated to
    ``limit``) — driver-side, benchmark-sized, like the reference harness.
    Parquet: only queries with a ground-truth row (parquet.rs:425-427).
    fbin: limit is clamped to the stored neighbor count (fbin.rs:108-112)."""
    cfg = cfg or read_dataset_config(path)
    if cfg.kind == "fbin":
        q = read_fbin(os.path.join(path, cfg.fbin.query_fbin))
        gt = read_fbin(os.path.join(path, cfg.fbin.query_ibin), dtype="<i4")
        assert q.shape[0] == gt.shape[0], "query/ground-truth count mismatch"
        k = min(limit, gt.shape[1])
        return [
            (i, q[i].astype(float).tolist(), {int(x) for x in gt[i, :k]})
            for i in range(q.shape[0])
        ]
    import pyarrow.parquet as pq

    p = cfg.parquet
    test = pq.read_table(
        os.path.join(path, p.test_file_name), columns=[p.embedding_column]
    )
    vecs = test.column(0).to_pylist()
    neigh = pq.read_table(
        os.path.join(path, p.neighbors_file_name),
        columns=[p.id_column, p.neighbors_id_column],
    )
    gt = {
        int(i): {int(x) for x in ns[:limit]}
        for i, ns in zip(
            neigh.column(0).to_pylist(), neigh.column(1).to_pylist()
        )
    }
    return [
        (i, [float(x) for x in v], gt[i])
        for i, v in enumerate(vecs)
        if i in gt
    ]


# ---------------------------------------------------------------------------
# selectivity buckets (mod.rs:128-173)
# ---------------------------------------------------------------------------


def assign_buckets(n: int) -> np.ndarray:
    """Bucket per id for ids 0..n-1 — the reference's nine-counter sweep:
    every id increments every counter; the FIRST bucket (ascending index =
    descending selectivity) whose counter reaches its period claims a
    still-unclaimed id and resets its counter. Returns uint8 with
    ``NO_BUCKET`` for unclaimed ids.

    Sequential sweep by construction (counters carry across ids); at data
    scale the reference persists the result once (buckets.bin) rather than
    recomputing — mirror that with write_buckets_bin."""
    periods = BUCKET_PERIODS
    counts = [0] * len(periods)
    out = np.full(n, NO_BUCKET, dtype=np.uint8)
    for i in range(n):
        claimed = False
        for idx, period in enumerate(periods):
            counts[idx] += 1
            if not claimed and counts[idx] >= period and out[i] == NO_BUCKET:
                out[i] = idx
                counts[idx] -= period
                claimed = True
    return out


def write_buckets_bin(path: str, buckets: np.ndarray) -> None:
    """buckets.bin rows: big-endian i64 id + u8 bucket, unclaimed skipped."""
    rec = struct.Struct(">qB")
    with open(os.path.join(path, BUCKETS_FILENAME), "wb") as f:
        for i, b in enumerate(buckets):
            if b != NO_BUCKET:
                f.write(rec.pack(i, int(b)))


def read_buckets_bin(path: str) -> dict[int, int]:
    rec = struct.Struct(">qB")
    out: dict[int, int] = {}
    with open(os.path.join(path, BUCKETS_FILENAME), "rb") as f:
        while chunk := f.read(rec.size):
            i, b = rec.unpack(chunk)
            out[i] = b
    return out


# ---------------------------------------------------------------------------
# dataset writers (fixture/export side: build a layout other tools can read)
# ---------------------------------------------------------------------------


def write_parquet_dataset(
    path: str,
    train: np.ndarray,
    queries: np.ndarray,
    neighbors: np.ndarray,
    cfg: ParquetConfig | None = None,
) -> None:
    """Materialize a VectorDBBench-layout dataset directory from arrays:
    ``train.parquet`` (id, emb), ``test.parquet`` (emb, row order = query
    id), ``neighbors.parquet`` (id, neighbors_id list)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cfg = cfg or ParquetConfig()
    os.makedirs(path, exist_ok=True)
    emb_t = pa.list_(pa.float32())
    pq.write_table(
        pa.table({
            cfg.id_column: pa.array(range(train.shape[0]), pa.int64()),
            cfg.embedding_column: pa.array(
                [row.tolist() for row in train.astype("f4")], emb_t),
        }),
        os.path.join(path, f"{cfg.train_file_pattern}.{cfg.ext}"),
    )
    pq.write_table(
        pa.table({
            cfg.embedding_column: pa.array(
                [row.tolist() for row in queries.astype("f4")], emb_t),
        }),
        os.path.join(path, cfg.test_file_name),
    )
    pq.write_table(
        pa.table({
            cfg.id_column: pa.array(range(neighbors.shape[0]), pa.int64()),
            cfg.neighbors_id_column: pa.array(
                [row.tolist() for row in neighbors.astype("i8")],
                pa.list_(pa.int64()),
            ),
        }),
        os.path.join(path, cfg.neighbors_file_name),
    )


def write_fbin_dataset(
    path: str,
    train: np.ndarray,
    queries: np.ndarray,
    neighbors: np.ndarray,
    cfg: FbinConfig | None = None,
) -> None:
    """Materialize a big-ann-layout dataset directory (data/query fbin +
    ground-truth ibin + dataset.toml selecting the fbin format)."""
    cfg = cfg or FbinConfig()
    os.makedirs(path, exist_ok=True)
    write_fbin(os.path.join(path, cfg.data_fbin), train)
    write_fbin(os.path.join(path, cfg.query_fbin), queries)
    write_ibin(os.path.join(path, cfg.query_ibin), neighbors)
    with open(os.path.join(path, DATASET_FILENAME), "w") as f:
        f.write(
            "[fbin]\n"
            f'data_fbin = "{cfg.data_fbin}"\n'
            f'query_fbin = "{cfg.query_fbin}"\n'
            f'query_ibin = "{cfg.query_ibin}"\n'
        )


# ---------------------------------------------------------------------------
# TEXMEX fvecs/ivecs (the SIFT/GIST corpus format: no global header — every
# row is [i32 dim][dim little-endian values]; f32 for .fvecs, i32 for .ivecs;
# ids are implicit row positions, like fbin)
# ---------------------------------------------------------------------------


def fvecs_header(path: str, item_size: int = 4) -> tuple[int, int]:
    """(count, dim) of a uniform-dimension fvecs/ivecs file: dim from the
    first row's prefix, count from the file size (every row is
    4 + dim·item_size bytes; a size not divisible by the stride means a
    mixed-dimension or truncated file and is rejected)."""
    with open(path, "rb") as f:
        (dim,) = struct.unpack("<i", f.read(4))
    if dim <= 0:
        raise ValueError(f"{path}: non-positive fvecs dimension {dim}")
    stride = 4 + dim * item_size
    size = os.path.getsize(path)
    if size % stride:
        raise ValueError(
            f"{path}: size {size} not a multiple of row stride {stride} "
            "(mixed dimensions or truncated file)"
        )
    return size // stride, dim


def write_fvecs(path: str, arr: np.ndarray) -> None:
    a = np.asarray(arr, dtype="<f4")
    out = np.empty((a.shape[0], a.shape[1] + 1), dtype="<f4")
    out[:, 0] = np.full(a.shape[0], a.shape[1], dtype="<i4").view("<f4")
    out[:, 1:] = a
    with open(path, "wb") as f:
        out.tofile(f)


def write_ivecs(path: str, arr: np.ndarray) -> None:
    a = np.asarray(arr, dtype="<i4")
    out = np.empty((a.shape[0], a.shape[1] + 1), dtype="<i4")
    out[:, 0] = a.shape[1]
    out[:, 1:] = a
    with open(path, "wb") as f:
        out.tofile(f)


def read_fvecs(path: str) -> np.ndarray:
    """Driver-side full read (benchmark-sized files)."""
    count, dim = fvecs_header(path)
    raw = np.fromfile(path, dtype="<f4").reshape(count, dim + 1)
    return raw[:, 1:]


def read_ivecs(path: str) -> np.ndarray:
    count, dim = fvecs_header(path)
    raw = np.fromfile(path, dtype="<i4").reshape(count, dim + 1)
    return raw[:, 1:]


def fvecs_dataframe(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_partition: int = 100_000,
) -> DataFrame:
    """Distributed fvecs reader — same per-slice memory-map shape as
    fbin_dataframe (each task maps only its own byte range); the per-row
    i32 dim prefixes are validated against the file-level dimension inside
    the slice, so a corrupt row fails its task instead of silently
    misaligning every later row."""
    count, dim = fvecs_header(path)
    stride_vals = dim + 1  # f4 slots per row incl. the prefix
    n_parts = max(1, (count + rows_per_partition - 1) // rows_per_partition)

    def read_slice(iterator):
        import pandas as pd

        for pdf in iterator:
            for part in pdf["id"].to_numpy():
                lo = int(part) * rows_per_partition
                hi = min(lo + rows_per_partition, count)
                if lo >= hi:
                    continue
                mm = np.memmap(
                    path, dtype="<f4", mode="r",
                    offset=lo * stride_vals * 4, shape=(hi - lo, stride_vals),
                )
                rows = np.asarray(mm)
                dims = rows[:, 0].copy().view("<i4")
                if not (dims == dim).all():
                    bad = int(np.nonzero(dims != dim)[0][0])
                    raise ValueError(
                        f"{path}: row {lo + bad} has dim {int(dims[bad])}, "
                        f"expected {dim}"
                    )
                yield pd.DataFrame({
                    id_col: np.arange(lo, hi, dtype="int64"),
                    vec_col: [row.astype("float32") for row in rows[:, 1:]],
                })

    return (
        spark.range(n_parts).toDF("id")
        .repartition(n_parts)
        .mapInPandas(read_slice, f"{id_col} long, {vec_col} array<float>")
    )
