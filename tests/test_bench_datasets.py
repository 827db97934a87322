"""Benchmark dataset sources: VectorDBBench parquet + big-ann fbin layouts,
round-tripped through the module's own writers, plus the selectivity-bucket
sweep pinned against a literal reimplementation.

Reference parity: crates/benchmark/src/data/{mod,parquet,fbin}.rs — header
layout, implicit fbin ids, neighbor truncation, query/ground-truth join,
bucket periods and claim order.
"""

import os
import struct

import numpy as np
import pytest

from vector_store_spark.sources.bench_datasets import (
    BUCKET_PERIODS,
    NO_BUCKET,
    assign_buckets,
    dataset_dimension,
    fbin_dataframe,
    fbin_header,
    load_queries,
    read_buckets_bin,
    read_dataset_config,
    read_fbin,
    train_dataframe,
    write_buckets_bin,
    write_fbin,
    write_fbin_dataset,
    write_ibin,
    write_parquet_dataset,
)


def _rng_data(n=120, d=8, q=7, k=5, seed=3):
    rng = np.random.default_rng(seed)
    train = rng.standard_normal((n, d)).astype("f4")
    queries = rng.standard_normal((q, d)).astype("f4")
    # exact L2 ground truth
    d2 = ((queries[:, None, :] - train[None, :, :]) ** 2).sum(-1)
    neighbors = np.argsort(d2, axis=1)[:, :k].astype("i4")
    return train, queries, neighbors


def test_fbin_header_and_roundtrip(tmp_path):
    train, _, _ = _rng_data()
    p = str(tmp_path / "base.fbin")
    write_fbin(p, train)
    # header: two little-endian u32s, then dense f32 LE rows (fbin.rs:30-45)
    with open(p, "rb") as f:
        raw = f.read(8)
    assert struct.unpack("<II", raw) == (120, 8)
    assert os.path.getsize(p) == 8 + 120 * 8 * 4
    assert fbin_header(p) == (120, 8)
    back = read_fbin(p)
    np.testing.assert_array_equal(back, train)


def test_fbin_dataset_load_queries_truncates(tmp_path):
    train, queries, neighbors = _rng_data()
    d = str(tmp_path / "ds")
    write_fbin_dataset(d, train, queries, neighbors)
    cfg = read_dataset_config(d)
    assert cfg.kind == "fbin"
    assert dataset_dimension(d) == 8
    # limit below stored k truncates PER ROW (fbin.rs:108-146)
    qs = load_queries(d, limit=3)
    assert len(qs) == 7
    for qid, vec, gt in qs:
        assert len(vec) == 8
        assert gt == {int(x) for x in neighbors[qid, :3]}
    # limit above stored k clamps to stored k
    qs_all = load_queries(d, limit=99)
    assert all(len(gt) == len(set(neighbors[i])) for i, _, gt in qs_all)


def test_fbin_dataframe_matches_driver_read(spark, tmp_path):
    train, _, _ = _rng_data(n=257, d=6)
    p = str(tmp_path / "big.fbin")
    write_fbin(p, train)
    # multiple slices (rows_per_partition < n) — each task maps its own range
    df = fbin_dataframe(spark, p, rows_per_partition=100)
    rows = {r.vec_id: r.embedding for r in df.collect()}
    assert len(rows) == 257
    for i in (0, 99, 100, 256):
        np.testing.assert_allclose(rows[i], train[i], rtol=0, atol=0)


def test_parquet_dataset_roundtrip(spark, tmp_path):
    train, queries, neighbors = _rng_data()
    d = str(tmp_path / "vdb")
    write_parquet_dataset(d, train, queries, neighbors)
    cfg = read_dataset_config(d)  # no dataset.toml -> default parquet layout
    assert cfg.kind == "parquet"
    assert dataset_dimension(d) == 8
    df = train_dataframe(spark, d)
    assert df.columns == ["vec_id", "embedding"]
    rows = {r.vec_id: r.embedding for r in df.collect()}
    assert len(rows) == 120
    np.testing.assert_allclose(rows[11], train[11])
    qs = load_queries(d, limit=5)
    assert len(qs) == 7
    for qid, vec, gt in qs:
        np.testing.assert_allclose(vec, queries[qid], rtol=1e-6)
        assert gt == {int(x) for x in neighbors[qid]}


def test_parquet_queries_require_ground_truth(tmp_path):
    # a query row without a neighbors row is dropped (parquet.rs:425-427)
    train, queries, neighbors = _rng_data()
    d = str(tmp_path / "vdb2")
    write_parquet_dataset(d, train, queries, neighbors[:4])
    qs = load_queries(d, limit=5)
    assert [qid for qid, _, _ in qs] == [0, 1, 2, 3]


def test_bucket_sweep_matches_reference_literal():
    """Pin assign_buckets against a direct transliteration of the reference
    counter sweep (mod.rs:128-162)."""
    n = 5000
    got = assign_buckets(n)

    counts = [0] * len(BUCKET_PERIODS)
    want = [NO_BUCKET] * n
    for i in range(n):
        for idx, period in enumerate(BUCKET_PERIODS):
            counts[idx] += 1
            if want[i] == NO_BUCKET and counts[idx] >= period:
                want[i] = idx
                counts[idx] -= period
    assert got.tolist() == want
    # stratum sizes approximate their selectivities: bucket 0 claims ~1/2
    # of ids net of earlier... bucket 0 IS the earliest, so exactly ~n/2
    sizes = {b: int((got == b).sum()) for b in range(len(BUCKET_PERIODS))}
    assert sizes[0] == n // 2
    assert 0 < sizes[8] <= n // 1000 + 1


def test_buckets_bin_roundtrip(tmp_path):
    buckets = assign_buckets(300)
    write_buckets_bin(str(tmp_path), buckets)
    # record layout: big-endian i64 + u8 (tokio write_i64/write_u8)
    with open(tmp_path / "buckets.bin", "rb") as f:
        i, b = struct.unpack(">qB", f.read(9))
    first_claimed = next(j for j in range(300) if buckets[j] != NO_BUCKET)
    assert (i, b) == (first_claimed, buckets[first_claimed])
    back = read_buckets_bin(str(tmp_path))
    assert back == {i: int(b) for i, b in enumerate(buckets) if b != NO_BUCKET}


def test_fvecs_roundtrip_and_distributed_read(spark, tmp_path):
    import numpy as np

    from vector_store_spark.sources import bench_datasets as bd

    a = (np.arange(60, dtype="f4").reshape(10, 6) - 30) / 7
    p = str(tmp_path / "t.fvecs")
    bd.write_fvecs(p, a)
    assert bd.fvecs_header(p) == (10, 6)
    assert np.array_equal(bd.read_fvecs(p), a)
    # distributed slice reader: multiple partitions, implicit ids, exact f32
    rows = (
        bd.fvecs_dataframe(spark, p, rows_per_partition=3)
        .orderBy("vec_id").collect()
    )
    assert [r.vec_id for r in rows] == list(range(10))
    got = np.array([r.embedding for r in rows], dtype="f4")
    assert np.array_equal(got, a)


def test_ivecs_roundtrip(tmp_path):
    import numpy as np

    from vector_store_spark.sources import bench_datasets as bd

    gt = np.arange(12, dtype="i4").reshape(4, 3)
    p = str(tmp_path / "gt.ivecs")
    bd.write_ivecs(p, gt)
    assert np.array_equal(bd.read_ivecs(p), gt)


def test_fvecs_rejects_malformed_files(spark, tmp_path):
    import numpy as np
    import pytest

    from vector_store_spark.sources import bench_datasets as bd

    # truncated file: size not a stride multiple
    p = str(tmp_path / "bad.fvecs")
    bd.write_fvecs(p, np.ones((3, 4), dtype="f4"))
    with open(p, "ab") as f:
        f.write(b"\x00\x00")
    with pytest.raises(ValueError, match="stride"):
        bd.fvecs_header(p)
    # mixed dimensions: a row whose prefix disagrees fails the reading TASK
    # (misalignment must not silently shift every later row)
    p2 = str(tmp_path / "mixed.fvecs")
    ok = np.ones((4, 4), dtype="<f4")
    with open(p2, "wb") as f:
        for i, row in enumerate(ok):
            dim = 4 if i != 2 else 3
            np.array([dim], dtype="<i4").tofile(f)
            row[: 4 if i != 2 else 3].astype("<f4").tofile(f)
        f.write(b"\x00" * 4)  # pad back to a stride multiple
    with pytest.raises(Exception) as ei:
        bd.fvecs_dataframe(spark, p2, rows_per_partition=10).collect()
    assert "dim" in str(ei.value)
