"""Registry robustness: a broken queries_* module must fail all_queries()
loudly instead of silently shrinking the driver-visible query surface."""

from unittest import mock

import pytest

from vector_store_spark.registry import all_queries


def test_all_queries_registers_everything():
    qs = all_queries()
    assert len(qs) >= 83
    # every registered spec is well-formed
    for name, spec in qs.items():
        assert spec.name == name
        assert callable(spec.fn)


def test_module_list_matches_disk():
    """The hardcoded module list in all_queries() must cover every
    queries_*.py file on disk — a new family that isn't appended would
    otherwise be silently excluded from the driver-visible registry."""
    import pathlib

    import vector_store_spark
    from vector_store_spark import registry

    pkg_dir = pathlib.Path(vector_store_spark.__file__).parent
    on_disk = sorted(p.stem for p in pkg_dir.glob("queries_*.py"))
    src = pathlib.Path(registry.__file__).read_text()
    for mod in on_disk:
        assert f'"{mod}"' in src, (
            f"{mod}.py exists on disk but is missing from the module list "
            "in registry.all_queries()"
        )


def test_every_family_contributes_queries():
    """Each query family must register entries — a single global floor
    can't detect one family partially vanishing."""
    qs = all_queries()
    prefixes = {
        "ann_": 8, "filter_": 3, "lww_": 3, "events_": 3, "bm25_": 5,
        "dedup_": 6, "text_": 8, "mm_": 3, "star_": 4, "curation_": 2,
        "mix_": 3, "stream_": 3,
    }
    for prefix, floor in prefixes.items():
        n = sum(1 for name in qs if name.startswith(prefix))
        assert n >= floor, f"family {prefix}* has {n} queries, expected >= {floor}"


def test_load_events_on_real_testdata(spark, sf_dir):
    """Read the REAL driver-generated events.parquet so a driver-side schema
    change (TIMESTAMP(NANOS) vs timestamp[us]) fails here, in-repo, before it
    fails in CORRECTNESS. Regression test for the r4 `ts div 1000` crash."""
    from vector_store_spark.registry import load_events

    df = load_events(spark, sf_dir)
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    row = df.orderBy("event_id").limit(1).collect()[0]
    assert row["ts"] is not None


def test_load_events_nanos_vintage(spark, tmp_path):
    """Synthesize the OLD on-disk layout (TIMESTAMP(NANOS)) and prove the
    nanos branch still truncates to identical µs values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vector_store_spark.registry import load_events

    ns = [1700000000_123456789, 1700000001_987654321]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ns, pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"), store_schema=False)
    df = load_events(spark, str(d))
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    from pyspark.sql import functions as F

    got = [r[0] for r in df.orderBy("event_id").select(F.unix_micros("ts")).collect()]
    assert got == [n // 1000 for n in ns]


def test_broken_module_import_raises():
    import importlib

    real_import = importlib.import_module

    def poisoned(name, *a, **k):
        if name.endswith("queries_star"):
            raise ModuleNotFoundError("synthetic breakage for test")
        return real_import(name, *a, **k)

    with mock.patch("importlib.import_module", side_effect=poisoned):
        with pytest.raises(ImportError, match="queries_star"):
            all_queries()


def test_all_errors_collected_not_just_first():
    import importlib

    real_import = importlib.import_module

    def poisoned(name, *a, **k):
        if name.endswith(("queries_star", "queries_mix")):
            raise RuntimeError("synthetic breakage")
        return real_import(name, *a, **k)

    with mock.patch("importlib.import_module", side_effect=poisoned):
        with pytest.raises(ImportError) as ei:
            all_queries()
    assert "queries_star" in str(ei.value) and "queries_mix" in str(ei.value)
