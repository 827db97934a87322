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
