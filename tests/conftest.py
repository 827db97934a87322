import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # smaller JVM for unit tests

#: heavy Spark-session families auto-marked ``slow`` (suite tiering: the
#: default `pytest -q` run excludes them via addopts; `pytest -q -m ""`
#: runs the full suite — see .claude/skills/verify/SKILL.md)
_SLOW_MODULES = {
    "test_streaming",
    "test_streaming_fts",
    "test_streaming_neardup",
    "test_trained_ann",
    "test_hnsw",
    "test_model_based",
    "test_stateful",
    "test_dedup",
    "test_fts",
    "test_engine_strategies",
    "test_admission",
    # r17 tier rebalance (VERDICT r16 #7): the plan-ban suite's session
    # fixture explains ALL 187 registry queries (eager entries build real
    # indexes) — 122 s of a 362 s default tier on a capacity-clean host.
    # It is a heavy Spark-session family by the definition above; the full
    # tier (`pytest -q -m ""`) still runs it before every round snapshot.
    "test_plans",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from vector_store_spark.session import get_spark

    s = get_spark("vector-store-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
