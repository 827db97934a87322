import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # smaller JVM for unit tests


@pytest.fixture(scope="session")
def spark():
    from vector_store_spark.session import get_spark

    s = get_spark("vector-store-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
