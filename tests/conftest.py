from __future__ import annotations

import pytest

from my_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("my_crawler_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _reclaim_jvm_memory():
    """Drop any caches a module leaked (iterative-query caches, runner state)
    so a long single-process suite can't accumulate JVM heap across modules
    (the round-1 resume-test flake)."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()


@pytest.fixture(scope="session")
def fixtures():
    from my_crawler_spark.fixtures import make_all

    return make_all(seed=42, n_hosts=8, n_pages=200)
