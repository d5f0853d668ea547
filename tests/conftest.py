from __future__ import annotations

import pytest

from my_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("my_crawler_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixtures():
    from my_crawler_spark.fixtures import make_all

    return make_all(seed=42, n_hosts=8, n_pages=200)
