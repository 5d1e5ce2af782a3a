from __future__ import annotations

import pytest

from ccm_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ccm_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"
