from __future__ import annotations

import pytest

from dnscrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dnscrawler_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
