from __future__ import annotations

import pytest

from dnscrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # local[8]: the suite is fixture-crawl latency-bound, and the fetch /
    # fused-pass stages use whatever cores exist; 8 threads on this
    # 32-core box cuts suite wall ~25% vs local[4] with identical plans
    s = get_spark(app_name="dnscrawler_spark_tests", master="local[8]", shuffle_partitions=4)
    yield s
