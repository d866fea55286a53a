from __future__ import annotations

import os

import pytest

from dnscrawler_spark.session import get_spark

# One shared JVM serves ~15 fixture crawls across the suite; the 8g
# default driver heap accumulates cache/broadcast/shuffle state and the
# JVM can die late in a full run (py4j protocol errors on the LAST
# module's tests, each green standalone). 16g gives the session-long
# run the same headroom bench.py gives itself (20g).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")


@pytest.fixture(scope="session")
def spark():
    # local[8]: the suite is fixture-crawl latency-bound, and the fetch /
    # fused-pass stages use whatever cores exist; 8 threads on this
    # 32-core box cuts suite wall ~25% vs local[4] with identical plans
    s = get_spark(app_name="dnscrawler_spark_tests", master="local[8]", shuffle_partitions=4)
    yield s


@pytest.fixture(autouse=True, scope="module")
def _module_cache_hygiene():
    """Clear leftover cached frames between modules: a module that leaks
    a persist keeps its whole crawl lineage pinned in the shared JVM for
    the rest of the suite. Only touches an ALREADY-running session."""
    yield
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            s.catalog.clearCache()
    except Exception:
        pass
