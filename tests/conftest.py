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
    s = get_spark(
        app_name="dnscrawler_spark_tests",
        master="local[8]",
        shuffle_partitions=4,
        # one JVM serves the whole suite (~15 fixture crawls): force the
        # ContextCleaner's periodic full GC well below its 30min default
        # so dead broadcast/RDD state is reclaimed DURING the run — a
        # long-lived local JVM otherwise accumulates heap state that
        # skews late-suite latency up to 2x (BENCH.md §0.8 / NOTES_r5)
        extra_conf={"spark.cleaner.periodicGC.interval": "3min"},
    )
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


# Cheap 2-shard/2-partition state layout for config-variant crawls —
# layout-only knobs (admission order and every parity assertion are
# layout-independent; module fixtures keep the wide 8/4 layout so shard
# routing stays covered at width >2). One constant, consumed by
# test_crawl_parity / test_stratified / test_fuzz_parity.
CHEAP_CRAWL_LAYOUT = dict(
    seen_shards=2, seen_bits=1 << 16, seen_buckets=1 << 10, partitions=2
)


@pytest.fixture(scope="module")
def crawl_conf(spark):
    """Crawl-time session conf for fixture crawls (exactly what bench.py
    and the __spark_entry__ probes set): AQE off — its per-exchange
    materialization barriers are pure latency on a 240-page crawl's
    known shapes — and a narrow fixed shuffle width. Layout-only; the
    crawl modules' assertions are value parity. Request from an autouse
    module fixture so non-crawl modules keep the session defaults."""
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.shuffle.partitions", shuf)
