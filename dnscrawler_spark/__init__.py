"""dnscrawler_spark — a PySpark-native crawl-frontier + analytics engine.

A brand-new engine re-creating the *capabilities* of CAIDA/dnscrawler
(dependency-chasing crawl loop: resolve dependency edges, expand new
targets, dedupe against a seen-set, re-enqueue with politeness — see
/root/reference/dnscrawler/dnsresolver_new.py) re-expressed as iterative
DataFrame rounds over snapshot-committed parquet tables of image+caption
records.

Spark-first design: everything is DataFrame/Catalyst; per-partition
mutable state (bloom+cuckoo seen shards, token buckets) lives in
Arrow-vectorized ``applyInPandas``/``mapInPandas`` — never per-row
Python UDFs.
"""

from dnscrawler_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
