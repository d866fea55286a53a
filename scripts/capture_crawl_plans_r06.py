#!/usr/bin/env python
"""Capture .explain('formatted') for the crawl round's two hottest
engine subplans (r6 evidence): the politeness admission output and the
expansion-candidate aggregation (the per-edge canon + min-struct agg).
Writes plans/r06/crawl_{politeness,expand}_{tag}.txt. Usage:
    python scripts/capture_crawl_plans_r06.py <tag>
"""
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

tag = sys.argv[1] if len(sys.argv) > 1 else "after"

from pyspark.sql import functions as F

from dnscrawler_spark import datagen
from dnscrawler_spark.operators import expand as X
from dnscrawler_spark.operators import politeness as pol
from dnscrawler_spark.operators.frontier import repartition_by_host, seed_frontier
from dnscrawler_spark.session import get_spark

spark = get_spark("capture_plans_r06", master="local[4]", shuffle_partitions=8)
spark.conf.set("spark.sql.adaptive.enabled", "false")

N = 500
n_hosts = datagen.default_n_hosts(N)
hs = datagen.generate_host_state_synthetic(spark, n_hosts)
fr = repartition_by_host(seed_frontier(spark, datagen.seed_urls(50, N, seed=7), 8))
prepared = pol.prepare_policy(hs, None, 0).hint("shuffle_hash")

# politeness: the admitted split (old: windows+unions per output; new:
# one decided frame the loop checkpoints, outputs are leaf filters)
admitted, leftover, blocked, debits = pol.admit(fr, prepared, 0)

# expansion: fetch (synthetic) -> candidate aggregation (canon + min-structs)
enr = X.fetch_synthetic(fr.limit(50), 7, N, n_hosts, 1)
fetched = enr.filter(F.col("is_hit")).drop("is_hit", "qmin_fallback", "fail_code")
cand = X.expand_candidates(fetched, 8, 1)

os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
for name, df in (("crawl_politeness", admitted), ("crawl_expand", cand)):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)")
spark.stop()
