"""One-off profiler: run a few crawl rounds with the engine's built-in
per-phase tracing (SPARK_GRAFT_ROUND_TRACE) on a synthetic corpus.

Knobs: PROF_PAGES, PROF_SEEDS, PROF_ROUNDS, PROF_STRATIFIED=1,
PROF_TWO_WAVE=1."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARK_GRAFT_ROUND_TRACE"] = "1"

from dnscrawler_spark import datagen
from dnscrawler_spark.session import get_spark
from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

N = int(os.environ.get("PROF_PAGES", "60000"))
SEEDS = int(os.environ.get("PROF_SEEDS", "3000"))
ROUNDS = int(os.environ.get("PROF_ROUNDS", "3"))

spark = get_spark("profile", master="local[32]", shuffle_partitions=32)
root = tempfile.mkdtemp(prefix="prof_")
n_hosts = datagen.default_n_hosts(N)
hs = datagen.generate_host_state_synthetic(spark, n_hosts, rate_scale=50.0)
cfg = CrawlConfig(
    max_rounds=ROUNDS,
    partitions=32,
    fetch_mode="synthetic",
    n_pages=N,
    n_hosts=n_hosts,
    stratified=os.environ.get("PROF_STRATIFIED", "1") == "1",
    two_wave=os.environ.get("PROF_TWO_WAVE", "1") == "1",
)
eng = CrawlEngine(spark, None, root, cfg)
snap = eng.start(datagen.seed_urls(SEEDS, N, seed=42), hs)
for _ in range(ROUNDS):
    if snap.metrics.get("done"):
        break
    t = time.monotonic()
    snap = eng.run_round(snap)
    print(
        f"round {snap.round - 1}: {time.monotonic() - t:.2f}s metrics={snap.metrics}",
        flush=True,
    )
eng.flush()
