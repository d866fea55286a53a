"""One-off profiler: time each phase of a crawl round (forces actions at
phase boundaries, so totals exceed the pipelined run — for relative
attribution only)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dnscrawler_spark import datagen
from dnscrawler_spark.operators import expand as X
from dnscrawler_spark.operators import politeness as pol
from dnscrawler_spark.operators.frontier import FRONTIER_COLS, repartition_by_host
from dnscrawler_spark.operators.seen import SeenFilter
from dnscrawler_spark.session import get_spark
from dnscrawler_spark.sources.snapshots import Snapshot, SnapshotStore
from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

N = int(os.environ.get("PROF_PAGES", "60000"))
SEEDS = int(os.environ.get("PROF_SEEDS", "3000"))

spark = get_spark("profile", master="local[32]", shuffle_partitions=32)
root = tempfile.mkdtemp(prefix="prof_")
pages = datagen.generate_pages(spark, N, seed=42, partitions=32)
hs = datagen.generate_host_state(pages, rate_scale=50.0)
cfg = CrawlConfig(max_rounds=4, partitions=32, collect_lineage=False)
eng = CrawlEngine(spark, pages, root, cfg)

t = time.monotonic()
eng.pages_keyed.count()
print(f"datagen+persist: {time.monotonic()-t:.2f}s", flush=True)

seeds = datagen.seed_urls(SEEDS, N, seed=42)
snap = eng.start(seeds, hs)

for rr in range(3):
    r = snap.round
    store = eng.store
    T = {}

    def mark(name, t0):
        T[name] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    frontier = store.read_table(spark, snap, "frontier")
    host_state = store.read_table(spark, snap, "host_state")
    glue = store.read_table(spark, snap, "glue")
    if glue is None:
        glue = spark.createDataFrame([], X.GLUE_SCHEMA)
    seen = SeenFilter.from_manifest(snap.seen)
    frontier = repartition_by_host(frontier, cfg.partitions)
    admitted, leftover, blocked, host_state2 = pol.admit(frontier, host_state, r)
    admitted = admitted.persist()
    blocked = blocked.persist()
    n_adm = admitted.count()
    mark("admit", t0)

    t0 = time.monotonic()
    fetched, misses = X.fetch(admitted, eng.pages_keyed)
    fetched = X.verify_payloads(fetched, 42).persist()
    n_f = fetched.count()
    mark("fetch+verify", t0)

    t0 = time.monotonic()
    retries, terminal, qmin = X.classify_misses(misses)
    retries = retries.persist(); terminal = terminal.persist()
    retries.count(); terminal.count()
    mark("classify", t0)

    t0 = time.monotonic()
    glue2 = glue.union(X.new_glue(fetched)).distinct().persist()
    glue2.count()
    mark("glue", t0)

    t0 = time.monotonic()
    seen_keys = fetched.select("url_key").union(terminal.select("url_key")).union(blocked.select("url_key"))
    seen2 = seen.insert(seen_keys, r)
    mark("seen_insert", t0)

    t0 = time.monotonic()
    candidates = X.expand_candidates(fetched, glue2, cfg.n_salts, r + 1, True, extra_edges=qmin)
    unseen = seen2.filter_unseen(candidates).persist()
    n_unseen = unseen.count()
    mark("expand+probe", t0)

    t0 = time.monotonic()
    inflight = leftover.select("url_key").union(retries.select("url_key"))
    nonhaz = unseen.join(inflight, "url_key", "left_semi")
    new_rows = unseen.join(inflight, "url_key", "left_anti")
    bump = lambda df: df.withColumn("round", F.lit(r + 1)).select(*FRONTIER_COLS)
    frontier2 = bump(leftover).union(bump(retries)).union(bump(new_rows))
    facts = (
        X.fetched_facts(fetched, r)
        .union(X.failure_facts(terminal, r))
        .union(X.simple_facts(nonhaz, "nonhazardous", r))
        .union(X.simple_facts(blocked, "robots_blocked", r))
    )
    nxt = Snapshot(snapshot_id=f"snap-{r+1:06d}", parent_id=snap.snapshot_id, round=r + 1)
    for name, df in [("host_state", host_state2), ("glue", glue2),
                     ("fetched", fetched.drop("bytes", "out_edges", "glue_edges", "carry_edges")),
                     ("frontier", frontier2), ("facts", facts)]:
        tw = time.monotonic()
        nxt.tables[name] = store.write_table(df, r + 1, name)
        T[f"write_{name}"] = round(time.monotonic() - tw, 2)
    nxt.seen = seen2.to_manifest()
    nxt.metrics = {"done": False}
    store.commit(nxt)
    for df in (admitted, blocked, fetched, retries, terminal, glue2, unseen):
        df.unpersist()
    seen2.release()
    print(f"round {r}: admitted={n_adm} fetched={n_f} unseen={n_unseen} | {T}", flush=True)
    snap = nxt

spark.stop()
