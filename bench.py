#!/usr/bin/env python
"""Benchmark harness (driver contract + north_rule evidence).

Default mode (what the per-round driver runs):
  - headline crawl job: synthetic pages corpus -> seeded frontier ->
    iterative rounds until drained; reports frontier throughput
    (URLs fetched+deduped per second), the BASELINE.json metric.
  - per-query wall time for every `queries()` entry from
    __spark_entry__.py at $SPARK_GRAFT_SF_DIR (default sf0.1),
    forced with a noop-format write (full execution, no collect).
  - prints ONE JSON line:
      {"metric": ..., "value": <total_sec>, "unit": "sec",
       "queries": {...}, "sf": ..., "crawl": {...}}

`--crawl-only` prints just the crawl JSON (used by --scaling).

`--scaling` runs the SAME crawl job at local[8] and local[32] in
fresh subprocesses (fresh JVM per master, same input seed/size) and
reports throughput at both plus scaling efficiency
(T32/T8)/4 -- the sandbox evidence for the north_rule's >=0.8
two-cluster-size criterion. Results land in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
# Python workers must import dnscrawler_spark too (UDF closures resolve
# by module reference) — propagate before the JVM/session starts
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# crawl job size: fixed across parallelism levels so throughput is comparable
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2000000"))
N_SEEDS = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "150000"))
MAX_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "4"))
PX_SCALE = int(os.environ.get("SPARK_GRAFT_BENCH_PX", "6"))
RATE_SCALE = float(os.environ.get("SPARK_GRAFT_BENCH_RATE", "2000"))
# stratified (hot/cold) frontier — the 10^10-scale mode; outputs are
# bit-identical to classic on drained crawls (tests/test_stratified.py),
# so the knob only changes which frontier machinery the headline job
# exercises. Default ON: measured par-or-faster than classic at every
# bench shape (drain +23%, politeness-bound backlog +28..40%) AND it is
# the architecture that holds at a 10^10-row backlog (BENCH.md §5).
STRATIFIED = os.environ.get("SPARK_GRAFT_BENCH_STRATIFIED", "1") == "1"
# Engine DEFAULT is two_wave=True (the reference runs two waves
# unconditionally, dnsresolver_new.py:210). The bench headline keeps
# single-wave so throughput stays comparable with rounds 1-2 and the
# scaling pair measures ONE wave's machinery; a wave-B sub-round is the
# same machinery run twice per round (parity: tests/test_stratified.py
# test_two_wave_stratified_parity). Set =1 to measure the two-wave shape.
TWO_WAVE = os.environ.get("SPARK_GRAFT_BENCH_TWO_WAVE", "0") == "1"
GEN_SEED = 42

SEEN_SHARDS = 32


def _pow2_at_least(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


# Filter capacity must track the KEY SPACE, not a constant: the
# ever-enqueued filter (stratified) holds every enqueued URL — at 4M
# seeds the old fixed 2^15-bucket cuckoo ran at ~95% load per shard,
# which means Python-side eviction storms on insert and degraded shards
# forcing tier-3 confirms on every probe (measured: 409 s vs 125 s for
# the same crawl). Size for <=25% cuckoo load and ~16 bloom bits/key;
# per-shard state stays a few MB — at 10^10 keys you raise n_shards
# instead (the documented scale path), keeping per-task state bounded.
_exp_keys_per_shard = max(1, (N_SEEDS * 3) // SEEN_SHARDS)
SEEN_BITS = max(1 << 20, _pow2_at_least(_exp_keys_per_shard * 16))
SEEN_BUCKETS = max(1 << 15, _pow2_at_least(_exp_keys_per_shard))


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from dnscrawler_spark.session import get_spark

    # local mode = driver does everything: an 8g heap GC-thrashes once a
    # round holds ~600k cached rows + shuffle buffers (measured: 8-core
    # round wall 152 s at 8g vs 131 s at 20g, same input). Identical at
    # every parallelism level, so the scaling pair stays apples-to-apples.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "20g")
    n = _cpus()
    # shuffle width is data-driven, not core-driven: a high initial
    # partition count + AQE size-based coalescing yields the SAME
    # physical plans at every parallelism level, so the N-vs-4N scaling
    # comparison varies only the executor thread count
    return get_spark(
        app_name="dnscrawler_spark_bench",
        master=f"local[{n}]",
        shuffle_partitions=max(64, 2 * n),
    )


def run_crawl(spark, two_wave: bool | None = None, warmup: bool | None = None) -> dict:
    """The headline job: fetch+dedupe a synthetic frontier to exhaustion.

    Throughput denominator is end-to-end wall time including snapshot
    commits; numerator is URLs processed through the fetch+dedupe path
    (fetched + terminal-failed + robots-blocked + glue-resolved +
    qmin-requeried — every URL the engine resolved or terminally
    classified). ``urls_seen`` is MEASURED from the final seen-state key
    files (parquet footer row counts, SeenFilter.exact_key_count) and
    cross-checked against that derived sum — the two must agree exactly.

    ``two_wave``: override the env default for this leg (the two-wave
    headline row, VERDICT r4 #4). ``warmup``: force/skip the JIT warmup
    round (the second leg in one session skips it — the JVM is warm).
    """
    from dnscrawler_spark import datagen
    from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

    root = tempfile.mkdtemp(prefix="bench_crawl_")
    # crawl rounds: AQE's per-exchange materialization barriers cost
    # ~0.5 s each x ~30 exchanges/round — pure overhead when the loop's
    # shapes are known. Fixed narrow shuffle width instead (identical
    # physical plans at every parallelism level); the Python fetch stage
    # keeps its own explicit 2x-cores fan-out. Restored after the crawl
    # so the analytic query suite still gets AQE.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    shuf_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # 8 in-loop shuffle partitions: the round's shuffles are small (the
    # heavy fetch stage sets its own explicit fan-out), so width 8 keeps
    # per-stage task waves short at every parallelism level — identical
    # plans across levels, same as 16 but ~3 s/round less task latency
    # at the 2-core level
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")
    )
    try:
        tw = TWO_WAVE if two_wave is None else two_wave
        n = _cpus()
        # SPARK_GRAFT_BENCH_HOSTS: shrink the host universe to make
        # politeness BIND (backlog >> per-round admissions) — the regime
        # the stratified frontier exists for; default = politeness loose
        n_hosts = int(
            os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "0")
        ) or datagen.default_n_hosts(N_PAGES)
        hs = datagen.generate_host_state_synthetic(spark, n_hosts, rate_scale=RATE_SCALE)
        cfg = CrawlConfig(
            max_rounds=MAX_ROUNDS,
            partitions=n,
            # fixed state layout across parallelism levels; capacity
            # auto-sized to the seed scale (see SEEN_BITS above)
            seen_shards=SEEN_SHARDS,
            seen_bits=SEEN_BITS,
            seen_buckets=SEEN_BUCKETS,
            collect_lineage=False,
            verify_payloads=True,
            fetch_mode="synthetic",  # per-URL outbound fetch, no corpus join
            px_scale=PX_SCALE,
            n_pages=N_PAGES,
            n_hosts=n_hosts,
            pipeline_writes=True,  # fetched/facts writes overlap next round
            stratified=STRATIFIED,
            two_wave=tw,
        )
        eng = CrawlEngine(spark, None, root, cfg)
        # seed set built distributed — never transits the driver
        seeds = datagen.seed_urls_df(spark, N_SEEDS, N_PAGES, seed=GEN_SEED, n_hosts=n_hosts)

        do_warm = (
            os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") == "1"
            if warmup is None
            else warmup
        )
        if do_warm:
            # JIT/codegen/Arrow-worker warmup: one tiny round through the
            # IDENTICAL plan shapes in a throwaway root, so the measured
            # window is steady-state at every parallelism level. Without
            # it the first round carries ~30 s of one-time JVM JIT +
            # codegen compilation + Python pool spin-up — a constant that
            # is invisible at 2 cores (hidden under compute) but 1/3 of
            # round wall at 8 cores, which silently corrupts the N-vs-4N
            # comparison. Real deployments run thousands of rounds;
            # steady-state throughput is the honest metric.
            wroot = tempfile.mkdtemp(prefix="bench_warm_")
            wcfg = CrawlConfig(
                max_rounds=1, partitions=n, seen_shards=SEEN_SHARDS,
                seen_bits=SEEN_BITS, seen_buckets=SEEN_BUCKETS,
                collect_lineage=False, verify_payloads=True,
                fetch_mode="synthetic", px_scale=PX_SCALE,
                n_pages=N_PAGES, n_hosts=n_hosts, pipeline_writes=True,
                stratified=STRATIFIED, two_wave=tw,
            )
            weng = CrawlEngine(spark, None, wroot, wcfg)
            wseeds = datagen.seed_urls_df(spark, 500, N_PAGES, seed=GEN_SEED + 1, n_hosts=n_hosts)
            weng.run(weng.start(wseeds, hs))
            shutil.rmtree(wroot, ignore_errors=True)

        t0 = time.monotonic()
        snap = eng.start(seeds, hs)
        fetched = terminal = blocked = glue_resolved = qmin = dups = 0
        rounds = 0
        while not snap.metrics.get("done") and snap.round < cfg.max_rounds:
            snap = eng.run_round(snap)
            m = snap.metrics
            fetched += m["n_fetched"]
            terminal += m["n_terminal"]
            blocked += m["n_blocked"]
            glue_resolved += m["n_glue_resolved"]
            qmin += m["n_qmin"]
            dups += m["n_dup_inserts"]
            rounds += 1
        eng.flush()  # pipelined writes must land inside the measured wall
        wall = time.monotonic() - t0
        urls = fetched + terminal + blocked + glue_resolved + qmin
        # measured seen-set size (tier-3 key-file footers) — must equal
        # processed urls minus re-processed ones (a url fetched after an
        # earlier glue-resolve is work done twice, seen once); a mismatch
        # means the headline metric is lying about dedup coverage
        from dnscrawler_spark.operators.seen import SeenFilter

        n_seen = SeenFilter.from_manifest(snap.seen).exact_key_count()
        if n_seen != urls - dups:
            raise AssertionError(
                f"urls_seen cross-check failed: measured {n_seen} != "
                f"derived {urls} - dups {dups}"
            )
        if eng.pages_keyed is not None:
            eng.pages_keyed.unpersist()
        return {
            "n_pages": N_PAGES,
            "n_seeds": N_SEEDS,
            "px_scale": PX_SCALE,
            "rounds": rounds,
            "urls_fetched": fetched,
            "urls_terminal": terminal,
            "urls_blocked": blocked,
            "urls_glue_resolved": glue_resolved,
            "urls_qmin": qmin,
            "urls_reprocessed": dups,
            "urls_seen": n_seen,
            "wall_sec": round(wall, 3),
            "urls_per_sec": round(urls / wall, 1),
            "cpus": _cpus(),
            "stratified": STRATIFIED,
            "two_wave": tw,
            "done": bool(snap.metrics.get("done")),
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", shuf_before)
        shutil.rmtree(root, ignore_errors=True)


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry

    # bench times the ENGINE: the probes' pure-Python oracle twins
    # (correctness machinery, driver-side scalar loops) are skipped
    prev_skip = os.environ.get("SPARK_GRAFT_SKIP_ORACLE_DUMP")
    os.environ["SPARK_GRAFT_SKIP_ORACLE_DUMP"] = "1"
    out: dict[str, float] = {}
    try:
        for name, fn in entry.queries().items():
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.monotonic() - t0, 3)
    finally:
        # restore (not pop): a caller-set skip flag must survive this call
        if prev_skip is None:
            os.environ.pop("SPARK_GRAFT_SKIP_ORACLE_DUMP", None)
        else:
            os.environ["SPARK_GRAFT_SKIP_ORACLE_DUMP"] = prev_skip
    return out


def run_crawl_fresh(two_wave: bool) -> dict:
    """One headline crawl leg in a FRESH JVM (subprocess --crawl-only,
    unpinned, same protocol): each leg is measured in the state its
    published band was measured in (standalone), not in whatever heap
    the query suite plus the PRIOR leg left behind — the same
    positional effect §0.8 fixed for the fixture probes (same-box A/B:
    the two-wave leg read 183.6 s as the last job of a full suite vs
    127.3 s standalone minutes later, identical outputs). The leg's own
    JIT warmup runs inside the subprocess, so the measured window is
    steady-state exactly as before."""
    env = dict(os.environ, SPARK_GRAFT_BENCH_TWO_WAVE="1" if two_wave else "0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only"],
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"headline leg (two_wave={two_wave}) failed rc={proc.returncode}: "
            f"{proc.stderr[-2000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument(
        "--scaling-two-wave",
        action="store_true",
        help="one pinned 2->8 pair at the engine-default two-wave shape",
    )
    args = ap.parse_args()

    if args.scaling:
        run_scaling()
        return
    if args.scaling_two_wave:
        run_scaling(levels=(2, 8), two_wave=True)
        return

    spark = _spark()
    try:
        if args.crawl_only:
            # the scaling harness's subprocess leg — respects
            # SPARK_GRAFT_BENCH_TWO_WAVE so --scaling-two-wave works
            print(json.dumps(run_crawl(spark)))
            return
        # Query suite FIRST, headline crawls after: the fixture crawl
        # probes (the correctness gate's latency-sensitive rows) are
        # then timed in the same JVM state as their published cold/warm
        # bands (BENCH.md §0.5) instead of inheriting the heap left by
        # two 2M-page crawl legs — same-box A/B showed the late-suite
        # slot reading up to 87 s on a probe whose fresh-state band is
        # 36-46 s. The headline legs are throughput rows over 80-140 s
        # and keep their own explicit JIT warmup, so the swap doesn't
        # flatter them.
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
        queries = run_queries(spark, sf_dir)
        # release the query-suite JVM before the crawl legs measure
        spark.stop()
        # headline single-wave row: explicit two_wave=False so an
        # inherited SPARK_GRAFT_BENCH_TWO_WAVE=1 can't relabel a
        # two-wave crawl as the single-wave headline (the two-wave leg
        # below is explicit); fresh subprocess per leg — see
        # run_crawl_fresh for the same-box A/B that motivates it
        crawl = run_crawl_fresh(two_wave=False)
        # the ENGINE DEFAULT shape (two_wave=True, dnsresolver_new.py:210)
        # gets its own headline row (VERDICT r4 #4): same input,
        # identical-output assertion against the single-wave leg
        # (two-wave only reorders WHEN a url is fetched within the
        # horizon; a drained crawl sees the same url set — parity:
        # test_two_wave_parity)
        crawl_tw = run_crawl_fresh(two_wave=True)
        if crawl["done"] and crawl_tw["done"]:
            # both drained: two-wave only moves WHEN a url is fetched, so
            # the final url-seen set must be identical (test_two_wave_parity)
            if crawl_tw["urls_seen"] != crawl["urls_seen"]:
                raise AssertionError(
                    f"two-wave leg diverged: urls_seen {crawl_tw['urls_seen']} "
                    f"!= single-wave {crawl['urls_seen']}"
                )
        total = round(
            sum(queries.values()) + crawl["wall_sec"] + crawl_tw["wall_sec"], 3
        )
        print(
            json.dumps(
                {
                    "metric": "frontier throughput (URLs fetched+deduped/sec) + operator suite wall time",
                    "value": total,
                    "unit": "sec",
                    "queries": {
                        "crawl_frontier": crawl["wall_sec"],
                        "crawl_frontier_two_wave": crawl_tw["wall_sec"],
                        **queries,
                    },
                    "sf": sf,
                    "crawl": crawl,
                    "crawl_two_wave": crawl_tw,
                }
            )
        )
    finally:
        spark.stop()


def run_scaling(levels: tuple[int, ...] = (2, 8, 32), two_wave: bool = False) -> None:
    """north_rule evidence: the same crawl job, same input, at N and 4N
    cores. Each level runs in a fresh subprocess PINNED to exactly that
    many CPUs (taskset) — on a shared 32-core host, an unpinned
    local[N] JVM spills GC/shuffle/Python-worker work onto the other
    cores, which silently flatters the small configuration.

    Reports N→4N pairs over ``levels`` (default 2→8 and 8→32). The host
    VM serializes memory-heavy work beyond ~10 concurrent processes —
    see BENCH.md's Spark-free host-ceiling control — so the 2→8 pair is
    the one that isolates ENGINE scaling from host contention, exactly
    what adding real cluster nodes provides at every size.

    ``two_wave=True`` runs the pair at the ENGINE DEFAULT shape
    (two zone-cut waves per round, dnsresolver_new.py:210) — the
    VERDICT r4 #4 leg. Outputs must be identical across levels exactly
    as in the single-wave protocol (the --crawl-only leg asserts its
    own urls_seen cross-check; the caller compares across levels).
    """
    scale_env = {
        "SPARK_GRAFT_BENCH_PAGES": os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2000000"),
        "SPARK_GRAFT_BENCH_SEEDS": os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "300000"),
        "SPARK_GRAFT_BENCH_ROUNDS": os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "2"),
        "SPARK_GRAFT_BENCH_RATE": os.environ.get("SPARK_GRAFT_BENCH_RATE", "5000"),
        # px 14 → 112-336 px images: per-URL decode+verify work sized
        # like a real image fetch (px 8 thumbnails under-weight the
        # embarrassingly-parallel stage the north_star actually measures;
        # the Spark-free control in BENCH.md shows THIS HOST caps even
        # perfect parallel code at ~0.92 between 2 and 8 pinned cores)
        "SPARK_GRAFT_BENCH_PX": os.environ.get("SPARK_GRAFT_BENCH_PX", "14"),
    }
    if two_wave:
        scale_env["SPARK_GRAFT_BENCH_TWO_WAVE"] = "1"
    results = {}
    for n in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), **scale_env)
        proc = subprocess.run(
            ["taskset", "-c", f"0-{n - 1}", sys.executable,
             os.path.join(REPO, "bench.py"), "--crawl-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[n] = json.loads(proc.stdout.strip().splitlines()[-1])

    seen_sets = {n: results[n]["urls_seen"] for n in levels}
    if len(set(seen_sets.values())) != 1:
        raise AssertionError(f"output diverged across levels: {seen_sets}")

    def pair(lo, hi):
        r = results[hi]["urls_per_sec"] / results[lo]["urls_per_sec"]
        return {
            "throughput_ratio": round(r, 3),
            "scaling_efficiency": round(r / 4.0, 3),
            "pass_0.8": r / 4.0 >= 0.8,
        }

    out = {"two_wave": two_wave}
    for n in levels:
        out[f"local{n}_pinned"] = results[n]
    for lo, hi in zip(levels, levels[1:]):
        out[f"pair_{lo}_to_{hi}"] = pair(lo, hi)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
