"""The crawl driver: iterative DataFrame rounds with snapshot commits.

One round == one wave of the reference's resolve loop
(/root/reference/dnscrawler/dnsresolver_new.py:210-234), vectorized over
every in-flight URL at once (SURVEY §3.3):

    admitted    = politeness(frontier_r)               # X5/W2
    fetched     = admitted ⋈ pages on url_key          # S2
    facts       = explode(parse(fetched))              # P1-P7, A1/A5
    candidates  = edges ⋈ glue                         # J1
    new         = (candidates ⟂ seen) ⟂ in-flight      # J2/J3/P11
    frontier_r+1= leftover ∪ retries ∪ new             # SO1/S7
    seen'       = seen ⊕ insert(fetched ∪ terminal ∪ blocked)
    commit snapshot r+1 (atomic manifest)              # O2

Resume: ``CrawlEngine.resume()`` reads the latest committed manifest;
a crash between commits replays at most one round (idempotent: the
round recomputes from its input snapshot).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from dnscrawler_spark.datagen import HOST_STATE_SCHEMA
from dnscrawler_spark.operators import expand as X
from dnscrawler_spark.operators import politeness as pol
from dnscrawler_spark.operators.frontier import (
    FRONTIER_COLS,
    N_SALTS_DEFAULT,
    repartition_by_host,
    seed_frontier,
    seed_frontier_from_df,
)
from dnscrawler_spark.operators.seen import SeenFilter
from dnscrawler_spark.sources.snapshots import Snapshot, SnapshotStore

FACT_KINDS = [
    "url", "host", "tld", "sld",
    "ps_url", "ps_host", "ps_tld", "ps_sld",
    "hazardous", "ip_ns_records", "missing_ns_records",
    "nonhazardous", "robots_blocked", "glue_resolved", "qmin_requery",
    "budget_exceeded",
]

FAIL_CLASSES = ["hazardous", "ip_ns_records", "missing_ns_records"]


@dataclass
class CrawlConfig:
    n_salts: int = N_SALTS_DEFAULT
    partitions: int | None = None  # shuffle width for the frontier
    max_rounds: int = 64
    verify_payloads: bool = True
    gen_seed: int = 42
    glue_broadcast: bool = True  # small+hot glue side (SURVEY J1/O4)
    seen_shards: int = 32
    seen_bits: int = 1 << 20
    seen_buckets: int = 1 << 15
    collect_lineage: bool = True
    # fetch stage: 'join' fetches from a materialized corpus table;
    # 'synthetic' fetches each URL as an outbound call (mapInPandas
    # regeneration — no corpus table, no join shuffle; the shape a real
    # network fetch stage has)
    fetch_mode: str = "join"
    px_scale: int = 1
    n_pages: int | None = None  # synthetic mode: URL-space size
    n_hosts: int | None = None
    # per-seed cumulative fetch budget (the deterministic analog of the
    # reference's per-seed wall-clock kill, run/run.py:59). Checked at
    # round granularity: a seed whose fetched count at round start is >=
    # the budget has ALL its pending frontier rows demoted to the
    # terminal 'budget_exceeded' class. None = unlimited (no overhead).
    seed_budget: int | None = None


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame | None,
        root: str,
        cfg: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.store = SnapshotStore(root)
        self.root = root
        if self.cfg.partitions is None:
            self.cfg.partitions = spark.sparkContext.defaultParallelism
        if self.cfg.fetch_mode == "synthetic":
            if self.cfg.n_pages is None:
                raise ValueError("synthetic fetch needs cfg.n_pages")
            if self.cfg.n_hosts is None:
                from dnscrawler_spark.datagen import default_n_hosts

                self.cfg.n_hosts = default_n_hosts(self.cfg.n_pages)
            self.pages_keyed = None
        else:
            # key + cache the corpus once, pre-hashed on the join key: the
            # cached InMemoryRelation keeps its HashPartitioning(url_key),
            # so each round's fetch join shuffles only the admitted side
            self.pages_keyed = (
                X.prepare_pages(pages)
                .repartition(self.cfg.partitions, "url_key")
                .persist()
            )

    # -- lifecycle ----------------------------------------------------------
    def start(self, seed_urls: list[str] | DataFrame, host_state: DataFrame) -> Snapshot:
        """Round-0 snapshot: seeded frontier + initial host_state +
        empty seen/glue/facts. ``seed_urls`` may be a list (small runs,
        the reference's seed-file shape) or a DataFrame with a ``url``
        column (scale path — a 10^10-row seed set never sees the
        driver)."""
        obs = None
        if isinstance(seed_urls, DataFrame):
            fr = seed_frontier_from_df(seed_urls, self.cfg.n_salts)
            obs = Observation("seed_n")
            fr = fr.observe(obs, F.count(F.lit(1)).alias("n"))
        else:
            fr = seed_frontier(self.spark, seed_urls, self.cfg.n_salts)
            n_seeds = len(seed_urls)
        snap = Snapshot(snapshot_id="snap-000000", parent_id=None, round=0)
        snap.tables["frontier"] = self.store.write_table(fr, 0, "frontier")
        if obs is not None:
            n_seeds = int(obs.get["n"])
        snap.tables["host_state"] = self.store.write_table(host_state, 0, "host_state")
        seen = SeenFilter(
            state_dir=os.path.join(self.root, "seen_state"),
            n_shards=self.cfg.seen_shards,
            n_bits=self.cfg.seen_bits,
            n_buckets=self.cfg.seen_buckets,
        )
        snap.seen = seen.to_manifest()
        snap.metrics = {"n_frontier": n_seeds, "done": False}
        self.store.commit(snap)
        return snap

    def resume(self) -> Snapshot | None:
        return self.store.latest()

    def run(self, snap: Snapshot | None = None) -> Snapshot:
        """Drive rounds until the frontier drains or max_rounds."""
        snap = snap or self.resume()
        if snap is None:
            raise ValueError("no snapshot to run from — call start() first")
        while not snap.metrics.get("done") and snap.round < self.cfg.max_rounds:
            snap = self.run_round(snap)
        return snap

    # -- one round ------------------------------------------------------------
    def run_round(self, snap: Snapshot) -> Snapshot:
        """One crawl wave. All round metrics piggyback on the snapshot
        writes via the Observation API (CollectMetrics nodes) — the round
        runs NO standalone count() jobs, so per-round fixed cost stays
        flat as parallelism grows (the north_rule scaling criterion)."""
        spark, cfg, store = self.spark, self.cfg, self.store
        r = snap.round
        t0 = time.monotonic()

        frontier = store.read_table(spark, snap, "frontier")
        host_state = store.read_table(spark, snap, "host_state")
        glue = store.read_table(spark, snap, "glue")
        if glue is None:
            glue = spark.createDataFrame([], X.GLUE_SCHEMA)
        seen = SeenFilter.from_manifest(snap.seen)

        # per-seed budget (run/run.py:59 analog): demote every frontier
        # row of an exhausted seed before politeness. Broadcast-semi on
        # the tiny exhausted-seed dim; zero overhead when budget unset.
        over_budget = None
        seed_state = None
        if cfg.seed_budget is not None:
            seed_state = store.read_table(spark, snap, "seed_state")
            if seed_state is None:
                seed_state = spark.createDataFrame([], "seed string, n_fetched long")
            exhausted = seed_state.filter(
                F.col("n_fetched") >= cfg.seed_budget
            ).select("seed")
            over_budget = frontier.join(
                F.broadcast(exhausted), "seed", "left_semi"
            ).persist()
            frontier = frontier.join(F.broadcast(exhausted), "seed", "left_anti")

        frontier = repartition_by_host(frontier)
        admitted, leftover, blocked, host_state2 = pol.admit(frontier, host_state, r)
        # every politeness output has 2+ consumers — cache them or each
        # consumer re-runs the frontier read + both ranking windows
        admitted = admitted.persist()
        leftover = leftover.persist()
        blocked = blocked.persist()

        enriched = None
        if cfg.fetch_mode == "synthetic":
            # fetch + payload verification fused: bytes stay in the stage;
            # the enriched frame is persisted ONCE so the hit/miss split
            # reads the cache instead of re-running the fetch per branch.
            # Explicit fan-out first: AQE sizes partitions by BYTES, and a
            # frontier row is ~200 B while fetching it costs ~1 ms of
            # Python — size-based coalescing would run the whole fetch on
            # 1-2 cores. Fixed-width repartition is exempt from AQE
            # coalescing, guaranteeing one fetch slice per task slot.
            fan_out = admitted.repartition(cfg.partitions * 2)
            enriched = X.fetch_synthetic(
                fan_out, cfg.gen_seed, cfg.n_pages, cfg.n_hosts, cfg.px_scale,
                verify=cfg.verify_payloads,
            ).persist()
            fetched = enriched.filter(F.col("is_hit")).drop("is_hit")
            misses = enriched.filter(~F.col("is_hit")).select(*FRONTIER_COLS)
            has_ok = True
        else:
            fetched, misses = X.fetch(admitted, self.pages_keyed)
            if cfg.verify_payloads:
                fetched = X.verify_payloads(fetched, cfg.gen_seed, cfg.px_scale)
            has_ok = cfg.verify_payloads
        obs_fetched = Observation(f"fetched_r{r}")
        fetched = fetched.observe(
            obs_fetched,
            F.count(F.lit(1)).alias("n"),
            (
                F.sum((~F.col("payload_ok")).cast("long")) if has_ok else F.lit(0)
            ).alias("bad"),
        ).persist()
        retries, terminal, qmin = X.classify_misses(misses, cfg.gen_seed)
        retries = retries.persist()
        terminal = terminal.persist()
        qmin = qmin.persist()

        glue2 = glue.union(X.new_glue(fetched)).distinct().persist()
        candidates = X.expand_candidates(
            fetched, glue2, cfg.n_salts, r + 1, cfg.glue_broadcast,
            extra_edges=qmin,
        )

        seen_keys = (
            fetched.select("url_key")
            .union(terminal.select("url_key"))
            .union(blocked.select("url_key"))
            # the minimized-form url itself is done (requery enqueued)
            .union(qmin.select(F.col("orig_url_key").alias("url_key")))
        )
        if over_budget is not None:
            seen_keys = seen_keys.union(over_budget.select("url_key"))
        # ONE fused applyInPandas pass: per shard, insert this round's
        # keys (npz + exact-key tier rewrite) then probe the expansion
        # candidates against the updated shard. Glue-hit candidates are
        # resolve rows (the glue short-circuit, dnsresolver_new.py:
        # 125-126): an unseen glue hit is resolved from the glue payload
        # — facts now, seen now, never fetched. The stats collect is also
        # the action that materializes the fetched/blocked caches.
        seen2, unseen, glue_resolved = seen.insert_and_probe(
            seen_keys, candidates, r, resolve_col=F.col("reason") == "glue"
        )
        unseen = unseen.persist()
        glue_resolved = glue_resolved.persist()
        inflight = leftover.select("url_key").union(retries.select("url_key"))
        nonhaz = unseen.join(inflight, "url_key", "left_semi")
        new_rows = unseen.join(inflight, "url_key", "left_anti")

        # per-branch observations all fire during the single frontier write
        obs_left = Observation(f"left_r{r}")
        obs_retry = Observation(f"retry_r{r}")
        obs_new = Observation(f"new_r{r}")

        def bump(df, obs):
            out = df.withColumn("round", F.lit(r + 1)).select(*FRONTIER_COLS)
            return out.observe(obs, F.count(F.lit(1)).alias("n"))

        frontier2 = (
            bump(leftover, obs_left)
            .union(bump(retries, obs_retry))
            .union(bump(new_rows, obs_new))
        )

        obs_facts = Observation(f"facts_r{r}")
        facts = (
            X.fetched_facts(fetched, r)
            .union(X.fetched_facts(glue_resolved, r))  # glue payload facts
            .union(X.simple_facts(glue_resolved, "glue_resolved", r))
            .union(X.failure_facts(terminal, r))
            .union(X.simple_facts(nonhaz, "nonhazardous", r))
            .union(X.simple_facts(blocked, "robots_blocked", r))
            .union(
                X.simple_facts(
                    qmin.select("seed", F.col("orig_url").alias("url")),
                    "qmin_requery", r,
                )
            )
        )
        if over_budget is not None:
            facts = facts.union(X.simple_facts(over_budget, "budget_exceeded", r))
        facts = facts.observe(
            obs_facts,
            F.sum(
                F.col("kind").isin("hazardous", "ip_ns_records", "missing_ns_records").cast("long")
            ).alias("n_terminal"),
            F.sum((F.col("kind") == "robots_blocked").cast("long")).alias("n_blocked"),
            F.sum((F.col("kind") == "glue_resolved").cast("long")).alias("n_glue"),
            F.sum((F.col("kind") == "qmin_requery").cast("long")).alias("n_qmin"),
        )

        # ---- parallel snapshot writes ---------------------------------------
        nxt = Snapshot(
            snapshot_id=f"snap-{r + 1:06d}",
            parent_id=snap.snapshot_id,
            round=r + 1,
        )
        fetched_slim = fetched.drop("bytes", "out_edges", "glue_edges", "carry_edges")
        # phase A: writes independent of the dedup verdict; phase B shares
        # the (now materialized) unseen cache — two parallel job waves,
        # no duplicate computation of the persisted intermediates
        # dimension-sized tables get few output files (a 31k-row table
        # scattered over 64 shuffle partitions costs 64 task launches +
        # 64 file commits per round, and 64 footer reads next round)
        n_small = max(1, cfg.partitions // 8)
        phase_a = {
            "host_state": host_state2.coalesce(n_small),
            "glue": glue2.coalesce(n_small),
            "fetched": fetched_slim,
        }
        if cfg.seed_budget is not None:
            # cumulative per-seed fetch counts (budget state for the NEXT
            # round's exhaustion check — round-granular by design)
            seed_state2 = (
                seed_state.unionByName(
                    fetched.groupBy("seed").agg(
                        F.count(F.lit(1)).cast("long").alias("n_fetched")
                    )
                )
                .groupBy("seed")
                .agg(F.sum("n_fetched").alias("n_fetched"))
            )
            phase_a["seed_state"] = seed_state2.coalesce(n_small)
        phase_b = {"frontier": frontier2, "facts": facts}
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = {
                name: ex.submit(store.write_table, df, r + 1, name)
                for name, df in phase_a.items()
            }
            unseen.count()  # warm the unseen cache before phase B shares it
            for name, fut in futs.items():
                nxt.tables[name] = fut.result()
            futs = {
                name: ex.submit(store.write_table, df, r + 1, name)
                for name, df in phase_b.items()
            }
            for name, fut in futs.items():
                nxt.tables[name] = fut.result()
        nxt.seen = seen2.to_manifest()

        n_left = int(obs_left.get["n"])
        n_retry = int(obs_retry.get["n"])
        n_new = int(obs_new.get["n"])
        n_fetched = int(obs_fetched.get["n"])
        n_terminal = int(obs_facts.get["n_terminal"] or 0)
        n_blocked = int(obs_facts.get["n_blocked"] or 0)
        n_qmin = int(obs_facts.get["n_qmin"] or 0)
        n_frontier2 = n_left + n_retry + n_new
        lineage = []
        if cfg.collect_lineage:
            lineage = [
                {"round": r, "partition_id": int(row["pid"]), "n_admitted": int(row["n"])}
                for row in admitted.groupBy(
                    F.spark_partition_id().alias("pid")
                ).agg(F.count("*").alias("n")).collect()
            ]
        nxt.lineage = lineage
        nxt.metrics = {
            "round": r,
            "n_admitted": n_fetched + n_retry + n_terminal + n_qmin,
            "n_fetched": n_fetched,
            "n_missed": n_retry + n_terminal + n_qmin,
            "n_qmin": n_qmin,
            "n_blocked": n_blocked,
            "n_retry": n_retry,
            "n_terminal": n_terminal,
            "n_new": n_new,
            "n_glue_resolved": int(obs_facts.get["n_glue"] or 0),
            "n_frontier_next": n_frontier2,
            "n_bad_payloads": int(obs_fetched.get["bad"] or 0),
            "wall_ms": round((time.monotonic() - t0) * 1e3, 1),
            "done": n_frontier2 == 0,
        }
        store.commit(nxt)

        for df in (
            admitted, leftover, blocked, fetched, retries, terminal, qmin,
            glue2, unseen, glue_resolved,
        ):
            df.unpersist()
        if over_budget is not None:
            over_budget.unpersist()
        if enriched is not None:
            enriched.unpersist()
        seen2.release()
        return nxt

    # -- outputs ------------------------------------------------------------
    def facts_df(self, upto: Snapshot) -> DataFrame:
        paths = []
        for rr in self.store.history():
            if 0 < rr <= upto.round:
                s = self.store.load(rr)
                if "facts" in s.tables:
                    paths.append(s.tables["facts"])
        if not paths:
            return self.spark.createDataFrame([], X.FACTS_SCHEMA)
        return self.spark.read.parquet(*paths)

    def results(self, upto: Snapshot) -> DataFrame:
        """Final per-seed result rows — the domain_dict analog
        (/root/reference/dnscrawler/dnsresolver_new.py:280-298): one row
        per seed, one sorted deduped array per fact kind, plus the
        grouped failure detail ``misconfigured`` map (the
        QuerySummaryList shape, querysummarylist.py:4-9 /
        reference README.md:5-52)."""
        facts = self.facts_df(upto)
        pivoted = (
            facts.groupBy("seed")
            .pivot("kind", FACT_KINDS)
            .agg(F.sort_array(F.collect_set("value")))
        )
        for k in FACT_KINDS:
            pivoted = pivoted.withColumn(
                k, F.coalesce(F.col(k), F.array().cast("array<string>"))
            )
        detail = self.failure_detail(upto)
        empty_map = F.expr(
            "cast(map() as map<string,"
            "array<struct<url:string,round:int,attempts:int>>>)"
        )
        return pivoted.join(detail, "seed", "left").withColumn(
            "misconfigured", F.coalesce(F.col("misconfigured"), empty_map)
        )

    def failure_detail(self, upto: Snapshot) -> DataFrame:
        """(seed, misconfigured MAP<fail_class, ARRAY<STRUCT<url, round,
        attempts>>>) — who failed, when, after how many attempts; arrays
        sorted for deterministic parity. Rebuilt from the facts table's
        failure rows (they carry ``attempts``); pure Catalyst
        (collect_list + map_from_entries), two hash-agg shuffles."""
        facts = self.facts_df(upto)
        fail = facts.filter(F.col("kind").isin(*FAIL_CLASSES))
        per_class = fail.groupBy("seed", "kind").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("value").alias("url"),
                        F.col("round").cast("int").alias("round"),
                        F.col("attempts").alias("attempts"),
                    )
                )
            ).alias("items")
        )
        return per_class.groupBy("seed").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("kind", "items")))
            ).alias("misconfigured")
        )

    def seen_urls(self, upto: Snapshot) -> DataFrame:
        """The final URL-seen set (north_rule parity object): all
        fetched/terminal/blocked urls, as canonical strings."""
        paths = []
        for rr in self.store.history():
            if 0 < rr <= upto.round:
                s = self.store.load(rr)
                if "fetched" in s.tables:
                    paths.append(s.tables["fetched"])
        fetched_urls = (
            self.spark.read.parquet(*paths).select("url") if paths else
            self.spark.createDataFrame([], "url string")
        )
        fact_urls = (
            self.facts_df(upto)
            .filter(
                F.col("kind").isin(
                    "hazardous", "ip_ns_records", "missing_ns_records",
                    "robots_blocked", "glue_resolved", "qmin_requery",
                    "budget_exceeded",
                )
            )
            .select(F.col("value").alias("url"))
        )
        return fetched_urls.union(fact_urls).distinct()

    def crawl_trace(self, upto: Snapshot) -> list[tuple[int, str]]:
        """Normalized crawl order: (round, url) for every admitted fetch,
        ordered by (round, host, priority, depth, url) — the engine/oracle
        parity object for 'exact crawl ordering' (SURVEY §7.3).

        FIXTURE-SCALE ONLY: this collects every fetched row to the
        driver. At production scale use ``crawl_trace_digest`` — the
        same parity information as an O(rounds) digest."""
        rows = []
        for rr in self.store.history():
            if 0 < rr <= upto.round:
                s = self.store.load(rr)
                if "fetched" in s.tables:
                    df = self.spark.read.parquet(s.tables["fetched"])
                    part = df.select("host", "priority", "depth", "url").collect()
                    part.sort(key=lambda x: (x["host"], x["priority"], x["depth"], x["url"]))
                    rows.extend((rr - 1, p["url"]) for p in part)
        return rows

    def crawl_trace_digest(self, upto: Snapshot) -> list[dict]:
        """Distributed trace parity (VERDICT r1 #8): per round, the count
        and an order-insensitive checksum of the fetched set — computed
        entirely JVM-side (xxhash64 + sum, whole-stage codegen); the
        driver receives one row per round, never the rows themselves.
        Two crawls (engine vs oracle, or run vs resume) agree on the
        (round, host, priority, depth, url) multiset iff digests match.
        """
        out = []
        for rr in self.store.history():
            if 0 < rr <= upto.round:
                s = self.store.load(rr)
                if "fetched" in s.tables:
                    df = self.spark.read.parquet(s.tables["fetched"])
                    out.append({"round": rr - 1, **trace_digest(df)})
        return out


def trace_digest(df: DataFrame) -> dict:
    """(n, checksum) of a trace-shaped DataFrame with columns
    (host, priority, depth, url). Order-insensitive: per-row xxhash64
    summed as decimal(38,0) — exact at any row count (no ANSI long
    overflow), reduced mod 2^64 driver-side. Used by the engine per
    round and by parity tests on the oracle's rows (same expression,
    same types)."""
    row = df.select(
        F.col("host").cast("string"),
        F.col("priority").cast("int"),
        F.col("depth").cast("int"),
        F.col("url").cast("string"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("host", "priority", "depth", "url").cast("decimal(38,0)")
        ).alias("checksum"),
    ).collect()[0]
    return {"n": int(row["n"]), "checksum": int(row["checksum"] or 0) % (1 << 64)}
