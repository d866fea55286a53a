"""One-off engine-vs-oracle parity sweep across config space (round-5
hardening): every case is a FULL parity crawl — seen set, exact
(round,host,priority,depth,url) trace, and per-seed fact lists must all
equal the pure-Python oracle's (oracle/crawler.py) on the same corpus.

The suite carries two unscanned-seed cases (tests/test_fuzz_parity.py)
to keep the pytest wall bounded; this script is the wide version run
out-of-band: new generator seeds crossed with frontier mode
(classic/stratified), wave mode (two-wave/single-wave), per-seed
budgets, a bigger corpus, and the synthetic (no-corpus-join) fetch
path. Results are recorded in BENCH.md / NOTES_r5.md.

    python scripts/parity_sweep.py            # full matrix
    python scripts/parity_sweep.py --extended # second matrix: wide state
                                              # layout x new seeds, 6-round
                                              # depth, budget x wave/fetch/
                                              # layout triples, 960-page corpus
    python scripts/parity_sweep.py --knobs    # third matrix: off-default
                                              # engine knobs (shuffle-hash
                                              # policy fallback, replenish
                                              # chunking, compaction cadence,
                                              # cold bucketing)
    python scripts/parity_sweep.py --lifecycle # fourth matrix: store/
                                              # lifecycle axes (pipelined
                                              # writes, interrupt+resume,
                                              # rate scaling, lineage,
                                              # run-to-drain)
    python scripts/parity_sweep.py --phys     # fifth matrix: physical/
                                              # payload knobs (salting
                                              # width, 4x px payloads with
                                              # verification on, verify off)
    python scripts/parity_sweep.py --quick    # first 4 cases (smoke)

Exit code 0 iff every case is bit-identical to the oracle.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnscrawler_spark import datagen
from dnscrawler_spark.oracle import crawler as oracle
from dnscrawler_spark.session import get_spark
from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine, FACT_KINDS

# cheap state layout (layout-only knobs; parity assertions are
# layout-independent — same rationale as tests/conftest.CHEAP_CRAWL_LAYOUT)
LAYOUT = dict(seen_shards=2, seen_bits=1 << 16, seen_buckets=1 << 10, partitions=2)


def case(fseed, *, stratified, two_wave=True, seed_budget=None, n=240,
         n_seeds=12, rounds=3, fetch_mode="join", layout=None, extra=None,
         rate_scale=1.0, resume_at=None, px_scale=1):
    return dict(fseed=fseed, stratified=stratified, two_wave=two_wave,
                seed_budget=seed_budget, n=n, n_seeds=n_seeds, rounds=rounds,
                fetch_mode=fetch_mode, layout=layout or LAYOUT,
                extra=extra or {}, rate_scale=rate_scale, resume_at=resume_at,
                px_scale=px_scale)


MATRIX = (
    # 1. new unscanned generator seeds, engine-default shape, both frontiers
    [case(s, stratified=st) for s in (37, 41, 43, 47, 53, 59) for st in (False, True)]
    # 2. single-wave on a subset
    + [case(s, stratified=st, two_wave=False) for s in (37, 43) for st in (False, True)]
    # 3. per-seed fetch budget (round-granular kill) on a subset
    + [case(s, stratified=st, seed_budget=3) for s in (41, 47) for st in (False, True)]
    # 4. bigger corpus, more seeds, one extra round
    + [case(61, stratified=st, n=480, n_seeds=20, rounds=4) for st in (False, True)]
    # 5. synthetic fetch (per-URL regeneration, no corpus join)
    + [case(37, stratified=st, fetch_mode="synthetic") for st in (False, True)]
)

# Second out-of-band matrix (--extended): crosses the axes the first
# sweep held fixed — the WIDE 8-shard/4-partition state layout on
# unscanned topologies (the suite runs it only at the scanned seed 13),
# depth beyond any in-suite crawl (6 rounds), and the axis triples the
# pairwise cases above never combine (budget × single-wave,
# budget × synthetic fetch, budget × wide layout).
WIDE = dict(seen_shards=8, seen_bits=1 << 16, seen_buckets=1 << 10, partitions=4)
MATRIX_EXTENDED = (
    # 1. wide state layout × new unscanned seeds, both frontiers
    [case(s, stratified=st, layout=WIDE) for s in (67, 71) for st in (False, True)]
    # 2. depth: 6 two-wave rounds (the suite's deepest crawl is 5)
    + [case(73, stratified=st, rounds=6) for st in (False, True)]
    # 3. triple interaction: per-seed budget under single-wave
    + [case(79, stratified=st, two_wave=False, seed_budget=3) for st in (False, True)]
    # 4. per-seed budget on the synthetic (no-corpus-join) fetch path
    + [case(83, stratified=st, fetch_mode="synthetic", seed_budget=4)
       for st in (False, True)]
    # 5. 4x the suite corpus: 960 pages, 24 seeds, 4 rounds
    + [case(89, stratified=st, n=960, n_seeds=24, rounds=4) for st in (False, True)]
    # 6. budget × wide layout × two-wave
    + [case(97, stratified=st, seed_budget=3, layout=WIDE) for st in (False, True)]
)

# Third matrix (--knobs): the engine knobs no fixture moves off their
# defaults — each is a pure performance/layout lever whose admissions
# and outputs must be bit-identical to the oracle (which has no such
# knobs at all). policy_broadcast_max=0 forces the shuffle-hash
# prepare_policy fallback in BOTH waves (the 10^10 round-0 path the
# broadcast-pruned fast path otherwise shadows at fixture scale);
# replenish_chunk changes the cold→hot pull amortization;
# state_compact_every=0 compacts the politeness token deltas every
# round; cold_buckets changes the cold-delta partitioning.
MATRIX_KNOBS = (
    [case(101, stratified=st, extra=dict(policy_broadcast_max=0))
     for st in (False, True)]
    + [case(103, stratified=True, extra=dict(replenish_chunk=c)) for c in (1, 8)]
    + [case(107, stratified=True, extra=dict(cold_buckets=4))]
    + [case(109, stratified=st, extra=dict(state_compact_every=0))
       for st in (False, True)]
    # everything at once, on top of a per-seed budget
    + [case(113, stratified=True, seed_budget=3, extra=dict(
        policy_broadcast_max=0, state_compact_every=0, replenish_chunk=1,
        cold_buckets=4))]
    + [case(113, stratified=False, seed_budget=3, extra=dict(
        policy_broadcast_max=0, state_compact_every=0))]
)


# Fourth matrix (--lifecycle): the store/lifecycle axes the first three
# matrices hold fixed (the suite covers each only at the scanned seed
# 13) — pipelined overlapped writes, interrupt-after-round-k + resume by
# a FRESH engine from disk only (eager and pipelined commit orders),
# politeness rate scaling (the only host-policy knob; the oracle models
# it too, so admissions must track it exactly), opt-in lineage
# collection (an extra cache-read job that must not perturb outputs),
# per-round cold-delta compaction, and run-to-drain (max_rounds far past
# the drain point: the A6 emptiness stop must fire at the same round as
# the oracle's — trace equality pins it).
MATRIX_LIFECYCLE = (
    # 1. pipelined writes on unscanned topologies, both frontiers
    [case(127, stratified=st, extra=dict(pipeline_writes=True))
     for st in (False, True)]
    # 2. interrupt@2 + fresh-engine resume, eager commit path
    + [case(131, stratified=st, rounds=4, resume_at=2) for st in (False, True)]
    # 3. interrupt@2 + resume composed with pipelined writes
    + [case(137, stratified=st, rounds=4, resume_at=2,
            extra=dict(pipeline_writes=True)) for st in (False, True)]
    # 4. politeness rate scaling (halved and doubled token rates)
    + [case(139, stratified=True, rate_scale=0.5),
       case(139, stratified=False, rate_scale=2.0)]
    # 5. opt-in lineage collection, both frontiers
    + [case(149, stratified=st, extra=dict(collect_lineage=True))
       for st in (False, True)]
    # 6. cold-delta compaction every round (stratified-only knob)
    + [case(151, stratified=True, extra=dict(cold_compact_every=0))]
    # 7. run-to-drain: the frontier empties well before max_rounds
    + [case(157, stratified=st, rounds=12) for st in (False, True)]
)


# Fifth matrix (--phys): the physical/payload knobs — host-salting
# width (n_salts spreads a hot host across partitions; admissions must
# not depend on it), px_scale (4x image payloads WITH per-row
# decoded-pixel verification on — the north-rule invariant at a bigger
# payload shape), and verify_payloads=False (the verification stage
# removed entirely must not change a crawl decision).
MATRIX_PHYS = (
    # 1. salting collapsed to 1 (no spread) and widened to 8
    [case(163, stratified=st, extra=dict(n_salts=1)) for st in (False, True)]
    + [case(167, stratified=True, extra=dict(n_salts=8))]
    # 2. 4x payload pixels, per-row PSNR/exact verification on
    + [case(173, stratified=st, px_scale=4) for st in (False, True)]
    # 3. payload verification off
    + [case(179, stratified=True, extra=dict(verify_payloads=False))]
)


def run_case(spark, c, root):
    n, fseed, px = c["n"], c["fseed"], c["px_scale"]
    n_hosts = datagen.default_n_hosts(n)
    corpus = [datagen.page_row(i, fseed, n, n_hosts, px) for i in range(n)]
    seeds = datagen.seed_urls(c["n_seeds"], n, seed=fseed)
    ores = oracle.crawl(corpus, seeds, max_rounds=c["rounds"], gen_seed=fseed,
                        seed_budget=c["seed_budget"], two_wave=c["two_wave"],
                        rate_scale=c["rate_scale"])

    cfg_kw = dict(max_rounds=c["rounds"], gen_seed=fseed, px_scale=px,
                  stratified=c["stratified"], two_wave=c["two_wave"],
                  seed_budget=c["seed_budget"], **c["layout"],
                  **c.get("extra", {}))
    if c["fetch_mode"] == "synthetic":
        pages = None
        hs = datagen.generate_host_state_synthetic(spark, n_hosts, c["rate_scale"])
        cfg = CrawlConfig(fetch_mode="synthetic", n_pages=n, **cfg_kw)
    else:
        pages = datagen.generate_pages(spark, n, seed=fseed, partitions=4,
                                       px_scale=px)
        hs = datagen.generate_host_state(pages, c["rate_scale"])
        cfg = CrawlConfig(**cfg_kw)
    eng = CrawlEngine(spark, pages, root, cfg)
    if c["resume_at"] is not None:
        # interrupt: run k rounds, flush (the pipelined durability
        # point; no-op on the eager path), throw the engine away, and
        # resume from the on-disk store with a FRESH engine
        snap = eng.start(seeds, hs)
        for _ in range(c["resume_at"]):
            if snap.metrics.get("done"):  # mirror run()'s stop-at-drain
                break
            snap = eng.run_round(snap)
        eng.flush()
        eng = CrawlEngine(spark, pages, root, cfg)
        resumed = eng.resume()
        assert resumed.round == snap.round
        final = eng.run(resumed)
    else:
        final = eng.run(eng.start(seeds, hs))

    got = {r["url"] for r in eng.seen_urls(final).collect()}
    bad = []
    if got != ores.seen:
        bad.append(f"seen: engine {len(got)} vs oracle {len(ores.seen)}")
    if eng.crawl_trace(final) != ores.trace:
        bad.append("trace mismatch")
    results = {r["seed"]: r for r in eng.results(final).collect()}
    if set(results) != set(ores.facts):
        bad.append("fact seed-set mismatch")
    else:
        for seed, kinds in ores.facts.items():
            for kind in FACT_KINDS:
                if list(results[seed][kind]) != sorted(kinds.get(kind, set())):
                    bad.append(f"facts {seed}/{kind}")
    return len(got), bad


def main():
    quick = "--quick" in sys.argv
    matrices = dict(extended=MATRIX_EXTENDED, knobs=MATRIX_KNOBS,
                    lifecycle=MATRIX_LIFECYCLE, phys=MATRIX_PHYS)
    picked = [k for k in matrices if f"--{k}" in sys.argv]
    if len(picked) > 1:
        # refuse rather than silently run only the first: an all-green
        # exit 0 here would record axes as swept that never ran
        sys.exit(f"pick ONE matrix flag, got {picked}")
    matrix = matrices[picked[0]] if picked else MATRIX
    if quick:
        matrix = matrix[:4]
    spark = get_spark(master=f"local[{os.environ.get('SWEEP_CPUS', '8')}]")
    # crawl-time session conf (what bench.py and the probes set)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    n_bad, lines = 0, []
    with tempfile.TemporaryDirectory(prefix="parity_sweep_") as tmp:
        for i, c in enumerate(matrix):
            t0 = time.monotonic()
            n_seen, bad = run_case(spark, c, os.path.join(tmp, f"case{i}"))
            dt = time.monotonic() - t0
            tag = (f"seed={c['fseed']} strat={int(c['stratified'])} "
                   f"2w={int(c['two_wave'])} budget={c['seed_budget']} "
                   f"n={c['n']} r={c['rounds']} mode={c['fetch_mode']} "
                   f"shards={c['layout']['seen_shards']}"
                   + (f" rate={c['rate_scale']}" if c["rate_scale"] != 1.0 else "")
                   + (f" px={c['px_scale']}" if c["px_scale"] != 1 else "")
                   + (f" resume@{c['resume_at']}" if c["resume_at"] is not None else "")
                   + (f" extra={c['extra']}" if c.get("extra") else ""))
            status = "OK " if not bad else "BAD"
            print(f"[{status}] {tag}: seen={n_seen} ({dt:.1f}s)"
                  + ("" if not bad else f"  {bad}"), flush=True)
            lines.append({**c, "seen": n_seen, "ok": not bad, "sec": round(dt, 1)})
            n_bad += bool(bad)
    print(json.dumps({"n_cases": len(matrix), "n_bad": n_bad, "cases": lines}))
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
