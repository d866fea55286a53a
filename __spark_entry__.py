"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one probe per implemented operator family from
SURVEY.md §2 (crawl-engine relational operators exercised on the
driver's TPC-H-ish tables) plus the training-data pipeline operators
(dedup / similarity / text) from dnscrawler_spark.operators.
``oracle_sql()`` mirrors each in DuckDB SQL with identical column names
and rounding. Every entry is hash-verified: operators whose hash
functions have no DuckDB builtin (xxhash64/simhash/LSH-ANN/binary
codecs) dump a brute-force pure-Python twin (dnscrawler_spark.oracle.
probes — scalar re-derivations, independent of the operators package)
that the oracle SQL reads back, the same dump-then-read pattern the
crawl probes use. Zero rows-only entries since round 5.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dnscrawler_spark.operators import dedup as D
from dnscrawler_spark.operators import similarity as S
from dnscrawler_spark.operators import text as TX

SF0001 = "/root/testdata/sf0.001"

BPE_RE = TX.BPE_ISH_RE
NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary aggregation (scan → filter → partial+
    final agg; the A1 fact-accumulation shape at TPC-H scale)."""
    return q_pricing_summary(spark, SF0001)


# --------------------------------------------------------------------------
# crawl-engine operator probes (SURVEY §2) on the driver tables
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


def q_j1_broadcast_join(spark, sf):
    # glue join J1: small hot dim broadcast (dnsresolver_new.py:125-126)
    nation, region = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_name", "r_name")


def q_j2_semi_join(spark, sf):
    # expansion-hit semi (J2): customers that do have orders
    customer, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return (
        customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_j3_anti_join(spark, sf):
    # seen-join J3: anti-join dedup (run/run.py:23 analog)
    customer, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_a1_collect_set(spark, sf):
    # fact-set accumulation A1/A5 (dnsresolver_new.py:160-173,288-297)
    # spread_input: the one-file scan ran the whole partial aggregation
    # in a single task (r6; result is set/count-valued — order-free).
    # countDistinct alongside collect_set plans ONE aggregation keyed by
    # (flag, orderkey) first — the collect_set buffers ride a
    # 1.5M-group ObjectHashAggregate chain (4 agg stages). Split into
    # two independent aggregations joined on the tiny group key, the
    # set aggregation runs over 3 groups and the distinct count is a
    # plain HashAggregate (r6, guide §2.3; 3.2 → 2.2 s warm,
    # row-identical incl. dtypes; plans/r06/a1_collect_set_after2.txt)
    li = D.spread_input(_t(spark, sf, "lineitem"))
    sets = li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
    )
    orders = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return sets.join(orders, "l_returnflag").select(
        "l_returnflag", "statuses", "n_orders"
    )


def q_a3_collect_list(spark, sf):
    # QuerySummaryList grouping A3 (querysummarylist.py:4-9)
    ev = _t(spark, sf, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ",",
    )
    return ev.groupBy("user_id").agg(F.count("*").alias("n_events"), seq.alias("seq"))


def q_a5_lower_distinct(spark, sf):
    # spread_input: same one-task-scan repair as a1 (set-valued result)
    orders = D.spread_input(_t(spark, sf, "orders"))
    return orders.select(F.lower("o_orderpriority").alias("p")).agg(
        F.array_join(F.sort_array(F.collect_set("p")), ",").alias("priorities")
    )


def q_so1_union_dedup(spark, sf):
    c, s = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def q_w2_priority_window(spark, sf):
    # salted priority-queue admit W2: row_number over (priority) ordering
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "rn")
    )


def q_w5_budget_topk(spark, sf):
    # per-host budget cap W5/X5: first-2-per-key
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_id", "rn")
    )


def q_p2_contains_filter(spark, sf):
    d = _t(spark, sf, "documents")
    return d.filter(F.col("text").contains("spark")).select("doc_id", "lang", "n_chars")


def q_p7_digit_filter(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.filter(F.col("source").rlike("[0-9]+$"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


def q_p6_value_filter(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("value") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


def q_f3_label_split(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.select(F.element_at(F.split("p_type", " "), 1).alias("first_word"))
        .groupBy("first_word")
        .agg(F.count("*").alias("n"))
    )


def _dump_oracle(name: str, make_pdf) -> None:
    """Compute a pure-Python oracle twin (zero-arg thunk) and write its
    frame for the DuckDB side (same pattern as the crawl probes: the
    probe runs first, the driver's oracle SQL reads the dump). Skipped
    when SPARK_GRAFT_SKIP_ORACLE_DUMP=1 — bench.py sets it so query
    timings measure the ENGINE, not the scalar correctness twin."""
    import os

    if os.environ.get("SPARK_GRAFT_SKIP_ORACLE_DUMP") == "1":
        return
    os.makedirs(_ORACLE_DUMP_DIR, exist_ok=True)
    make_pdf().to_parquet(
        os.path.join(_ORACLE_DUMP_DIR, f"{name}.parquet"), index=False
    )


def q_f12_xxhash_keys(spark, sf):
    # engine URL keying F12; the DuckDB twin reads the pure-Python
    # xxhash64 re-implementation's output (oracle/pyxxhash.py) — no
    # longer rows-only (VERDICT r4 #1)
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("f12_oracle", lambda: OP.f12_xxhash_keys(sf))
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.xxhash64("text").alias("url_key"))


def q_p1_isin_filter(spark, sf):
    # record-type filter P1 (pydns.py:62): keep rows whose type is in
    # the requested set
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_p3_conditional_split(spark, sf):
    # address-type split P3 (dnsresolver_new.py:70-82): when/otherwise
    # routing + per-class aggregation
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn(
            "family",
            F.when(F.col("value") >= 50, F.lit("high")).otherwise(F.lit("low")),
        )
        .groupBy("event_type", "family")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def q_p10_cross_key_filter(spark, sf):
    # cross-domain predicate P10 (dnsresolver_new.py:130-133): join then
    # keep only pairs whose keys mismatch
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    j = c.join(s, c["c_nationkey"] == s["s_nationkey"], "inner")
    return (
        j.filter(F.col("c_custkey") % 100 != F.col("s_suppkey") % 100)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_pairs"))
    )


def q_j4_union_by_key(spark, sf):
    # response merge J4 (dnsresolver_new.py:231,234): union-by-key of
    # set-valued facts across sources
    c = _t(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_mktsegment").alias("tag")
    )
    o = (
        _t(spark, sf, "orders")
        .join(_t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("nationkey"), F.col("o_orderpriority").alias("tag"))
    )
    return (
        c.union(o)
        .groupBy("nationkey")
        .agg(F.array_join(F.sort_array(F.collect_set("tag")), ",").alias("tags"))
    )


def q_a4_dedup_by_key(spark, sf):
    # per-response rdata dedup A4 (pydns.py:63): one row per key, keeping
    # the min payload (deterministic stand-in for dict-insert order)
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.min("l_quantity").alias("qty"))
        .groupBy()
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("qty"), 2).alias("sum_qty"))
    )


def q_f1_f11_canon(spark, sf):
    # the URL-canonicalizer function family F1-F11 exercised as one
    # expression pipeline: lower, trim/regex, split, slice, concat_ws
    p = _t(spark, sf, "part")
    labels = F.split(F.lower(F.col("p_type")), " ")
    return p.select(
        F.col("p_partkey"),
        F.concat_ws(".", F.slice(labels, 2, 2)).alias("canon_suffix"),
        F.element_at(labels, 1).alias("first_label"),
        F.length(F.regexp_replace(F.col("p_name"), "[aeiou]", "")).alias("consonants"),
    )


def q_composite_order_revenue(spark, sf):
    # composite probe: 3-way join + filter + agg + top-k (the analysis
    # query shape of run/pandastest.py at TPC-H scale)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("c_mktsegment") == "BUILDING")
    )
    agg = j.groupBy("o_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("o_orderkey", "o_orderdate", "revenue", "rn")
    )


def q_composite_region_volume(spark, sf):
    # composite probe: 5-way star join through dims (broadcast-heavy)
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j = (
        r.join(n, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(c, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return j.groupBy("r_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------
# training-data pipeline operators
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.countDistinct(D.normalize_text(F.col("text"))).alias("n_unique"),
        F.count("*").alias("n_docs"),
    )


def q_dedup_jaccard(spark, sf):
    return D.jaccard_pairs(_t(spark, sf, "documents"), threshold=0.12, g=5)


def q_dedup_minhash_lsh(spark, sf):
    return D.lsh_candidate_pairs(_t(spark, sf, "documents"), n_hashes=16, bands=4, g=5)


def q_dedup_minhash_groups(spark, sf):
    # the generic cluster/survivor stage on the TEXT table: MinHash-LSH
    # pairs (the audited dedup_minhash_lsh pipeline) -> alternating-star
    # connected components -> min-doc_id survivor per duplicate cluster.
    # The twin re-derives clusters with pure-Python union-find over the
    # pair list produced by the SAME audited DuckDB SQL (oracle/probes.py)
    # — so this gate isolates exactly the new cluster/survivor stage.
    from dnscrawler_spark.operators import components as CC
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle(
        "minhash_groups_oracle",
        lambda: OP.dedup_minhash_groups(sf, oracle_sql()["dedup_minhash_lsh"]),
    )
    docs = _t(spark, sf, "documents")
    pairs = D.lsh_candidate_pairs(docs, n_hashes=16, bands=4, g=5)
    return CC.dedup_survivors(
        docs.select("doc_id"), pairs, id_col="doc_id", id_a="doc_a", id_b="doc_b"
    ).select("doc_id", "component", "keep")


def q_dedup_simhash(spark, sf):
    # xxhash64-based; verified against the scalar SimHash twin
    # (oracle/probes.py: same sign-vote law, same pigeonhole candidate
    # set, re-derived without Catalyst)
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("simhash_oracle", lambda: OP.dedup_simhash_pairs(sf, max_hamming=8))
    return D.simhash_near_pairs(_t(spark, sf, "documents"), max_hamming=8)


def q_text_tokens(spark, sf):
    return TX.token_counts(_t(spark, sf, "documents"))


def q_text_quality(spark, sf):
    return TX.quality_scores(_t(spark, sf, "documents"))


def q_text_langid(spark, sf):
    return TX.lang_id(_t(spark, sf, "documents"))


def q_text_fingerprints(spark, sf):
    return TX.fingerprints(_t(spark, sf, "documents"), g=8)


def q_dedup_embedding_cosine(spark, sf):
    # embedding-cosine near-dup (exact baseline; LSH variant is the
    # scale path, recall-tested in tests/)
    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return D.embedding_near_dup(e.filter(F.col("vec_id") < 300), threshold=0.3)


def q_dedup_embedding_groups(spark, sf):
    # third application of the cluster/survivor stage: the EMBEDDING
    # modality's cosine-threshold pair graph (pairs audited via the
    # dedup_embedding_cosine SQL twin) -> components -> min-vec_id
    # survivor. With phash (image) and minhash (text), all three
    # pair-producing modalities now gate the same generic stage.
    from dnscrawler_spark.operators import components as CC
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle(
        "embedding_groups_oracle",
        lambda: OP.dedup_embedding_groups(sf, oracle_sql()["dedup_embedding_cosine"]),
    )
    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    ).filter(F.col("vec_id") < 300)
    pairs = D.embedding_near_dup(e, threshold=0.3)
    return CC.dedup_survivors(
        e.select("vec_id"), pairs, id_col="vec_id", id_a="id_a", id_b="id_b"
    ).select("vec_id", "component", "keep")


def q_streaming_windowed_counts(spark, sf):
    # Structured Streaming: file source -> watermark -> tumbling window
    # agg -> availableNow; result equals the batch windowed agg, so it
    # oracle-checks against plain SQL
    from dnscrawler_spark.streaming.windows import windowed_event_counts

    return windowed_event_counts(spark, f"{sf}/events.parquet")


def q_streaming_stateful_stats(spark, sf):
    # custom stateful streaming op (applyInPandasWithState): per-key
    # running tracker; final state equals the batch groupBy
    from dnscrawler_spark.streaming.stateful import running_user_stats

    return running_user_stats(spark, f"{sf}/events.parquet")


_MM_N = 96  # ≥64 rows across fmt ∈ {raw, png, qjpg, stub} (VERDICT r4 #6)


def _mm_pages(spark, n):
    """The mm probes' corpus: datagen pages with 2/10 of rows
    deterministically relabeled as an EXTERNAL format, so the stub path
    (decode_ok=false) is probe-covered, not just unit-tested."""
    from dnscrawler_spark import datagen

    pages = datagen.generate_pages(spark, n, seed=7, partitions=4)
    return pages.withColumn(
        "fmt",
        F.when(
            F.substring("image_id", -1, 1).isin("3", "8"), F.lit("jpeg")
        ).otherwise(F.col("fmt")),
    )


def q_mm_decode_features(spark, sf):
    # multimodal decode/feature plumbing: per-image feature rows across
    # raw/png/qjpg plus stub-format rows (decode_ok=false). The DuckDB
    # twin reads the scalar re-derivation (oracle/probes.py: lossless
    # round-trip law + qjpg quantization midpoints) — fully verified.
    from dnscrawler_spark.operators import multimodal as MM
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("mm_decode_oracle", lambda: OP.mm_decode_features(_MM_N, 7))
    feats = MM.decode_features(_mm_pages(spark, _MM_N))
    return feats.select(
        "image_id", "fmt", "dec_w", "dec_h", "channels",
        F.round("mean_luma", 6).alias("mean_luma"), "decode_ok",
    )


def q_mm_frame_sample(spark, sf):
    # one row per sampled frame (the batch-explode shape), stub rows
    # skipped — verified against the scalar twin like mm_decode_features
    from dnscrawler_spark.operators import multimodal as MM
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("mm_frames_oracle", lambda: OP.mm_frame_sample(_MM_N, 7, every=4))
    frames = MM.frame_sample(_mm_pages(spark, _MM_N), every=4)
    return frames.select(
        "image_id", "frame_idx", F.round("row_luma", 6).alias("row_luma")
    )


_PH_N = 256  # 64 planted clusters × 4 variants (0/1/2/3 flipped bits)


def _phash_probe_images(spark, n):
    """Deterministic phash corpus with planted near-dup clusters: each
    group of 4 image_ids shares an xxhash64 base; variant v flips the
    first v of 3 group-keyed bit positions, so intra-group hamming is
    small and structured while inter-group distance is ~32 bits.
    (datagen's corpus phash is avalanche-mixed — real near-dup pairs
    would be vanishingly rare there, so the probe plants its own.)"""
    df = spark.range(n).select(
        F.format_string("img-%012d", F.col("id")).alias("image_id"),
        (F.col("id") / 4).cast("long").alias("grp"),
        (F.col("id") % 4).cast("int").alias("variant"),
    )
    ph = F.xxhash64(F.col("grp"))
    for k in range(3):
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64(grp * 8 + {k + 100}), 64) AS INT))"
        )
        ph = F.when(F.col("variant") > k, ph.bitwiseXOR(mask)).otherwise(ph)
    return df.select("image_id", ph.alias("phash"), "variant")


def q_mm_phash_near_dup(spark, sf):
    # image-payload near-dedup over the input-hint's phash:int64 column
    # (the image analog of dedup_simhash_pairs): pigeonhole block join,
    # exact at hamming<=3 with 4 chunks. The DuckDB twin reads the
    # brute-force all-pairs scalar re-derivation (oracle/probes.py) —
    # a blocking bug that dropped pairs would hash-mismatch.
    from dnscrawler_spark.operators import dedup as DD
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("phash_oracle", lambda: OP.mm_phash_near_dup(_PH_N))
    imgs = _phash_probe_images(spark, _PH_N)
    return DD.phash_near_dup(imgs, max_hamming=3)


_PHG_N = 257  # 64 planted 4-variant clusters + ONE pairless singleton


def q_dedup_phash_groups(spark, sf):
    # the full image-dedup pipeline: near-dup PAIRS (pigeonhole phash
    # join) -> duplicate CLUSTERS (alternating-star connected
    # components) -> one canonical survivor per cluster (max variant,
    # ties min id). The DuckDB twin reads a pure-Python re-derivation
    # built with entirely different machinery (brute-force popcount +
    # union-find, oracle/probes.py) — a star-iteration bug that split or
    # merged a component, or a mis-elected survivor, hash-mismatches.
    from dnscrawler_spark.operators import components as CC, dedup as DD
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("phash_groups_oracle", lambda: OP.dedup_phash_groups(_PHG_N))
    imgs = _phash_probe_images(spark, _PHG_N)
    pairs = DD.phash_near_dup(imgs, max_hamming=3)
    return CC.dedup_survivors(
        imgs.select("image_id", "variant"),
        pairs,
        id_col="image_id",
        id_a="img_a",
        id_b="img_b",
        prefer="variant",
    ).select("image_id", "component", "keep")


_FIXTURE_CRAWL_CACHE: dict[int, tuple] = {}
_ORACLE_DUMP_DIR = "/tmp/dnscrawler_spark_probe"

# Fixture shape (VERDICT r3 #1: the r2 shape needed 8 two-wave rounds to
# reach the qmin motif, which blew the probes past the driver's
# correctness-harness patience). This shape was scanned for motif
# richness: at gen_seed=13 / 12 seeds / 5 rounds the oracle emits 14
# fact kinds — glue_resolved, hazardous, ip_ns_records,
# missing_ns_records, qmin_requery, robots_blocked, ps_* promotions and
# the url/host/tld/sld base — a strict superset of the old 8-round
# fixture's 8 kinds, at 5/8 the rounds.
_FIX_N = 240
_FIX_SEED = 13
_FIX_NSEEDS = 12
_FIX_ROUNDS = 5


def _fixture_crawl(spark):
    """One fixture crawl shared by every crawl_* probe (engine run +
    pure-Python oracle run), cached per SparkSession."""
    key = id(spark)
    if key in _FIXTURE_CRAWL_CACHE:
        return _FIXTURE_CRAWL_CACHE[key]
    import tempfile

    from dnscrawler_spark import datagen
    from dnscrawler_spark.oracle import crawler as oracle_crawler
    from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

    n = _FIX_N
    cfg = CrawlConfig(
        # 2-way state/shuffle layout: a 240-page crawl is pure scheduling
        # latency — fewer shards/partitions = fewer tiny tasks per stage
        # (shape-only knobs; admission/parity are layout-independent)
        max_rounds=_FIX_ROUNDS, seen_shards=2, seen_bits=1 << 16,
        seen_buckets=1 << 10, partitions=2, fetch_mode="synthetic",
        n_pages=n, collect_lineage=False, gen_seed=_FIX_SEED,
        # writes overlap the next round's compute (parity-tested:
        # test_pipelined_writes_parity) — measured -43% fixture wall
        pipeline_writes=True,
    )
    hs = datagen.generate_host_state_synthetic(spark, datagen.default_n_hosts(n))
    eng = CrawlEngine(spark, None, tempfile.mkdtemp(prefix="q_crawl_"), cfg)
    # tiny fixture crawl: narrow shuffles + no AQE barriers (restored)
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        snap = eng.start(datagen.seed_urls(_FIX_NSEEDS, n, seed=_FIX_SEED), hs)
        final = eng.run(snap)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", shuf)
    # independent implementation: the sequential pure-Python oracle
    # crawler on the same corpus/seeds (no Spark, no shared operators)
    n_hosts = datagen.default_n_hosts(n)
    corpus = [datagen.page_row(i, _FIX_SEED, n, n_hosts) for i in range(n)]
    ores = oracle_crawler.crawl(
        corpus, datagen.seed_urls(_FIX_NSEEDS, n, seed=_FIX_SEED),
        max_rounds=_FIX_ROUNDS, gen_seed=_FIX_SEED,
    )
    _FIXTURE_CRAWL_CACHE[key] = (eng, final, ores)
    return _FIXTURE_CRAWL_CACHE[key]


def q_crawl_results(spark, sf):
    """The flagship end-to-end: a full crawl on the fixture corpus, one
    row per seed with sorted fact arrays (domain_dict analog,
    dnsresolver_new.py:280-298). The DuckDB twin re-pivots the fact rows
    the independent pure-Python oracle crawler produced for the same
    corpus + seeds (dumped here) — the driver's hash compare IS the
    engine-vs-oracle per-seed facts parity check."""
    import os

    import pandas as pd

    eng, final, ores = _fixture_crawl(spark)
    os.makedirs(_ORACLE_DUMP_DIR, exist_ok=True)
    rows = [
        (seed, kind, v)
        for seed, kinds in ores.facts.items()
        for kind, vals in kinds.items()
        for v in vals
    ]
    pd.DataFrame(rows, columns=["seed", "kind", "value"]).to_parquet(
        os.path.join(_ORACLE_DUMP_DIR, "facts_oracle.parquet"), index=False
    )
    res = eng.results(final).drop("misconfigured")  # map covered by
    # crawl_failure_detail (hash-checked); arrays joined for stable hashing
    arr_cols = [c for c in res.columns if c != "seed"]
    return res.select(
        "seed", *[F.array_join(F.col(c), "|").alias(c) for c in arr_cols]
    ).orderBy("seed")


def q_crawl_failure_detail(spark, sf):
    """A3 full shape (QuerySummaryList analog): flattened failure-detail
    rows from the ENGINE crawl. The DuckDB twin reads the rows the
    independent pure-Python oracle crawler produced for the same corpus
    + seeds (dumped to parquet here) — so the driver's hash compare IS
    the engine-vs-oracle parity check for who/when/how-many-attempts."""
    import os

    import pandas as pd

    eng, final, ores = _fixture_crawl(spark)
    # dump the oracle's raw failure records for the DuckDB side
    os.makedirs(_ORACLE_DUMP_DIR, exist_ok=True)
    rows = [
        (seed, cls, url, src, code, rnd, att)
        for seed, classes in ores.failure_detail.items()
        for cls, items in classes.items()
        for (url, src, code, rnd, att) in items
    ]
    pd.DataFrame(
        rows, columns=["seed", "fail_class", "url", "src", "code", "round", "attempts"]
    ).astype({"round": "int64", "attempts": "int64"}).to_parquet(
        os.path.join(_ORACLE_DUMP_DIR, "failure_detail_oracle.parquet"), index=False
    )
    det = eng.failure_detail(final)
    flat = det.select(
        "seed", F.explode("misconfigured").alias("fail_class", "items")
    ).select("seed", "fail_class", F.explode("items").alias("it"))
    return flat.select(
        "seed",
        "fail_class",
        F.col("it.url").alias("url"),
        F.col("it.src").alias("src"),
        F.col("it.code").alias("code"),
        F.col("it.round").cast("long").alias("round"),
        F.col("it.attempts").cast("long").alias("attempts"),
    )


_FIXTURE_STRAT_CACHE: dict[int, tuple] = {}


def _fixture_crawl_stratified(spark):
    """Fixture crawl with the stratified (hot/cold) frontier — the
    10^10-scale mode (operators/stratified.py): politeness ranks only
    the hot horizon, the backlog is append-only cold deltas, the
    in-flight cycle break runs through the fused ever-enqueued exact
    filter. Admission must still be bit-identical to the oracle."""
    key = id(spark)
    if key in _FIXTURE_STRAT_CACHE:
        return _FIXTURE_STRAT_CACHE[key]
    import tempfile

    from dnscrawler_spark import datagen
    from dnscrawler_spark.oracle import crawler as oracle_crawler
    from dnscrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

    n = _FIX_N
    cfg = CrawlConfig(
        max_rounds=_FIX_ROUNDS, seen_shards=2, seen_bits=1 << 16,
        seen_buckets=1 << 10, partitions=2, fetch_mode="synthetic",
        n_pages=n, collect_lineage=False, stratified=True, gen_seed=_FIX_SEED,
        pipeline_writes=True,  # parity-tested; -43% fixture wall
    )
    hs = datagen.generate_host_state_synthetic(spark, datagen.default_n_hosts(n))
    eng = CrawlEngine(spark, None, tempfile.mkdtemp(prefix="q_strat_"), cfg)
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        snap = eng.start(datagen.seed_urls(_FIX_NSEEDS, n, seed=_FIX_SEED), hs)
        final = eng.run(snap)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", shuf)
    n_hosts = datagen.default_n_hosts(n)
    corpus = [datagen.page_row(i, _FIX_SEED, n, n_hosts) for i in range(n)]
    ores = oracle_crawler.crawl(
        corpus, datagen.seed_urls(_FIX_NSEEDS, n, seed=_FIX_SEED),
        max_rounds=_FIX_ROUNDS, gen_seed=_FIX_SEED,
    )
    _FIXTURE_STRAT_CACHE[key] = (eng, final, ores)
    return _FIXTURE_STRAT_CACHE[key]


def q_crawl_stratified_trace(spark, sf):
    """Stratified-frontier crawl ORDER parity, row-exact: every fetched
    (round, host, priority, depth, url) from the stratified engine run
    vs the oracle's trace (dumped to parquet for the DuckDB twin). A
    hash match here means the hot/cold split + deficit replenish made
    the EXACT admission decisions the full-queue oracle makes."""
    import os
    from functools import reduce

    import pandas as pd

    eng, final, ores = _fixture_crawl_stratified(spark)
    os.makedirs(_ORACLE_DUMP_DIR, exist_ok=True)
    pd.DataFrame(
        ores.trace_full, columns=["round", "host", "priority", "depth", "url"]
    ).astype({"round": "int64", "priority": "int64", "depth": "int64"}).to_parquet(
        os.path.join(_ORACLE_DUMP_DIR, "strat_trace_oracle.parquet"), index=False
    )
    parts = []
    for rr in eng.store.history():
        if 0 < rr <= final.round:
            s = eng.store.load(rr)
            if "fetched" in s.tables:
                parts.append(
                    spark.read.parquet(s.tables["fetched"]).select(
                        F.lit(rr - 1).cast("long").alias("round"),
                        "host",
                        F.col("priority").cast("long").alias("priority"),
                        F.col("depth").cast("long").alias("depth"),
                        "url",
                    )
                )
    out = reduce(lambda a, b: a.union(b), parts)
    return out.orderBy("round", "host", "priority", "depth", "url")


def q_sim_cosine_topk(spark, sf):
    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return S.cosine_topk(e, e.filter(F.col("vec_id") == 0), k=10)


def q_sim_lsh_topk(spark, sf):
    # approximate ANN — recall vs exact is property-tested; result
    # EXACTNESS (deterministic buckets, multi-probe set, re-rank order)
    # is verified against the scalar twin in oracle/probes.py
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle("lsh_topk_oracle", lambda: OP.sim_lsh_topk(sf, k=10, n_planes=12, n_queries=4))
    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return S.lsh_topk(e, e.filter(F.col("vec_id") < 4), k=10, n_planes=12)


def q_sim_ivf_topk(spark, sf):
    # the OTHER ANN scale path (inverted-file coarse quantizer) next to
    # lsh_topk; deterministic centroids, so result EXACTNESS (assignment,
    # probe set, re-rank order) is verified against the scalar twin
    from dnscrawler_spark.oracle import probes as OP

    _dump_oracle(
        "ivf_topk_oracle",
        lambda: OP.sim_ivf_topk(sf, k=10, n_centroids=16, n_probe=4, n_queries=4),
    )
    e = _t(spark, sf, "embeddings")
    return S.ivf_topk(
        e, e.filter(F.col("vec_id") < 4), k=10, n_centroids=16, n_probe=4
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q_pricing_summary,
        "j1_broadcast_join": q_j1_broadcast_join,
        "j2_semi_join": q_j2_semi_join,
        "j3_anti_join": q_j3_anti_join,
        "a1_collect_set": q_a1_collect_set,
        "a3_collect_list": q_a3_collect_list,
        "a5_lower_distinct": q_a5_lower_distinct,
        "so1_union_dedup": q_so1_union_dedup,
        "w2_priority_window": q_w2_priority_window,
        "w5_budget_topk": q_w5_budget_topk,
        "p2_contains_filter": q_p2_contains_filter,
        "p7_digit_filter": q_p7_digit_filter,
        "p6_value_filter": q_p6_value_filter,
        "f3_label_split": q_f3_label_split,
        "f12_xxhash_keys": q_f12_xxhash_keys,
        "p1_isin_filter": q_p1_isin_filter,
        "p3_conditional_split": q_p3_conditional_split,
        "p10_cross_key_filter": q_p10_cross_key_filter,
        "j4_union_by_key": q_j4_union_by_key,
        "a4_dedup_by_key": q_a4_dedup_by_key,
        "f1_f11_canon": q_f1_f11_canon,
        "composite_order_revenue": q_composite_order_revenue,
        "composite_region_volume": q_composite_region_volume,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard_pairs": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash_pairs": q_dedup_simhash,
        "text_token_counts": q_text_tokens,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprints": q_text_fingerprints,
        "sim_cosine_topk": q_sim_cosine_topk,
        "sim_lsh_topk": q_sim_lsh_topk,
        "sim_ivf_topk": q_sim_ivf_topk,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "streaming_windowed_counts": q_streaming_windowed_counts,
        "streaming_stateful_stats": q_streaming_stateful_stats,
        "mm_decode_features": q_mm_decode_features,
        "mm_frame_sample": q_mm_frame_sample,
        "mm_phash_near_dup": q_mm_phash_near_dup,
        "dedup_phash_groups": q_dedup_phash_groups,
        "dedup_minhash_groups": q_dedup_minhash_groups,
        "dedup_embedding_groups": q_dedup_embedding_groups,
        "crawl_results": q_crawl_results,
        "crawl_failure_detail": q_crawl_failure_detail,
        "crawl_stratified_trace": q_crawl_stratified_trace,
    }


# --------------------------------------------------------------------------
# DuckDB oracle SQL (identical column names + rounding)
# --------------------------------------------------------------------------


def _crawl_results_sql() -> str:
    """Pivot the dumped oracle fact rows into one row per seed with
    '|'-joined sorted value lists per fact kind — the exact shape
    q_crawl_results returns for the engine run."""
    from dnscrawler_spark.streaming.rounds import FACT_KINDS

    cols = ",\n                   ".join(
        f"coalesce(string_agg(value, '|' ORDER BY value) "
        f"FILTER (WHERE kind = '{k}'), '') AS {k}"
        for k in FACT_KINDS
    )
    return f"""
            SELECT seed,
                   {cols}
            FROM read_parquet('/tmp/dnscrawler_spark_probe/facts_oracle.parquet')
            GROUP BY seed ORDER BY seed
        """

_SHINGLE_CTE = f"""
words AS (
  SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS shingle
  FROM words, unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)
  WHERE len(ws) >= 5
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "j1_broadcast_join": """
            SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "j2_semi_join": """
            SELECT c_mktsegment, count(*) AS n_customers FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "j3_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "a1_collect_set": """
            SELECT l_returnflag,
                   string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_returnflag
        """,
        "a3_collect_list": """
            SELECT user_id, count(*) AS n_events,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        """,
        "a5_lower_distinct": """
            SELECT string_agg(DISTINCT p, ',' ORDER BY p) AS priorities
            FROM (SELECT lower(o_orderpriority) AS p FROM orders)
        """,
        "so1_union_dedup": """
            SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey FROM supplier
        """,
        "w2_priority_window": """
            SELECT o_orderpriority, o_orderkey, rn FROM (
              SELECT o_orderpriority, o_orderkey,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3
        """,
        "w5_budget_topk": """
            SELECT user_id, event_id, rn FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn <= 2
        """,
        "p2_contains_filter": """
            SELECT doc_id, lang, n_chars FROM documents WHERE contains(text, 'spark')
        """,
        "p7_digit_filter": """
            SELECT source, count(*) AS n FROM documents
            WHERE regexp_matches(source, '[0-9]+$') GROUP BY source
        """,
        "p6_value_filter": """
            SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
            FROM events WHERE value > 50 GROUP BY event_type
        """,
        "f3_label_split": """
            SELECT split_part(p_type, ' ', 1) AS first_word, count(*) AS n
            FROM part GROUP BY first_word
        """,
        "p1_isin_filter": """
            SELECT event_type, count(*) AS n FROM events
            WHERE event_type IN ('click', 'view') GROUP BY event_type
        """,
        "p3_conditional_split": """
            SELECT event_type,
                   CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS family,
                   count(*) AS n, round(sum(value), 6) AS sum_value
            FROM events GROUP BY event_type, family
        """,
        "p10_cross_key_filter": """
            SELECT c_nationkey, count(*) AS n_pairs
            FROM customer JOIN supplier ON c_nationkey = s_nationkey
            WHERE c_custkey % 100 <> s_suppkey % 100
            GROUP BY c_nationkey
        """,
        "j4_union_by_key": """
            WITH u AS (
              SELECT c_nationkey AS nationkey, c_mktsegment AS tag FROM customer
              UNION ALL
              SELECT c_nationkey AS nationkey, o_orderpriority AS tag
              FROM orders JOIN customer ON o_custkey = c_custkey)
            SELECT nationkey,
                   string_agg(DISTINCT tag, ',' ORDER BY tag) AS tags
            FROM u GROUP BY nationkey
        """,
        "a4_dedup_by_key": """
            SELECT count(*) AS n_rows, round(sum(qty), 2) AS sum_qty FROM (
              SELECT l_orderkey, l_linenumber, min(l_quantity) AS qty
              FROM lineitem GROUP BY l_orderkey, l_linenumber)
        """,
        "f1_f11_canon": """
            SELECT p_partkey,
                   coalesce(array_to_string(list_slice(string_split(lower(p_type), ' '), 2, 3), '.'), '')
                     AS canon_suffix,
                   string_split(lower(p_type), ' ')[1] AS first_label,
                   length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS consonants
            FROM part
        """,
        "composite_order_revenue": """
            SELECT o_orderkey, o_orderdate, revenue, rn FROM (
              SELECT o_orderkey, o_orderdate,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                     row_number() OVER (
                       ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
                                o_orderkey) AS rn
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              WHERE c_mktsegment = 'BUILDING'
              GROUP BY o_orderkey, o_orderdate)
            WHERE rn <= 20
        """,
        "composite_region_volume": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM region
            JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY r_name
        """,
        "dedup_exact": f"""
            SELECT lang, count(DISTINCT {NORM}) AS n_unique, count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "dedup_jaccard_pairs": f"""
            WITH {_SHINGLE_CTE},
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000),
            sf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN ok USING(shingle)),
            common AS (
              SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, count(*) AS n_common
              FROM sf a JOIN sf c USING(shingle) WHERE a.doc_id < c.doc_id
              GROUP BY a.doc_id, c.doc_id)
            SELECT doc_a, doc_b,
                   round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.12
        """,
        "dedup_minhash_lsh": f"""
            WITH {_SHINGLE_CTE},
            mh AS (
              SELECT doc_id, h, min(md5(h::varchar || '_' || shingle)) AS minv
              FROM sh, unnest(range(0, 16)) AS t(h) GROUP BY doc_id, h),
            sig AS (SELECT doc_id, list(minv ORDER BY h) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, bb AS band,
                     md5(array_to_string(list_slice(sig, bb*4+1, bb*4+4), '|')) AS bucket
              FROM sig, unnest(range(0, 4)) AS t(bb))
            SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
            FROM bands a JOIN bands c ON a.band = c.band AND a.bucket = c.bucket
            WHERE a.doc_id < c.doc_id
        """,
        "text_token_counts": f"""
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
                   length(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens
            FROM documents
        """,
        "text_quality": """
            WITH f AS (
              SELECT doc_id,
                     len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                     len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     w -> w IN ('a','the','of','and','in'))) AS n_stop,
                     length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
                     length(text) AS n_chars
              FROM documents)
            SELECT doc_id, n_tok AS n_tokens, n_chars AS n_chars_measured,
                   round(n_stop / n_tok, 6) AS stopword_ratio,
                   round(n_punct / n_chars, 6) AS punct_ratio,
                   (5 * least(n_tok, 100)
                    + 3 * least(CAST(floor(500 * n_stop / n_tok) AS BIGINT), 100)
                    + 2 * (100 - least(CAST(floor(1000 * n_punct / n_chars) AS BIGINT), 100)))
                     AS quality_x1000
            FROM f
        """,
        "text_langid": """
            WITH f AS (
              SELECT doc_id, lang,
                     string_split_regex(trim(text), '\\s+') AS ws
              FROM documents)
            SELECT doc_id, lang AS lang_true,
                   CASE
                     WHEN len(list_filter(ws, w -> w = 'the')) * 1000 >= len(ws) * 60 THEN 'en'
                     WHEN len(list_filter(ws, w -> w = 'a')) * 1000 >= len(ws) * 60 THEN 'es'
                     WHEN len(list_filter(ws, w -> w = 'big')) * 1000 >= len(ws) * 40 THEN 'zh'
                     ELSE 'other'
                   END AS lang_pred
            FROM f
        """,
        "text_fingerprints": f"""
            WITH words AS (
              SELECT doc_id, {NORM} AS norm, string_split({NORM}, ' ') AS ws FROM documents),
            sh AS (
              SELECT doc_id, md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS h
              FROM words, unnest(range(1, greatest(len(ws) - 6, 1))) AS t(i)
              WHERE len(ws) >= 8)
            SELECT w.doc_id, coalesce(m.fp, md5(w.norm)) AS fingerprint
            FROM words w LEFT JOIN
                 (SELECT doc_id, min(h) AS fp FROM sh GROUP BY doc_id) m USING(doc_id)
        """,
        "dedup_embedding_cosine": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings WHERE vec_id < 300)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v) /
                         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                         6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v) /
                        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                        6) >= 0.3
        """,
        "streaming_windowed_counts": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n, round(sum(value), 6) AS sum_value
            FROM events GROUP BY window_start, event_type
        """,
        "streaming_stateful_stats": """
            SELECT user_id, count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY user_id
        """,
        "crawl_failure_detail": """
            SELECT seed, fail_class, url, src, code, round, attempts
            FROM read_parquet('/tmp/dnscrawler_spark_probe/failure_detail_oracle.parquet')
        """,
        # engine-vs-oracle per-seed facts parity (NOTES_r2 #3): re-pivot
        # the dumped oracle fact rows into the same seed × kind arrays
        "crawl_results": _crawl_results_sql(),
        # stratified-frontier crawl order, row-exact vs the oracle trace
        "crawl_stratified_trace": """
            SELECT round, host, priority, depth, url
            FROM read_parquet('/tmp/dnscrawler_spark_probe/strat_trace_oracle.parquet')
            ORDER BY round, host, priority, depth, url
        """,
        "sim_cosine_topk": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id = 0),
            s AS (
              SELECT q.query_id, e.vec_id,
                     round(list_dot_product(e.v, q.qv) /
                           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))),
                           6) AS score
              FROM e, q WHERE e.vec_id <> q.query_id)
            SELECT query_id, vec_id, score, rn FROM (
              SELECT *, row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM s)
            WHERE rn <= 10
        """,
        # ------------------------------------------------------------------
        # The five former rows-only probes (VERDICT r4 #1): each Spark probe
        # dumps a brute-force pure-Python twin (oracle/probes.py — scalar
        # xxhash64 + plain loops, independent of the operators package) and
        # the oracle side reads it back, so the driver hash-compares engine
        # vs independent re-derivation. Same dump-then-read pattern as the
        # crawl probes above.
        "f12_xxhash_keys": """
            SELECT doc_id, url_key
            FROM read_parquet('/tmp/dnscrawler_spark_probe/f12_oracle.parquet')
        """,
        "dedup_simhash_pairs": """
            SELECT doc_a, doc_b, hamming
            FROM read_parquet('/tmp/dnscrawler_spark_probe/simhash_oracle.parquet')
        """,
        "sim_lsh_topk": """
            SELECT query_id, vec_id, score, rn
            FROM read_parquet('/tmp/dnscrawler_spark_probe/lsh_topk_oracle.parquet')
        """,
        "sim_ivf_topk": """
            SELECT query_id, vec_id, score, rn
            FROM read_parquet('/tmp/dnscrawler_spark_probe/ivf_topk_oracle.parquet')
        """,
        "mm_decode_features": """
            SELECT image_id, fmt, dec_w, dec_h, channels, mean_luma, decode_ok
            FROM read_parquet('/tmp/dnscrawler_spark_probe/mm_decode_oracle.parquet')
        """,
        "mm_frame_sample": """
            SELECT image_id, frame_idx, row_luma
            FROM read_parquet('/tmp/dnscrawler_spark_probe/mm_frames_oracle.parquet')
        """,
        "mm_phash_near_dup": """
            SELECT img_a, img_b, hamming
            FROM read_parquet('/tmp/dnscrawler_spark_probe/phash_oracle.parquet')
        """,
        "dedup_phash_groups": """
            SELECT image_id, component, keep
            FROM read_parquet('/tmp/dnscrawler_spark_probe/phash_groups_oracle.parquet')
        """,
        "dedup_minhash_groups": """
            SELECT doc_id, component, keep
            FROM read_parquet('/tmp/dnscrawler_spark_probe/minhash_groups_oracle.parquet')
        """,
        "dedup_embedding_groups": """
            SELECT vec_id, component, keep
            FROM read_parquet('/tmp/dnscrawler_spark_probe/embedding_groups_oracle.parquet')
        """,
    }
