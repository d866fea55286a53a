"""Stratified (hot/cold) frontier: rank-and-rewrite only the admission
horizon, never the backlog (VERDICT r1 next-step #3; SURVEY §4.2).

The classic frontier re-sorts and rewrites the WHOLE backlog every
round — at a 10^10-URL frontier with politeness-bounded admission the
leftover churn makes every round O(backlog). This module splits the
frontier per host at a monotone watermark ``W`` over the admission sort
key ``(priority, depth, url)``:

- **hot** = every live row with key ≤ W(host). Small (politeness-horizon
  sized); the ONLY rows the politeness windows rank and the only
  frontier table rewritten per round.
- **cold** = every live row with key > W(host). Append-only parquet
  deltas partitioned by ``hbucket = pmod(xxhash64(host), n_buckets)``;
  a round APPENDS spilled rows and never rewrites cold.
- **queue_state** = per-host (W, n_cold) bookkeeping, dimension-sized.

Invariants (all maintained without ever rewriting cold):
1. W is monotone non-decreasing per host.
2. Every hot row has key ≤ W; every LIVE cold row has key > W. Hence
   per-host top-budget over hot == top-budget over the full queue —
   admission is EXACTLY the oracle's full-queue decision.
3. A cold row with key ≤ W is DEAD (it was promoted by the pull that
   raised W past it — pulls take a contiguous sorted prefix, so the
   filter ``key > W`` is an exact liveness test; monotonicity rules out
   resurrection).

Round protocol:
- **replenish** (before admission): any host with n_cold > 0 and
  n_hot < ceil(burst) could under-admit — pull its per-host top
  ``chunk × ceil(burst) − n_hot`` live cold rows (amortizes to one pull
  every ~chunk rounds per host), raise W to the max pulled key. The
  cold scan prunes to the hbucket partitions containing deficit hosts
  (directory-level partition pruning; the driver sees only the ≤
  n_buckets distinct bucket ids, never hosts).
- **route** (after expansion): re-enqueued rows go hot iff key ≤ W or
  the host's cold side is empty (then W is raised over them, keeping
  invariant 2); everything else appends to cold.

Correctness at enqueue (kept exact vs the oracle, see rounds.py):
robots gating moves to enqueue time (a blocked row is terminal the
moment it is discovered — same observable facts/seen/trace since the
oracle blocks it before the next resolve step), and the in-flight
cycle break (P11) uses the fused ever-enqueued exact filter E
(seen.insert_and_probe(enqueue=...)) instead of a union over the
backlog.

The reference has no analog (its frontier is one process's working
dict, dnsresolver_new.py:214-215); this is the 10^10-scale rehosting
of the same priority-queue semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from dnscrawler_spark.operators.frontier import FRONTIER_COLS, FRONTIER_SCHEMA

N_COLD_BUCKETS_DEFAULT = 64

W_TYPE = T.StructType(
    [
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

# w == NULL means -infinity (nothing promoted yet: everything is cold)
QUEUE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("w", W_TYPE, True),
        T.StructField("n_cold", T.LongType(), False),
    ]
)

COLD_SCHEMA = T.StructType(
    list(FRONTIER_SCHEMA.fields) + [T.StructField("hbucket", T.IntegerType(), True)]
)


def key_struct():
    """The admission sort key as an orderable struct — Spark compares
    structs lexicographically, matching the oracle's (priority, depth,
    url) tuple order exactly."""
    return F.struct(F.col("priority"), F.col("depth"), F.col("url"))


def hbucket_col(host, n_buckets: int):
    return F.pmod(F.xxhash64(host, F.lit(2)), F.lit(n_buckets)).cast("int")


def live_pred(w_col):
    return w_col.isNull() | (key_struct() > w_col)


def read_cold(spark: SparkSession, cold_paths: list[str]) -> DataFrame:
    """All cold deltas as one DataFrame. Explicit schema: no footer
    round-trips; ``hbucket`` is recovered from the partition dirs, so a
    ``.filter(hbucket.isin(...))`` downstream prunes whole directories."""
    return spark.read.schema(COLD_SCHEMA).parquet(*cold_paths)


def replenish(
    spark: SparkSession,
    hot: DataFrame,
    qs: DataFrame,
    host_state: DataFrame,
    cold_paths: list[str],
    chunk: int,
    n_buckets: int,
):
    """Pull per-host top-chunks from cold into hot for every deficit
    host, guaranteeing n_hot ≥ this round's politeness budget wherever
    live rows exist (budget ≤ floor(tokens) ≤ ceil(burst) = the deficit
    threshold — conservative, so admission stays exact).

    Returns ``(hot2, qs2, persisted)`` where ``persisted`` are frames to
    unpersist after the round's writes. The ONE driver action here is
    the deficit-bucket collect (≤ n_buckets ints — never hosts), which
    is what lets the cold scan prune to the deficit buckets only.
    """
    hot_counts = hot.groupBy("host").agg(F.count(F.lit(1)).alias("n_hot"))
    need = (
        qs.filter(F.col("n_cold") > 0)
        .join(hot_counts, "host", "left")
        .join(host_state.select("host", "burst"), "host", "left")
        .withColumn("need", F.ceil(F.coalesce(F.col("burst"), F.lit(1.0))).cast("int"))
        .withColumn("n_hot", F.coalesce(F.col("n_hot"), F.lit(0)))
        .filter(F.col("n_hot") < F.col("need"))
        .select(
            "host",
            "w",
            (F.lit(chunk) * F.col("need") - F.col("n_hot")).alias("pull_t"),
        )
        .persist()
    )
    buckets = [
        r["b"]
        for r in need.select(hbucket_col(F.col("host"), n_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    if not buckets or not cold_paths:
        need.unpersist()
        return hot, qs, []

    cold = read_cold(spark, cold_paths).filter(F.col("hbucket").isin(buckets))
    j = cold.drop("hbucket").join(need, "host")
    live = j.filter(live_pred(F.col("w")))
    w_rank = Window.partitionBy("host").orderBy("priority", "depth", "url")
    pulled = (
        live.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= F.col("pull_t"))
        .select(*FRONTIER_COLS)
        .persist()
    )
    pull_stats = pulled.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pulled"),
        F.max(key_struct()).alias("w_new"),
    )
    qs2 = (
        qs.join(pull_stats, "host", "left")
        .withColumn("n_cold", F.col("n_cold") - F.coalesce(F.col("n_pulled"), F.lit(0)))
        # pulled keys are all > old W, so the new W (max pulled) only
        # moves up — invariant 1
        .withColumn("w", F.coalesce(F.col("w_new"), F.col("w")))
        .drop("n_pulled", "w_new")
    )
    hot2 = hot.unionByName(pulled)
    return hot2, qs2, [need, pulled]


def route(rows: DataFrame, qs: DataFrame, n_buckets: int):
    """Split re-enqueued frontier rows into hot (key ≤ W, or the host
    has no cold rows — W is raised over them) and cold (appended).
    Returns ``(routed_persisted, to_hot, to_cold, qs3)``; the caller
    writes to_hot as the next hot table, to_cold as a cold delta
    (partitioned by hbucket), qs3 as the next queue_state, then
    unpersists ``routed_persisted``."""
    j = rows.join(
        qs.select(
            "host", F.col("w").alias("_w"), F.col("n_cold").alias("_nc")
        ),
        "host",
        "left",
    ).persist()
    has_cold = F.coalesce(F.col("_nc"), F.lit(0)) > 0
    to_cold_pred = has_cold & (F.col("_w").isNull() | (key_struct() > F.col("_w")))
    to_hot = j.filter(~to_cold_pred).select(*FRONTIER_COLS)
    to_cold = (
        j.filter(to_cold_pred)
        .select(*FRONTIER_COLS)
        .withColumn("hbucket", hbucket_col(F.col("host"), n_buckets))
    )
    cold_stats = to_cold.groupBy("host").agg(F.count(F.lit(1)).alias("n_add"))
    # hosts whose cold side is empty take every row hot — W must cover
    # them (invariant 2): raise to the max hot-routed key. Hosts with
    # cold rows only take key ≤ W rows hot, so no raise is needed there.
    raise_stats = (
        j.filter(~to_cold_pred & ~has_cold)
        .groupBy("host")
        .agg(F.max(key_struct()).alias("w_cand"))
    )
    qs3 = (
        qs.join(cold_stats, "host", "full")
        .join(raise_stats, "host", "full")
        .withColumn(
            "n_cold", F.coalesce(F.col("n_cold"), F.lit(0)) + F.coalesce(F.col("n_add"), F.lit(0))
        )
        .withColumn(
            "w",
            F.when(
                F.col("w_cand").isNotNull()
                & (F.col("w").isNull() | (F.col("w_cand") > F.col("w"))),
                F.col("w_cand"),
            ).otherwise(F.col("w")),
        )
        .select("host", "w", "n_cold")
    )
    return j, to_hot, to_cold, qs3


def compact_cold(spark: SparkSession, qs: DataFrame, cold_paths: list[str]) -> DataFrame:
    """Live cold rows across all deltas (dead rows dropped) — written by
    the caller as a single fresh delta replacing the whole list. Run
    when the delta count passes cfg.cold_compact_every: bounds file
    count and replenish-scan fan-in at O(1) deltas amortized."""
    cold = read_cold(spark, cold_paths)
    j = cold.join(qs.select("host", "w"), "host", "left")
    return (
        j.filter(live_pred(F.col("w")))
        .select(*FRONTIER_COLS, "hbucket")
    )
