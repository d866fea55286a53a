"""Per-host politeness: token buckets + robots gating (SURVEY §2.9 X5).

The reference gets politeness implicitly — one domain's queries run
sequentially inside one worker process with a 60 s budget
(/root/reference/run/run.py:59) and 2 s × 2-try query budgets
(/root/reference/dnscrawler/constants.py:1-2). The engine makes the
budget explicit: each host owns a token bucket (rate tokens/round,
burst cap) in the ``host_state`` table; a round admits at most
``floor(tokens)`` URLs per host, in priority order; robots-disallowed
paths are rejected outright.

Everything here is native Catalyst (joins + two windows + one groupBy)
— vectorized JVM-side, no Python in the loop. Skew strategy: the
frontier is salted, so the heavy ranking work (phase 1) runs per
(host, salt); the per-host phase 2 only sees the per-salt survivors
(≤ salts × budget rows per host), so a hot host can never concentrate
more than a bounded sliver of work in one task. AQE skew-join handles
anything residual (SURVEY §4.2).

Admission must be *identical* to the oracle's single-threaded decision,
which ranks the whole host queue by (priority, depth, url) and takes
``budget`` — the two-phase top-k provably yields the same set: the
global per-host top-B is contained in every per-salt top-B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dnscrawler_spark.functions.canon import path_col

ORDER_COLS = ("priority", "depth", "url")


def robots_block_pred():
    """Robots disallow predicate over rows that carry (url,
    robots_fetched, robots_disallow) — null-safe (hosts without policy
    are never blocked). Shared by admit() and the stratified frontier's
    robots-at-enqueue gate (same decision, made once per row)."""
    raw = (
        F.col("robots_fetched")
        & (F.size("robots_disallow") > 0)
        & F.exists(
            "robots_disallow",
            lambda p: path_col(F.col("url")).startswith(p),
        )
    )
    return F.coalesce(raw, F.lit(False))


def refill(host_state: DataFrame, round_no: int) -> DataFrame:
    """tokens ← min(burst, tokens + rate) once per round (idempotent:
    a host already refilled at ``round_no`` is left alone — resume
    safety)."""
    need = F.col("last_refill_round") < F.lit(round_no)
    return host_state.withColumn(
        "tokens",
        F.when(need, F.least(F.col("burst"), F.col("tokens") + F.col("rate"))).otherwise(
            F.col("tokens")
        ),
    ).withColumn(
        "last_refill_round",
        F.when(need, F.lit(round_no)).otherwise(F.col("last_refill_round")),
    )


def admit(
    frontier: DataFrame,
    host_state: DataFrame,
    round_no: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """One round of politeness.

    Returns ``(admitted, leftover, blocked, new_host_state)``:
    - admitted: rows fetched this round (per-host top-budget by
      (priority, depth, url))
    - leftover: rows staying in the frontier for the next round
    - blocked: robots-rejected rows (terminal — recorded + marked seen
      so they are never re-enqueued)
    - new_host_state: buckets debited by admissions, refill applied
    """
    hs = refill(host_state, round_no)
    policy = F.broadcast(hs.select("host", "tokens", "robots_disallow", "robots_fetched"))

    fr = frontier.join(policy, "host", "left")
    # hosts absent from host_state (dead-edge hosts can be): default budget 1/round
    fr = fr.withColumn("budget", F.floor(F.coalesce(F.col("tokens"), F.lit(1.0))).cast("int"))

    blocked_pred = robots_block_pred()
    blocked = fr.filter(blocked_pred)
    candid = fr.filter(~blocked_pred)

    # phase 1: per-(host, salt) prune to the per-salt top-budget.
    # The frontier arrives repartitioned by (host, salt), so this window
    # needs no exchange — just a partition-local sort.
    w1 = Window.partitionBy("host", "salt").orderBy(*ORDER_COLS)
    ranked1 = candid.withColumn("rn1", F.row_number().over(w1))
    pruned = ranked1.filter(F.col("rn1") <= F.col("budget"))
    # phase 2: exact per-host top-budget over the (small) survivors
    w2 = Window.partitionBy("host").orderBy(*ORDER_COLS)
    ranked = pruned.withColumn("rn", F.row_number().over(w2))
    admitted = ranked.filter(F.col("rn") <= F.col("budget"))

    # leftover = phase-1 spill ∪ phase-2 spill — derived from the ranks
    # already computed instead of an anti-join (saves a full shuffle of
    # the frontier every round)
    leftover = ranked.filter(F.col("rn") > F.col("budget")).drop("rn").unionByName(
        ranked1.filter(F.col("rn1") > F.col("budget"))
    )

    debits = admitted.groupBy("host").agg(F.count("*").alias("n_admitted"))
    new_hs = (
        hs.join(debits, "host", "left")
        .withColumn(
            "tokens", F.col("tokens") - F.coalesce(F.col("n_admitted").cast("double"), F.lit(0.0))
        )
        .drop("n_admitted")
    )

    drop_aux = ["tokens", "robots_disallow", "robots_fetched", "budget", "rn1", "rn"]
    return (
        admitted.drop(*drop_aux),
        leftover.drop(*[c for c in drop_aux if c in leftover.columns]),
        blocked.drop(*[c for c in drop_aux if c in blocked.columns]),
        new_hs,
    )
