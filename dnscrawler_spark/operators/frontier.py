"""Salted priority-queue frontier (SURVEY §1.2, §2.5 W1/W2).

The frontier replaces three reference structures: the per-resolution
``auth_ns`` working dict (/root/reference/dnscrawler/dnsresolver_new.py:
214-215), the seed file order (/root/reference/run/run.py:50-51,58), and
the retry list (/root/reference/run/run.py:41-44,53-55). One table,
explicitly hash-partitioned by (host, salt) so politeness stays local to
an executor (north_rule).

Priority semantics (lower = sooner), reproducing the reference's
normalized crawl order (SURVEY §7.3):
  - ``priority``: band — seeds 0, glue-hit expansions 1, plain
    expansions 2, carries 3, retries 10+band (retry-after, W4)
  - ``depth``: BFS depth from seed (the superdomain-first analog, W2)
  - tie-break: canonical url string (replaces Python-set iteration
    order, which the reference leaves undefined)

``salt = pmod(xxhash64(url, 1), n_salts)`` spreads a hot host's rows
across tasks; admission correctness under salting is restored by the
two-phase top-k in politeness.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from dnscrawler_spark.functions.canon import canon_url_col, host_col, url_key_col

N_SALTS_DEFAULT = 8

PRIORITY_SEED = 0
PRIORITY_GLUE = 1
PRIORITY_EXPAND = 2
PRIORITY_CARRY = 3
PRIORITY_QMIN = 4  # full-name requery after a minimized-form miss (O7)
PRIORITY_RETRY_BASE = 10

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # canonical form
        T.StructField("url_key", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("reason", T.StringType(), False),  # seed|expand|glue|retry|carry
        T.StructField("seed", T.StringType(), False),  # originating seed url
        T.StructField("attempts", T.IntegerType(), False),
    ]
)

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]


def derive_frontier_cols(df: DataFrame, n_salts: int = N_SALTS_DEFAULT) -> DataFrame:
    """Given rows with a raw ``url`` plus (priority, depth, round, reason,
    seed, attempts), canonicalize and derive (url, url_key, host, salt).
    Pure Catalyst — stays in whole-stage codegen."""
    c = canon_url_col(F.col("url"))
    return (
        df.withColumn("url", c)
        .withColumn("url_key", url_key_col(F.col("url")))
        .withColumn("host", host_col(F.col("url")))
        .withColumn("salt", F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(n_salts)).cast("int"))
        .select(*FRONTIER_COLS)
    )


def seed_frontier(spark, seed_urls: list[str], n_salts: int = N_SALTS_DEFAULT) -> DataFrame:
    """Round-0 frontier from the seed list. Seed order becomes the
    priority tie only through depth/url ordering — all seeds share band
    0, matching the reference where every seed is scheduled up-front
    (/root/reference/run/run.py:56-60)."""
    rows = [(u,) for u in seed_urls]
    df = (
        spark.createDataFrame(rows, ["url"])
        .withColumn("priority", F.lit(PRIORITY_SEED))
        .withColumn("depth", F.lit(0))
        .withColumn("round", F.lit(0))
        .withColumn("reason", F.lit("seed"))
        .withColumn("seed", canon_url_col(F.col("url")))
        .withColumn("attempts", F.lit(0))
    )
    return derive_frontier_cols(df, n_salts).dropDuplicates(["url_key"])


def seed_frontier_from_df(urls: DataFrame, n_salts: int = N_SALTS_DEFAULT) -> DataFrame:
    """Round-0 frontier from a DataFrame of raw urls (scale path: the
    seed set stays distributed end to end)."""
    df = (
        urls.select("url")
        .withColumn("priority", F.lit(PRIORITY_SEED))
        .withColumn("depth", F.lit(0))
        .withColumn("round", F.lit(0))
        .withColumn("reason", F.lit("seed"))
        .withColumn("seed", canon_url_col(F.col("url")))
        .withColumn("attempts", F.lit(0))
    )
    return derive_frontier_cols(df, n_salts).dropDuplicates(["url_key"])


def repartition_by_host(frontier: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Explicit hash partitioning by (host, salt) — the engine's analog
    of one-seed-per-process (/root/reference/run/run.py:56): politeness
    decisions for a host stay within one task per salt (SURVEY §2.9 X1,
    O10). No fixed width: leaving numPartitions unset keeps the exchange
    AQE-coalescible, so partition count follows data size (tiny rounds
    collapse to a few tasks; 10^10-key rounds fan out to the cap)."""
    if n_partitions is not None:
        return frontier.repartition(n_partitions, "host", "salt")
    return frontier.repartition("host", "salt")
