import pandas as pd
from pyspark.sql import functions as F

from dnscrawler_spark.operators import frontier as fr
from dnscrawler_spark.operators import politeness as pol


def _mk_frontier(spark, urls, n_salts=4):
    df = (
        spark.createDataFrame([(u,) for u in urls], ["url"])
        .withColumn("priority", F.lit(2))
        .withColumn("depth", F.lit(1))
        .withColumn("round", F.lit(0))
        .withColumn("reason", F.lit("expand"))
        .withColumn("seed", F.lit("http://seed/x"))
        .withColumn("attempts", F.lit(0))
    )
    return fr.derive_frontier_cols(df, n_salts)


def _mk_host_state(spark, rows):
    from dnscrawler_spark.datagen import HOST_STATE_SCHEMA

    return spark.createDataFrame(
        [(h, t, r, b, -1, dis, True) for (h, t, r, b, dis) in rows], HOST_STATE_SCHEMA
    )


def test_refill_is_idempotent_per_round(spark):
    hs = _mk_host_state(spark, [("a.com", 0.0, 2.0, 4.0, [])])
    once = pol.refill(hs, 3)
    twice = pol.refill(once, 3)
    assert once.collect()[0]["tokens"] == 2.0
    assert twice.collect()[0]["tokens"] == 2.0
    assert pol.refill(once, 4).collect()[0]["tokens"] == 4.0


def test_admission_matches_unsalted_topk_and_conserves_budget(spark):
    # one hot host with 40 urls, budget 3 after refill
    urls = [f"http://hot.example.com/img/{i:04d}" for i in range(40)]
    f = _mk_frontier(spark, urls, n_salts=4)
    hs = _mk_host_state(spark, [("hot.example.com", 0.0, 3.0, 6.0, [])])
    admitted, leftover, blocked, new_hs = pol.admit(f, hs, round_no=0)
    got = sorted(r["url"] for r in admitted.collect())
    # oracle decision: per-host global sort by (priority, depth, url), take floor(tokens)
    want = sorted(sorted(urls)[:3])
    assert got == want
    assert leftover.count() == 37
    assert blocked.count() == 0
    row = new_hs.collect()[0]
    assert row["tokens"] == 0.0 and row["last_refill_round"] == 0


def test_priority_band_beats_url_order(spark):
    base = _mk_frontier(spark, ["http://a.com/img/zzz"], n_salts=2)
    high = base.withColumn("priority", F.lit(0))
    low = _mk_frontier(spark, ["http://a.com/img/aaa"], n_salts=2)
    f = high.union(low)
    hs = _mk_host_state(spark, [("a.com", 1.0, 0.0, 2.0, [])])
    admitted, leftover, _, _ = pol.admit(f, hs, round_no=0)
    assert [r["url"] for r in admitted.collect()] == ["http://a.com/img/zzz"]
    assert [r["url"] for r in leftover.collect()] == ["http://a.com/img/aaa"]


def test_robots_blocking(spark):
    f = _mk_frontier(spark, ["http://b.com/priv/img-1", "http://b.com/img/img-2"])
    hs = _mk_host_state(spark, [("b.com", 5.0, 1.0, 5.0, ["/priv"])])
    admitted, leftover, blocked, _ = pol.admit(f, hs, round_no=0)
    assert [r["url"] for r in blocked.collect()] == ["http://b.com/priv/img-1"]
    assert [r["url"] for r in admitted.collect()] == ["http://b.com/img/img-2"]
    assert leftover.count() == 0


def test_unknown_host_gets_default_budget(spark):
    f = _mk_frontier(spark, [f"http://ghost.net/img/{i}" for i in range(5)])
    hs = _mk_host_state(spark, [("other.com", 1.0, 1.0, 1.0, [])])
    admitted, leftover, _, _ = pol.admit(f, hs, round_no=0)
    assert admitted.count() == 1  # default budget 1/round
    assert leftover.count() == 4


def test_multi_host_budgets_independent(spark):
    urls = [f"http://h{k}.org/img/{i}" for k in range(3) for i in range(10)]
    f = _mk_frontier(spark, urls)
    hs = _mk_host_state(
        spark, [(f"h{k}.org", float(k + 1), 0.0, 9.0, []) for k in range(3)]
    )
    admitted, *_ = pol.admit(f, hs, round_no=0)
    counts = {r["host"]: r["n"] for r in admitted.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"h0.org": 1, "h1.org": 2, "h2.org": 3}


def test_seed_frontier_shape(spark):
    sf = fr.seed_frontier(spark, ["http://A.com/img/1#x", "http://b.com/img/2"])
    rows = {r["url"]: r for r in sf.collect()}
    assert set(rows) == {"http://a.com/img/1", "http://b.com/img/2"}
    r = rows["http://a.com/img/1"]
    assert r["priority"] == 0 and r["depth"] == 0 and r["reason"] == "seed"
    assert r["seed"] == "http://a.com/img/1"
    assert 0 <= r["salt"] < fr.N_SALTS_DEFAULT
