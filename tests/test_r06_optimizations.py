"""Focused gates for the round-6 optimization internals.

Each test pins an equivalence the optimization relies on:
- CC convergence: (count, xxhash64-sum) signature stability must agree
  with the old exceptAll-based set equality at EVERY star iteration.
- MinHash one-pass aggregation ≡ the explode/two-groupBy law.
- IVF literal-expression centroids ≡ F.lit-built arrays, bit-exact,
  and plan-time Python norms ≡ the JVM fold.
- spread_input only repartitions under-parallel scans.
"""

import random

import pytest
from pyspark.sql import functions as F


def _star_step(edges):
    from dnscrawler_spark.operators.components import _large_star, _small_star

    return _small_star(_large_star(edges))


def test_cc_signature_convergence_equals_set_equality(spark):
    """At every alternating-star iteration, signature stability
    (count + order-insensitive checksum) must coincide with exceptAll
    set equality — the r6 convergence criterion vs the r5 one."""
    from dnscrawler_spark.operators.components import _canon_edges, _sig_by_agg

    rng = random.Random(99)
    cases = []
    for n, m in ((50, 60), (30, 15)):
        es = [
            e
            for e in {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
            if e[0] != e[1]
        ]
        cases.append([(f"x{a:03d}", f"x{b:03d}") for a, b in es])
    cases.append([(f"p{i:03d}", f"p{i + 1:03d}") for i in range(40)])
    for pairs in cases:
        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
        prev = _canon_edges(df, "id_a", "id_b").localCheckpoint(eager=True)
        prev_sig = _sig_by_agg(prev)
        for _ in range(15):
            new = _star_step(prev).localCheckpoint(eager=True)
            new_sig = _sig_by_agg(new)
            sig_stable = new_sig == prev_sig
            set_equal = (
                new.count() == prev.count() and new.exceptAll(prev).isEmpty()
            )
            assert sig_stable == set_equal
            prev, prev_sig = new, new_sig
            if sig_stable:
                break
        else:
            pytest.fail("no fixpoint in 15 iterations")


def test_minhash_one_pass_equals_explode_law(spark):
    """The r6 single-aggregation MinHash signature must equal the r5
    explode → groupBy(doc,h) → collect_list law element-for-element."""
    from dnscrawler_spark.operators.dedup import minhash_signatures, shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_hashes = 8
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, n_hashes=n_hashes, g=5).collect()
    }
    s = shingles(docs, 5)
    hashed = s.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_hashes - 1)),
                lambda i: F.struct(
                    i.alias("h"),
                    F.md5(
                        F.concat(i.cast("string"), F.lit("_"), F.col("shingle"))
                    ).alias("v"),
                ),
            )
        ).alias("hv"),
    )
    want = {
        r["doc_id"]: [p["minv"] for p in r["pairs"]]
        for r in hashed.groupBy("doc_id", F.col("hv.h").alias("h"))
        .agg(F.min("hv.v").alias("minv"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("h", "minv"))).alias("pairs"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_ivf_literals_and_norms_bit_exact(spark):
    from dnscrawler_spark.operators.similarity import _lit_vec, _norm, _py_norm

    rng = random.Random(5)
    vecs = [
        [rng.uniform(-2, 2) * 10 ** rng.randint(-6, 6) for _ in range(9)]
        for _ in range(5)
    ]
    row = spark.range(1).select(
        *[_lit_vec(v).alias(f"e{i}") for i, v in enumerate(vecs)],
        *[
            F.array(*[F.lit(float(x)) for x in v]).alias(f"l{i}")
            for i, v in enumerate(vecs)
        ],
        *[_norm(_lit_vec(v)).alias(f"n{i}") for i, v in enumerate(vecs)],
    ).collect()[0]
    for i, v in enumerate(vecs):
        assert list(row[f"e{i}"]) == list(row[f"l{i}"])
        assert row[f"n{i}"] == _py_norm(v)


def test_spread_input_scale_adaptive(spark):
    from dnscrawler_spark.operators.dedup import spread_input

    p = spark.sparkContext.defaultParallelism
    narrow = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert spread_input(narrow).rdd.getNumPartitions() >= min(
        p, max(narrow.rdd.getNumPartitions(), 1)
    )
    wide = spark.range(0, 1000, numPartitions=p * 2)
    # already wider than the default parallelism: untouched, no shuffle
    assert spread_input(wide) is wide
