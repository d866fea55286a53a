"""Training-data operator properties: embedding near-dup (exact vs LSH
recall), streaming windowed agg vs batch, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .filter(F.col("vec_id") < 150)
        .persist()
    )


def test_embedding_near_dup_exact_symmetric(emb):
    from dnscrawler_spark.operators.dedup import embedding_near_dup

    pairs = embedding_near_dup(emb, threshold=0.3).collect()
    assert all(p["id_a"] < p["id_b"] for p in pairs)
    assert all(p["cosine"] >= 0.3 for p in pairs)
    assert len(pairs) > 0


def test_embedding_near_dup_lsh_is_subset_with_recall(emb):
    """LSH-bucketed path returns a subset of the exact pairs (no false
    positives after re-rank) with nontrivial recall."""
    from dnscrawler_spark.operators.dedup import embedding_near_dup

    exact = {(p["id_a"], p["id_b"]) for p in embedding_near_dup(emb, 0.3).collect()}
    lsh = {
        (p["id_a"], p["id_b"])
        for p in embedding_near_dup(emb, 0.3, n_planes=2).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) > 0.2  # 2-plane buckets, same-sign pairs only


def test_ivf_topk_subset_and_recall(emb):
    """IVF-probed top-k scores only true cosine values (every returned
    pair appears in the exact brute-force ranking with the SAME score)
    and keeps useful recall@10 with 4 of 16 lists probed; recall is
    monotone in n_probe, reaching exact at n_probe = n_centroids (every
    list scanned => identical to brute force)."""
    from dnscrawler_spark.operators import similarity as S

    q = emb.filter(F.col("vec_id") < 4)
    exact = S.cosine_topk(emb, q, k=10).collect()
    exact_scores = {(r["query_id"], r["vec_id"]): r["score"] for r in exact}
    ivf = S.ivf_topk(emb, q, k=10, n_centroids=16, n_probe=4).collect()
    assert all(
        exact_scores.get((r["query_id"], r["vec_id"])) in (None, r["score"])
        for r in ivf
    )
    hits = sum((r["query_id"], r["vec_id"]) in exact_scores for r in ivf)
    assert hits / len(exact) >= 0.5  # recall@10, 4/16 lists probed
    full = S.ivf_topk(emb, q, k=10, n_centroids=16, n_probe=16).collect()
    assert {tuple(r) for r in full} == {tuple(r) for r in exact}
    assert sum((r["query_id"], r["vec_id"]) in exact_scores for r in full) >= hits


def test_streaming_windowed_counts_equals_batch(spark):
    from dnscrawler_spark.streaming.windows import windowed_event_counts

    got = windowed_event_counts(spark, f"{SF}/events.parquet")
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stateful_stream_equals_batch(spark):
    from dnscrawler_spark.streaming.stateful import running_user_stats

    got = running_user_stats(spark, f"{SF}/events.parquet")
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_multimodal_resize_roundtrip(spark):
    from dnscrawler_spark import codecs, datagen
    from dnscrawler_spark.operators import multimodal as MM

    pages = datagen.generate_pages(spark, 32, seed=7, partitions=2)
    small = MM.resize(pages, 8, 8).collect()
    assert len(small) == 32
    for r in small:
        arr, fmt = codecs.decode(bytes(r["bytes"]))
        assert arr.shape == (8, 8, 3)
        assert fmt == r["fmt"]


def test_multimodal_external_fmt_stubbed(spark):
    """External codecs are stubbed: rows survive with decode_ok=false,
    never a task failure."""
    import pandas as pd

    from dnscrawler_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["x"], "bytes": [b"\xff\xd8junk"], "fmt": ["jpeg"]}
        )
    )
    rows = MM.decode_features(df).collect()
    assert len(rows) == 1 and rows[0]["decode_ok"] is False


def test_multimodal_frame_sample_shape(spark):
    from dnscrawler_spark import datagen
    from dnscrawler_spark.operators import multimodal as MM

    pages = datagen.generate_pages(spark, 16, seed=7, partitions=2)
    frames = MM.frame_sample(pages, every=4)
    per = {r["image_id"]: r["n"] for r in frames.groupBy("image_id").agg(F.count("*").alias("n")).collect()}
    heights = {r["image_id"]: r["h"] for r in pages.select("image_id", "h").collect()}
    assert per and all(per[i] == (heights[i] + 3) // 4 for i in per)


def test_phash_near_dup_matches_brute_force(spark):
    """Pigeonhole block join ≡ brute-force all-pairs at every exact
    radius (hamming ≤ n_chunks−1), on the probe's planted-cluster
    corpus — the blocking must never drop a pair inside the guarantee."""
    import __spark_entry__ as entry
    from dnscrawler_spark.operators.dedup import phash_near_dup

    imgs = entry._phash_probe_images(spark, 128).persist()
    rows = imgs.collect()
    phs = {r["image_id"]: r["phash"] & ((1 << 64) - 1) for r in rows}
    ids = sorted(phs)
    for max_h, n_chunks in ((3, 4), (7, 8), (1, 2)):
        brute = {
            (a, b, bin(phs[a] ^ phs[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(phs[a] ^ phs[b]).count("1") <= max_h
        }
        got = {
            (r["img_a"], r["img_b"], r["hamming"])
            for r in phash_near_dup(imgs, max_hamming=max_h, n_chunks=n_chunks).collect()
        }
        assert got == brute, f"mismatch at max_hamming={max_h}, n_chunks={n_chunks}"
    imgs.unpersist()


def test_phash_near_dup_on_corpus_table_finds_planted_duplicate(spark):
    """Runs on the real input-hint table shape (datagen pages carry
    phash:int64): an exact re-crawled duplicate (same pixels, new id)
    is found at hamming 0; avalanche-mixed distinct pages never pair."""
    from dnscrawler_spark import datagen
    from dnscrawler_spark.operators.dedup import phash_near_dup

    pages = datagen.generate_pages(spark, 64, seed=7, partitions=4).select(
        "image_id", "phash"
    )
    dup = pages.filter(F.col("image_id") == "img-000000000000").select(
        F.lit("img-dup-recrawl").alias("image_id"), "phash"
    )
    pairs = phash_near_dup(pages.union(dup), max_hamming=3).collect()
    assert [(p["img_a"], p["img_b"], p["hamming"]) for p in pairs] == [
        ("img-000000000000", "img-dup-recrawl", 0)
    ]


def test_phash_near_dup_refuses_lossy_config(spark):
    from dnscrawler_spark.operators.dedup import phash_near_dup
    from dnscrawler_spark import datagen

    pages = datagen.generate_pages(spark, 4, seed=7, partitions=1)
    with pytest.raises(ValueError):
        phash_near_dup(pages, max_hamming=4, n_chunks=4)
    with pytest.raises(ValueError):
        phash_near_dup(pages, max_hamming=1, n_chunks=5)


def test_connected_components_matches_union_find(spark):
    """Alternating large-star/small-star ≡ brute-force union-find on
    deterministic random graphs (dense one-component, sparse forest)
    AND a 200-node path — the O(diameter) killer that pins the O(log n)
    convergence claim (min-label propagation would need 199 rounds;
    max_iter=12 forces the star algorithm's bound)."""
    import random

    from dnscrawler_spark.operators.components import connected_components

    def expected(edges):
        nodes = {v for e in edges for v in e}
        parent = {v: v for v in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comps = {}
        for v in nodes:
            comps.setdefault(find(v), []).append(v)
        return {v: min(ms) for ms in comps.values() for v in ms}

    rng = random.Random(42)
    cases = []
    for n, m in ((60, 70), (40, 20), (30, 60)):
        es = [e for e in {(rng.randrange(n), rng.randrange(n)) for _ in range(m)} if e[0] != e[1]]
        cases.append([(f"d{a:03d}", f"d{b:03d}") for a, b in es])
    cases.append([(f"c{i:04d}", f"c{i + 1:04d}") for i in range(199)])  # path-200
    for edges in cases:
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["node"]: r["component"] for r in connected_components(df, max_iter=12).collect()}
        assert got == expected(edges)
    empty = spark.createDataFrame([], "id_a string, id_b string")
    assert connected_components(empty).count() == 0


def test_dedup_survivors_election_and_singletons(spark):
    """Survivor = max `prefer` (ties min id); docs in no pair are their
    own singleton component and always kept; exactly one keeper per
    component."""
    from dnscrawler_spark.operators.components import dedup_survivors

    docs = spark.createDataFrame(
        [("d1", 5.0), ("d2", 9.0), ("d3", 9.0), ("d4", 1.0), ("d5", 0.0)],
        ["doc_id", "quality"],
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d3", "d4")], ["id_a", "id_b"]
    )
    out = {r["doc_id"]: (r["component"], r["keep"])
           for r in dedup_survivors(docs, pairs, prefer="quality").collect()}
    assert out == {
        "d1": ("d1", False), "d2": ("d1", True), "d3": ("d1", False),
        "d4": ("d1", False), "d5": ("d5", True),
    }
    # no prefer: min id wins
    out2 = {r["doc_id"]: r["keep"] for r in dedup_survivors(docs, pairs).collect()}
    assert out2 == {"d1": True, "d2": False, "d3": False, "d4": False, "d5": True}
