import numpy as np

from dnscrawler_spark import codecs, datagen
from dnscrawler_spark.functions import canon

N = 400
SEED = 42


def test_pages_deterministic_and_shaped(spark):
    df = datagen.generate_pages(spark, N, seed=SEED, partitions=4)
    rows = {r["image_id"]: r for r in df.collect()}
    assert len(rows) == N
    # regenerate one row independently — must match byte-for-byte
    r = rows["img-000000000007"]
    again = datagen.page_row(7, SEED, N, datagen.default_n_hosts(N))
    assert r["bytes"] == again["bytes"]
    assert r["caption"] == again["caption"]
    assert r["phash"] == again["phash"]
    assert r["url"] == again["url"]
    assert list(r["out_edges"]) == again["out_edges"]


def test_payload_invariant_holds_for_all_fmts(spark):
    df = datagen.generate_pages(spark, 60, seed=SEED, partitions=2)
    fmts = set()
    for r in df.collect():
        i = int(r["image_id"].split("-")[1])
        ref, w, h = datagen.page_pixels(i, SEED)
        assert (r["w"], r["h"]) == (w, h)
        assert codecs.payload_ok(bytes(r["bytes"]), ref)
        fmts.add(r["fmt"])
    assert fmts == {"raw", "png", "qjpg"}


def test_motifs_present(spark):
    df = datagen.generate_pages(spark, N, seed=SEED, partitions=4).collect()
    hosts = {r["host"] for r in df}
    all_edges = [e for r in df for e in r["out_edges"]]
    assert any(h.split(".")[-1].isdigit() for h in hosts), "ip_ns motif"
    assert any(h.endswith(".img.ps") for h in hosts), "ps motif"
    assert any("/dead-r/" in e.lower() for e in all_edges), "retryable dead edge"
    assert any("/dead-h/" in e.lower() for e in all_edges), "hazardous dead edge"
    assert any("#" in e for e in all_edges), "non-canonical edge"
    assert any(r["glue_edges"] for r in df), "glue motif"
    assert any(r["carry_edges"] for r in df), "carry motif"
    # glue edges are a subset of canonicalized out_edges
    for r in df:
        canon_out = {canon.canonicalize_url(e) for e in r["out_edges"]}
        for g in r["glue_edges"]:
            assert canon.canonicalize_url(g) in canon_out


def test_host_skew(spark):
    df = datagen.generate_pages(spark, 2000, seed=SEED, partitions=4)
    counts = {r["host"]: r["n"] for r in df.groupBy("host").count().withColumnRenamed("count", "n").collect()}
    top8 = sum(sorted(counts.values(), reverse=True)[:8])
    assert top8 >= 0.35 * 2000, "hot hosts should own a large corpus share"


def test_host_state_and_seeds(spark):
    pages = datagen.generate_pages(spark, N, seed=SEED, partitions=2)
    hs = datagen.generate_host_state(pages).collect()
    hosts = {r["host"] for r in pages.select("host").distinct().collect()}
    assert {r["host"] for r in hs} == hosts
    assert all(r["rate"] >= 2.0 and r["burst"] == 2 * r["rate"] for r in hs)
    assert any(r["robots_disallow"] for r in hs)
    seeds = datagen.seed_urls(10, N, seed=SEED)
    assert len(seeds) == 10 and len(set(seeds)) == 10
    page_urls = {r["url"] for r in pages.select("url").collect()}
    assert set(seeds) <= page_urls
