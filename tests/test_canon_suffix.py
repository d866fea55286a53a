import pandas as pd
from pyspark.sql import functions as F

from dnscrawler_spark.functions import canon, suffix

URLS = [
    "http://Host.Example.COM/img/a",
    "HTTP://HOST.EXAMPLE.COM/IMG/A#FRAG",
    "http://host.example.com:80/img/a",
    "http://host.example.com/img/a/",
    "http://host.example.com/",
    "http://host.example.com",
    "  http://pad.example.com/x  ",
    "https://h0001.site1.co.uk:80/img/b#x",
]


def test_scalar_vs_pandas_agree():
    scal = [canon.canonicalize_url(u) for u in URLS]
    vec = canon.canonicalize_series(pd.Series(URLS)).tolist()
    assert scal == vec


def test_scalar_vs_spark_agree(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = [r[0] for r in df.select(canon.canon_url_col(F.col("url"))).collect()]
    assert got == [canon.canonicalize_url(u) for u in URLS]


def test_canon_folds_variants_to_same_key():
    variants = URLS[0:4]  # all same resource modulo case/frag/port/slash
    assert len({canon.canonicalize_url(u) for u in variants}) == 1


def test_host_path_extraction(spark):
    u = "http://h1.site9.com/img/img-000000000042"
    assert canon.host_of_url(u) == "h1.site9.com"
    assert canon.path_of_url(u) == "/img/img-000000000042"
    df = spark.createDataFrame([(u,), ("http://x.com",)], ["url"])
    rows = df.select(
        canon.host_col(F.col("url")).alias("h"), canon.path_col(F.col("url")).alias("p")
    ).collect()
    assert (rows[0]["h"], rows[0]["p"]) == ("h1.site9.com", "/img/img-000000000042")
    assert (rows[1]["h"], rows[1]["p"]) == ("x.com", "/")


HOSTS = [
    "h0001.site1.net",
    "a.b.co.uk",
    "h0011.img.ps",
    "img.ps",
    "com",
    "weird.zzz",
    "h0007.ns.7",
    # real multi-label PSL rules (VERDICT r1 #7)
    "shop.example.com.br",
    "x.y.co.uk",
    "a.b.ck",          # wildcard *.ck → b.ck is the public suffix
    "www.ck",          # exception !www.ck → ck is the public suffix
    "sub.www.ck",
    "foo.s3.amazonaws.com",  # private-section rule
    "deep.aisai.aichi.jp",   # 3-label jp geo rule
]


def test_suffix_scalar():
    assert suffix.extract("h0001.site1.net") == ("net", "site1.net")
    assert suffix.extract("a.b.co.uk") == ("co.uk", "b.co.uk")
    assert suffix.extract("h0011.img.ps") == ("img.ps", "h0011.img.ps")
    assert suffix.extract("img.ps") == ("img.ps", "")
    assert suffix.extract("com") == ("com", "")
    assert suffix.extract("weird.zzz") == ("zzz", "weird.zzz")
    assert suffix.extract("h0007.ns.7") == ("7", "ns.7")


def test_suffix_scalar_real_psl():
    # normal multi-label rules from the embedded snapshot
    assert suffix.extract("shop.example.com.br") == ("com.br", "example.com.br")
    assert suffix.extract("x.y.co.uk") == ("co.uk", "y.co.uk")
    assert suffix.extract("deep.aisai.aichi.jp") == (
        "aisai.aichi.jp",
        "deep.aisai.aichi.jp",
    )
    assert suffix.extract("foo.s3.amazonaws.com") == (
        "s3.amazonaws.com",
        "foo.s3.amazonaws.com",
    )
    # wildcard rule *.ck
    assert suffix.extract("a.b.ck") == ("b.ck", "a.b.ck")
    assert suffix.extract("b.ck") == ("b.ck", "")
    # exception rule !www.ck beats the wildcard
    assert suffix.extract("www.ck") == ("ck", "www.ck")
    assert suffix.extract("sub.www.ck") == ("ck", "www.ck")
    # case-insensitive
    assert suffix.extract("A.B.CO.UK") == ("co.uk", "b.co.uk")


def test_suffix_spark_matches_scalar(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    rows = df.select(
        "host",
        suffix.tld_col(F.col("host")).alias("tld"),
        suffix.sld_col(F.col("host")).alias("sld"),
        suffix.is_ps_host_col(F.col("host")).alias("ps"),
    ).collect()
    for r in rows:
        tld, sld = suffix.extract(r["host"])
        assert (r["tld"], r["sld"]) == (tld, sld), r["host"]
        assert r["ps"] == suffix.is_ps_host(r["host"])


def test_suffix_broadcast_join_matches_scalar(spark):
    """The pure-Catalyst candidate-explode + broadcast-join path agrees
    with the scalar PSL algorithm on every fixture host."""
    df = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    rows = suffix.suffix_facts_for_hosts(df).collect()
    assert len(rows) == len(set(HOSTS))
    for r in rows:
        tld, sld = suffix.extract(r["host"])
        assert (r["tld"], r["sld"]) == (tld, sld), r["host"]
