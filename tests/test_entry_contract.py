"""Replicates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    got = _normalize(q(spark, SF).toPandas())
    want = _normalize(ddb.sql(entry_mod.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch (first diff: "\
        f"{next(((a, b) for a, b in zip(got, want) if a != b), None)})"


def test_all_queries_have_oracle_or_are_flagged():
    # every queries() entry has a DuckDB oracle twin: hash-native ops and
    # binary-column probes dump a pure-Python brute-force twin the SQL
    # reads back (oracle/probes.py) — zero rows-only entries since r5
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) == set(qs)


def test_dumped_oracle_queries_run(spark):
    # the six dump-then-read probes exercise their twin path end-to-end
    qs = entry_mod.queries()
    for name in ("f12_xxhash_keys", "dedup_simhash_pairs", "sim_lsh_topk",
                 "sim_ivf_topk", "mm_decode_features", "mm_frame_sample"):
        df = qs[name](spark, SF)
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
