"""Driver-style correctness harness: run every `queries()` entry and its
`oracle_sql()` DuckDB twin side-by-side at sf0.01, compare row count +
sorted-column value hash (the driver's CORRECTNESS gate, re-implemented
so a round never ships blind again — VERDICT r3 #1).

    python scripts/check_correctness.py               # all queries
    python scripts/check_correctness.py crawl_results # subset

Env: CHECK_SF_DIR (default /root/testdata/sf0.01), CHECK_CPUS (8).
Exit code 0 iff every checked query is green (hash for oracle-paired
queries, runs-clean for rows-only ones).
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    # numpy scalars (np.float32/np.bool_/np.int64 …) are not instances of
    # the Python builtins — unwrap them first so a Spark float32 column vs
    # a DuckDB double column hashes through the same formatting (ADVICE r4)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:  # NaN: Spark NULL doubles and DuckDB NULLs both reach
            return "NULL"  # pandas as NaN — normalize to the same token
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return hashlib.md5(v).hexdigest()
    return str(v)


def frame_hash(pdf):
    """Sort columns by name, rows by all values, hash the cell grid —
    the driver's compare, re-derived."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.md5()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(rows)


def main():
    import duckdb

    import __spark_entry__ as E
    from dnscrawler_spark.session import get_spark

    sf_dir = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("CHECK_CPUS", "8")
    spark = get_spark(
        "check_correctness", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    qs = E.queries()
    osql = E.oracle_sql()
    names = sys.argv[1:] or list(qs)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results, n_bad = {}, 0
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(exc)[:300]}
            n_bad += 1
            print(f"[FAIL] {name}: spark error: {exc}", flush=True)
            continue
        wall = round(time.monotonic() - t0, 2)
        if name not in osql:
            results[name] = {"status": "rows_only", "rows": len(sdf), "sec": wall}
            print(f"[rows] {name}: {len(sdf)} rows ({wall}s)", flush=True)
            continue
        # oracle_sql entries for crawl probes read parquet the Spark side
        # dumps — so Spark must run FIRST (it did, above)
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(exc)[:300]}
            n_bad += 1
            print(f"[FAIL] {name}: duckdb error: {exc}", flush=True)
            continue
        sh, sn = frame_hash(sdf)
        oh, on = frame_hash(odf)
        ok = sh == oh and sorted(sdf.columns) == sorted(odf.columns)
        status = "HASH_OK" if ok else "HASH_MISMATCH"
        if not ok:
            n_bad += 1
            print(
                f"[FAIL] {name}: spark({sn} rows, {sorted(sdf.columns)})"
                f" vs oracle({on} rows, {sorted(odf.columns)})",
                flush=True,
            )
        else:
            print(f"[ ok ] {name}: {sn} rows hash-match ({wall}s)", flush=True)
        results[name] = {"status": status, "rows": sn, "oracle_rows": on, "sec": wall}

    print(json.dumps({"n_checked": len(names), "n_bad": n_bad, "results": results}))
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
