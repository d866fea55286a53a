import json, sys, time, hashlib
import duckdb, glob, os
import pandas as pd
from dnscrawler_spark.session import get_spark
import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
spark = get_spark("judge2", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.round(6).to_csv(index=False).encode()).hexdigest()

qs = E.queries()
osql = E.oracle_sql()
subset = ["streaming_stateful_stats", "mm_decode_features", "mm_frame_sample",
          "crawl_results", "crawl_failure_detail", "crawl_stratified_trace"]
for name in subset:
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
        msg = f"rows={len(sdf)}"
        if name in osql:
            odf = con.execute(osql[name]).df()
            rm = len(sdf) == len(odf)
            sm = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
            hm = None
            if rm and sm:
                odf.columns = [c.lower() for c in odf.columns]
                sdf.columns = [c.lower() for c in sdf.columns]
                hm = canon(sdf) == canon(odf)
            msg += f" oracle_rows={len(odf)} rows_match={rm} schema_match={sm} hash_match={hm}"
    except Exception as e:
        msg = f"ERR {type(e).__name__}: {str(e)[:200]}"
    print(f"{name}: {msg} {time.time()-t0:.1f}s", flush=True)
print("DONE")
