#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays frozen).

Modes:
  --suite            run every queries() entry in bench order with the
                     EXACT bench.py methodology (one session, noop sink,
                     SPARK_GRAFT_SKIP_ORACLE_DUMP=1) and print a JSON
                     map of per-query seconds.
  --query NAME       time one query standalone; --reps N repeats the
                     timed fn+noop (fresh DataFrame each rep, same
                     session) and reports every sample.
  --explain NAME     write plans/r06/<NAME>_<tag>.txt with the
                     .explain("formatted") output (tag via --tag).
  --warm             run a generic JVM warmup job first (codegen, Arrow
                     python workers, parquet reader) so timings are
                     steady-state, isolating the cold-JVM constant from
                     per-query cost (guide §1.1: decide what the time is
                     going to before optimizing it).

All timing uses the noop sink (guide §1.4) and labelled jobs (§1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
os.environ.setdefault("SPARK_GRAFT_SKIP_ORACLE_DUMP", "1")

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _spark():
    from dnscrawler_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "20g")
    n = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = None
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{ev_dir}",
        }
    return get_spark(
        app_name="dnscrawler_spark_bench_extra",
        master=f"local[{n}]",
        shuffle_partitions=max(64, 2 * n),
        extra_conf=extra,
    )


def warmup(spark) -> float:
    """Generic JVM warmup: exercises parquet scan, hash agg, sort,
    window, broadcast join and the Arrow python-worker pool on synthetic
    data — no query results touched."""
    from pyspark.sql import Window, functions as F

    t0 = time.monotonic()
    spark.sparkContext.setJobDescription("warmup")
    df = spark.range(0, 200_000).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k"),
        F.md5(F.col("id").cast("string")).alias("s"),
    )
    small = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    w = Window.partitionBy("k").orderBy("s")
    out = (
        df.join(F.broadcast(small), "k")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("v")
        .agg(F.count("*"), F.collect_set("k"))
    )
    out.write.format("noop").mode("overwrite").save()

    def _py(it):
        for pdf in it:
            yield pdf

    spark.range(0, 1000).mapInPandas(_py, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{DEFAULT_SF_DIR}/nation.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)
    return time.monotonic() - t0


def _time_one(spark, name, fn, sf_dir, split=False):
    """Total fn+noop seconds (bench methodology). With ``split``, also
    report the fn-build phase alone (eager driver work: fixture crawls,
    centroid collects, streaming runs) vs the noop execution."""
    spark.sparkContext.setJobDescription(f"bench_extra: {name}")
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    t1 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.monotonic()
    spark.sparkContext.setJobDescription(None)
    if split:
        return {
            "total": round(t2 - t0, 3),
            "build": round(t1 - t0, 3),
            "exec": round(t2 - t1, 3),
        }
    return round(t2 - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--query")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = entry.queries()
    spark = _spark()
    try:
        if args.warm:
            print(f"warmup: {warmup(spark):.2f}s", file=sys.stderr)
        if args.explain:
            fn = qs[args.explain]
            df = fn(spark, args.sf_dir)
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            path = os.path.join(REPO, "plans", "r06", f"{args.explain}_{args.tag}.txt")
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan.splitlines())} lines)")
            return
        if args.query:
            out = {}
            for name in args.query.split(","):
                out[name] = [
                    _time_one(spark, name, qs[name], args.sf_dir, split=True)
                    for _ in range(args.reps)
                ]
            print(json.dumps(out, indent=1))
            return
        if args.suite:
            out = {}
            for name, fn in qs.items():
                out[name] = _time_one(spark, name, fn, args.sf_dir)
            out["_suite_total"] = round(sum(out.values()), 3)
            print(json.dumps(out, indent=1))
            return
        ap.print_help()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
