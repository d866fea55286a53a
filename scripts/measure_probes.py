"""Repeat-measure individual driver probes (VERDICT r2 #7: explain the
round-2 suite regressions — noise vs real). Runs each named query N
times in BOTH orders against $SPARK_GRAFT_SF_DIR and prints per-run
walls; a large first-run-only gap is cache/suite-order noise, a stable
gap is a real change.

    python scripts/measure_probes.py dedup_minhash_lsh text_fingerprints
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

import __spark_entry__ as E
from dnscrawler_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("MEASURE_REPEATS", "3"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    names = sys.argv[1:] or ["dedup_minhash_lsh", "text_fingerprints"]
    spark = get_spark(
        "measure", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    qs = E.queries()
    results = {n: [] for n in names}
    orders = [names, list(reversed(names))]
    for rep in range(N):
        for name in orders[rep % 2]:
            t0 = time.monotonic()
            force(qs[name](spark, SF))
            dt = round(time.monotonic() - t0, 2)
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt}s", flush=True)
    for name, walls in results.items():
        print(f"SUMMARY {name}: {walls} (min {min(walls)}, max {max(walls)})")


if __name__ == "__main__":
    main()
