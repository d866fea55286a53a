#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r06/.

Usage: python scripts/capture_r06_plans.py <tree_root> <tag> <q1,q2,...>

``tree_root`` is the repo checkout whose code should produce the plan
(the round-start worktree for *_before.txt, this repo for *_after.txt);
output always lands in THIS repo's plans/r06/. Oracle dumps are skipped
(SPARK_GRAFT_SKIP_ORACLE_DUMP=1) so capture is side-effect free.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
tree, tag, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sys.path.insert(0, tree)
os.environ["PYTHONPATH"] = tree + os.pathsep + os.environ.get("PYTHONPATH", "")
os.environ["SPARK_GRAFT_SKIP_ORACLE_DUMP"] = "1"

import __spark_entry__ as entry  # noqa: E402  (from tree)
from dnscrawler_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("plan_capture", master="local[8]", shuffle_partitions=64)
outdir = os.path.join(HERE, "plans", "r06")
os.makedirs(outdir, exist_ok=True)
qs = entry.queries()
for name in names:
    df = qs[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")
spark.stop()
