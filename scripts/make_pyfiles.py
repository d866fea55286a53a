#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files`` (north_rule
deployment shape: the job ships as one zip to every executor).

Usage: python scripts/make_pyfiles.py [out.zip]
Default output: dist/dnscrawler_spark.zip (repo-relative).

The zip holds the ``dnscrawler_spark`` package INCLUDING its data files
(the embedded public-suffix snapshot) with package-relative paths, so
``--py-files dist/dnscrawler_spark.zip`` makes the engine importable on
the driver and every executor Python worker — no install step. All
package data is read via importlib.resources, which resolves inside
the zip (zipimport).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dnscrawler_spark")

EXCLUDE_DIRS = {"__pycache__"}
INCLUDE_EXT = {".py", ".gz", ".dat", ".json", ".txt"}


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d not in EXCLUDE_DIRS]
            for name in sorted(files):
                if os.path.splitext(name)[1] not in INCLUDE_EXT:
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)  # dnscrawler_spark/...
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "dnscrawler_spark.zip"
    )
    print(build(out))
