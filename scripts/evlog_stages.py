#!/usr/bin/env python
"""Summarize a Spark event log: top stages by wall (completion - submission),
with task-time sums, to attribute crawl-round cost (guide §7.1 empirically,
without the UI — spark.ui.enabled is off in this sandbox).

Usage: python scripts/evlog_stages.py <event_log_file> [top_n]
"""

import json
import sys
from collections import defaultdict

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30

stages = {}
jobs = {}
job_desc = {}
for line in open(path):
    try:
        ev = json.loads(line)
    except json.JSONDecodeError:
        continue
    e = ev.get("Event")
    if e == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        sid = si["Stage ID"]
        sub = si.get("Submission Time")
        com = si.get("Completion Time")
        stages[sid] = {
            "name": si["Stage Name"].split("\n")[0][:70],
            "wall_ms": (com - sub) if sub and com else 0,
            "tasks": si.get("Number of Tasks", 0),
        }
    elif e == "SparkListenerJobStart":
        jid = ev["Job ID"]
        jobs[jid] = {
            "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            "t0": ev.get("Submission Time"),
            "desc": (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )[:60],
        }
    elif e == "SparkListenerJobEnd":
        jid = ev["Job ID"]
        if jid in jobs:
            jobs[jid]["wall_ms"] = ev.get("Completion Time", 0) - (
                jobs[jid]["t0"] or 0
            )

tot = sum(s["wall_ms"] for s in stages.values())
print(f"{len(stages)} stages, {len(jobs)} jobs, stage-wall sum {tot/1e3:.1f}s")
print("\n== top stages by wall ==")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["wall_ms"])[:top_n]:
    print(f"  {s['wall_ms']/1e3:7.2f}s  {s['tasks']:4d}t  s{sid:<5d} {s['name']}")

print("\n== jobs by wall ==")
agg = defaultdict(lambda: [0, 0])
for jid, j in jobs.items():
    agg[j["desc"]][0] += j.get("wall_ms", 0)
    agg[j["desc"]][1] += 1
for desc, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
    print(f"  {ms/1e3:7.2f}s  {n:4d} jobs  {desc or '(no description)'}")
