#!/usr/bin/env python3
"""Summarize a Spark event log: per-stage task count, total/max task time,
input rows/bytes, shuffle bytes — the §1 'where does the time go' view.

Usage: python3 tools/stage_report.py <event-log-file> [min_ms]
"""
import json, sys, collections

path = sys.argv[1]
min_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0

stages = {}  # (stageId, attempt) -> dict
jobs = {}
with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            k = (si["Stage ID"], si["Stage Attempt ID"])
            st = stages.setdefault(k, collections.defaultdict(float))
            st["name"] = si["Stage Name"]
            st["ntasks"] = si["Number of Tasks"]
            st["submit"] = si.get("Submission Time", 0)
            st["complete"] = si.get("Completion Time", 0)
        elif ev == "SparkListenerTaskEnd":
            k = (e["Stage ID"], e["Stage Attempt ID"])
            st = stages.setdefault(k, collections.defaultdict(float))
            m = e.get("Task Metrics") or {}
            rt = m.get("Executor Run Time", 0)
            st["task_ms"] += rt
            st["max_task_ms"] = max(st["max_task_ms"], rt)
            st["gc_ms"] += m.get("JVM GC Time", 0)
            im = m.get("Input Metrics") or {}
            st["in_rows"] += im.get("Records Read", 0)
            st["in_bytes"] += im.get("Bytes Read", 0)
            srm = m.get("Shuffle Read Metrics") or {}
            st["sh_read"] += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
            swm = m.get("Shuffle Write Metrics") or {}
            st["sh_write"] += swm.get("Shuffle Bytes Written", 0)
            st["done"] += 1
        elif ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": (e.get("Properties") or {}).get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                "t0": e.get("Submission Time", 0)}
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e.get("Completion Time", 0)

total_wall = 0.0
print(f"{'stage':>6} {'tasks':>5} {'wall_ms':>8} {'cpu_ms':>8} {'max_ms':>7} "
      f"{'in_rows':>9} {'sh_rd_kb':>8} {'sh_wr_kb':>8}  name")
for k in sorted(stages):
    st = stages[k]
    wall = (st.get("complete", 0) or 0) - (st.get("submit", 0) or 0)
    total_wall += max(wall, 0)
    if wall < min_ms and st["task_ms"] < min_ms:
        continue
    print(f"{k[0]:>6} {int(st.get('ntasks', 0)):>5} {wall:>8.0f} {st['task_ms']:>8.0f} "
          f"{st['max_task_ms']:>7.0f} {int(st['in_rows']):>9} "
          f"{st['sh_read']/1024:>8.0f} {st['sh_write']/1024:>8.0f}  "
          f"{str(st.get('name', ''))[:70]}")
print(f"\n#stages={len(stages)} sum(stage wall)={total_wall/1000:.2f}s  #jobs={len(jobs)}")
for jid in sorted(jobs):
    j = jobs[jid]
    if "t1" in j:
        d = j["t1"] - j["t0"]
        if d >= min_ms:
            print(f"job {jid:>3} {d:>7.0f} ms  stages={j['stages']}  {j['desc'][:60]}")
