#!/usr/bin/env python3
"""Summarize a Spark 4 event log: job timeline with driver gaps + per-stage
task-time attribution (metrics live in Task Info Accumulables in Spark 4).

Usage: tools/stageprof.py <eventlog-file> [topN]
"""
import json, sys, collections

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 30

stages = {}          # sid -> dict
jobs = {}            # jid -> dict
sqls = []            # (t, +1/-1, desc)
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        stages.setdefault(sid, {"task_ms": 0, "tasks": 0})
        stages[sid].update({
            "name": si.get("Stage Name", "").split("\n")[0][:90],
            "sub": si.get("Submission Time"),
            "com": si.get("Completion Time"),
            "ntasks": si.get("Number of Tasks", 0),
        })
    elif ev == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        st = stages.setdefault(sid, {"task_ms": 0, "tasks": 0})
        st["tasks"] += 1
        for a in (e.get("Task Info") or {}).get("Accumulables", []):
            if a.get("Name") == "internal.metrics.executorRunTime":
                st["task_ms"] += a.get("Update", 0)
    elif ev == "SparkListenerJobStart":
        jobs[e["Job ID"]] = {
            "t0": e.get("Submission Time", 0),
            "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
        }
    elif ev == "SparkListenerJobEnd":
        j = jobs.get(e["Job ID"])
        if j:
            j["t1"] = e.get("Completion Time", 0)
    elif ev and ev.endswith("SparkListenerSQLExecutionStart"):
        sqls.append((e.get("time", 0), e.get("executionId"),
                     e.get("description", "")[:60], "start"))
    elif ev and ev.endswith("SparkListenerSQLExecutionEnd"):
        sqls.append((e.get("time", 0), e.get("executionId"), "", "end"))

print("== job timeline (gap = driver-only time since previous job end) ==")
prev_end = None
tot_gap = tot_job = 0
for jid in sorted(jobs):
    j = jobs[jid]
    if "t1" not in j:
        continue
    dur = j["t1"] - j["t0"]
    gap = (j["t0"] - prev_end) if prev_end is not None else 0
    prev_end = j["t1"]
    tot_gap += max(gap, 0)
    tot_job += dur
    names = []
    ttask = 0
    for sid in j["stages"]:
        s = stages.get(sid)
        if s and "name" in s:
            names.append(f"{sid}:{s['name'][:45]}")
            ttask += s.get("task_ms", 0)
    print(f"job {jid:>3} gap {gap:>5} dur {dur:>6} task_ms {ttask:>7}  "
          f"{' | '.join(names[:3])}")
print(f"\nsum(job dur)={tot_job/1000:.2f}s  sum(driver gaps)={tot_gap/1000:.2f}s")

print("\n== slowest stages (wall) ==")
rows = [(s.get("com", 0) - s.get("sub", 0) if s.get("sub") else 0, sid, s)
        for sid, s in stages.items()]
for wall, sid, s in sorted(rows, reverse=True)[:top]:
    print(f"[{sid:>3}] wall {wall:>6} task_ms {s.get('task_ms',0):>7} "
          f"tasks {s.get('tasks',0):>3}  {s.get('name','?')}")
