#!/usr/bin/env python3
"""Summarize a Spark event log: per-stage wall/task time attribution.

Usage: tools/stageprof.py <eventlog-file> [topN]

Prints one row per stage, sorted by stage wall-clock (completion -
submission), with the aggregate executor task time and the first line of
the stage's callsite so the stage maps back to operator code.
"""
import json, sys, collections

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

stages = {}
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
            sid = (si["Stage ID"], si["Stage Attempt ID"])
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", ""),
                "wall_ms": (com - sub) if sub and com else 0,
                "tasks": si.get("Number of Tasks", 0),
                "task_ms": 0,
                "shuffle_read": 0,
                "shuffle_write": 0,
            }
        elif ev == "SparkListenerTaskEnd":
            sid = (e["Stage ID"], e["Stage Attempt ID"])
            m = e.get("Task Metrics") or {}
            if sid not in stages:
                stages[sid] = {"name": "?", "wall_ms": 0, "tasks": 0,
                               "task_ms": 0, "shuffle_read": 0,
                               "shuffle_write": 0}
            stages[sid]["task_ms"] += m.get("Executor Run Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            stages[sid]["shuffle_read"] += (sr.get("Remote Bytes Read", 0) +
                                            sr.get("Local Bytes Read", 0))
            stages[sid]["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
        elif ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "t0": e.get("Submission Time", 0),
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
        elif ev == "SparkListenerJobEnd":
            j = jobs.get(e["Job ID"])
            if j:
                j["t1"] = e.get("Completion Time", 0)

tot_wall = sum(s["wall_ms"] for s in stages.values())
tot_task = sum(s["task_ms"] for s in stages.values())
print(f"stages={len(stages)} jobs={len(jobs)} "
      f"sum(stage wall)={tot_wall/1000:.2f}s sum(task time)={tot_task/1000:.2f}s")
jw = [(j.get("t1", 0) - j.get("t0", 0)) for j in jobs.values() if "t1" in j]
print(f"sum(job wall)={sum(jw)/1000:.2f}s n_jobs={len(jw)}")
print()
print(f"{'wall_ms':>8} {'task_ms':>8} {'tasks':>5} {'shufR_kb':>8} {'shufW_kb':>8}  stage (callsite)")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["wall_ms"])[:top]:
    name = s["name"].split("\n")[0][:110]
    print(f"{s['wall_ms']:>8} {s['task_ms']:>8} {s['tasks']:>5} "
          f"{s['shuffle_read']//1024:>8} {s['shuffle_write']//1024:>8}  [{sid[0]}] {name}")

# group by callsite
bysite = collections.Counter()
for s in stages.values():
    bysite[s["name"].split("\n")[0][:110]] += s["wall_ms"]
print("\n-- wall by callsite --")
for site, ms in bysite.most_common(25):
    print(f"{ms:>8}  {site}")
