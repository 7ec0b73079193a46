"""Decompose a Spark event log into the scaling-relevant terms:

  * per-job wall spans and the driver-serial GAPS between jobs
  * wall time covered by LOW-PARALLELISM stages (running task count
    below the cluster's core budget — these act as serial time in an
    N-vs-4N comparison)
  * occupancy: total task core-seconds / (cores x busy wall)
  * top stages by wall, with task counts and total task time

Usage: python scripts/analyze_eventlog.py <event_log_file> [cores]

The event log is the single app-* file spark.eventLog.dir; pass the
cluster's total cores (default 8 = 4 x 2-core executors).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def _open_log(path):
    """Accept a plain event-log file, a .zstd one, or the eventlog_v2
    rolling directory (picks the events_* file inside)."""
    import glob
    import io
    import os
    import subprocess

    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "events_*")))
        if not inner:
            raise FileNotFoundError(f"no events_* file under {path}")
        path = inner[-1]
    if path.endswith(".zstd"):
        proc = subprocess.Popen(["zstd", "-dc", path], stdout=subprocess.PIPE)
        return io.TextIOWrapper(proc.stdout)
    return open(path)


def main() -> int:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    jobs = {}  # id -> [start, end]
    stages = {}  # (stage_id, attempt) -> dict
    tasks = []  # (launch, finish, stage_id)
    agg = defaultdict(int)  # executor-metric totals across all tasks
    for line in _open_log(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = [e["Submission Time"], None]
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]][1] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "submit": si.get("Submission Time"),
                "complete": si.get("Completion Time"),
                "n_tasks": si["Number of Tasks"],
            }
        elif ev == "SparkListenerTaskEnd":
            ti = e["Task Info"]
            tasks.append((ti["Launch Time"], ti["Finish Time"], e["Stage ID"]))
            tm = e.get("Task Metrics") or {}
            sr = tm.get("Shuffle Read Metrics") or {}
            sw = tm.get("Shuffle Write Metrics") or {}
            inp = tm.get("Input Metrics") or {}
            agg["run_ms"] += tm.get("Executor Run Time", 0)
            agg["cpu_ns"] += tm.get("Executor CPU Time", 0)
            agg["gc_ms"] += tm.get("JVM GC Time", 0)
            agg["shuffle_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )
            agg["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
            agg["input_b"] += inp.get("Bytes Read", 0)
            agg["spill_disk_b"] += tm.get("Disk Bytes Spilled", 0)

    if not jobs:
        print("no jobs in log")
        return 1

    done = {j: (s, e) for j, (s, e) in jobs.items() if e}
    t0 = min(s for s, _ in done.values())
    t1 = max(e for _, e in done.values())
    wall = (t1 - t0) / 1e3

    # driver gaps: merge job intervals, measure uncovered wall
    ivals = sorted(done.values())
    covered, cur_s, cur_e = 0, ivals[0][0], ivals[0][1]
    gaps = []
    for s, e in ivals[1:]:
        if s > cur_e:
            gaps.append((cur_e, s))
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    gap_total = (t1 - t0 - covered) / 1e3

    # concurrency profile from task intervals (sweep line); a truncated
    # log (killed run) can carry jobs but zero TaskEnd events — report
    # what we have instead of IndexError-ing on events[0] (ADVICE r3)
    events = []
    for s, e, _ in tasks:
        events.append((s, 1))
        events.append((e, -1))
    events.sort()
    low_par_ms = defaultdict(float)  # running tasks -> ms at that level
    if events:
        prev_t, running = events[0][0], 0
        for t, d in events:
            if t > prev_t:
                low_par_ms[min(running, cores)] += t - prev_t
            running += d
            prev_t = t
    else:
        print("warning: no TaskEnd events (truncated log?) — skipping concurrency sweep")
    task_core_s = sum(e - s for s, e, _ in tasks) / 1e3

    print(f"jobs={len(done)} wall={wall:.1f}s  driver-gap-between-jobs={gap_total:.1f}s")
    if gaps:
        worst = sorted(gaps, key=lambda g: g[1] - g[0], reverse=True)[:5]
        print("largest driver gaps (s, at +s from start): "
              + ", ".join(f"{(e - s) / 1e3:.1f}@{(s - t0) / 1e3:.0f}" for s, e in worst))
    print(f"total task time={task_core_s:.0f} core-s  occupancy={task_core_s / (cores * wall):.2%} of {cores} cores x wall")
    # executor-metric totals: the core-second / shuffle-byte receipts an
    # N-vs-4N comparison is argued with (BENCH.md round-5 receipts)
    print(
        f"executor totals: run={agg['run_ms'] / 1e3:.0f} core-s  "
        f"cpu={agg['cpu_ns'] / 1e9:.0f} core-s  gc={agg['gc_ms'] / 1e3:.0f} core-s  "
        f"shuffle-read={agg['shuffle_read_b'] / 1e9:.2f} GB  "
        f"shuffle-write={agg['shuffle_write_b'] / 1e9:.2f} GB  "
        f"input={agg['input_b'] / 1e9:.2f} GB  "
        f"disk-spill={agg['spill_disk_b'] / 1e9:.2f} GB"
    )
    print("\nwall seconds at each concurrency level (capped at cores):")
    for lvl in sorted(low_par_ms):
        sec = low_par_ms[lvl] / 1e3
        if sec > 1:
            print(f"  {lvl:3d} running: {sec:8.1f}s")
    under = sum(ms for lvl, ms in low_par_ms.items() if lvl < cores) / 1e3
    print(f"wall below full width ({cores}): {under:.1f}s  <- acts as serial in N-vs-4N")

    # top stages by wall
    by_wall = sorted(
        (s for s in stages.values() if s["submit"] and s["complete"]),
        key=lambda s: s["complete"] - s["submit"],
        reverse=True,
    )[:15]
    print("\ntop stages by wall (s, tasks, name):")
    for s in by_wall:
        print(f"  {(s['complete'] - s['submit']) / 1e3:7.1f}  {s['n_tasks']:5d}  {s['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
