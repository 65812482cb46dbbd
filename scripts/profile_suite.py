"""Whole-suite profiler: run bench.run_suite with the Spark event log
enabled, record each _timed segment's wall window, then attribute every
Spark job/stage to its segment and print a per-query breakdown
(jobs, job wall, stage task totals, biggest stages).

Usage: python scripts/profile_suite.py [sf_dir]
Writes /tmp/profile_suite_report.json and prints a readable summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events"
os.makedirs(EVDIR, exist_ok=True)

from elasticsearch_approx_plugin_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

SEGMENTS: list[tuple[float, float, float]] = []  # (t0, t1, dur)

_orig_timed = bench._timed


def _timed_rec(fn):
    t0 = time.time()
    n = fn()
    t1 = time.time()
    SEGMENTS.append((t0, t1, t1 - t0))
    return t1 - t0, n


bench._timed = _timed_rec


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
    spark = get_spark(
        app_name="profile_suite",
        master=f"local[{bench.CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
        },
    )
    app_id = spark.sparkContext.applicationId
    t_suite0 = time.time()
    timings, extras = bench.run_suite(spark, sf)
    t_suite1 = time.time()
    spark.stop()

    # map segments to timing keys: _timed calls happen in run_suite body
    # order; timings/extras assignments interleave.  Match by rounded
    # duration in order.
    keys = list(timings.keys())
    seg_iter = iter(SEGMENTS)
    seg_of: dict[str, tuple[float, float]] = {}
    unmatched = []
    for seg in SEGMENTS:
        matched = None
        for k in keys:
            if k not in seg_of and abs(timings[k] - seg[2]) < 0.0015:
                matched = k
                break
        if matched:
            seg_of[matched] = (seg[0], seg[1])
        else:
            unmatched.append(seg)

    with open("/tmp/profile_suite_segments.json", "w") as f:
        json.dump({"segments": SEGMENTS, "timings": timings}, f)

    # parse event log (Spark 4 rolling layout: eventlog_v2_<app>/events_*)
    jobs = {}  # id -> dict
    stages = {}  # id -> dict
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.startswith("events_")
        )
    else:
        parts = [path]
    import itertools

    def _lines():
        for p in parts:
            with open(p) as f:
                yield from f

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:80],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"][:60],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time", 0) / 1000.0,
                    "done": si.get("Completion Time", 0) / 1000.0,
                }

    report = {}
    for k, (t0, t1) in sorted(seg_of.items(), key=lambda kv: kv[1][0]):
        in_jobs = [
            j for j in jobs.values() if "end" in j and t0 <= j["start"] <= t1
        ]
        job_wall = sum(j["end"] - j["start"] for j in in_jobs)
        st = []
        for j in in_jobs:
            for sid in j["stages"]:
                s = stages.get(sid)
                if s and s["sub"]:
                    st.append(
                        (round(s["done"] - s["sub"], 3), s["tasks"], sid, s["name"])
                    )
        st.sort(reverse=True)
        report[k] = {
            "wall": timings[k],
            "n_jobs": len(in_jobs),
            "job_wall": round(job_wall, 3),
            "driver_gap": round(timings[k] - job_wall, 3),
            "stages": st[:8],
            "n_stages": len(st),
            "total_tasks": sum(x[1] for x in st),
        }

    with open("/tmp/profile_suite_report.json", "w") as f:
        json.dump({"report": report, "timings": timings}, f, indent=1)

    print(f"suite wall: {t_suite1 - t_suite0:.1f}s; timed sum {sum(timings.values()):.1f}")
    for k, r in sorted(report.items(), key=lambda kv: -kv[1]["wall"]):
        print(
            f"\n{k}: wall={r['wall']} jobs={r['n_jobs']} job_wall={r['job_wall']} "
            f"driver_gap={r['driver_gap']} stages={r['n_stages']} tasks={r['total_tasks']}"
        )
        for dur, ntask, sid, name in r["stages"][:6]:
            print(f"   {dur:7.3f}s {ntask:4d}t s{sid:4d} {name}")


if __name__ == "__main__":
    main()
