"""Parse a Spark rolling event log against recorded _timed segments.

Usage: python scripts/parse_eventlog.py <eventlog_dir> [segments_json]
"""

from __future__ import annotations

import io
import json
import os
import sys


def lines_of(d: str):
    parts = sorted(p for p in os.listdir(d) if p.startswith("events_"))
    for p in parts:
        path = os.path.join(d, p)
        if p.endswith(".zstd"):
            import subprocess

            proc = subprocess.Popen(
                ["zstd", "-dc", path], stdout=subprocess.PIPE
            )
            reader = io.TextIOWrapper(proc.stdout, encoding="utf-8", errors="replace")
            yield from reader
            proc.wait()
        else:
            with open(path) as f:
                yield from f


def main() -> None:
    d = sys.argv[1]
    seg_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_suite_segments.json"
    with open(seg_path) as f:
        sj = json.load(f)
    segments, timings = sj["segments"], sj["timings"]

    keys = list(timings.keys())
    seg_of = {}
    extra_segs = []
    for seg in segments:
        matched = None
        for k in keys:
            if k not in seg_of and abs(timings[k] - seg[2]) < 0.0015:
                matched = k
                break
        if matched:
            seg_of[matched] = (seg[0], seg[1])
        else:
            extra_segs.append(seg)

    jobs, stages = {}, {}
    for line in lines_of(d):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"] / 1000.0,
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"] / 1000.0
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"][:70],
                "tasks": si["Number of Tasks"],
                "sub": si.get("Submission Time", 0) / 1000.0,
                "done": si.get("Completion Time", 0) / 1000.0,
            }

    def seg_report(name, t0, t1, wall):
        in_jobs = [j for j in jobs.values() if "end" in j and t0 <= j["start"] <= t1]
        job_wall = sum(j["end"] - j["start"] for j in in_jobs)
        st = []
        for j in in_jobs:
            for sid in j["stages"]:
                s = stages.get(sid)
                if s and s["sub"]:
                    st.append((round(s["done"] - s["sub"], 3), s["tasks"], sid, s["name"]))
        st.sort(reverse=True)
        print(
            f"\n{name}: wall={wall:.3f} jobs={len(in_jobs)} job_wall={job_wall:.3f} "
            f"gap={wall - job_wall:.3f} stages={len(st)} tasks={sum(x[1] for x in st)}"
        )
        for dur, ntask, sid, nm in st[:7]:
            print(f"   {dur:7.3f}s {ntask:4d}t s{sid:4d} {nm}")

    for k, (t0, t1) in sorted(seg_of.items(), key=lambda kv: kv[1][0]):
        seg_report(k, t0, t1, timings[k])
    for t0, t1, dur in extra_segs:
        seg_report("(extra)", t0, t1, dur)


if __name__ == "__main__":
    main()
