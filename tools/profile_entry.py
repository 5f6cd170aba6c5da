"""Per-job wall-clock profile of one battery entry (guide §1: measure
first).  Runs the named entry on a warm session with the Spark event
log enabled, then parses JobStart/JobEnd events to print every Spark
job the entry ran — duration, description, and stage names — so
job-count-bound entries show exactly which actions pay the local
~0.3-0.5s/job floor.

Usage: python tools/profile_entry.py <entry[,entry2,...]> [sf_dir] [--cold]
  Default runs each entry TWICE and profiles the second (warm) run;
  --cold profiles the first.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cold = "--cold" in sys.argv
    names = args[0].split(",")
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    evt_dir = f"/tmp/spark_events_{os.getpid()}"
    os.makedirs(evt_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from spark_alchemy_spark.session import build_session

    spark = build_session(
        "profile",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    walls: dict[str, list[float]] = {}
    runs = 1 if cold else 2
    for name in names:
        fn = qs[name]
        for i in range(runs):
            # marker job: jobs after it belong to (name, run i)
            spark.sparkContext.setJobDescription(f"__marker_{name}_{i}")
            spark.range(1).count()
            spark.sparkContext.setJobDescription(None)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            walls.setdefault(name, []).append(wall)
            print(f"{name} run {i}: {wall:.2f}s", file=sys.stderr)
    spark.stop()

    evt_file = max(glob.glob(evt_dir + "/*"), key=os.path.getmtime)
    if os.path.isdir(evt_file):  # Spark 4 rolling event log directory
        evt_file = max(
            glob.glob(evt_file + "/events_*"), key=os.path.getmtime
        )
    starts, ends, descs, stages = {}, {}, {}, {}
    markers: dict[int, str] = {}
    with open(evt_file) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                starts[jid] = e["Submission Time"]
                d = e.get("Properties", {}).get("spark.job.description", "")
                descs[jid] = d
                stages[jid] = [
                    s.get("Stage Name", "")[:60]
                    for s in e.get("Stage Infos", [])
                ]
                if d.startswith("__marker_"):
                    markers[jid] = d[len("__marker_"):]
            elif ev == "SparkListenerJobEnd":
                ends[e["Job ID"]] = e["Completion Time"]

    # segment the job stream by markers; report the profiled run of each
    want = {f"{n}_{runs - 1}": n for n in names}
    seg_of_job: dict[int, str] = {}
    current = None
    for j in sorted(starts):
        if j in markers:
            current = markers[j]
            continue
        if current in want:
            seg_of_job[j] = current
    for seg, name in want.items():
        jobs = [j for j, s in seg_of_job.items() if s == seg and j in ends]
        total = 0.0
        print(f"\n=== {name} (walls {['%.2f' % w for w in walls[name]]}): "
              f"{len(jobs)} jobs ===")
        prev_end = None
        for j in sorted(jobs):
            dur = (ends[j] - starts[j]) / 1000.0
            gap = (starts[j] - prev_end) / 1000.0 if prev_end else 0.0
            prev_end = ends[j]
            total += dur
            d = descs.get(j, "")
            st = "; ".join(dict.fromkeys(stages.get(j, [])))
            print(
                f"job {j:4d} {dur:7.3f}s gap={gap:6.3f}s  "
                f"{d[:40]:40s} {st[:80]}"
            )
        print(f"total in-job: {total:.2f}s  ({len(jobs)} jobs)")


if __name__ == "__main__":
    main()
