"""Deterministic per-key cost profile: #jobs, #stages, #tasks per
registered query at a given SF (default sf0.1), via the status tracker.

Job/stage/task counts are NOISE-FREE measurements of query structure —
on a host with unstable wall-clock (the round-14 box drifts 1.5-6x on
multi-minute scales, see OPTIMIZATION_r14.md) they are the primary
optimization evidence: every removed job is ~one less driver round-trip
+ scheduling cycle at ANY scale, every removed stage one less exchange
or materialization.

Usage: python scripts/profile_jobs.py [sf_dir] [out.json] [key ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piper_spark import registry
from piper_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else "/tmp/profile_jobs.json"
    qs = registry.all_queries()
    keys = args[2:] or sorted(qs)
    spark = get_spark("profile_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    st = sc.statusTracker()
    # Warm-up pass (sf0.001) so codegen/session state matches bench.py.
    for k in keys:
        try:
            qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print("warm fail", k, e, file=sys.stderr)
    spark.catalog.clearCache()
    out: dict[str, dict] = {}
    for k in keys:
        grp = f"prof_{k}"
        sc.setJobGroup(grp, k)
        t0 = time.perf_counter()
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = st.getJobIdsForGroup(grp)
        nstages = ntasks = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is None:
                    continue
                nstages += 1
                ntasks += si.numTasks
        out[k] = {
            "wall": round(wall, 2),
            "jobs": len(jobs),
            "stages": nstages,
            "tasks": ntasks,
        }
        print(k, out[k], flush=True)
        spark.catalog.clearCache()
        sc.setJobGroup(None, None)
    totals = {
        m: sum(v[m] for v in out.values())
        for m in ("wall", "jobs", "stages", "tasks")
    }
    print("TOTALS", totals)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "totals": totals, "keys": out}, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
