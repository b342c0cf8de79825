"""Split every key's wall into BUILD (the Python fn call: py4j plan
construction + any internal collects/fits) vs ACTION (the noop write:
analysis of the final plan + execution). Identifies keys whose cost is
driver-side plan work (guide §7.3) rather than cluster work.

Usage: python scripts/build_vs_action.py [sf_dir] [out.json] [key ...]
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
    out_path = args[1] if len(args) > 1 else "/tmp/build_vs_action.json"
    qs = registry.all_queries()
    keys = args[2:] or sorted(qs)
    spark = get_spark("build_vs_action")
    spark.sparkContext.setLogLevel("ERROR")
    for k in keys:  # bench.py warm-up convention
        try:
            qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print("warm fail", k, e, file=sys.stderr)
    spark.catalog.clearCache()
    out: dict[str, dict] = {}
    for k in keys:
        t0 = time.perf_counter()
        df = qs[k](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        out[k] = {
            "build": round(t1 - t0, 3),
            "action": round(t2 - t1, 3),
        }
        spark.catalog.clearCache()
    tot_b = round(sum(v["build"] for v in out.values()), 1)
    tot_a = round(sum(v["action"] for v in out.values()), 1)
    print("TOTAL build", tot_b, "action", tot_a, file=sys.stderr)
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "total_build": tot_b, "total_action": tot_a,
             "keys": out},
            fh,
            indent=1,
        )
        fh.write("\n")


if __name__ == "__main__":
    main()
