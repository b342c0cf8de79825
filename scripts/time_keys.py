"""Median-of-N wall timing for a set of keys in ONE bench-shaped
session (warm-up at sf0.001, clearCache between queries, noop sink) —
the quick within-session A/B harness for round-15 touched keys.

Usage: python scripts/time_keys.py [sf_dir] [n_rounds] key [key ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piper_spark import registry
from piper_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2])
    keys = sys.argv[3:]
    qs = registry.all_queries()
    spark = get_spark("time_keys")
    spark.sparkContext.setLogLevel("ERROR")
    for k in keys:  # warm-up, bench.py's convention
        try:
            qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print("warm fail", k, e, file=sys.stderr)
    spark.catalog.clearCache()
    walls: dict[str, list[float]] = {k: [] for k in keys}
    for _ in range(n):
        for k in keys:
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[k].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    out = {
        k: {"median": round(statistics.median(v), 3), "runs": v}
        for k, v in walls.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
