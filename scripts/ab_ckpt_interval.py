"""Interleaved A/B of PREGEL_CKPT_INTERVAL on the iterative graph keys
(round 15, VERDICT item 8). The interval only changes WHERE the loop
materializes/truncates — iteration counts (CC_ROUNDS, PR_ITERS, peel
rounds) are declared semantics and untouched — so results are
identical by construction; the A/B prices the per-interval
localCheckpoint jobs against the plan growth between checkpoints.

Usage: python scripts/ab_ckpt_interval.py [sf_dir] [rounds] [out.json]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piper_spark import registry
from piper_spark.functions import graphs
from piper_spark.session import get_spark

KEYS = ["graph_cc", "graph_lpa", "graph_kcore", "graph_bfs", "graph_pagerank"]
CANDIDATES = [3, 5, 8]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 5
    out_path = args[2] if len(args) > 2 else "/tmp/ab_ckpt.json"
    qs = registry.all_queries()
    spark = get_spark("ab_ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    for k in KEYS:
        qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()
    walls: dict[int, dict[str, list[float]]] = {
        c: {k: [] for k in KEYS} for c in CANDIDATES
    }
    for r in range(rounds):
        for c in CANDIDATES:
            graphs.PREGEL_CKPT_INTERVAL = c
            for k in KEYS:
                t0 = time.perf_counter()
                qs[k](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[c][k].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        print(f"round {r + 1}/{rounds} done", flush=True)
    med = {
        c: {k: statistics.median(v) for k, v in walls[c].items()}
        for c in CANDIDATES
    }
    totals = {c: round(sum(med[c].values()), 2) for c in CANDIDATES}
    print("per-key medians (interval -> total):", totals)
    for k in KEYS:
        print(f"{k:16s}", {c: med[c][k] for c in CANDIDATES})
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "rounds": rounds, "totals": totals,
             "medians": med, "raw": walls},
            fh, indent=1,
        )
        fh.write("\n")


if __name__ == "__main__":
    main()
