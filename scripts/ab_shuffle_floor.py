"""Interleaved A/B of the static shuffle-partition floor on the
CURRENT host (round 15, VERDICT item 7: the round-14 A/B that chose
cpus/4 ran on a noisy box; re-pin where the driver measures).

For each candidate partition count the heaviest keys run to the noop
sink with `spark.sql.shuffle.partitions` set at runtime (the static
no-AQE policy reads it at planning time), INTERLEAVED A/B/C per round
so host drift hits every arm equally; the per-key statistic is the
median over rounds.

Usage: python scripts/ab_shuffle_floor.py [sf_dir] [rounds] [out.json]
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

#: The heavy-tail keys (sum-of-medians order, BENCH_PIN_r15pre).
KEYS = [
    "text_substring_clean", "dedup_ensemble", "dedup_substring",
    "sim_ann_batch", "dedup_minhash", "pipeline_curate",
    "cluster_kmeans", "pipeline_near_dedup", "text_self_repeat",
    "sim_knn_join", "agg_quantiles_bins", "sim_ann_kmeans",
    "sim_ann_two_level", "dedup_containment", "sim_ivf_pq",
    "text_bpe_encode", "tpch_q21", "dedup_semantic_ivf",
    "video_fingerprint", "sim_ann_ivf", "graph_cc", "dedup_winnow",
    "dedup_simhash128", "sample_quality_mix", "pipeline_embed_curate",
    "pipeline_signatures",
]
CANDIDATES = [8, 16, 32]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 5
    out_path = args[2] if len(args) > 2 else "/tmp/ab_floor.json"
    qs = registry.all_queries()
    spark = get_spark("ab_floor")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up at sf0.001 (the bench's codegen-warmth methodology).
    for k in KEYS:
        try:
            qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print("warm fail", k, e, file=sys.stderr)
    spark.catalog.clearCache()
    walls: dict[int, dict[str, list[float]]] = {
        c: {k: [] for k in KEYS} for c in CANDIDATES
    }
    for r in range(rounds):
        for c in CANDIDATES:
            spark.conf.set("spark.sql.shuffle.partitions", str(c))
            for k in KEYS:
                t0 = time.perf_counter()
                qs[k](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[c][k].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        print(
            f"round {r + 1}/{rounds}:",
            {c: round(sum(v[-1] for v in walls[c].values()), 1) for c in CANDIDATES},
            flush=True,
        )
    med = {
        c: {k: statistics.median(v) for k, v in walls[c].items()}
        for c in CANDIDATES
    }
    totals = {c: round(sum(med[c].values()), 2) for c in CANDIDATES}
    print("per-key medians (candidate -> total):", totals)
    for k in KEYS:
        print(f"{k:28s}", {c: med[c][k] for c in CANDIDATES})
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "rounds": rounds, "totals": totals,
             "medians": med, "raw": walls},
            fh, indent=1,
        )
        fh.write("\n")


if __name__ == "__main__":
    main()
