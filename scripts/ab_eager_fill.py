"""Interleaved A/B of the round-15 eager cache fills, per key (guide
§1.1 empirical loop): every fill site routes through
`session.eager_fill`, gated by `session._EAGER_FILL_ENABLED`, so one
session can alternate fills-ON / fills-OFF per round and the per-key
median decides which sites keep their fill. Results identical in both
arms by construction (a fill is a pure materialization).

Usage: python scripts/ab_eager_fill.py [sf_dir] [rounds] [out.json] [key ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import piper_spark.session as sess_mod
from piper_spark import registry
from piper_spark.session import get_spark

KEYS = [
    "dedup_minhash", "dedup_simhash", "dedup_simhash128",
    "pipeline_signatures", "dedup_ensemble", "pipeline_near_dedup",
    "dedup_winnow", "dedup_near_incremental", "dedup_containment",
    "dedup_substring", "text_substring_clean", "text_self_repeat",
    "text_decontam", "text_ccnet_buckets", "sample_quality_mix",
    "text_dup_grams", "sim_knn_join", "graph_triangles",
    "graph_neighbor_jaccard", "dedup_lsh_cosine", "sim_ann_lsh",
    "pipeline_curate", "pipeline_embed_curate", "pipeline_audio_curate",
    "pipeline_video_curate", "dq_outliers", "event_cooccur",
    "agg_median_bins", "agg_quantiles_bins", "tpch_q21",
    "dedup_semantic", "dedup_semantic_ivf",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 5
    out_path = args[2] if len(args) > 2 else "/tmp/ab_eager_fill.json"
    keys = args[3:] or KEYS
    qs = registry.all_queries()
    spark = get_spark("ab_eager_fill")
    spark.sparkContext.setLogLevel("ERROR")
    for k in keys:
        try:
            qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print("warm fail", k, e, file=sys.stderr)
    spark.catalog.clearCache()
    arms = {"on": True, "off": False}
    walls: dict[str, dict[str, list[float]]] = {
        a: {k: [] for k in keys} for a in arms
    }
    for r in range(rounds):
        for arm, flag in arms.items():
            sess_mod._EAGER_FILL_ENABLED = flag
            for k in keys:
                t0 = time.perf_counter()
                qs[k](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[arm][k].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        print(
            f"round {r + 1}/{rounds}:",
            {a: round(sum(v[-1] for v in walls[a].values()), 1) for a in arms},
            flush=True,
        )
    sess_mod._EAGER_FILL_ENABLED = True
    med = {
        a: {k: statistics.median(v) for k, v in walls[a].items()}
        for a in arms
    }
    print("totals:", {a: round(sum(med[a].values()), 2) for a in arms})
    for k in keys:
        on, off = med["on"][k], med["off"][k]
        tag = "FILL-WINS" if on < off else "fill-costs"
        print(f"{k:26s} on {on:6.2f}  off {off:6.2f}  ({on / off:4.2f}x)  {tag}")
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "rounds": rounds, "medians": med, "raw": walls},
            fh, indent=1,
        )
        fh.write("\n")


if __name__ == "__main__":
    main()
