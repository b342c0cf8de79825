"""Dump `.explain("formatted")` for a set of keys into plans/<tag>/.

The optimization-round evidence artifact: run once at the pre-change
commit with suffix `before` and once at the post-change tree with
suffix `after`, so every plan claim in OPTIMIZATION_r*.md is checkable
without running Spark.

Usage: python scripts/dump_round_plans.py <outdir> <suffix> [key ...]
       (keys default to the round's touched set in OPTIMIZATION_r14.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piper_spark import registry
from piper_spark.session import get_spark

DEFAULT_KEYS = [
    # operators with code changes this round
    "dedup_simhash",
    "dedup_simhash128",
    "dedup_minhash",
    "text_winnow",
    "dedup_embed",
    "embed_cov",
    "embed_power_iter",
    "cluster_kmeans",
    "sim_ann_kmeans",
    # heaviest session-policy exhibits (jobs/stages removed)
    "dedup_ensemble",
    "pipeline_near_dedup",
    "pipeline_signatures",
    "graph_cc",
    "graph_kcore",
    "dedup_winnow",
    "dedup_containment",
    "dedup_substring",
    "text_substring_clean",
    "agg_countmin",
    "agg_hll_union",
    "dedup_bloom",
    "event_retention",
    "event_rfm",
    "er_match",
    "sim_ann_batch",
    "sim_ann_two_level",
    "sim_ivf_pq",
    "sim_knn_join",
    "tpch_q21",
    "text_self_repeat",
]


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    keys = sys.argv[3:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_round_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    for k in keys:
        try:
            df = qs[k](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {e}\n"
        with open(os.path.join(outdir, f"{k}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        spark.catalog.clearCache()
        print("wrote", k, suffix)


if __name__ == "__main__":
    main()
