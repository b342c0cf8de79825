"""Generate POWER-LAW edge tables for the graph-family scaling runs.

The quadratic-map link graph the registered keys synthesize has
bounded skew (max degree ~20 at any size), so the degree-orientation
(graph_triangles) and hub-cap (graph_neighbor_jaccard) guarantees were
argued, not measured, against the degree distribution that actually
breaks naive wedge joins.  This corpus fixes that (round-9 VERDICT
item 7): each of N nodes emits 3 directed edges whose target is
floor(N · u³) for a per-(node, slot) uniform u — the cubic map
concentrates mass near node 0 with in-degree(k) ∝ k^(-2/3), giving a
genuine hub spine (E[indeg(0)] ≈ 3·N^(2/3): ~880 at 5k nodes, ~19k at
500k) while most nodes keep in-degree O(1).

Everything derives from xxhash64-style integer mixing of (node, slot)
— JVM-side expressions only, bit-stable across runs and partitionings.
Output: OUT_DIR/edges.parquet with (src, dst) BIGINT columns.

Usage: python scripts/gen_scale_graph.py OUT_DIR N_NODES
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gen_edges(spark: SparkSession, n_nodes: int) -> DataFrame:
    r = spark.range(n_nodes).withColumnRenamed("id", "src")
    e = r.select(
        "src", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("c")
    )
    # u in [0, 1) from a 30-bit hash slice; dst = floor(N * u^3) — the
    # cubic push toward low ids is the power-law. Integer-exact:
    # dst = (N * h^3) >> 90 would overflow, so go through double (u has
    # 30 significant bits, u^3 and the product stay exact enough to be
    # deterministic — doubles are IEEE on every executor).
    u = (
        F.pmod(F.xxhash64("src", "c"), F.lit(1 << 30)).cast("double")
        / float(1 << 30)
    )
    dst = F.floor(F.lit(float(n_nodes)) * u * u * u).cast("long")
    return (
        e.select("src", dst.alias("dst"))
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )


def main() -> None:
    out_dir, n_nodes = sys.argv[1], int(sys.argv[2])
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("gen-scale-graph")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "edges.parquet")
    gen_edges(spark, n_nodes).coalesce(8).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"wrote {path} ({n} edges over {n_nodes} nodes)")


if __name__ == "__main__":
    main()
