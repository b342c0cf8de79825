"""Generate scaled-up synthetic `customer` tables for the entity-
resolution scaling runs.

Same discipline as gen_scale_docs/events/vecs: N× sf0.1-shaped
customers built ENTIRELY with JVM-side expressions (spark.range —
no Python in the data path), schema mirroring the driver's customer
table (contiguous c_custkey is the only column `er_match`/
`er_clusters` read; the rest keep the shape honest). Deterministic
in c_custkey.

Usage: python scripts/gen_scale_customers.py OUT_DIR N_ROWS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def gen_customers(spark: SparkSession, n_rows: int) -> DataFrame:
    segs = F.array(*[F.lit(s) for s in SEGMENTS])
    k = F.col("id")
    return spark.range(n_rows).select(
        k.alias("c_custkey"),
        F.concat(
            F.lit("Customer#"), F.lpad(k.cast("string"), 9, "0")
        ).alias("c_name"),
        (k % 25).cast("int").alias("c_nationkey"),
        ((F.xxhash64(k) % 1_000_000 + 1_000_000) % 1_000_000 / 100.0).alias(
            "c_acctbal"
        ),
        F.element_at(segs, (k % 5 + 1).cast("int")).alias("c_mktsegment"),
    )


def main() -> None:
    out_dir, n_rows = sys.argv[1], int(sys.argv[2])
    from piper_spark.session import get_spark

    spark = get_spark("gen-scale-customers")
    gen_customers(spark, n_rows).coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )
    print(f"wrote {out_dir}/customer.parquet ({n_rows} rows)")


if __name__ == "__main__":
    main()
