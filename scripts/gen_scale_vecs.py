"""Generate scaled-up synthetic `embeddings` tables for LSH scaling runs.

The driver's embeddings table is a fixed 500 rows at every SF, so
scale-slope evidence for the sign-LSH family (SCALING.md) needs
self-generated vector corpora. Vectors are built ENTIRELY with
JVM-side expressions (spark.range + hash-derived components — no
Python in the data path), with the duplicate structure the near-dup
queries exercise:

- ~2% near duplicates (vec_id % 50 == 13 copies vec_id - 6's vector
  plus ±0.005 per-dim noise → cosine ≈ 1),
- the rest hash-unique 64-dim vectors with components in [-0.5, 0.5)
  (the real table's range).

Everything derives from xxhash64(vec_id, dim), so the corpus is
bit-stable across runs and partitionings. Output lands next to the
documents corpus: OUT_DIR/embeddings.parquet.

Usage: python scripts/gen_scale_vecs.py OUT_DIR N_ROWS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIMS = 64


def _vec(seed_col):
    """64 deterministic components in [-0.5, 0.5) keyed off `seed_col`."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(DIMS - 1)),
        lambda d: (
            F.pmod(F.xxhash64(seed_col, d), F.lit(100000)).cast("double") / 100000.0
            - 0.5
        ).cast("float"),
    )


def gen_embeddings(spark: SparkSession, n_rows: int) -> DataFrame:
    r = spark.range(n_rows).withColumnRenamed("id", "vec_id")
    near = (F.col("vec_id") % 50 == 13) & (F.col("vec_id") >= 6)
    base = _vec(F.col("vec_id"))
    twin = F.zip_with(
        _vec(F.col("vec_id") - 6),
        F.sequence(F.lit(0), F.lit(DIMS - 1)),
        lambda x, d: (
            x
            + F.pmod(F.xxhash64(F.col("vec_id"), d, F.lit(1)), F.lit(11)).cast(
                "double"
            )
            / 1000.0
            - 0.005
        ).cast("float"),
    )
    return r.select(
        "vec_id",
        F.when(near, twin).otherwise(base).alias("embedding"),
        F.pmod(F.xxhash64("vec_id", F.lit(2)), F.lit(10)).cast("int").alias("label"),
    )


def main() -> None:
    out_dir, n_rows = sys.argv[1], int(sys.argv[2])
    from piper_spark.session import get_spark

    spark = get_spark("gen-scale-vecs")
    gen_embeddings(spark, n_rows).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    print(f"wrote {n_rows} vectors to {out_dir}/embeddings.parquet")


if __name__ == "__main__":
    main()
