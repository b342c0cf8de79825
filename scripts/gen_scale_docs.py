"""Generate scaled-up synthetic `documents` tables for dedup scaling runs.

The driver's testdata tops out at sf0.1 (5,000 docs) and is read-only,
so scale-slope evidence (SCALING.md) needs self-generated corpora. This
produces N x sf0.1-shaped documents ENTIRELY with JVM-side expressions
(spark.range + hash-indexed vocab lookups — no Python in the data path,
so generation itself scales), with the same duplicate structure the
dedup family exercises:

- ~5%% exact duplicates (doc_id %% 20 == 7 copies doc_id - 7's text),
- ~5%% near duplicates (doc_id %% 20 == 13 takes doc_id - 6's text and
  appends two extra words -> high shingle-Jaccard pair, not exact),
- the rest hash-unique word salads over the testdata vocabulary
  (10-49 words, like sf0.1's documents).

Everything derives from xxhash64(doc_id), so the corpus is bit-stable
across runs and partitionings.

Usage: python scripts/gen_scale_docs.py OUT_DIR N_ROWS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = (
    "spark sort hash join scan agg group filter batch line column order "
    "small fast slow value part merge shuffle read write cache disk page "
    "index key row table query plan stage task core node rack wide deep "
    "cold warm dense sparse left right inner outer"
).split()

LANGS = ["en", "de", "fr", "es", "pt"]
SOURCES = ["web", "books", "code", "wiki"]


def gen_documents(spark: SparkSession, n_rows: int) -> DataFrame:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    langs = F.array(*[F.lit(x) for x in LANGS])
    sources = F.array(*[F.lit(x) for x in SOURCES])

    def salad(seed_col):
        """10-49 deterministic vocab words keyed off `seed_col`."""
        n_words = (F.pmod(F.xxhash64(seed_col, F.lit(1)), F.lit(40)) + 10).cast("int")
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: F.element_at(
                    vocab,
                    (F.pmod(F.xxhash64(seed_col, i), F.lit(len(VOCAB))) + 1).cast(
                        "int"
                    ),
                ),
            ),
        )

    base = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    # Duplicate structure: exact copies point at doc_id-7, near-dups at
    # doc_id-6 (same salad + 2 appended words => shingle-Jaccard ~0.9).
    seed = (
        F.when(F.col("doc_id") % 20 == 7, F.col("doc_id") - 7)
        .when(F.col("doc_id") % 20 == 13, F.col("doc_id") - 6)
        .otherwise(F.col("doc_id"))
    )
    text = F.when(
        F.col("doc_id") % 20 == 13,
        F.concat_ws(" ", salad(seed), F.lit("extra tail")),
    ).otherwise(salad(seed))
    return base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            langs, (F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(len(LANGS))) + 1).cast("int")
        ).alias("lang"),
        F.element_at(
            sources,
            (F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(len(SOURCES))) + 1).cast("int"),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def main() -> None:
    out_dir, n_rows = sys.argv[1], int(sys.argv[2])
    from piper_spark.session import get_spark

    spark = get_spark("gen-scale-docs")
    gen_documents(spark, n_rows).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    print(f"wrote {n_rows} docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
