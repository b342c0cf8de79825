"""Generate scaled-up synthetic `documents` tables for dedup scaling runs.

The driver's testdata tops out at sf0.1 (5,000 docs) and is read-only,
so scale-slope evidence (SCALING.md) needs self-generated corpora. This
produces N x sf0.1-shaped documents ENTIRELY with JVM-side expressions
(spark.range + hash-indexed vocab lookups — no Python in the data path,
so generation itself scales), with the same duplicate structure the
dedup family exercises:

- ~5%% exact duplicates (doc_id %% 20 == 7 copies the root doc_id - 7),
- ~5%% near duplicates (doc_id %% 20 == 13 takes the SAME root's salad,
  doc_id - 13, and appends two extra words -> shingle-Jaccard ~0.9
  with both the root and its exact copy — a planted triple per block),
- the rest hash-unique word salads over the testdata vocabulary
  (10-49 words, like sf0.1's documents).

Everything derives from xxhash64(doc_id), so the corpus is bit-stable
across runs and partitionings.

Usage: python scripts/gen_scale_docs.py OUT_DIR N_ROWS [VOCAB_SCALE]
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


def gen_documents(
    spark: SparkSession, n_rows: int, vocab_scale: int = 1
) -> DataFrame:
    """vocab_scale > 1 appends a deterministic numeric suffix drawn from
    `vocab_scale` values to every word, growing the effective vocabulary
    to len(VOCAB)·vocab_scale — the Heaps'-law-ish regime real corpora
    live in. The DEFAULT (1) keeps the original fixed-47-word corpus,
    whose x100 form SATURATES its 3-gram space (median gram df ≈ 150):
    that corpus is kept as the stop-gram stress case for the df-capped
    fingerprint ops; the scaled form carries their true slope."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    langs = F.array(*[F.lit(x) for x in LANGS])
    sources = F.array(*[F.lit(x) for x in SOURCES])

    def salad(seed_col):
        """10-49 deterministic vocab words keyed off `seed_col`."""
        n_words = (F.pmod(F.xxhash64(seed_col, F.lit(1)), F.lit(40)) + 10).cast("int")

        def word_at(i):
            base = F.element_at(
                vocab,
                (F.pmod(F.xxhash64(seed_col, i), F.lit(len(VOCAB))) + 1).cast("int"),
            )
            if vocab_scale <= 1:
                return base
            return F.concat(
                base,
                F.pmod(F.xxhash64(seed_col, i, F.lit(7)), F.lit(vocab_scale)).cast(
                    "string"
                ),
            )

        return F.concat_ws(
            " ",
            F.transform(F.sequence(F.lit(1), n_words), word_at),
        )

    base = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    # Duplicate structure: every 20-block carries a {root, exact copy,
    # near-dup} triple — doc ≡ 7 copies the ROOT doc_id−7 (≡ 0)
    # verbatim, doc ≡ 13 takes the SAME root's salad (doc_id−13) plus
    # two appended words (shingle-Jaccard ~0.9). Both seeds chain to
    # the root, whose text IS its own salad: the previous form seeded
    # near-dups at doc_id−6, but that doc is itself seed-redirected, so
    # salad(doc_id−6) appeared NOWHERE in the corpus and the planted
    # "near-dup" pairs had Jaccard ≈ 0 (found round 6 by measuring
    # planted recall instead of trusting the plan).
    seed = (
        F.when(F.col("doc_id") % 20 == 7, F.col("doc_id") - 7)
        .when(F.col("doc_id") % 20 == 13, F.col("doc_id") - 13)
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
    vocab_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from piper_spark.session import get_spark

    spark = get_spark("gen-scale-docs")
    gen_documents(spark, n_rows, vocab_scale).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    print(f"wrote {n_rows} docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
