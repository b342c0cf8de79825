"""Deterministic sampling / split (SURVEY.md §2B "Sampling / split").

Re-expresses the reference's seeded shuffle + 80/20 train/val split
(reference: src/burn-nn/src/data/loader.rs:21-45) as a deterministic
key-hash split. The modulo form (`doc_id % 100 < 80`) is used for the
oracle because xxhash64 differs between Spark and DuckDB; the
xxhash64-based form for keys without uniform ids lives in
piper_spark.functions.dedup.hash_split.

Scale notes: a split is a narrow filter — no shuffle, no sort, and
(unlike randomSplit) no re-scan inconsistency between the two halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "sample_stratified",
    oracle="""
SELECT lang, count(*) AS sampled, CAST(min(doc_id) AS BIGINT) AS min_id
FROM documents
WHERE doc_id % 10 < 3
GROUP BY lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~30% key-hash sample with per-stratum counts.

    Unlike df.sample(), re-runs and retries see the same rows — the
    property the reference gets from fixed seeds (loader.rs:37-39),
    without depending on partition layout.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 < 3)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("sampled"),
        F.min("doc_id").alias("min_id"),
    )


@register(
    "split_hash",
    oracle="""
SELECT CASE WHEN doc_id % 100 < 80 THEN 'train' ELSE 'val' END AS split,
       count(*) AS cnt,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM documents
GROUP BY 1
""",
)
def split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 split tag + per-split stats."""
    d = table(spark, sf_dir, "documents")
    split = F.when(F.col("doc_id") % 100 < 80, F.lit("train")).otherwise(F.lit("val"))
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
