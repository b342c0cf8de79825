"""Scans / sources (SURVEY.md §2B "Scans / sources / sinks").

Generalizes the reference's image-directory scan + count
(reference: src/piper/spark/data_augment.py:115-122) to columnar
Parquet scans with column pruning and provenance grouping
(`image.origin` ≙ `documents.source`).

Scale notes: `scan_count` compiles to a metadata-only parquet count
(no row materialization); `scan_prune` reads exactly two columns
(check ReadSchema in the plan); `source_files` is a low-cardinality
hash aggregate with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "scan_count",
    oracle="SELECT count(*) AS cnt FROM lineitem",
)
def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table count of lineitem (reference S2: image_df.count())."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "scan_prune",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection; parquet reads only the two columns."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "source_files",
    oracle="SELECT source, count(*) AS cnt FROM documents GROUP BY source",
)
def source_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source row counts (provenance; reference `image.origin` field)."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
