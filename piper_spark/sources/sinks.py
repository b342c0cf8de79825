"""Sinks — the engine's replacement for the reference's side-effect file
writes (reference: data_augment.py:60-72 writes one JPEG per row from
inside foreachPartition; errors swallowed per-row at :74-75).

Here every sink is a declarative DataFrame write: atomic per-task
commit protocol, retry-safe (deterministic input → overwrite mode is
idempotent), and partition/bucket layout is metadata the planner can
use downstream (partition pruning, shuffle-free joins on bucket keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout → downstream partition pruning.

    The mirror of the reference's class-per-folder image tree
    (loader.rs:13-19 infers labels from folder names) — but here the
    layout is a first-class catalog property, not a path convention.
    """
    df.write.format(fmt).mode("overwrite").partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table → co-located, shuffle-free joins/aggs on
    the bucket key at any scale (the 100 TB answer to repeated joins
    on the same key)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
