"""Sink round-trips (partitioned + bucketed) and the salted-join utility."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from piper_spark.operators.joins import salted_join
from piper_spark.session import table
from piper_spark.sources.sinks import write_partitioned
from tests.conftest import SF_SMOKE


def test_write_partitioned_roundtrip_and_pruning(spark):
    d = tempfile.mkdtemp(prefix="piper_sink_")
    docs = table(spark, SF_SMOKE, "documents")
    write_partitioned(docs, d, ["lang"])
    # hive-style dirs exist
    langs = {p.split("=")[1] for p in os.listdir(d) if p.startswith("lang=")}
    assert langs == {"de", "en", "es", "fr", "zh"}
    back = spark.read.parquet(d)
    assert back.count() == docs.count()
    # partition filter prunes to one directory → PartitionFilters in scan
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan


def test_write_partitioned_idempotent_overwrite(spark):
    d = tempfile.mkdtemp(prefix="piper_sink_")
    docs = table(spark, SF_SMOKE, "documents")
    write_partitioned(docs, d, ["lang"])
    write_partitioned(docs, d, ["lang"])  # rerun = same result, no dupes
    assert spark.read.parquet(d).count() == docs.count()


def test_bucketed_join_is_shuffle_free(spark):
    """Both sides bucketed on the join key → SortMergeJoin with NO
    shuffle exchange on either side — the 100 TB answer to repeated
    joins on one key (bucket layout replaces the per-query shuffle)."""
    import shutil

    from piper_spark.sources.sinks import write_bucketed

    # a fresh in-memory catalog + a leftover location from a previous
    # process makes saveAsTable fail — clean both
    for t in ("b_orders", "b_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/root/repo/spark-warehouse/{t}", ignore_errors=True)

    orders = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_cust",
        ["o_custkey"],
        num_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    assert j.count() == orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    ).count()


def test_salted_join_matches_plain_join(spark):
    orders = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders,
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey",
        salt_key="o_orderkey",
        n_salts=8,
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b
