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
