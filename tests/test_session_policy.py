"""Round-14 session-policy contracts: input-size-derived adaptivity,
the core-count parallelism floor, fan_out's conditional spread, and the
table() analyzed-plan memo. These pin the OPTIMIZATION semantics — the
policy must keep every core busy locally AND stay byte-derived at
scale — so a future tuning pass cannot silently reintroduce the
4-partition collapse measured in round 14 (OPTIMIZATION_r14.md)."""

from __future__ import annotations

from piper_spark.session import (
    _derived_shuffle_partitions,
    fan_out,
    table,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_derived_partitions_floor_is_quarter_cores():
    # Tiny input → cpus/4 floor (shuffle-bound stages only; CPU-heavy
    # map stages are fanned out explicitly by the operators). Measured
    # on the 26 heaviest keys: 8 partitions beat 32 by ~17% at sf0.1.
    assert _derived_shuffle_partitions(17 << 20, 32) == 8
    assert _derived_shuffle_partitions(0, 8) == 2
    assert _derived_shuffle_partitions(1 << 20, 2) == 2


def test_derived_partitions_byte_derived_above_floor():
    # One partition per 4 MiB once that exceeds the core count...
    assert _derived_shuffle_partitions(400 << 20, 32) == 100
    # ...capped at 4x the core count to bound scheduling overhead.
    assert _derived_shuffle_partitions(900 << 20, 16) == 64


def test_fan_out_spreads_narrow_input(spark):
    few = spark.range(0, 1000, 1, 2)
    assert (
        fan_out(few).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_fan_out_is_noop_on_wide_input(spark):
    p = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, p + 3)
    # Already at/above the session parallelism: the SAME plan comes
    # back — at scale the round-robin exchange must never be paid.
    assert fan_out(wide) is wide
    assert fan_out(wide).rdd.getNumPartitions() == p + 3


def test_fan_out_preserves_rows(spark):
    few = spark.range(0, 257, 1, 1).selectExpr("id", "id * id AS sq")
    got = sorted(r["sq"] for r in fan_out(few).collect())
    assert got == sorted(i * i for i in range(257))


def test_table_memo_returns_same_plan(spark):
    # Plan reuse only — the same analyzed DataFrame object comes back,
    # so repeated table() calls skip the driver-side footer re-read.
    d1 = table(spark, SF_SMOKE, "documents")
    d2 = table(spark, SF_SMOKE, "documents")
    assert d1 is d2


def test_table_memo_keyed_on_dir_and_name(spark):
    d = table(spark, SF_SMOKE, "documents")
    e = table(spark, SF_SMOKE, "embeddings")
    assert d is not e
    other = table(spark, "/root/testdata/sf0.01", "documents")
    assert d is not other
    # Different dirs really are different relations, not stale plans
    # (documents keeps 500 rows across SFs; lineitem does not).
    assert (
        table(spark, "/root/testdata/sf0.01", "lineitem").count()
        != table(spark, SF_SMOKE, "lineitem").count()
    )
