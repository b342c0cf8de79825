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


def test_fan_out_skips_shuffled_plans(spark):
    """Round-15 (ADVICE 2): a plan already containing an Exchange comes
    back UNCHANGED and unprobed — `.rdd` on an Exchange-bearing plan
    under AQE eagerly executes its query stages, so fan_out must never
    touch one (its partitioning was set by the shuffle anyway)."""
    from pyspark.sql import functions as F

    agg = (
        spark.range(0, 100, 1, 2)
        .groupBy((F.col("id") % 10).alias("k"))
        .count()
    )
    assert fan_out(agg) is agg
    rep = spark.range(0, 100, 1, 2).repartition(3)
    assert fan_out(rep) is rep


def test_eager_fill_returns_same_relation(spark):
    """Round-15 (VERDICT 1): eager_fill is a pure materialization — the
    SAME DataFrame comes back (caller keeps the cache handle) and the
    rows are untouched."""
    from piper_spark.session import eager_fill

    df = spark.range(0, 57).selectExpr("id", "id * 3 AS t").persist()
    out = eager_fill(df)
    assert out is df
    assert sorted(r["t"] for r in out.collect()) == [
        3 * i for i in range(57)
    ]
    df.unpersist()


def test_lloyd_seeds_out_rows_are_lowest_vec_ids(spark):
    """Round-15 (VERDICT 4): lloyd_centroids hands the seed ROWS back —
    the k lowest vec_ids with their xq — so consumers read the
    vec_id = 0 query vector from seeds_out[0] instead of running a
    filter/head job. Seeds must equal the initial centroids."""
    from piper_spark.functions.similarity import (
        _km_xq_col,
        lloyd_centroids,
    )

    vecs = (
        table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _km_xq_col().alias("xq"))
        .persist()
    )
    seeds: list = []
    cents = lloyd_centroids(vecs, k=4, seeds_out=seeds)
    assert [int(r["vec_id"]) for r in seeds] == sorted(
        int(r["vec_id"]) for r in seeds
    )
    assert int(seeds[0]["vec_id"]) == 0  # fixture vec_ids are 0-based
    assert len(seeds) == len(cents) == 4
    assert all(len(r["xq"]) > 0 for r in seeds)  # rows carry xq
    vecs.unpersist()
