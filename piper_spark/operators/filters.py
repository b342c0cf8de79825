"""Projection / filter / scalar math (SURVEY.md §2B).

`filter_pred` generalizes the reference's scan-level invalid-row drop
(reference: data_augment.py:117 `dropInvalid`); `proj_math` and
`clamp_scale` re-express the reference's per-pixel math — u8 scale
(conversion.rs:9-26) and color-jitter `x*1.2+10` clamped to [0,255]
(data_augment.py:21-22) — as whole-stage-codegen'd column expressions
instead of row-at-a-time Python.

Scale notes: all three are narrow (no shuffle); predicates and
projections push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_totalprice > 100000.0 AND o_orderstatus <> 'P')
   OR o_orderpriority = '1-URGENT'
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive + disjunctive predicates, pushed to the parquet scan."""
    o = table(spark, sf_dir, "orders")
    cond = ((F.col("o_totalprice") > 100000.0) & (F.col("o_orderstatus") != "P")) | (
        F.col("o_orderpriority") == "1-URGENT"
    )
    return o.filter(cond).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )


@register(
    "proj_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
""",
)
def proj_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row scalar math — same IEEE op order both engines, no rounding
    (rounding a value that sits exactly on a decimal midpoint is the one
    place the engines' round() implementations can disagree)."""
    li = table(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.select("l_orderkey", "l_linenumber", charge.alias("charge"))


@register(
    "clamp_scale",
    oracle="""
SELECT event_id,
       least(CAST(255 AS BIGINT),
             greatest(CAST(0 AS BIGINT),
                      CAST(round(value * 1.2 + 10, 0) AS BIGINT))) AS px
FROM events
""",
)
def clamp_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-math analogue of the reference color-jitter (S9): clamp(x*1.2+10)."""
    e = table(spark, sf_dir, "events")
    px = F.least(
        F.lit(255).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.round(F.col("value") * 1.2 + 10, 0).cast("long"),
        ),
    )
    return e.select("event_id", px.alias("px"))


@register(
    "scalar_subq",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders,
     (SELECT (CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS DOUBLE) / 100.0) / count(*) AS avg_price
      FROM orders) t
WHERE o_totalprice > t.avg_price
""",
)
def scalar_subq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: orders above the global average price.

    The threshold is computed with the exact scaled-long recipe (not
    native avg) so the BORDER rows are identical across engines —
    a float threshold from order-dependent summation could flip rows
    that sit exactly at the average. Plan: one tiny aggregate broadcast
    against the scan, narrow otherwise.
    """
    from piper_spark.functions.numeric import davg

    o = table(spark, sf_dir, "orders")
    avg_row = o.agg(davg(F.col("o_totalprice")).alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "reshape_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
)
WHERE l_orderkey < 100
""",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) — the inverse of agg_pivot.
    Values pass through untouched (no float math); the oracle spells
    the same op as UNION ALL for engine portability."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        [
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("discount"),
        ],
        "measure",
        "value",
    )
