"""Window functions (SURVEY.md §2B "Window functions").

`win_rank` generalizes the reference's top-1 argmax inference
(reference: src/burn-nn/src/inference.rs:7-12) to top-k per group;
`win_running` is the batch analogue of the training loop's gradient
accumulation (reference: training.rs:243-254 — an ordered running sum).

Every ORDER BY carries a unique tie-break key (event_id / o_orderkey)
so results are total-ordered and oracle-reproducible. Running sums use
the exact-decimal recipe (functions/numeric.py) so prefix sums match
DuckDB bit-for-bit regardless of each engine's accumulation strategy.

Scale notes: window partitions are per-user / per-customer — bounded
size, one shuffle on the partition key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "win_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price, deterministic tie-break."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_running",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 AS running_value
FROM events
""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum of value per user (exact scaled-long prefix sums —
    same recipe as functions/numeric.py, windowed)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    running = F.sum(scaled).over(w).cast("double") / 100.0
    return e.select("event_id", "user_id", running.alias("running_value"))


@register(
    "win_ranks",
    oracle="""
SELECT o_orderkey, o_custkey,
       dense_rank() OVER w AS drnk,
       rank()       OVER w AS rnk,
       ntile(4)     OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderstatus, o_orderkey)
""",
)
def win_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile in one pass — the rest of the ranking
    family next to win_rank's row_number. ntile's ORDER BY carries the
    unique o_orderkey tie-break so bucket assignment is total-ordered."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderstatus", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        # Spark rank fns return INT, DuckDB BIGINT → cast for schema parity
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.ntile(4).over(wq).cast("long").alias("quartile"),
    )


@register(
    "win_movavg",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 100.0
         / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS mov_avg
FROM events
""",
)
def win_movavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user — bounded sliding frame (exact
    scaled-long sums over the frame, then one double division)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    scaled = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    mov = F.sum(scaled).over(w).cast("double") / 100.0 / F.count(F.lit(1)).over(w)
    return e.select("event_id", "user_id", mov.alias("mov_avg"))


@register(
    "win_firstlast",
    oracle="""
SELECT event_id, user_id,
       first_value(value) OVER w AS first_v,
       last_value(value)  OVER w AS last_v,
       nth_value(value, 2) OVER w AS second_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the whole partition frame — the
    navigation-function family (values pass through untouched, so no
    float recipe needed; the frame must be unbounded BOTH ways or
    last/nth are prefix-dependent)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
    )


@register(
    "win_dist",
    oracle="""
SELECT o_orderkey,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — distribution window functions. Both
    are ratios of exact integer ranks, so the doubles match across
    engines without any recipe.

    o_orderstatus has only 3 values, so the naive window
    (`partitionBy(o_orderstatus)`) sorts a third of the table in ONE
    task — a scale-killer at 100 TB. Scale-safe decomposition instead:

    1. band every row by a fixed price bucket (value-derived, so it is
       deterministic and needs no pre-pass),
    2. aggregate per-(status, bucket) counts — a tiny relation
       (3 × #buckets rows), on which the per-status prefix-sum window
       is trivially cheap,
    3. row_number within (status, bucket) — the only window the big
       table flows through, and its partitions are price bands, each a
       small slice of a status (narrow the band width to scale), and
    4. broadcast the offsets back: global rank = band offset + rn.

    (o_totalprice, o_orderkey) is a unique ordering, so rank ==
    row_number and cume_dist == rank/n; both ratios are exact-integer
    divisions and match the oracle bit-for-bit.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.withColumn("bucket", F.floor(F.col("o_totalprice") / F.lit(10000.0)))
    counts = b.groupBy("o_orderstatus", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wpre = (
        Window.partitionBy("o_orderstatus")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "o_orderstatus",
        "bucket",
        F.coalesce(F.sum("cnt").over(wpre), F.lit(0)).alias("offset"),
        F.sum("cnt").over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    wrn = Window.partitionBy("o_orderstatus", "bucket").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = b.withColumn("rn", F.row_number().over(wrn))
    rank = F.col("offset") + F.col("rn")
    return ranked.join(F.broadcast(offsets), ["o_orderstatus", "bucket"]).select(
        "o_orderkey",
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise((rank - 1) / (F.col("n") - 1))
        .alias("pr"),
        (rank / F.col("n")).alias("cd"),
    )


@register(
    "win_lag",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) AS gap_us
FROM events
""",
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in microseconds (exact integer math)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return e.select("event_id", "user_id", gap.alias("gap_us"))


@register(
    "win_rangeframe",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_hour_cents
FROM events
""",
)
def win_rangeframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window — the VALUE-based frame the ROWS-framed
    `win_movavg` can't express: each event's trailing-one-hour spend,
    bounded by TIME distance (µs epoch), not row count. Equal
    timestamps share one frame, so no tie-break is needed for
    determinism (unlike row_number windows). Partitioned on user_id —
    bounded per-partition state like every window here; the frame is
    evaluated with a sliding aggregate, not a per-row rescan. Sums are
    exact scaled integers (functions/numeric.py discipline).
    """
    e = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("trailing_hour_cents"),
    )


#: EWMA frame: the last EWMA_SPAN events (current included). α = 1/2 —
#: halving is EXACT in float64, so the fold is bit-identical across
#: engines (cents ≤ 2¹⁶ plus 16 halvings needs ~32 mantissa bits < 53).
EWMA_SPAN = 16


@register(
    "win_ewma",
    oracle=f"""
SELECT event_id, user_id,
       list_reduce(
         list(CAST(floor(value * 100.0 + 0.5) AS DOUBLE))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW),
         (acc, x) -> (acc + x) / 2.0) / 100.0 AS ewma
FROM events
""",
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = ½) per user over the
    last {EWMA_SPAN} events.

    The decay factor is deliberately ½: dividing a float64 by two is
    exact, and the scaled-cents inputs fit the mantissa with all 16
    halvings to spare, so the left-fold s ← (s + x)/2 produces
    BIT-IDENTICAL doubles in both engines (the win_movavg scaled-long
    discipline, extended to a decaying frame — an arbitrary α would
    hit libm pow and diverge in the last bits). Spark's `aggregate`
    seeds with the frame's first element to match DuckDB's
    `list_reduce` semantics exactly.

    Scale shape: one user-keyed shuffle; per-row state is the bounded
    {EWMA_SPAN}-element frame array — no unbounded partition state, no
    global window.
    """
    e = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), Window.currentRow)
    )
    arr = F.collect_list(cents).over(w)
    folded = F.aggregate(
        F.slice(arr, 2, EWMA_SPAN),
        F.element_at(arr, 1),
        lambda acc, x: (acc + x) / 2.0,
    )
    return e.select(
        "event_id", "user_id", (folded / 100.0).alias("ewma")
    )
