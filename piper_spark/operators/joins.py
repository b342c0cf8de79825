"""Joins (SURVEY.md §2B "Joins").

The reference has no joins (SURVEY.md §2A: category absent); these are
the required relational surface, expressed so Catalyst picks the right
physical join at any scale:

- only BOUNDED dimension tables (region: 5 rows, nation: 25, supplier:
  sub-linear) carry explicit `F.broadcast()` hints — they stay
  broadcastable at any SF. Fact-scaled tables (orders, customer,
  lineitem) are never hinted: an explicit hint overrides
  autoBroadcastJoinThreshold and would OOM every executor at 100 TB.
  AQE picks broadcast for them at small SF from runtime sizes, and
  shuffled hash / sort-merge at scale — the right plan both times;
- the range join is an equi-join on the user key with the range
  predicate as a join filter (SortMergeJoin + filter), NOT a broadcast
  nested loop over the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from piper_spark.functions.numeric import dsum, sql_dsum
from piper_spark.registry import register
from piper_spark.session import table


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side deterministically,
    replicate the small side across salts, join on (key, salt).

    AQE's skew-join split handles moderate skew automatically; this is
    the explicit form for pathological hot keys (one key ≫ one
    executor's memory). Deterministic salt (hash of a unique column),
    so retries and re-runs place rows identically.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_key)), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    right = small.select("*", salts).withColumn("__salt", F.col("__salt").cast("bigint"))
    return left.join(right, [on, "__salt"]).drop("__salt")


@register(
    "join_inner",
    oracle="""
SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join orders ⋈ customer. Both sides fact-scaled, so no
    broadcast hint — AQE broadcasts at small SF, shuffles at 100 TB."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@register(
    "join_multiway",
    oracle=f"""
SELECT c_mktsegment,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way fact⋈fact⋈fact join + aggregate. orders/customer grow with
    SF, so no hints: AQE broadcasts them while small and switches to
    shuffled joins at scale."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(dsum(rev, 4).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "join_left",
    oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — customers with zero orders kept (count = 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join (left semi) — no duplication of the left side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation join (left anti) — complement of join_semi."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "tpch_q3",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: shipping-priority top-10 — selective filters
    pushed to every scan, aggregate, top-k without a global sort.
    orders/customer are fact-scaled → no broadcast hints (AQE decides)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, local-supplier revenue by nation.

    Only the bounded dimensions (region 5 rows, nation 25, supplier
    sub-linear) carry broadcast hints; orders/customer are fact-scaled,
    so AQE picks their join strategy (broadcast while small, shuffled
    hash / sort-merge at 100 TB).
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev, 4).alias("revenue"))
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name
FROM region CROSS JOIN nation
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT cartesian product of two BOUNDED dims (5×25 rows) — the
    one place a cross join is legitimate: enumerating a small
    combination space. Production guardrail: anything fact-sized on
    either side is a red-flag plan (tests/test_plan_shapes.py greps
    CartesianProduct out of every other query)."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "tpch_q6",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24.0
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan → pushed filters → global agg. The
    plan is one codegen'd stage over a pruned 4-column scan; at 100 TB
    the only cost is the scan itself (no shuffle beyond the final
    single-row reduce)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return f.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top-20 customers.
    nation (bounded, 25 rows) is the only broadcast hint; the
    customer/orders/lineitem joins are AQE-planned. Top-k via
    TakeOrderedAndProject, never a global sort."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14",
    oracle=f"""
SELECT round(100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)}
             / {sql_dsum('l_extendedprice * (1 - l_discount)', 4)}, 4)
         AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share in a shipdate window.
    Both numerator and denominator use the exact scaled-long sums, so
    the ratio divides identical doubles on both engines. part is
    sub-linear in SF — AQE broadcast-joins it unhinted."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    j = li.join(p, li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(100.0 * dsum(promo, 4) / dsum(rev, 4), 4).alias(
            "promo_revenue_pct"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q18",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum('l_quantity', 2)} AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > 30000
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (total quantity > 300).
    The HAVING subquery is a self-contained aggregate semi-join —
    Catalyst plans it as an aggregate + left-semi; the quantity
    threshold compares exact scaled longs so membership is identical
    across engines. Top-100 via TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long")).alias(
                "sq"
            )
        )
        .filter(F.col("sq") > 30000)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1.0 AND l_quantity <= 20.0)
   OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 5.0 AND l_quantity <= 35.0)
   OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 10.0 AND l_quantity <= 50.0)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate spanning
    both join sides. Catalyst extracts the common join key (equi-join,
    never a nested loop) and evaluates the OR-of-ANDs as a post-join
    filter; per-branch single-side conjuncts get pushed to the scans."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1.0) & (q <= 20.0))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(10, 30)
           & (q >= 5.0) & (q <= 35.0))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(20, 50)
           & (q >= 10.0) & (q <= 50.0))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(
        dsum(rev, 4).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


@register(
    "join_salted",
    oracle=f"""
SELECT s_name,
       {sql_dsum('l_extendedprice', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
""",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join as a registered, oracle-checked query:
    per-supplier revenue through `salted_join` — identical semantics to
    the plain equi-join (the oracle), but hot supplier keys are spread
    across n_salts sub-keys so no single task owns a whole hot key.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    j = salted_join(li, s, on="l_suppkey", salt_key="l_orderkey")
    return j.groupBy("s_name").agg(
        dsum(F.col("l_extendedprice"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_range",
    oracle="""
SELECT a.event_id AS event_id, count(*) AS n_followers
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.event_id
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events followed by same-user events within 10 minutes.

    Expressed as equi-join on user_id with the time range as a join
    filter → SortMergeJoin, never a nested-loop cross product. At 100 TB
    the per-user groups stay bounded, so the shuffle is the only cost.
    """
    e = table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_followers"))
    )


def _bucket_table(spark: SparkSession, df: DataFrame, name: str, key: str) -> DataFrame:
    """(Re)write df as a bucketed external table and return the catalog
    read — the bucketing metadata makes later equi-joins/aggs on `key`
    shuffle-free."""
    from piper_spark.operators.scans import WAREHOUSE_DIR

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, key)
        .sortBy(key)
        .option("path", f"{WAREHOUSE_DIR}/{name}")
        .saveAsTable(name)
    )
    return spark.table(name)


@register(
    "join_bucket",
    oracle=f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_dsum('o.o_totalprice')} AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
)
def join_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join via BUCKETED tables — zero join shuffle.

    Both sides are written `bucketBy(8, custkey).sortBy(custkey)`; the
    sort-merge join then reads co-located buckets directly — the plan
    has NO Exchange under the join (pinned by tests/test_plan_shapes).
    This is the 100 TB recipe the prompt's shuffle-minimization rule
    asks for: pay the partitioned write once, amortize it over every
    subsequent join/agg on the bucket key. The `merge` hint keeps the
    demo on the SMJ path even where AQE would broadcast the small side
    at toy SF (at real scale neither side is broadcastable).
    """
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.rstrip("/").rsplit("/", 1)[-1])
    o = _bucket_table(
        spark,
        table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        f"bkt_orders_{tag}",
        "o_custkey",
    )
    c = _bucket_table(
        spark,
        table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        f"bkt_customer_{tag}",
        "c_custkey",
    )
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


#: CDC key space: inserted rows get keys shifted far past the base
#: table's range so MERGE "not matched" branches are unambiguous.
MERGE_INSERT_SHIFT = 100_000_000


@register(
    "merge_upsert",
    oracle=f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
),
ins AS (
  SELECT o_orderkey + {MERGE_INSERT_SHIFT} AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 7
),
changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
UNION ALL
SELECT * FROM changes
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC upsert) semantics on plain parquet relations.

    The lakehouse staple Spark-on-parquet lacks as a statement: apply a
    changelog of updates (matched → new status 'U') and inserts (not
    matched → shifted keys, status 'N') to a base table in one pass.
    Expressed as the relational core every MERGE implementation lowers
    to — a key anti-join removing superseded base rows + a union of the
    applied changes. The changelog here is derived deterministically
    from the base table so the key stays oracle-checkable (a real CDC
    feed swaps the two derivation filters for the incoming batch;
    `dedup_incremental` is the same pattern on the dedup side).

    Scale shape: one o_orderkey-shuffled anti-join (sort-merge or
    shuffled-hash under AQE — the changelog is usually batch-sized, so
    Catalyst broadcasts it when small) and a shuffle-free union. No
    global state; Delta/Iceberg MERGE adds file-level pruning on top of
    exactly this plan.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    upd = o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_orderstatus", F.lit("U")
    )
    ins = (
        o.filter(F.col("o_orderkey") % 10 == 7)
        .withColumn("o_orderkey", F.col("o_orderkey") + MERGE_INSERT_SHIFT)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    changes = upd.unionByName(ins)
    kept = o.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    return kept.unionByName(changes)


@register(
    "scd2_intervals",
    oracle="""
WITH chg AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS ver_key
  FROM orders GROUP BY o_custkey, o_orderdate
),
v AS (
  SELECT c.o_custkey AS cust_key, c.o_orderdate AS valid_from,
         o.o_orderstatus AS status,
         lead(c.o_orderdate) OVER (PARTITION BY c.o_custkey
                                   ORDER BY c.o_orderdate) AS valid_to
  FROM chg c JOIN orders o ON o.o_orderkey = c.ver_key
)
SELECT cust_key, valid_from, valid_to, status,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM v
""",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 dimension build — turn a changelog into validity
    intervals [valid_from, valid_to) with an is_current flag, the
    Kimball slowly-changing-dimension shape every lakehouse dimension
    load runs and the historical sibling of `merge_upsert` (which keeps
    only the latest version; SCD2 keeps them ALL, queryable as-of any
    date via `join_asof`). Changelog derived deterministically from
    `orders`: per (customer, date) the highest orderkey is that day's
    version (the dedup-to-one-version-per-grain step every CDC feed
    needs — same discipline as `exact_dedup`'s deterministic survivor).

    Shape: one (key, grain) hash agg → one orderkey-keyed join back for
    the version payload → ONE key-partitioned lead() window; all three
    shuffle on the dimension key or the version key, state per window
    partition bounded by one key's history. At 100 TB the window is the
    only sort, and it sorts each customer's handful of versions —
    never a global order."""
    o = table(spark, sf_dir, "orders")
    chg = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("ver_key")
    )
    v = chg.join(
        o.select("o_orderkey", "o_orderstatus"),
        chg["ver_key"] == F.col("o_orderkey"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    # is_current derives FROM valid_to (one window slot, single source
    # of truth — the oracle does the same), never a second lead().
    return v.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.col("o_orderstatus").alias("status"),
    ).withColumn("is_current", F.col("valid_to").isNull().cast("int"))


#: join_interval geometry: order intervals [orderdate, +key%14 days],
#: 52 maintenance windows of 10 days weekly from 1995-01-01, both
#: exploded to 7-day buckets for the equi-join prejoin.
IVL_MAX_DAYS, IVL_WINDOWS, IVL_WIN_DAYS, IVL_EPOCH = 14, 52, 10, "1995-01-01"


@register(
    "join_interval",
    oracle=f"""
WITH iv AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + CAST((o_orderkey % {IVL_MAX_DAYS}) AS INTEGER) AS e
  FROM orders
),
win AS (
  SELECT w AS window_id,
         DATE '{IVL_EPOCH}' + CAST(7 * w AS INTEGER) AS ws,
         DATE '{IVL_EPOCH}' + CAST(7 * w + {IVL_WIN_DAYS} - 1 AS INTEGER) AS we
  FROM (SELECT unnest(range(0, {IVL_WINDOWS})) AS w)
)
SELECT iv.o_orderkey, CAST(win.window_id AS BIGINT) AS window_id,
       CAST(date_diff('day', greatest(iv.s, win.ws), least(iv.e, win.we)) + 1
            AS BIGINT) AS overlap_days
FROM iv JOIN win ON iv.s <= win.we AND win.ws <= iv.e
""",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP join — the temporal-join shape `join_range`'s
    docstring warns about, solved the scalable way: both interval sets
    are EXPLODED TO WEEK BUCKETS (an interval of ≤ d days covers
    ≤ ⌈d/7⌉+1 buckets — bounded fan-out) and paired by a bucket
    EQUI-JOIN, with the exact overlap predicate re-checked on the
    bounded candidates and duplicates (pairs sharing several buckets)
    collapsed by distinct.  Catalyst's native answer to `a.s <= b.e AND
    b.s <= a.e` is a broadcast-nested-loop scan — fine for 52 windows,
    quadratic death when both sides scale; the bucket prejoin stays a
    hash join at any size (plan-pinned: no BNLJ).  The oracle states
    the plain overlap join — DuckDB's optimizer handles its own
    strategy; ours must produce the identical pair set.

    Output: (o_orderkey, window_id, overlap_days), overlap in whole
    days by exact date arithmetic.
    """
    o = table(spark, sf_dir, "orders")
    iv = o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("s"),
        F.expr(
            f"date_add(to_date(o_orderdate), cast(o_orderkey % {IVL_MAX_DAYS} as int))"
        ).alias("e"),
    )
    win = spark.range(IVL_WINDOWS).select(
        F.col("id").alias("window_id"),
        F.expr(f"date_add(date'{IVL_EPOCH}', cast(7 * id as int))").alias("ws"),
        F.expr(
            f"date_add(date'{IVL_EPOCH}', cast(7 * id + {IVL_WIN_DAYS} - 1 as int))"
        ).alias("we"),
    )
    wk_s = F.expr(f"floor(datediff(s, date'{IVL_EPOCH}') / 7)")
    wk_e = F.expr(f"floor(datediff(e, date'{IVL_EPOCH}') / 7)")
    ivb = iv.select(
        "o_orderkey", "s", "e",
        F.explode(F.sequence(wk_s.cast("long"), wk_e.cast("long"))).alias("wk"),
    )
    wwk_s = F.expr(f"floor(datediff(ws, date'{IVL_EPOCH}') / 7)")
    wwk_e = F.expr(f"floor(datediff(we, date'{IVL_EPOCH}') / 7)")
    winb = win.select(
        "window_id", "ws", "we",
        F.explode(F.sequence(wwk_s.cast("long"), wwk_e.cast("long"))).alias("wk"),
    )
    overlap = (
        F.datediff(F.least("e", "we"), F.greatest("s", "ws")) + 1
    ).cast("long")
    return (
        ivb.join(winb, "wk")
        .filter((F.col("s") <= F.col("we")) & (F.col("ws") <= F.col("e")))
        .select(
            "o_orderkey",
            F.col("window_id").cast("long").alias("window_id"),
            overlap.alias("overlap_days"),
        )
        .distinct()
    )


#: join_geo_grid geometry: deterministic integer positions on a
#: GEO_GRID_SIZE² grid from the customer key; pairs within Chebyshev
#: distance GEO_RADIUS found via a 3×3 neighbor-cell probe (cell width
#: = radius ⇒ a qualifying partner is never more than one cell away).
GEO_GRID_SIZE, GEO_RADIUS = 10_000, 25


@register(
    "join_geo_grid",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id,
         (c_custkey * 7919) % {GEO_GRID_SIZE} AS x,
         (c_custkey * c_custkey % 9973 * 4073 + c_custkey) % {GEO_GRID_SIZE} AS y
  FROM customer
)
SELECT a.id AS id1, b.id AS id2,
       CAST(greatest(abs(a.x - b.x), abs(a.y - b.y)) AS BIGINT) AS cheb
FROM pts a JOIN pts b
  ON a.id < b.id
WHERE greatest(abs(a.x - b.x), abs(a.y - b.y)) <= {GEO_RADIUS}
""",
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL SELF-JOIN by grid bucketing — `join_interval`'s 2D
    sibling (proximity pairs instead of overlap pairs): points within
    Chebyshev distance {GEO_RADIUS} on an integer grid, found by
    exploding each point to its 3×3 NEIGHBOR CELLS (cell width =
    radius, so any qualifying partner lies in one of them) on the
    probe side only, equi-joining on the cell key against unexploded
    build points, then verifying the exact distance.  A pair is found
    EXACTLY once (the build point occupies one cell), so no distinct
    is needed — cheaper than the interval variant's multi-bucket
    dedup.  The naive form is an O(n²) cross join; this is one keyed
    equi-join with 9× probe fan-out, the standard uniform-grid spatial
    index lowered to relational ops (positions synthesized from the
    key in exact integer arithmetic — the `link_edges` precedent; a
    real table would bring lat/lon through the same `div`-bucketing).

    Output: (id1, id2, cheb) with the exact Chebyshev distance.
    """
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % GEO_GRID_SIZE).alias("x"),
        (
            (
                F.col("c_custkey") * F.col("c_custkey") % 9973 * 4073
                + F.col("c_custkey")
            )
            % GEO_GRID_SIZE
        ).alias("y"),
    )
    cx = F.expr(f"x div {GEO_RADIUS}")
    cy = F.expr(f"y div {GEO_RADIUS}")
    build = pts.select(
        F.col("id").alias("id2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        (cx * 100_000 + cy).alias("cell"),
    )
    probe = (
        pts.select(
            "id",
            "x",
            "y",
            F.explode(
                F.array(*[F.lit(d) for d in range(9)])
            ).alias("d"),
        )
        .select(
            F.col("id").alias("id1"),
            F.col("x").alias("x1"),
            F.col("y").alias("y1"),
            (
                (cx + F.col("d") % 3 - 1) * 100_000
                + (cy + F.expr("d div 3") - 1)
            ).alias("cell"),
        )
    )
    cheb = F.greatest(
        F.abs(F.col("x1") - F.col("x2")), F.abs(F.col("y1") - F.col("y2"))
    ).cast("long")
    return (
        probe.join(build, "cell")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", cheb.alias("cheb"))
        .filter(F.col("cheb") <= GEO_RADIUS)
    )
