"""Sort / limit / top-k / set ops / exact dedup (SURVEY.md §2B).

`sort_limit` compiles to TakeOrderedAndProject (per-partition top-k +
driver merge — no global sort even at 100 TB). `dedup_exact` keeps the
MINIMUM doc_id per text group rather than using dropDuplicates, whose
survivor is partition-order-dependent (SURVEY.md §7 "Nondeterministic
keepers").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "sort_limit",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
ORDER BY revenue DESC, l_orderkey, l_linenumber
LIMIT 10
""",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by revenue with total-order tie-break (raw double —
    identical per-row IEEE math orders identically in both engines)."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select("l_orderkey", "l_linenumber", rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register(
    "set_ops",
    oracle="""
SELECT 'union_all' AS op, c_custkey FROM (
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'except' AS op, c_custkey FROM (
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT of two customer-key sets, tagged."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(a.unionAll(b), "union_all")
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.subtract(b), "except"))
    )


@register(
    "dedup_exact",
    oracle="""
SELECT text, CAST(min(doc_id) AS BIGINT) AS keeper_id, count(*) AS dup_cnt
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on text with deterministic keeper (min doc_id).

    At 100 TB: group on xxhash64(text) first to avoid shuffling full
    text — see piper_spark.functions.dedup.exact_dedup for that form;
    this oracle-checked query groups on the raw text directly.
    """
    return (
        table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )
