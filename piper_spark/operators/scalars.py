"""Scalar functions: string / date / JSON / array (SURVEY.md §2B).

`arr_norm` re-expresses the reference's tensor normalization + u8→f32
scaling (reference: src/burn-nn/src/model/normalize.rs:8-28,
data/conversion.rs:9-26) as array-column math; `arr_argmax` is the
reference's top-1 inference (inference.rs:7-12).

Cross-engine type notes: Spark length/year/month return INT where
DuckDB returns BIGINT → Spark side casts to long. DuckDB
date_trunc('month') returns DATE → oracle casts to TIMESTAMP. All array
folds run left-to-right from 0.0 in both engines, so doubles match
bit-for-bit (elements are cast to double BEFORE any arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "str_funcs",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lc,
       substr(p_type, 1, 5) AS type5,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat(p_brand, '#', p_type) AS brand_type
FROM part
WHERE p_name LIKE '%a%'
""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/substr/length/concat/LIKE over part."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       count(*) AS cnt
FROM orders
GROUP BY 1, 2, 3
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc buckets of o_orderdate."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "str_regexp",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
       regexp_replace(p_brand, '[0-9]+', '#') AS brand_masked,
       CAST(regexp_matches(p_name, 'a.*e') AS BOOLEAN) AS has_ae
FROM part
""",
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace/match — patterns kept to the common subset
    where Java and RE2 regex semantics agree."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
        F.col("p_name").rlike("a.*e").alias("has_ae"),
    )


@register(
    "date_buckets",
    oracle="""
SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
       CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(quarter(o_orderdate) AS INTEGER) AS qnum,
       count(*) AS cnt
FROM orders
GROUP BY 1, 2, 3, 4, 5
""",
)
def date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing at every reporting granularity in one pass
    (week/month/quarter truncs + year/quarter numbers). Both engines
    start ISO weeks on Monday under UTC."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.groupBy(
        F.date_trunc("week", d).alias("wk"),
        F.date_trunc("month", d).alias("mo"),
        F.date_trunc("quarter", d).alias("qtr"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qnum"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "str_extract_all",
    oracle="""
SELECT event_id,
       CAST(len(regexp_extract_all(props, '([0-9]+)', 1)) AS INTEGER) AS n_nums,
       regexp_extract_all(props, '([0-9]+)', 1)[1] AS first_num
FROM events
""",
)
def str_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — all matches as an array (UDTF-adjacent
    string op); count + first element compared (1-based in both)."""
    e = table(spark, sf_dir, "events")
    all_nums = F.regexp_extract_all("props", F.lit("([0-9]+)"), 1)
    return e.select(
        "event_id",
        F.size(all_nums).alias("n_nums"),
        # F.get (0-based) yields NULL on an empty array, matching the
        # oracle's [1]; element_at would throw INVALID_ARRAY_INDEX under
        # ANSI mode for a digit-free props string.
        F.get(all_nums, 0).alias("first_num"),
    )


@register(
    "str_funcs2",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up,
       reverse(p_name) AS rev,
       lpad(p_brand, 12, '.') AS padded,
       repeat(p_type, 2) AS doubled,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up
FROM part
""",
)
def str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: case, reverse, pad, repeat, translate —
    pure per-row codegen'd expressions, zero shuffle."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.reverse("p_name").alias("rev"),
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.repeat("p_type", 2).alias("doubled"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
    )


@register(
    "agg_mode",
    oracle="""
SELECT user_id, event_type AS modal_type, cnt
FROM (
  SELECT user_id, event_type, count(*) AS cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events
  GROUP BY user_id, event_type
) WHERE rn = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type — mode() with a DETERMINISTIC tie-break
    (engines' built-in mode() breaks ties arbitrarily; rank-over-counts
    does not)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "cnt")
    )


@register(
    "date_arith",
    oracle="""
SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_lag_days,
       count(*) AS cnt
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
GROUP BY 1
""",
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag histogram — timestamp difference arithmetic.
    orders is fact-scaled → no broadcast hint; AQE picks the strategy."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lag_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(lag_days.alias("ship_lag_days"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "null_funcs",
    oracle="""
SELECT coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status,
       CAST(coalesce(NULL, -1) AS BIGINT) AS missing_label,
       count(*) AS cnt
FROM orders
GROUP BY 1, 2
""",
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif/coalesce — the reference's missing-label
    sentinel (conversion.rs:79-83, Annotation missing → -1) as
    relational null handling."""
    o = table(spark, sf_dir, "orders")
    status = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
    )
    return o.groupBy(
        status.alias("status"),
        F.coalesce(F.lit(None), F.lit(-1)).cast("long").alias("missing_label"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*) AS cnt
FROM events
GROUP BY 1
""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pull props.k out of the JSON string column and aggregate by it."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "json_typed",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_band
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
""",
)
def json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a TYPED struct (vs json_extract's stringly
    get_json_object) — the schema-projection JSON surface. Parse once,
    then field access is ordinary column math."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "struct<k:int>")
    return (
        e.select("event_id", parsed.alias("p"))
        .select("event_id", F.col("p.k").alias("k"), (F.col("p.k") % 10).alias("k_band"))
        .filter(F.col("k").isNotNull())
    )


@register(
    "arr_ops",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS n_dims,
       round(CAST(embedding[3] AS DOUBLE), 4) AS third,
       round(CAST(list_min(embedding[1:8]) AS DOUBLE), 4) AS head_min,
       round(CAST(list_reverse(embedding)[1] AS DOUBLE), 4) AS last_elem,
       CAST(list_contains(list_transform(embedding, x -> x > 0.5), true)
            AS INTEGER) AS has_big
FROM embeddings
""",
)
def arr_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-manipulation surface in one row-parallel pass: size,
    element access, slice+min, reverse, existence predicate. All
    codegen'd JVM ops; DuckDB's list_* family is the oracle twin
    (both engines index 1-based).
    """
    e = table(spark, sf_dir, "embeddings")
    ed = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(ed).alias("n_dims"),
        F.round(F.element_at(ed, 3).cast("double"), 4).alias("third"),
        F.round(F.array_min(F.slice(ed, 1, 8)).cast("double"), 4).alias("head_min"),
        F.round(F.element_at(F.reverse(ed), 1).cast("double"), 4).alias("last_elem"),
        F.exists(ed, lambda x: x > 0.5).cast("int").alias("has_big"),
    )


@register(
    "arr_posexplode",
    oracle="""
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
       CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
         AS val_q
FROM embeddings
WHERE vec_id < 20
""",
)
def arr_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UDTF shape): one row per (vector, dimension)
    with the value fixed-point quantized so floats never enter the
    hash. Bounded subset — exploding 64× is a deliberate cost."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("v").cast("double") * 10000.0 + 0.5).cast("long").alias("val_q"),
    )


@register(
    "arr_norm",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))), 4) AS l2_norm
FROM embeddings
""",
)
def arr_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row L2 norm of the embedding (reference normalize.rs semantics)."""
    e = table(spark, sf_dir, "embeddings")
    squares = F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x)
    sumsq = F.aggregate(squares, F.lit(0.0), lambda acc, x: acc + x)
    return e.select("vec_id", F.round(F.sqrt(sumsq), 4).alias("l2_norm"))


@register(
    "arr_argmax",
    oracle="""
SELECT vec_id,
       CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_idx
FROM embeddings
""",
)
def arr_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-based index of the max embedding element, first-occurrence ties."""
    e = table(spark, sf_dir, "embeddings")
    idx = F.array_position(F.col("embedding"), F.array_max(F.col("embedding")))
    return e.select("vec_id", idx.alias("argmax_idx"))


@register(
    "json_variant",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 16 AS k_band,
       count(*) AS cnt,
       CAST(max(json_extract_string(props, '$.k') :: BIGINT) AS BIGINT) AS max_k
FROM events
GROUP BY 1
""",
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    `parse_json` once into an open-schema binary encoding, then typed
    `variant_get` path extraction — the modern shredded-JSON surface
    next to `json_extract` (stringly get_json_object) and `json_typed`
    (closed-schema from_json). At scale VARIANT parses each document
    once and pushes typed paths into columnar reads instead of
    re-walking JSON text per expression.
    """
    e = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return e.groupBy((k % 16).alias("k_band")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max(k).alias("max_k"),
    )
