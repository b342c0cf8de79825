"""Event sessionization + tumbling windows (batch twins of streaming ops).

These two queries carry the correctness burden for the streaming layer
(piper_spark/streaming/) — the streaming versions run the SAME column
expressions behind watermarks (SURVEY.md §2B note on streaming).

All session arithmetic is exact integer microseconds; tumbling totals
use the exact-decimal sum recipe — both hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from piper_spark.functions.numeric import dsum, sql_dsum
from piper_spark.registry import register
from piper_spark.session import table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min inactivity gap


@register(
    "event_sessions",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
FROM s
GROUP BY user_id, session_id
""",
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize events per user with a 30-minute inactivity gap.

    lag → gap flag → running sum = session id → per-session rollup. One
    shuffle on user_id; per-user partitions stay bounded at any scale.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(run).cast("long")
    )
    us = F.unix_micros(F.col("ts"))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


@register(
    "event_hwm",
    oracle="""
WITH m AS (
  SELECT user_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events
)
SELECT user_id, count(*) AS n_records
FROM m
WHERE prev_max IS NULL OR value > prev_max
GROUP BY user_id
""",
)
def event_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user record-setting event count (events whose value beats
    every earlier value of that user). This is the BATCH TWIN of the
    custom stateful streaming operator `stream_high_water_marks`
    (streaming/events.py, applyInPandasWithState) — the state there is
    exactly this window's running max; parity is asserted in
    tests/test_streaming.py.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = e.withColumn("prev_max", F.max("value").over(w))
    return (
        m.filter(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


@register(
    "event_sliding",
    oracle="""
SELECT win_start, event_type, count(*) AS cnt
FROM (
  SELECT unnest([CAST(date_trunc('day', ts) AS TIMESTAMP) - INTERVAL 1 DAY,
                 CAST(date_trunc('day', ts) AS TIMESTAMP)]) AS win_start,
         event_type
  FROM events
)
GROUP BY win_start, event_type
""",
)
def event_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-day windows advancing 1 day — each event lands in two
    windows (F.window with slide; the oracle expands the two candidate
    starts explicitly)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt")
    )


@register(
    "event_tumbling",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       count(*) AS cnt,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def event_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event type — batch twin of F.window.

    Uses the streaming-native `F.window` primitive (window.start ==
    date_trunc('day') under UTC), so the streaming layer reuses this
    exact expression behind a watermark.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day"), "event_type", "cnt", "total_value"
        )
    )


@register(
    "ts_gapfill",
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
  FROM events
),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS cnt
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT cal.day, CAST(coalesce(daily.cnt, 0) AS BIGINT) AS cnt
FROM cal LEFT JOIN daily ON cal.day = daily.day
""",
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily time series with zero-filled gaps: generate the full
    calendar between min and max event days (sequence + explode), left
    join the sparse per-day counts. The missing-day problem every
    time-series report hits; the calendar side is bounded by the date
    range, never by data volume.
    """
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cal.join(daily, "day", "left").select(
        "day", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )


@register(
    "event_streaks",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS hot,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all
  FROM events
),
runs AS (
  SELECT user_id,
         rn_all - row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS grp
  FROM flagged WHERE hot = 1
),
lens AS (
  SELECT user_id, count(*) AS streak FROM runs GROUP BY user_id, grp
)
SELECT user_id, CAST(max(streak) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM lens GROUP BY user_id
""",
)
def event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive run of value>50 events per
    user. The rn_all − rn_filtered difference is constant within a
    consecutive run, so one extra window turns streaks into group keys
    — no iteration, no self-join. Distinct from sessionization (which
    groups by TIME gaps; this groups by ORDINAL adjacency).
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("rn_all", F.row_number().over(w)).filter(
        F.col("value") > 50.0
    )
    runs = flagged.withColumn(
        "grp", F.col("rn_all") - F.row_number().over(w)
    )
    lens = runs.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("streak"))
    return lens.groupBy("user_id").agg(
        F.max("streak").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# Hard per-user state bound for event_funnel: the first this-many
# funnel-relevant events per user enter the fold. Far above any tested
# SF's per-user volume (sf0.1 ≈ 4k events/user), but a real bound — the
# collected array can never exceed it regardless of corpus skew.
FUNNEL_EVENT_CAP = 32768


@register(
    "event_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT step, users FROM (
  SELECT 'step1_view' AS step, count(*) AS users FROM v
  UNION ALL SELECT 'step2_click', count(*) FROM c
  UNION ALL SELECT 'step3_purchase', count(*) FROM p
)
ORDER BY step
""",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked
    STRICTLY after their first view, then purchased strictly after
    that click — the sequential-constraint aggregation behind every
    product-analytics funnel.

    The oracle expresses it as three chained min-aggregates (each step
    joined back on user) — 3 shuffles. The engine computes the same
    strict-ordering semantics in ONE shuffle: collect each user's
    events, sort once, and fold a (stage, ts) state machine over the
    array with `aggregate` — a step advances only on its event type
    with a strictly later timestamp, so equal-ts orderings cannot
    change the outcome and the fold is deterministic. Per-user state is
    one struct.

    Per-user state is BOUNDED in code, not just documented: a
    row_number window keeps each user's first FUNNEL_EVENT_CAP
    funnel-relevant events before the collect. The window's sort is
    Spark's spillable external sort, so a pathological user cannot OOM
    an executor the way an uncapped `collect_list` would; beyond the
    cap, later events are ignored — funnels favor EARLIEST events, so
    any user who converts within their first cap-many events is exact
    (all users at tested SFs sit far below the cap, keeping the oracle
    identical). The window hash-partitions by user_id, which the
    groupBy reuses — still one shuffle end-to-end.
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    wcap = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        e.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= FUNNEL_EVENT_CAP)
        .drop("rn")
    )
    evs = capped.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("ts")
    )
    step = {1: "view", 2: "click", 3: "purchase"}

    def advance(acc, x):
        out = acc
        for stage, etype in reversed(step.items()):
            cond = (acc["stage"] == stage - 1) & (x["event_type"] == F.lit(etype))
            if stage > 1:
                cond = cond & (x["ts"] > acc["ts"])
            out = F.when(
                cond,
                F.struct(F.lit(stage).alias("stage"), x["ts"].alias("ts")),
            ).otherwise(out)
        return out

    staged = evs.select(F.aggregate("evs", init, advance)["stage"].alias("stage"))
    counts = staged.agg(
        *[
            F.sum(F.when(F.col("stage") >= s, 1).otherwise(0)).alias(f"s{s}")
            for s in (1, 2, 3)
        ]
    )
    return counts.select(
        F.expr(
            "stack(3, 'step1_view', s1, 'step2_click', s2, "
            "'step3_purchase', s3) AS (step, users)"
        )
    ).orderBy("step")


@register(
    "event_retention",
    oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY 1)
SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
       CAST(date_diff('day', f.cohort_day, ud.d) AS BIGINT) AS day_offset,
       CAST(count(DISTINCT ud.user_id) AS BIGINT) AS users
FROM ud JOIN f ON ud.user_id = f.user_id
GROUP BY 1, 2
""",
)
def event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users active on day cohort_day + offset.

    The classic growth-analytics triangle. Scale shape: the distinct
    user-day projection partial-aggregates map-side before its shuffle;
    the cohort (min-day) aggregate and the join both hash on user_id,
    so the exchange is REUSED between them (one user_id shuffle, not
    two); the final aggregate lands on the bounded (cohort, offset)
    grid — days², independent of row count. No windows, no state.
    """
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    f = ud.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ud.join(f, "user_id")
        .groupBy(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
    )


@register(
    "ts_interp",
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
  FROM events
),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         (CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
          / 100.0) AS v
  FROM events WHERE event_type = 'purchase' AND user_id = 7 GROUP BY 1
),
j AS (SELECT cal.day, daily.v FROM cal LEFT JOIN daily ON cal.day = daily.day),
carried AS (
  SELECT day, v,
         last_value(v IGNORE NULLS) OVER
           (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
           (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_d,
         first_value(v IGNORE NULLS) OVER
           (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
           (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_d
  FROM j
)
SELECT day,
       CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed,
       round(CASE
         WHEN v IS NOT NULL THEN v
         WHEN prev_v IS NULL THEN next_v
         WHEN next_v IS NULL THEN prev_v
         ELSE prev_v + (next_v - prev_v)
              * (date_diff('day', prev_d, day)
                 / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
       END, 4) AS val_interp
FROM carried
""",
)
def ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: `ts_gapfill`'s sibling for VALUE
    series (zero-fill is wrong for a metric that exists between
    observations). Missing days get prev + (next−prev)·Δ/gap over the
    user-7 purchase series (sparse at every SF); edge days clamp to the
    nearest observation.

    Scale shape: the carry windows run over the CALENDAR join result —
    bounded by the date range (30 rows here, thousands for years),
    never by event volume — so the single-partition window is over a
    bounded relation by construction, the same argument as
    `ts_gapfill`'s calendar. Per-series interpolation at scale
    partitions the same windows by series key. Daily totals use the
    exact scaled-integer sum (functions/numeric.py), and the
    interpolation arithmetic is the same double ops in both engines.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        e.filter((F.col("event_type") == "purchase") & (F.col("user_id") == 7))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum(F.col("value")).alias("v"))
    )
    j = cal.join(daily, "day", "left")
    back = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    c = j.select(
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("prev_v"),
        F.last(known_day, ignorenulls=True).over(back).alias("prev_d"),
        F.first("v", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(known_day, ignorenulls=True).over(fwd).alias("next_d"),
    )
    frac = F.datediff("day", "prev_d") / F.datediff("next_d", "prev_d").cast(
        "double"
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return c.select(
        "day",
        F.col("v").isNotNull().cast("long").alias("observed"),
        F.round(interp, 4).alias("val_interp"),
    )


@register(
    "event_anomaly",
    oracle="""
WITH s AS (
  SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2
  FROM s GROUP BY 1 HAVING count(*) >= 2
)
SELECT s.user_id,
       CAST(min(m.n) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN (s.x - m.s1 / CAST(m.n AS DOUBLE))
                          * (s.x - m.s1 / CAST(m.n AS DOUBLE))
                     > 4.0 * ((m.s2 - m.s1 * (m.s1 / CAST(m.n AS DOUBLE)))
                              / CAST(m.n - 1 AS DOUBLE))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM s JOIN m ON s.user_id = m.user_id
GROUP BY 1
""",
)
def event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier counts: purchases beyond 2 sample standard
    deviations of the user's own mean. The z-test is rearranged to
    (x − mean)² > 4·var — no sqrt, no division by a possibly-zero std —
    and the moments are exact scaled integers (the `agg_stats`
    discipline: n, Σx, Σx² are mergeable counters, map-side partial),
    so both engines evaluate identical doubles in the comparison.

    Scale shape: moments aggregate in one hash agg; the re-join on
    user_id reuses the same hash partitioning (co-partitioned, no extra
    exchange under AQE); output is one row per user. Σx² fits long up
    to ~10⁹ rows/user at 5-digit scaled values — cast the moment to
    decimal beyond that (agg_stats shows the decimal form).
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = e.select(
        "user_id", F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("x")
    )
    m = (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.col("x") * F.col("x")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    mean = F.col("s1") / F.col("n").cast("double")
    var = (F.col("s2") - F.col("s1") * mean) / (F.col("n") - 1).cast("double")
    dev = F.col("x").cast("double") - mean
    return (
        s.join(m, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("n").alias("n_events"),
            F.sum((dev * dev > 4.0 * var).cast("long")).alias("n_anomalies"),
        )
    )


@register(
    "event_anomaly_run",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, x,
         row_number() OVER w - 1 AS n,
         CAST(coalesce(sum(x) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS s1,
         CAST(coalesce(sum(x * x) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS s2
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN n >= 2
                      AND (x - s1 / CAST(n AS DOUBLE))
                          * (x - s1 / CAST(n AS DOUBLE))
                        > 4.0 * ((s2 - s1 * (s1 / CAST(n AS DOUBLE)))
                                 / CAST(n - 1 AS DOUBLE))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM r GROUP BY 1
""",
)
def event_anomaly_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREQUENTIAL anomaly counts: each purchase is tested against the
    running moments of the user's STRICTLY PRIOR purchases — the
    decision an online monitor can actually make at event time (the
    batch `event_anomaly` uses full-series stats; this one never looks
    ahead). Same rearranged z-test, same exact-integer moments, but
    accumulated by an exclusive-frame running window. Streaming twin:
    `stream_anomaly_counts` (applyInPandasWithState) folds the same
    state and is parity-tested against this query.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    r = s.select(
        "user_id",
        "x",
        (F.row_number().over(w) - 1).alias("n"),
        F.coalesce(F.sum("x").over(prior), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.col("x") * F.col("x")).over(prior), F.lit(0)).alias(
            "s2"
        ),
    )
    # greatest() keeps ANSI mode from raising on the n<2 rows, whose
    # flag is forced false anyway; for n>=2 it is the identity.
    mean = F.col("s1") / F.greatest(F.col("n"), F.lit(1)).cast("double")
    var = (F.col("s2") - F.col("s1") * mean) / F.greatest(
        F.col("n") - 1, F.lit(1)
    ).cast("double")
    dev = F.col("x").cast("double") - mean
    flag = (F.col("n") >= 2) & (dev * dev > 4.0 * var)
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(flag.cast("long")).alias("n_flagged"),
    )


@register(
    "event_markov",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS transitions
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
)
def event_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior transition matrix: counts of consecutive
    (prev_type → next_type) pairs per user stream — the input to any
    Markov-chain / next-action model over clickstreams. One per-user
    lag window (bounded partitions, deterministic (ts, event_id)
    order) + one hash agg onto the tiny type×type grid.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return o.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("transitions")
    )


@register(
    "event_topk_run",
    oracle="""
WITH s AS (
  SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         event_id
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cents DESC, event_id) AS rn
  FROM s
)
SELECT user_id,
       CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS top1,
       CAST(max(CASE WHEN rn = 2 THEN cents END) AS BIGINT) AS top2,
       CAST(max(CASE WHEN rn = 3 THEN cents END) AS BIGINT) AS top3
FROM r WHERE rn <= 3
GROUP BY 1
""",
)
def event_topk_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-3 purchase values (exact scaled cents, null-padded)
    — the multiset of the 3 largest values is ORDER-INSENSITIVE, which
    is what makes it maintainable as streaming state: the twin
    `stream_running_topk` (streaming/events.py) keeps exactly these
    three longs per key through Spark 4's transformWithStateInPandas
    and converges to this query's rows from ANY micro-batch order
    (parity test needs no time-ordered fixture, unlike the running-max
    twin). Batch shape: one spillable rank window, top-3 filter, pivot
    by rank — never a per-user collect.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = e.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("cents").desc(), "event_id")
    r = s.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    pick = lambda i: F.max(F.when(F.col("rn") == i, F.col("cents")))  # noqa: E731
    return r.groupBy("user_id").agg(
        pick(1).alias("top1"), pick(2).alias("top2"), pick(3).alias("top3")
    )


@register(
    "event_cooccur",
    oracle="""
WITH u AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
),
n AS (
  SELECT count(*) AS nb
  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events)
),
t AS (SELECT event_type, count(*) AS cnt FROM u GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS both_cnt
  FROM u a
  JOIN u b ON a.user_id = b.user_id AND a.day = b.day
          AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.both_cnt,
       round(CAST(p.both_cnt AS DOUBLE) / n.nb, 6) AS support,
       round(CAST(p.both_cnt AS DOUBLE) * n.nb / (ta.cnt * tb.cnt), 6) AS lift
FROM p, n
JOIN t ta ON ta.event_type = p.type_a
JOIN t tb ON tb.event_type = p.type_b
""",
)
def event_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over (user, day) activity baskets — per
    event-type pair the basket co-occurrence count, support, and LIFT
    (observed co-rate / rate expected under independence; > 1 means the
    types attract, < 1 repel). Market-basket analytics' core primitive
    (Agrawal et al. 1993's support/lift, minus the iterative Apriori
    growth — pairs only, the query-engine cut), and the same statistic
    an LLM-pipeline uses to find correlated quality signals.

    Shape: one DISTINCT shuffle builds the basket relation, then the
    pair join is keyed on (user_id, day) with per-basket fan-out ≤
    C(|event-type domain|, 2) — a CONSTANT for enum-like item domains
    (5 types here), never an all-pairs blowup; basket count and
    per-type counts are tiny aggregates broadcast back onto the
    pair-count relation. For large item domains (e.g. SKUs) add a
    min-support df-cap on the item relation first — the
    `dedup_containment` discipline — before the basket self-join."""
    ev = table(spark, sf_dir, "events")
    # persist: the basket relation feeds the per-type counts, the
    # basket count, and BOTH pair-join aliases (caller owns the cache).
    u = (
        ev.select("user_id", F.to_date("ts").alias("day"), "event_type")
        .distinct()
        .persist()
    )
    n = u.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("nb")
    )
    t = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = u.alias("a"), u.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("both_cnt"))
    )
    ta = t.select(F.col("event_type").alias("type_a"), F.col("cnt").alias("ca"))
    tb = t.select(F.col("event_type").alias("type_b"), F.col("cnt").alias("cb"))
    return (
        p.crossJoin(F.broadcast(n))
        .join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "both_cnt",
            F.round(F.col("both_cnt").cast("double") / F.col("nb"), 6).alias(
                "support"
            ),
            F.round(
                F.col("both_cnt").cast("double")
                * F.col("nb")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "event_paths",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS path, count(*) AS path_count
FROM o
WHERE event_type IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1 ORDER BY path_count DESC, path LIMIT 10
""",
)
def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event-type PATHS per user timeline — the
    sequential-pattern-mining primitive behind clickstream analysis
    (the n-gram view of `event_markov`'s single transitions: Markov
    sees click→buy, paths see view>click>buy as one unit). Ordering
    within a user is (ts, event_id) so simultaneous events rank
    deterministically in both engines.

    Shape: ONE user-keyed window (two lead() slots share it — state is
    one user's events), a concat projection, a path hash-agg with
    map-side partials over the bounded |types|³ key space, and
    TakeOrderedAndProject for the top-k — no global sort, no self-join
    (the window IS the adjacency; a join-based 3-gram would shuffle the
    corpus twice more)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    # All three slots must be non-null: concat_ws SKIPS nulls while the
    # oracle's || propagates them — an unguarded null event_type would
    # emit a 2-segment path here and a NULL path there.
    return (
        o.filter(
            F.col("event_type").isNotNull()
            & F.col("t2").isNotNull()
            & F.col("t3").isNotNull()
        )
        .select(F.concat_ws(">", "event_type", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("path_count"))
        .orderBy(F.col("path_count").desc(), F.col("path").asc())
        .limit(10)
    )




#: Open/close keeper-key multiplier: k = rel_us · OHLC_ID_MULT +
#: event_id is the lexicographic (timestamp, id) order as ONE number.
#: 10¹⁵ ids of headroom — but the product overflows int64 (rel_us
#: alone is ~2.7·10¹² on the fixture window), so BOTH engines compute
#: k in wide integer arithmetic: Spark DECIMAL(38,0), DuckDB HUGEINT
#: (2.7·10¹²·10¹⁵ ≈ 10²⁸ ≪ 10³⁸ — no bound a real corpus hits, unlike
#: the old int64 k whose implicit event_id < 10⁶ assumption the repo's
#: own 10M-row scale corpus violated).  `ts_ohlc` additionally asserts
#: the id bound from the parquet footer count (ids are contiguous).
OHLC_ID_MULT = 10**15

#: The shared k projection text (dialect-common except the epoch-us
#: function and the wide-type cast, interpolated per engine).
_OHLC_K_SPARK = (
    "CAST(unix_micros(ts) - unix_micros(timestamp'2024-01-01 00:00:00')"
    f" AS DECIMAL(38,0)) * {OHLC_ID_MULT} + event_id"
)


def ohlc_aggs() -> list:
    """The OHLC aggregate list over a (cents, k) projection — ONE
    definition shared by the batch `ts_ohlc` and the streaming twin
    `streaming.events.stream_ohlc` (every member is a partial-agg-able
    DeclarativeAggregate, so both the batch shuffle and the streaming
    state stay map-side-combining)."""
    return [
        F.min_by("cents", "k").alias("open"),
        F.max("cents").alias("high"),
        F.min("cents").alias("low"),
        F.max_by("cents", "k").alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("cents").alias("volume_cents"),
    ]


@register(
    "ts_ohlc",
    oracle=f"""
WITH e AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_ts,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')
              AS HUGEINT) * {OHLC_ID_MULT} + event_id AS k
  FROM events
)
SELECT event_type, bar_ts,
       arg_min(cents, k) AS open,
       CAST(max(cents) AS BIGINT) AS high,
       CAST(min(cents) AS BIGINT) AS low,
       arg_max(cents, k) AS close,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(cents) AS BIGINT) AS volume_cents
FROM e GROUP BY event_type, bar_ts
""",
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — the financial-bar aggregation (open / high /
    low / close / trade count / volume per (series, hour) bucket) that
    rounds out the time-series family: `ts_gapfill` densifies,
    `ts_interp` fills, this DOWNSAMPLES.  Open/close are `min_by` /
    `max_by` on a composite microsecond+event_id key, because
    `first()`-style keepers are nondeterministic under parallel scan
    order — the SURVEY §7 rule.  The key is exact WIDE-integer
    arithmetic (Spark DECIMAL(38,0), DuckDB HUGEINT — see
    `OHLC_ID_MULT`): rel_us · 10¹⁵ + event_id compares identically in
    both engines with ~10¹⁰ digits of headroom, where the old int64
    key silently assumed event_id < 10⁶ (violated by the repo's own
    10M-row scale corpus, making open/close selection collide).  The
    id bound that remains (event_id < 10¹⁵) is ASSERTED from the
    parquet footer count — ids are contiguous — not assumed.

    Scale shape: ONE partial-aggregatable keyed shuffle on
    (event_type, bar) — min/max/min_by/max_by/sum/count all combine
    map-side, so 100 TB of ticks reduce to bar-count rows before the
    exchange.  Values are scaled cents (`floor(x·100 + 0.5)`, the
    win_rangeframe idiom) so every aggregate is integer-exact.
    """
    from piper_spark.session import row_count

    n_events = row_count(spark, sf_dir, "events")
    if n_events > OHLC_ID_MULT:  # pragma: no cover - 10^15 rows
        raise ValueError(
            f"ts_ohlc keeper key needs event_id < {OHLC_ID_MULT}; "
            f"corpus has {n_events} events"
        )
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(_OHLC_K_SPARK).alias("k"),
    )
    return e.groupBy("event_type", "bar_ts").agg(*ohlc_aggs())


#: RFM reference instant (end of the fixture's event window).
RFM_ASOF = "2024-01-31 00:00:00"

@register(
    "event_rfm",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_us(TIMESTAMP '{RFM_ASOF}') - epoch_us(max(ts)) AS BIGINT)
           AS recency_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS monetary_cents
  FROM events GROUP BY user_id
),
cuts AS (
  SELECT quantile_cont(CAST(recency_us AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS rc,
         quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS fc,
         quantile_cont(CAST(monetary_cents AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS mc
  FROM u
)
SELECT user_id, recency_us, frequency, monetary_cents,
       CAST(5 - (CASE WHEN recency_us > rc[1] THEN 1 ELSE 0 END +
                 CASE WHEN recency_us > rc[2] THEN 1 ELSE 0 END +
                 CASE WHEN recency_us > rc[3] THEN 1 ELSE 0 END +
                 CASE WHEN recency_us > rc[4] THEN 1 ELSE 0 END) AS BIGINT) AS r_q,
       CAST(1 + (CASE WHEN frequency > fc[1] THEN 1 ELSE 0 END +
                 CASE WHEN frequency > fc[2] THEN 1 ELSE 0 END +
                 CASE WHEN frequency > fc[3] THEN 1 ELSE 0 END +
                 CASE WHEN frequency > fc[4] THEN 1 ELSE 0 END) AS BIGINT) AS f_q,
       CAST(1 + (CASE WHEN monetary_cents > mc[1] THEN 1 ELSE 0 END +
                 CASE WHEN monetary_cents > mc[2] THEN 1 ELSE 0 END +
                 CASE WHEN monetary_cents > mc[3] THEN 1 ELSE 0 END +
                 CASE WHEN monetary_cents > mc[4] THEN 1 ELSE 0 END) AS BIGINT) AS m_q
FROM u CROSS JOIN cuts
""",
)
def event_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary quintiles —
    the classic Hughes customer-value grid, the analytics sibling of
    `text_ccnet_buckets`' quality terciles): one per-user aggregate,
    quintile cuts from ONE three-column exact-percentile aggregate
    broadcast back (never an ntile()/rank() GLOBAL window — the
    single-partition trap that ccnet_buckets documents), quintile
    assignment as exact threshold counts.  Recency is measured in
    MICROSECONDS to the fixture's end instant — day granularity
    degenerates (nearly every synthetic user is active on the final
    day, collapsing the cuts; measured 17/133 in the day form vs exact
    30×5 here).  Spark `percentile` ≡ DuckDB `quantile_cont` on the
    same doubles (the agg_median parity), so the key is value-exact.

    Scale: one user-keyed partial-agg shuffle + a 1-row broadcast —
    the corpus is never re-shuffled for the cuts; at 100 TB swap the
    exact percentile for `approx_percentile` (the agg_median_approx
    twin discipline).
    """
    e = table(spark, sf_dir, "events")
    cents = F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")
    u = e.groupBy("user_id").agg(
        F.expr(
            f"unix_micros(timestamp'{RFM_ASOF}') - unix_micros(max(ts))"
        ).alias("recency_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("long")
        .alias("monetary_cents"),
    )
    cuts = u.agg(
        F.expr(
            "percentile(cast(recency_us as double), array(0.2, 0.4, 0.6, 0.8))"
        ).alias("rc"),
        F.expr(
            "percentile(cast(frequency as double), array(0.2, 0.4, 0.6, 0.8))"
        ).alias("fc"),
        F.expr(
            "percentile(cast(monetary_cents as double), array(0.2, 0.4, 0.6, 0.8))"
        ).alias("mc"),
    )

    def quint(v: str, c: str, base: str, sign: str) -> F.Column:
        terms = f" {sign} ".join(
            f"(CASE WHEN {v} > {c}[{i}] THEN 1 ELSE 0 END)" for i in range(4)
        )
        return F.expr(f"CAST({base} ({terms}) AS BIGINT)")

    return u.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "recency_us",
        "frequency",
        "monetary_cents",
        quint("recency_us", "rc", "5 -", "+").alias("r_q"),
        quint("frequency", "fc", "1 +", "+").alias("f_q"),
        quint("monetary_cents", "mc", "1 +", "+").alias("m_q"),
    )
