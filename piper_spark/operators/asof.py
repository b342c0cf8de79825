"""As-of join — match each row to the most recent earlier row of another
stream (SURVEY.md §2B custom-operator mandate; Spark has no native
ASOF JOIN, DuckDB 1.0 does — which makes it oracle-checkable).

Implementation is the scalable union-and-carry shape, NOT a per-row
subquery or range cross join:

  tag both sides → union → window over (key ORDER BY ts, side) →
  last_value(right payload, ignorenulls) carries the latest right row
  forward → keep left rows.

One shuffle on the join key; no nested-loop, no range explosion. This
is the batch twin of a stream-stream join with state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts (strict: <); ``direction="forward"`` instead
    attaches the SMALLEST right_ts >= left_ts — the next event rather
    than the latest state. Both directions are the same union-and-carry
    plan, differing only in the window's timestamp sort order.

    Returns the left columns + right_payload columns (null when no
    matching right row exists).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
        F.struct(*left.columns).alias("__l"),
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
    )
    # strict: right rows at the same ts sort AFTER left rows → not visible.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_payload
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv_{c}").alias(f"r_{c}") for c in right_payload],
    )
    return out


def _signup_sides(e: "DataFrame") -> tuple["DataFrame", "DataFrame"]:
    """The as-of family's shared fixture: non-signup events as the left
    side, signups deduped to one row per (user_id, ts) by max event_id
    as the right side — ONE definition so the three registered
    directions can never desynchronize their tie semantics."""
    left = e.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts"
    )
    right = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    return left, right


@register(
    "join_asof",
    oracle="""
SELECT e.event_id, e.user_id, e.ts, s.ts AS r_ts, s.event_id AS r_event_id
FROM (SELECT * FROM events WHERE event_type <> 'signup') e
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'signup'
                GROUP BY user_id, ts) s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each non-signup event to the user's most recent signup
    at-or-before it (classic enrich-with-latest-state shape).

    The right side is deduped to one row per (key, ts) — ASOF tie
    behavior on duplicate timestamps is engine-arbitrary otherwise.
    """
    left, right = _signup_sides(table(spark, sf_dir, "events"))
    return asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "event_id"],
    )


@register(
    "join_asof_fwd",
    oracle="""
SELECT e.event_id, e.user_id, e.ts, s.ts AS r_ts, s.event_id AS r_event_id
FROM (SELECT * FROM events WHERE event_type <> 'signup') e
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'signup'
                GROUP BY user_id, ts) s
  ON e.user_id = s.user_id AND e.ts <= s.ts
""",
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: attach each non-signup event to the user's NEXT
    signup at-or-after it — time-to-next-event analysis, the mirror of
    `join_asof`'s enrich-with-latest-state. Same union-and-carry plan
    with the window's timestamp order reversed; one shuffle on the
    key, no range explosion. DuckDB's ASOF with a flipped inequality
    is the oracle.
    """
    left, right = _signup_sides(table(spark, sf_dir, "events"))
    return asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "event_id"], direction="forward",
    )


@register(
    "event_attribution",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS channel
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY user_id, ts
)
SELECT coalesce(a.channel, 'none') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       (CAST(sum(CAST(floor(a.value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0) AS total_value
FROM (
  SELECT p.*, t.channel
  FROM p ASOF LEFT JOIN t
    ON p.user_id = t.user_id AND p.ts >= t.ts
) a
GROUP BY 1
""",
)
def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: credit each purchase to the user's most
    recent preceding click or view (the standard marketing-analytics
    composite over the as-of machinery), reporting purchase count and
    exact revenue per attributed channel — 'none' when no touch
    precedes the purchase.

    Same union-and-carry plan as `join_asof` (one shuffle on user_id,
    no range explosion); the touch side is deduped to one row per
    (user, ts) with a deterministic arg-max channel so ASOF tie
    behavior matches DuckDB's native operator exactly.
    """
    from piper_spark.functions.numeric import dsum

    e = table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "event_type"))["event_type"].alias("channel"))
    )
    j = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["channel"],
    )
    return j.groupBy(
        F.coalesce(F.col("r_channel"), F.lit("none")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum(F.col("value")).alias("total_value"),
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH e AS (SELECT * FROM events WHERE event_type <> 'signup'),
s AS (SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
b AS (SELECT e.event_id, e.user_id, e.ts, s.ts AS b_ts, s.event_id AS b_id
      FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts),
f AS (SELECT e.event_id, s.ts AS f_ts, s.event_id AS f_id
      FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts <= s.ts)
SELECT b.event_id, b.user_id, b.ts,
  CASE WHEN b_ts IS NULL THEN f_ts
       WHEN f_ts IS NULL THEN b_ts
       WHEN (epoch_us(b.ts) - epoch_us(b_ts)) <= (epoch_us(f_ts) - epoch_us(b.ts))
       THEN b_ts ELSE f_ts END AS r_ts,
  CASE WHEN b_ts IS NULL THEN f_id
       WHEN f_ts IS NULL THEN b_id
       WHEN (epoch_us(b.ts) - epoch_us(b_ts)) <= (epoch_us(f_ts) - epoch_us(b.ts))
       THEN b_id ELSE f_id END AS r_event_id
FROM b JOIN f USING (event_id)
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: attach each non-signup event to the signup
    CLOSEST in time, in either direction — the third member of the
    as-of family (backward `join_asof` = latest state, forward
    `join_asof_fwd` = next event, nearest = best timestamp alignment,
    the sensor-fusion/record-linkage variant). Ties at equal distance
    resolve to the BACKWARD match (<=), and one-sided rows (no signup
    before/after) fall back to the side that exists — both rules
    mirrored in the oracle's CASE order.

    Shape: the two directional passes are each ONE union-and-carry
    window over the join key (`asof_join` — no range join, no
    explosion), combined by an event_id equi-join; all three shuffles
    are keyed, state per window partition is one user's events. The
    distance comparison is integer microseconds on both engines
    (unix_micros ≡ epoch_us), so the choice is value-exact."""
    left, right = _signup_sides(table(spark, sf_dir, "events"))
    # persist: both directional passes read each side (caller-owned).
    left, right = left.persist(), right.persist()
    b = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "event_id"],
    ).select(
        "event_id", "user_id", "ts",
        F.col("r_ts").alias("b_ts"), F.col("r_event_id").alias("b_id"),
    )
    f = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "event_id"], direction="forward",
    ).select(
        F.col("event_id"), F.col("r_ts").alias("f_ts"),
        F.col("r_event_id").alias("f_id"),
    )
    j = b.join(f, "event_id")
    back_wins = (
        F.unix_micros("ts") - F.unix_micros("b_ts")
    ) <= (F.unix_micros("f_ts") - F.unix_micros("ts"))
    pick = lambda bc, fc: (  # noqa: E731
        F.when(F.col("b_ts").isNull(), F.col(fc))
        .when(F.col("f_ts").isNull(), F.col(bc))
        .when(back_wins, F.col(bc))
        .otherwise(F.col(fc))
    )
    return j.select(
        "event_id", "user_id", "ts",
        pick("b_ts", "f_ts").alias("r_ts"),
        pick("b_id", "f_id").alias("r_event_id"),
    )


#: Tolerance for `join_asof_tol`: a backward match older than this is
#: discarded (state considered stale) — 24 h in integer microseconds,
#: compared identically in both engines (unix_micros / epoch_us).
ASOF_TOL_US = 86_400_000_000


@register(
    "join_asof_tol",
    oracle=f"""
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN s.ts IS NOT NULL
             AND epoch_us(e.ts) - epoch_us(s.ts) <= {ASOF_TOL_US}
            THEN s.ts END AS r_ts,
       CASE WHEN s.ts IS NOT NULL
             AND epoch_us(e.ts) - epoch_us(s.ts) <= {ASOF_TOL_US}
            THEN s.event_id END AS r_event_id
FROM (SELECT * FROM events WHERE event_type <> 'signup') e
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'signup'
                GROUP BY user_id, ts) s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (round-12, completing the family:
    backward / forward / nearest / tolerance — pandas' merge_asof
    ``tolerance=`` semantic): attach the most recent signup at-or-
    before each event, but DISCARD matches older than ASOF_TOL_US —
    the telemetry/finance rule that state older than a staleness bound
    must not enrich (a quote from yesterday is not a price).

    Plan: the same ONE-shuffle union-and-carry as `join_asof`, plus a
    narrow post-projection that nulls the payload outside tolerance —
    no extra shuffle, no range join. The gap compares integer
    microseconds (unix_micros vs epoch_us), value-exact cross-engine;
    DuckDB has no native ASOF tolerance, so its oracle applies the
    identical CASE to the plain ASOF result."""
    left, right = _signup_sides(table(spark, sf_dir, "events"))
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "event_id"],
    )
    in_tol = F.col("r_ts").isNotNull() & (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))
        <= F.lit(ASOF_TOL_US)
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_tol, F.col("r_ts")).alias("r_ts"),
        F.when(in_tol, F.col("r_event_id")).alias("r_event_id"),
    )
