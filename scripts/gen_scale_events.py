"""Generate scaled-up synthetic `events` tables for sessions/funnel
scaling runs.

Same discipline as gen_scale_docs/vecs: N× sf0.1-shaped events built
ENTIRELY with JVM-side expressions (spark.range + xxhash64-derived
fields — no Python in the data path). Shape mirrors the driver's
events table: 30 days of microsecond timestamps, users scaling with
volume (~67 events/user like sf0.1), five event types, 2-decimal
values, a one-key JSON props string. Deterministic in event_id.

Usage: python scripts/gen_scale_events.py OUT_DIR N_ROWS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TYPES = ["click", "error", "purchase", "signup", "view"]
DAYS_US = 30 * 86_400 * 1_000_000
EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def gen_events(spark: SparkSession, n_rows: int) -> DataFrame:
    types = F.array(*[F.lit(t) for t in TYPES])
    r = spark.range(n_rows).withColumnRenamed("id", "event_id")
    h = lambda s: F.xxhash64(F.col("event_id"), F.lit(s))  # noqa: E731
    n_users = max(n_rows // 67, 1)
    return r.select(
        "event_id",
        F.timestamp_micros(
            F.lit(EPOCH_2024_US) + F.pmod(h(0), F.lit(DAYS_US))
        ).alias("ts"),
        F.pmod(h(1), F.lit(n_users)).alias("user_id"),
        F.element_at(types, F.pmod(h(2), F.lit(5)).cast("int") + 1).alias(
            "event_type"
        ),
        (F.pmod(h(3), F.lit(50_000)).cast("double") / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), F.pmod(h(4), F.lit(100)).cast("string"), F.lit("}")
        ).alias("props"),
    )


def main() -> None:
    out_dir, n_rows = sys.argv[1], int(sys.argv[2])
    from piper_spark.session import get_spark

    spark = get_spark("gen-scale-events")
    gen_events(spark, n_rows).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    print(f"wrote {n_rows} events to {out_dir}/events.parquet")


if __name__ == "__main__":
    main()
