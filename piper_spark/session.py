"""SparkSession bootstrap + table catalog.

The reference enables AQE + partition coalescing explicitly
(reference: src/piper/spark/data_augment.py:102-108); we keep those and
add the settings that matter for oracle-exact results (UTC session
timezone — testdata timestamps are naive) and for local iteration
(shuffle partitions sized to the local core count rather than the 200
default; on a real cluster this is AQE-managed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at every scale factor (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "piper_spark") -> SparkSession:
    """Create (or reuse) a local SparkSession tuned for this engine.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is safe to carry over (AQE, UTC, Arrow).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    # The driver may hand us a session it built itself; enforce the two
    # settings correctness depends on (runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet → columnar scan with pushdown.

    events.ts has shipped in two physical types across testdata
    generations: TIMESTAMP(NANOS) (which Spark surfaces as int64 under
    the legacy nanosAsLong conf) and plain TIMESTAMP(MICROS) (which
    Spark 4 infers as TIMESTAMP_NTZ). Branch on the schema Spark
    actually reads and normalize both to the session-UTC TIMESTAMP
    type: long nanos get the ns→us truncation DuckDB applies, NTZ gets
    a value-preserving cast (session tz is pinned to UTC above, so the
    wall-clock values are identical and functions like unix_micros
    keep working). A narrow per-row projection, free at any scale.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Testdata timestamps are naive; interpret them in UTC no matter what
    # session the caller (e.g. the driver) hands us, or every
    # date_trunc/window bucket shifts on a non-UTC host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        # Scope the legacy conf to this read: schema conversion happens
        # eagerly at plan time, so restoring immediately is safe — and a
        # later nanosecond-parquet read in the same session gets real
        # timestamps again instead of silent longs.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


#: (sf_dir, table) → row count. Session-lifetime memo: corpus-size-derived
#: parameters (LSH band width) need |table| once per input, not per query.
_ROW_COUNT_MEMO: dict[tuple[str, str], int] = {}


def row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of one table WITHOUT a Spark job when possible.

    Parquet footers carry exact row counts, so the fast path sums
    `num_rows` over the fragments' metadata via pyarrow on the driver —
    one metadata read per file, no scan, no job (round-5 VERDICT item 5:
    the `.count()` inside `dedup_lsh_cosine`/`img_phash` was the last
    driver-side job in those hot paths). Falls back to `count()` for
    any path pyarrow can't open (e.g. a non-local filesystem scheme this
    container lacks bindings for). Memoized per (sf_dir, table): at
    100 TB an object-store listing is a real serial step, and corpus
    size is needed once per input, not once per derived-width operator.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (sf_dir, name)
    if key not in _ROW_COUNT_MEMO:
        path = f"{sf_dir}/{name}.parquet"
        try:
            import pyarrow.dataset as pads

            n = sum(
                frag.metadata.num_rows
                for frag in pads.dataset(path, format="parquet").get_fragments()
            )
        except Exception:  # noqa: BLE001 — any pyarrow failure → Spark job
            n = table(spark, sf_dir, name).count()
        _ROW_COUNT_MEMO[key] = int(n)
    return _ROW_COUNT_MEMO[key]


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() works on bare names."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
