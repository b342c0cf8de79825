"""Scans / sources (SURVEY.md §2B "Scans / sources / sinks").

Generalizes the reference's image-directory scan + count
(reference: src/piper/spark/data_augment.py:115-122) to columnar
Parquet scans with column pruning and provenance grouping
(`image.origin` ≙ `documents.source`), plus the read side of the
reference's labeled folder layout (loader.rs:13-19): `labeled_scan`
writes a Hive-partitioned tree and reads it back through partition
pruning, the label coming from the directory name.

Scale notes: `scan_count` compiles to a metadata-only parquet count
(no row materialization); `scan_prune` reads exactly two columns
(check ReadSchema in the plan); `source_files` is a low-cardinality
hash aggregate with map-side partial aggregation; `labeled_scan`'s
read never opens the pruned-out partitions' files at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table

#: Repo-local scratch warehouse for queries that demonstrate a
#: write→read round trip (gitignored; safe to delete).
WAREHOUSE_DIR = os.environ.get("SPARK_GRAFT_WAREHOUSE", "/root/repo/.warehouse")


@register(
    "labeled_scan",
    oracle="""
SELECT lang,
       CASE WHEN doc_id % 100 < 80 THEN 'train' ELSE 'val' END AS split,
       count(*) AS cnt,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM documents
WHERE doc_id % 100 < 80 AND lang IN ('en', 'de')
GROUP BY 1, 2
""",
)
def labeled_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R1 read side: labels from the storage layout.

    Writes documents as a split=…/lang=… Hive-partitioned tree (the
    relational mirror of the reference's class-per-folder image tree,
    loader.rs:13-19), then reads it back with a partition predicate.
    The filter never opens pruned partitions' files (PartitionFilters
    in the scan — pinned by tests/test_plan_shapes.py), and the label
    columns (split, lang) come from directory names, not file contents.
    """
    docs = table(spark, sf_dir, "documents").withColumn(
        "split",
        F.when(F.col("doc_id") % 100 < 80, F.lit("train")).otherwise(F.lit("val")),
    )
    path = f"{WAREHOUSE_DIR}/labeled_scan_{os.path.basename(sf_dir.rstrip('/'))}"
    from piper_spark.sources.sinks import write_partitioned

    write_partitioned(docs, path, ["split", "lang"])
    # Explicit schema: an empty corpus writes a tree with no partition
    # directories, where schema/partition inference has nothing to read
    # — the writer's schema makes the empty read well-defined.
    back = spark.read.schema(docs.schema).parquet(path).filter(
        (F.col("split") == "train") & F.col("lang").isin("en", "de")
    )
    return back.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("min_doc")
    )


#: Columns whose values survive text serialization bit-exactly
#: (integers, strings, µs timestamps — doubles are excluded on purpose:
#: decimal text round-trip of arbitrary doubles is not identity).
_TEXT_SAFE_COLS = ("event_id", "ts", "user_id", "event_type")

_TEXT_SOURCE_ORACLE = """
SELECT event_id, ts, user_id, event_type FROM events
"""


def _text_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from piper_spark.sources.sinks import write_partitioned  # noqa: F401 (sibling)

    src = table(spark, sf_dir, "events").select(*_TEXT_SAFE_COLS)
    path = f"{WAREHOUSE_DIR}/events_{fmt}_{os.path.basename(sf_dir.rstrip('/'))}"
    # default text timestamp formats truncate to millis — force µs
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    writer = src.write.mode("overwrite").format(fmt).option("timestampFormat", ts_fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    writer.save(path)
    reader = (
        spark.read.format(fmt)
        .schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("timestampFormat", ts_fmt)
    )
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.load(path)


@register("source_csv", oracle=_TEXT_SOURCE_ORACLE)
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink round trip: write the (text-safe) event columns
    as CSV, read them back with an explicit schema + µs timestamp
    format, and prove value identity against the parquet original —
    the schema-on-read path every ingest pipeline starts from."""
    return _text_roundtrip(spark, sf_dir, "csv")


@register("source_json", oracle=_TEXT_SOURCE_ORACLE)
def source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round trip (same contract as source_csv —
    explicit schema, no inference in production paths)."""
    return _text_roundtrip(spark, sf_dir, "json")


@register(
    "scan_count",
    oracle="SELECT count(*) AS cnt FROM lineitem",
)
def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table count of lineitem (reference S2: image_df.count())."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "scan_prune",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection; parquet reads only the two columns."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


def ensure_binary_tree(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (overwrite) the class-per-folder PNG fixture tree the
    binary/image sources scan — a Hive-partitioned `lang=<label>/` tree
    of real PNG files derived from `documents`, plus one non-image
    decoy proving the glob filter filters. Bounded to doc_id < 200
    (corpus fixture, like the bounded O(n²) dedup ground truths); in
    production the tree already exists on object storage and only the
    read is the operator."""
    import shutil

    import numpy as np

    from piper_spark.sources.multimodal import encode_png

    docs = (
        table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 200)
            & (F.octet_length(F.encode("text", "utf-8")) > 0)
        )
        .select("doc_id", "lang", "text")
        .collect()  # bounded fixture materialization (≤200 rows), not a data path
    )
    path = f"{WAREHOUSE_DIR}/binary_tree_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    for row in docs:
        payload = row.text.encode("utf-8")
        n = len(payload)
        w, h = 1 + n % 64, 1 + n % 48
        gray = np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w))
        d = f"{path}/lang={row.lang}"
        os.makedirs(d, exist_ok=True)
        with open(f"{d}/doc_{row.doc_id}.png", "wb") as fh:
            fh.write(encode_png(gray))
    # A non-image decoy proves the glob filter actually filters.
    os.makedirs(f"{path}/lang=en", exist_ok=True)
    with open(f"{path}/lang=en/notes.txt", "w") as fh:
        fh.write("not an image")
    return path


def _binary_tree_batches(batches):
    """mapInPandas worker: real image FILE bytes → decode → pixel facts."""
    import numpy as np
    import pandas as pd

    from piper_spark.sources.multimodal import decode_image

    out = []
    for pdf in batches:
        for doc_id, lang, content in zip(pdf["doc_id"], pdf["lang"], pdf["content"]):
            rgb = decode_image(bytes(content))
            out.append(
                (
                    int(doc_id),
                    lang,
                    rgb.shape[1],
                    rgb.shape[0],
                    int(rgb.sum(dtype=np.int64)),
                )
            )
        yield pd.DataFrame(
            out, columns=["doc_id", "lang", "width", "height", "pix_sum"]
        )
        out = []


@register(
    "source_binary",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, text,
         octet_length(encode(text)) AS n,
         1 + octet_length(encode(text)) % 64 AS w,
         1 + octet_length(encode(text)) % 48 AS h
  FROM documents
  WHERE doc_id < 200 AND octet_length(encode(text)) > 0
    AND lang IN ('en', 'de')
)
SELECT doc_id, lang,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 * ((h * w // n)
                   * list_sum([ord(substring(text, i, 1))
                               FOR i IN range(1, n + 1)])
                 + coalesce(list_sum([ord(substring(text, i, 1))
                                      FOR i IN range(1, (h * w) % n + 1)]), 0))
            AS BIGINT) AS pix_sum
FROM d
""",
)
def source_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal ingest shape: a DIRECTORY TREE of encoded
    image files scanned into rows (reference data_augment.py:115-120 —
    `spark.read.format("image")` over a class-per-folder tree with an
    extension filter, labels from directory names via loader.rs:13-19).

    Engine form: `spark.read.format("binaryFile")` with a
    `pathGlobFilter` (the reference's IMG_EXTENSIONS filter,
    constants.py:2) over a Hive-partitioned `lang=<label>/` tree of
    REAL PNG files. The label is the discovered partition column — a
    `lang IN ('en','de')` predicate prunes whole directories before any
    file is opened (PartitionFilters, pinned in test_plan_shapes.py) —
    and each file's bytes run through the real PNG decoder, so the
    DuckDB oracle can recompute every pixel sum arithmetically.

    The tree itself is test scaffolding materialized from `documents`
    (driver-side, bounded to doc_id < 200 — a corpus fixture, like the
    bounded O(n²) dedup ground truths); in production the tree already
    exists on object storage and ONLY the read below is the operator.
    At 100 TB the scan parallelizes per-file, the glob and partition
    pruning happen in the driver's file index, and decode runs in
    Arrow-batched Python exactly as here.
    """
    from piper_spark.sources.multimodal import spread_for_decode

    path = ensure_binary_tree(spark, sf_dir)
    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(path)
        .filter(F.col("lang").isin("en", "de"))
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.png", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("lang").cast("string").alias("lang"),
            F.col("content"),
        )
    )
    return spread_for_decode(binf).mapInPandas(
        _binary_tree_batches,
        schema="doc_id long, lang string, width int, height int, pix_sum long",
    )


@register(
    "source_files",
    oracle="SELECT source, count(*) AS cnt FROM documents GROUP BY source",
)
def source_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source row counts (provenance; reference `image.origin` field)."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "source_orc",
    oracle="SELECT event_id, ts, user_id, event_type, value FROM events",
)
def source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round trip — Spark's second built-in columnar
    format. Unlike the text sources, ORC carries its own schema and
    types, so doubles ride along bit-exactly with no timestampFormat
    ceremony; the read is a columnar scan with pushdown, same as
    parquet. The session is pinned UTC (session.table), so ORC's
    local-time timestamp semantics write and read the same instants.
    """
    src = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = f"{WAREHOUSE_DIR}/events_orc_{os.path.basename(sf_dir.rstrip('/'))}"
    src.write.mode("overwrite").orc(path)
    return spark.read.orc(path)
