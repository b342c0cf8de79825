"""Multimodal (image/audio/video) column plumbing.

Re-expresses the reference's image dataflow Spark-first: the reference
iterates pickled Rows per partition and writes files as a side effect
(reference: src/piper/spark/data_augment.py:28-75,129-136); here the
binary payload is an opaque `binary` COLUMN with typed metadata, and
all per-item work runs through Arrow-batched `mapInPandas` /
`pandas_udf` — the JVM↔Python crossing is columnar, not row pickling.

The image libraries (OpenCV/Pillow) are not in this container, so the
REAL codec step is stubbed behind `decode_image` (NotImplementedError)
with a deterministic fake (`fake_decode_meta`) that keeps every piece
of Spark-side plumbing — schema, batch iteration, UDF signatures —
real and testable (and, for `img_meta`, oracle-checkable).

Numeric semantics mirrored from the reference (tested in tests/):
  resize        — data_augment.py:57 (cv2.resize INTER_AREA)  → stub
  scale u8→f32  — conversion.rs:9-26 (x / 255.0)
  normalize     — normalize.rs:8-28 ((x - mean) / std, ImageNet stats)
  color jitter  — data_augment.py:21-22 (clamp(x*1.2 + 10) to u8)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table

#: Spark's built-in image-source schema (what `spark.read.format("image")`
#: yields; reference data_augment.py:42-62 consumes exactly these fields).
IMAGE_STRUCT = (
    "origin string, height int, width int, nChannels int, mode int, data binary"
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload to an HWC uint8 array.

    STUB: real decoding needs an image codec (cv2.imdecode in the
    reference, data_augment.py:53); not available in this container.
    """
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, n_bytes).

    Pure arithmetic on the payload length so the DuckDB oracle can
    reproduce it (img_meta below).
    """
    n = len(payload)
    return 1 + n % 64, 1 + n % 48, n


def scale_u8_to_f32(img: np.ndarray) -> np.ndarray:
    """u8 → f32 in [0,1] (reference conversion.rs:9-26)."""
    return img.astype(np.float32) / 255.0


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    """Per-channel (x - mean)/std, HWC layout (reference normalize.rs:8-28)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def color_jitter(img: np.ndarray, alpha: float = 1.2, beta: float = 10.0) -> np.ndarray:
    """clamp(round(x*alpha + beta), 0, 255) on u8 (reference data_augment.py:21-22).

    Vectorized twin of cv2.convertScaleAbs for non-negative inputs.
    """
    return np.clip(np.round(img.astype(np.float64) * alpha + beta), 0, 255).astype(
        np.uint8
    )


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 of the text).

    In production this column comes straight from parquet `binary` or
    `spark.read.format("binaryFile")`.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode-metadata per payload, Arrow-batched."""
    for pdf in batches:
        meta = [fake_decode_meta(p) for p in pdf["payload"]]
        out = pd.DataFrame(meta, columns=["width", "height", "n_bytes"])
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register(
    "img_meta",
    oracle="""
SELECT doc_id,
       1 + octet_length(encode(text)) % 64 AS width,
       1 + octet_length(encode(text)) % 48 AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
)
def img_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through real mapInPandas plumbing.

    documents.text stands in for an encoded media payload; the Python
    side sees Arrow batches (never pickled Rows) and returns typed
    metadata columns.
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _meta_batches, schema="doc_id long, width long, height long, n_bytes long"
    )
