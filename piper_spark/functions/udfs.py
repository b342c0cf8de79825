"""UDF surface — the engine's registration + vectorized-Python layer.

The reference's per-row Python functions (resize/augment,
data_augment.py:28-75) are the moral equivalent of UDFs executed via
pickled rows; here the surface is explicit and Arrow-vectorized:

- scalar `pandas_udf`          — vectorized per-row compute
- grouped-agg `pandas_udf`     — per-group numpy reductions
- `applyInPandas`              — grouped map (per-group DataFrames)
- `spark.udf.register`         — SQL-callable registration

`embed_centroids` (applyInPandas) is registered rows-only: float mean
summation order differs between numpy's pairwise sum and any SQL
engine, so it is exercised by unit tests with tolerance instead of the
bit-exact oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from piper_spark.registry import register
from piper_spark.session import table


@F.pandas_udf(DoubleType())
def vocab_density(text: pd.Series) -> pd.Series:
    """Distinct-word ratio per document — vectorized over Arrow batches."""
    words = text.str.split(" ")
    return words.map(lambda w: len(set(w)) / len(w) if w else 0.0)


def register_udfs(spark: SparkSession) -> None:
    """Expose the Python UDFs to spark.sql() callers."""
    spark.udf.register("vocab_density", vocab_density)


def _centroid(pdf: pd.DataFrame) -> pd.DataFrame:
    emb = np.stack(pdf["embedding"].to_numpy())
    c = emb.astype(np.float64).mean(axis=0)
    return pd.DataFrame(
        {"label": [int(pdf["label"].iloc[0])], "centroid": [c.tolist()],
         "n": [len(pdf)]}
    )


@register("embed_centroids")  # float-mean ordering → rows-only check
def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid via applyInPandas (grouped map).

    The batch-scoring shape of the reference's tensor batcher
    (batch.rs:57-94): groups arrive as pandas DataFrames over Arrow,
    numpy does the math, results return as columnar batches.
    """
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        _centroid, schema="label int, centroid array<double>, n long"
    )
