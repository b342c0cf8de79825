"""UDF surface tests: pandas_udf, SQL registration, applyInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from piper_spark.functions.udfs import embed_centroids, register_udfs, vocab_density
from piper_spark.session import table
from tests.conftest import SF_SMOKE


def test_vocab_density_vectorized(spark):
    df = spark.createDataFrame(
        [("a b a",), ("x y z",)], "text string"
    )
    rows = df.select(vocab_density("text").alias("d")).collect()
    assert abs(rows[0].d - 2 / 3) < 1e-12
    assert rows[1].d == 1.0


def test_udf_sql_registration(spark):
    register_udfs(spark)
    spark.createDataFrame([("a a b",)], "text string").createOrReplaceTempView(
        "t_udf"
    )
    r = spark.sql("SELECT vocab_density(text) AS d FROM t_udf").collect()
    assert abs(r[0].d - 2 / 3) < 1e-12


def test_embed_centroids_matches_numpy(spark):
    out = {r.label: (r.centroid, r.n) for r in embed_centroids(spark, SF_SMOKE).collect()}
    emb = table(spark, SF_SMOKE, "embeddings").toPandas()
    for label, grp in emb.groupby("label"):
        want = np.stack(grp["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
        got, n = out[int(label)]
        assert n == len(grp)
        np.testing.assert_allclose(got, want, rtol=1e-12)
    # plan uses Arrow (FlatMapGroupsInPandas), not row pickling
    plan = embed_centroids(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
