"""UDF surface tests: pandas_udf, SQL registration, applyInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from piper_spark.functions.udfs import (
    centroid_arrays,
    embed_centroids,
    register_udfs,
    vocab_density,
)
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


def test_scalar_iter_pandas_udf(spark):
    from piper_spark.functions.udfs import zscore_iter_udf

    z = zscore_iter_udf(50.0, 29.0)
    df = spark.createDataFrame([(21.0,), (79.0,)], "v double")
    rows = df.select(z("v").alias("z")).collect()
    assert rows[0].z == pytest.approx((21.0 - 50.0) / 29.0)
    assert rows[1].z == pytest.approx(1.0)
    plan = df.select(z("v"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython


def test_event_zscore_registered_and_exact(spark):
    """The SCALAR_ITER exhibit is now a registered key (round-10
    VERDICT item 8): corpus moments from exact integer power sums, z
    streamed through the iterator UDF. Spot-check the math against a
    direct numpy computation on the same quantized values."""
    from piper_spark.functions.udfs import event_zscore

    out = {r.event_id: r.z for r in event_zscore(spark, SF_SMOKE).collect()}
    e = table(spark, SF_SMOKE, "events").select("event_id", "value").toPandas()
    v = np.floor(e["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5)
    n = len(v)
    mean = v.sum() / (100.0 * n)
    import math

    var = (v * v).sum() / (10000.0 * n) - mean * mean
    std = math.sqrt(var) if var > 0.0 else 1.0
    for eid, val in zip(e["event_id"], v):
        assert out[int(eid)] == pytest.approx((val / 100.0 - mean) / std)


def test_event_zscore_null_value_yields_null_not_nan(spark):
    """Round-12 (ADVICE 2): a NULL `value` must surface as NULL z (the
    oracle's NULL arithmetic), never NaN from the numpy conversion —
    and the decimal power sums must fit the moments on a corpus that
    would overflow a plain int64 sum(v*v) (n·v² > 2⁶³)."""
    from unittest import mock

    from piper_spark.functions import udfs as U

    big = 4.0e7  # v = 4e9, v² = 1.6e19 > 2⁶³ ≈ 9.2e18: one row wraps int64
    d = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, big)],
        "event_id long, value double",
    )
    with mock.patch.object(U, "table", lambda s, sf, name: d):
        rows = {r.event_id: r.z for r in U.event_zscore(spark, "_").collect()}
    assert rows[2] is None  # NULL in, NULL out
    import math

    v = np.array([1000.0, 4.0e9])
    n = 3  # count(*) counts the NULL row too, both engines
    mean = v.sum() / (100.0 * n)
    var = (v * v).sum() / (10000.0 * n) - mean * mean
    std = math.sqrt(var) if var > 0.0 else 1.0
    assert rows[1] == pytest.approx((10.0 - mean) / std)
    assert rows[3] == pytest.approx((big - mean) / std)


def test_grouped_agg_pandas_udf_plan_and_value(spark):
    from piper_spark.functions.udfs import agg_rms_udf
    from tests.conftest import SF_SMOKE

    df = agg_rms_udf(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the grouped-agg Arrow crossing (node renamed in Spark 4.1)
    assert "AggregateInPandas" in plan or "ArrowAggregatePython" in plan
    rows = {r.event_type: (r.rms, r.cnt) for r in df.collect()}
    vals = [
        (r.event_type, r.value)
        for r in table(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    ]
    for et, (rms, cnt) in rows.items():
        xs = np.array([v for t, v in vals if t == et])
        assert cnt == len(xs)
        want = float(
            np.sqrt(np.floor(xs * xs * 1e6 + 0.5).astype(np.int64).sum() / 1e6 / len(xs))
        )
        assert rms == want  # bit-exact by the fixed-point recipe


def test_events_read_restores_nanos_conf(spark):
    # table() must not leave the legacy nanos conf flipped for the
    # whole session (a later nanosecond-parquet read would silently
    # yield longs instead of timestamps).
    from tests.conftest import SF_SMOKE

    table(spark, SF_SMOKE, "events").limit(1).collect()
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    )


def test_centroid_arrays_library_form():
    import pandas as pd

    pdf = pd.DataFrame(
        {"label": [3, 3], "embedding": [[1.0, 2.0], [3.0, 4.0]]}
    )
    out = centroid_arrays(pdf)
    assert out["label"].tolist() == [3] and out["n"].tolist() == [2]
    np.testing.assert_allclose(out["centroid"].iloc[0], [2.0, 3.0])


def test_embed_centroids_matches_numpy(spark):
    rows = embed_centroids(spark, SF_SMOKE).collect()
    got = {}
    for r in rows:
        got.setdefault(r.label, {})[r.dim] = r.val
    emb = table(spark, SF_SMOKE, "embeddings").toPandas()
    for label, grp in emb.groupby("label"):
        want = np.stack(grp["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
        vals = got[int(label)]
        assert sorted(vals) == list(range(len(want)))  # every dim present
        np.testing.assert_allclose(
            [vals[d] for d in range(len(want))], want, atol=1e-6
        )
    # plan uses Arrow (FlatMapGroupsInPandas), not row pickling
    plan = embed_centroids(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


# --- Arrow word-hash parity (the round-10 hash-tax recovery) ---------
#
# The vectorized numpy closed form MUST be bit-identical to the
# interpreted `_winnow_word_hash` Catalyst HOF (which the DuckDB
# list_reduce oracles mirror): the minhash/simhash/winnow family's
# oracle-exactness rests on this equality.


def _ref_fold(word: str) -> int:
    acc = 0
    for ch in word:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


def test_hash_words_flat_matches_fold_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from piper_spark.functions.text import _hash_words_flat

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.text(max_size=40), max_size=25))
    def check(words):
        got = _hash_words_flat(words)
        assert got.tolist() == [_ref_fold(w) for w in words]

    check()


#: Tokenization/hash edge cases: empties from repeated/leading/trailing
#: spaces, the empty string (Java split and str.split both yield [""]),
#: multi-byte BMP chars, an astral code point, and a long word.
_TRICKY_TEXTS = [
    "the quick brown fox",
    "",
    " ",
    "a  b ",
    "  leading",
    "trailing  ",
    "héllo wörld",
    "日本語 テスト",
    "astral 😀 plane",
    "x" * 500 + " y",
]


def test_text_word_hash_udf_matches_hof(spark):
    from piper_spark.functions.text import (
        _winnow_word_hash,
        text_word_hash_udf,
        words_col,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TRICKY_TEXTS)] + [(99, None)],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id",
        text_word_hash_udf()(F.col("text")).alias("fast"),
        F.transform(words_col(), _winnow_word_hash).alias("ref"),
    ).collect()
    for r in rows:
        assert r.fast == r.ref, (r.doc_id, r.fast, r.ref)


def test_word_hash_scalar_udf_matches_hof(spark):
    from piper_spark.functions.text import _winnow_word_hash, word_hash_scalar_udf

    words = sorted({w for t in _TRICKY_TEXTS for w in t.split(" ")})
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select(
        "w",
        word_hash_scalar_udf()(F.col("w")).alias("fast"),
        _winnow_word_hash(F.col("w")).alias("ref"),
    ).collect()
    for r in rows:
        assert r.fast == r.ref, (r.w, r.fast, r.ref)


def test_words_hash_udf_matches_hof(spark):
    from piper_spark.functions.text import (
        _winnow_word_hash,
        words_col,
        words_hash_udf,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TRICKY_TEXTS)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        words_hash_udf()(words_col()).alias("fast"),
        F.transform(words_col(), _winnow_word_hash).alias("ref"),
    ).collect()
    for r in rows:
        assert r.fast == r.ref, (r.doc_id, r.fast, r.ref)
