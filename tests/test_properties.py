"""Property-based spot checks (SURVEY.md §5 strategy #3, hypothesis).

Algebraic invariants that must hold for ANY input, not just the
synthetic tables. Spark round-trips are expensive, so examples are
capped low — the point is shrinking counterexamples, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from piper_spark.functions.dedup import exact_dedup
from piper_spark.functions.numeric import dsum

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2-decimal money values on the exact grid (the dsum contract)
money = st.integers(min_value=-10**6, max_value=10**6).map(lambda c: c / 100.0)


@given(st.lists(money, min_size=1, max_size=200), st.integers(1, 8))
@settings(**SETTINGS)
def test_dsum_partition_invariant_and_exact(spark, values, parts):
    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(parts)
    got = df.agg(dsum(F.col("v")).alias("s")).collect()[0].s
    want = sum(int(round(v * 100)) for v in values) / 100.0
    assert got == want


@given(st.lists(st.integers(0, 50), min_size=1, max_size=100))
@settings(**SETTINGS)
def test_exact_dedup_idempotent_and_minimal(spark, keys):
    rows = [(i, f"k{k}") for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, k string")
    once = exact_dedup(df, ["k"], "id")
    got = {(r.k, r.id) for r in once.collect()}
    want = {}
    for i, k in enumerate(keys):
        want.setdefault(f"k{k}", i)
    assert got == set((k, v) for k, v in want.items())
    twice = exact_dedup(once, ["k"], "id")
    assert {(r.k, r.id) for r in twice.collect()} == got


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=150, unique=True))
@settings(**SETTINGS)
def test_split_complementary_exhaustive(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    tagged = df.withColumn(
        "split",
        F.when(F.col("id") % 100 < 80, F.lit("train")).otherwise(F.lit("val")),
    )
    counts = dict(tagged.groupBy("split").count().collect())
    assert sum(counts.values()) == len(ids)
    # membership is a pure function of the id
    for r in tagged.collect():
        assert r.split == ("train" if r.id % 100 < 80 else "val")


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10**6)),
        min_size=1,
        max_size=100,
    )
)
@settings(**SETTINGS)
def test_topk_is_sorted_prefix_of_full_sort(spark, rows):
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g int, v long, id long"
    )
    full = [
        (r.v, r.id)
        for r in df.orderBy(F.col("v").desc(), "id").collect()
    ]
    top = [
        (r.v, r.id)
        for r in df.orderBy(F.col("v").desc(), "id").limit(5).collect()
    ]
    assert top == full[:5]
