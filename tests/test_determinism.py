"""Determinism tests (SURVEY.md §5 strategy #4): every oracle query must
produce identical values under different shuffle-partition settings —
guards against partition-order-dependent results (the failure mode of
dropDuplicates/first()).
"""

from __future__ import annotations

import pandas as pd
import pytest

from piper_spark import registry
from scripts.check_oracle import normalize
from tests.conftest import SF_SMOKE

# A representative slice across operator families (full sweep would
# re-run the whole registry twice; the oracle parity suite covers those).
SAMPLE = [
    "agg_group",
    "join_multiway",
    "win_rank",
    "win_running",
    "sort_limit",
    "sim_topk",
    "event_sessions",
    "text_topwords",
    "dedup_exact",
    "set_ops",
    # round-2 additions, one per new family
    "agg_stats",
    "dedup_clusters",
    "embed_centroids",
    "score_linear",
    "labeled_scan",
    "event_hwm",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_shuffle_partition_invariance(spark, name):
    fn = registry.all_queries()[name]
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        a = normalize(fn(spark, SF_SMOKE).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "29")
    b = normalize(fn(spark, SF_SMOKE).toPandas())
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    pd.testing.assert_frame_equal(a, b, check_exact=True)
