"""LIVE-trigger streaming smoke (round-5 VERDICT item 4).

The availableNow parity tests (test_streaming.py) drain a finite file
fixture; these drive the custom stateful operators from a REAL
unbounded source (`rate-micro-batch`) under a processing-time trigger
for several micro-batches, then assert the keyed state converged to the
batch fold over exactly the prefix that was processed — exercising the
trigger scheduling, state-store carry-over between live batches, and
query stop paths that availableNow never touches.

`rate-micro-batch` (not `rate`) on purpose: it emits EXACTLY
rowsPerBatch rows per micro-batch with deterministic values 0,1,2,…,
so the processed prefix is a contiguous [0, M) whose per-user expected
state is computable after the fact — a live trigger without a flaky
row-count race. Values map to events with cents == value (monotone), so
M itself is recoverable from the emitted state (see each test).

Wall-clock: each test runs a handful of sub-second trigger intervals
(~5-10 s). Set SPARK_GRAFT_SKIP_LIVE=1 to skip both on a tight budget.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_LIVE") == "1",
    reason="live-trigger smoke skipped by SPARK_GRAFT_SKIP_LIVE=1",
)

#: Rows per deterministic micro-batch and distinct user keys.
ROWS_PER_BATCH, N_USERS, MIN_BATCHES = 64, 8, 3


def _live_events(spark):
    """Unbounded deterministic event stream: value v → one purchase by
    user v%8 worth v/100.0 (so scaled cents == v exactly — floor(v/100
    * 100 + 0.5) == v for any v < 2^43, making expected state a pure
    function of the processed prefix [0, M))."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .option("numPartitions", 2)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        (F.col("value") % N_USERS).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        (F.col("value") / 100.0).alias("value"),
        F.col("timestamp").alias("ts"),
    )


def _run_live(spark, df, name: str, min_batches: int = MIN_BATCHES):
    """Run `df` into a memory sink under a processing-time trigger until
    ≥ min_batches micro-batches completed, then stop. Returns nothing;
    rows are in spark.table(name)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= min_batches and p["numInputRows"] > 0:
                break
            time.sleep(0.2)
        else:
            raise AssertionError("live trigger never completed enough batches")
    finally:
        q.stop()
        q.awaitTermination(30)


def test_live_running_topk_converges_to_prefix_top3(spark):
    """stream_running_topk under a real processing-time trigger: the
    per-user elementwise-max of emissions must equal the exact top-3 of
    the processed prefix [0, M). M is recovered from the state itself:
    cents == value is monotone, so the global max top1 is M−1."""
    from piper_spark.streaming.events import stream_running_topk

    _run_live(spark, stream_running_topk(_live_events(spark)), "live_topk")
    got = {
        r.user_id: (r.top1, r.top2, r.top3)
        for r in spark.table("live_topk")
        .groupBy("user_id")
        .agg(
            F.max("top1").alias("top1"),
            F.max("top2").alias("top2"),
            F.max("top3").alias("top3"),
        )
        .collect()
    }
    assert got, "no state emitted"
    m = max(v[0] for v in got.values()) + 1
    # complete batches only: the prefix is a whole number of batches
    assert m % ROWS_PER_BATCH == 0 and m >= MIN_BATCHES * ROWS_PER_BATCH
    for u in range(N_USERS):
        vals = sorted(range(u, m, N_USERS), reverse=True)[:3]
        want = tuple((vals + [None, None, None])[:3])
        assert got[u] == want, (u, m, got[u], want)


def test_live_anomaly_counts_converge_to_prefix_fold(spark):
    """stream_anomaly_counts under a real processing-time trigger: the
    final per-user (n_events, n_flagged) must equal the production
    prequential fold applied once to the user's full processed prefix
    in (ts, event_id) order — i.e. state carried across live
    micro-batches composes to the single-shot batch fold. M is
    recovered as Σ_u n_events (every processed row is a purchase)."""
    from piper_spark.streaming.events import _fold_anomaly, stream_anomaly_counts

    _run_live(spark, stream_anomaly_counts(_live_events(spark)), "live_anom")
    got = {
        r.user_id: (r.n_events, r.n_flagged)
        for r in spark.table("live_anom")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_flagged").alias("n_flagged"),
        )
        .collect()
    }
    assert got, "no state emitted"
    m = sum(v[0] for v in got.values())
    assert m % ROWS_PER_BATCH == 0 and m >= MIN_BATCHES * ROWS_PER_BATCH
    for u in range(N_USERS):
        vals = list(range(u, m, N_USERS))
        pdf = pd.DataFrame(
            {
                "ts": range(len(vals)),  # already in arrival order
                "event_id": vals,
                "value": [v / 100.0 for v in vals],
            }
        )
        n, s1, s2, flagged = _fold_anomaly(0, 0, 0, 0, [pdf])
        assert got[u] == (n, flagged), (u, m, got[u], (n, flagged))
