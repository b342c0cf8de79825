"""Empty-corpus robustness — every operator must be well-defined on a
zero-row corpus (empty relation out, never a crash).

This is the failure class behind the round-4 dq_quarantine advice item
(schema inference on an empty sink) and the round-5 labeled_scan /
sim_ann_ivf fixes (missing partition dirs; numpy axis errors on empty
model fits). The full 156-key sweep runs out-of-band
(scripts/check_oracle.py-style); the suite pins the RISKY classes:
fixture-writing queries, bounded driver-side collects, numpy model
fits, windows, LSH banding, and the multimodal decode paths.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from piper_spark import registry
from piper_spark.session import TABLE_NAMES
from tests.conftest import SF_SMOKE

#: Queries that write fixtures, collect bounded model inputs, run
#: numpy fits, or band/explode — the shapes that break on empty input.
RISKY = [
    "labeled_scan",
    "source_binary",
    "source_image_struct",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_topk",
    "dedup_lsh_cosine",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_simhash128",
    "dedup_clusters",
    "dedup_incremental",
    "img_phash",
    "img_resize",
    "score_eval",
    "embed_quantize",
    "text_chunks",
    "text_pack",
    "text_decontam",
    "text_gopher_full",
    "pipeline_curate",
    "dq_quarantine",
    "event_funnel",
    "win_dist",
    "sample_mixture",
    "ts_interp",
    "join_bucket",
    # round-6 additions: banded/exploding fingerprint paths, persisted
    # self-joins, an iterative CC loop, and a percentile-broadcast map.
    "text_winnow",
    "dedup_winnow",
    "dedup_substring",
    "text_lm_score",
    "text_boilerplate",
    "audio_fingerprint",
    "dedup_audio",
    "sample_temperature",
    "text_ccnet_buckets",
    "pipeline_near_dedup",
    # round-7 additions: a waterfill over an empty count relation, a
    # gram-join removal transform, and the size-gated decontam path.
    "sample_unimax",
    "text_substring_clean",
    "text_boilerplate_lines",
    "video_fingerprint",
    "dedup_video",
    "dedup_near_incremental",
    "sample_quality_mix",
    "text_self_repeat",
    # round-7 late additions: a scalar agg feeding an integer division
    # (n_docs = 0), an empty broadcast counter relation, empty pinned
    # seeds under a crossJoin + argmax window, and a seeded frame fold.
    "text_bm25",
    "agg_countmin",
    "dedup_semantic",
    "win_ewma",
    # round-7 closing batch: an Arrow Gram pass + numpy eigh model fit
    # on zero rows, a persisted shingle self-join, grouped exact
    # percentiles feeding a broadcast, and a basket-count crossJoin.
    "embed_cov",
    "embed_pca",
    "dedup_containment",
    "dq_outliers",
    "event_cooccur",
    "text_bpe_pairs",
    "scd2_intervals",
    "pipeline_embed_curate",
    "join_asof_nearest",
    "event_paths",
    "embed_whiten",
    "dq_profile",
    # round-8 additions: a modulo-by-zero edge map (n = 0 footer count),
    # an iterative rank loop, persisted wedge/band self-joins, a
    # per-block Arrow union-find, an empty bloom-word broadcast, and
    # min_by/max_by keepers over zero groups.
    "graph_pagerank",
    "graph_triangles",
    "graph_neighbor_jaccard",
    "er_match",
    "er_clusters",
    "dedup_bloom",
    "ts_ohlc",
    "pipeline_audio_curate",
    # round-8 wave 2: a 1-row merge pivot over an empty pair relation
    # (agg returns one all-NULL row feeding replace()), sequence
    # explodes over empty interval sets, and percentile cuts of an
    # empty user aggregate.
    "text_bpe_encode",
    "join_interval",
    "event_rfm",
    "join_geo_grid",
    "pipeline_video_curate",
    "pipeline_image_curate",
    "graph_bfs",
    "sample_soft_dedup",
    "dq_referential",
    "agg_moments",
    # round-9: the distributed Lloyd loop (empty seed collect must
    # short-circuit to an empty typed relation before any iteration)
    # and an Arrow string-fold UDF over zero rows.
    "cluster_kmeans",
    "text_nfc",
    "graph_kcore",
    "audio_wav_energy",
    "graph_lpa",
    "embed_pq",
    "dq_drift",
    "sim_ann_kmeans",
    # round-10: strict AVI chunk walk over zero rows (empty corpus must
    # yield an empty typed relation, not a parser error).
    "video_avi_frames",
    "img_augment",
    # round-11: the SCALAR_ITER moments fit (empty corpus must
    # short-circuit before the z-score division, not raise) and the
    # batched IVF search (empty fit AND empty query batch must both
    # short-circuit to the typed empty relation).
    "event_zscore",
    "sim_ann_batch",
    "sim_knn_join",
    "pipeline_signatures",
    "dedup_ensemble",
    # round-12: the cross-doc gram-df join over zero rows, and the
    # tolerance as-of (empty union-and-carry window input).
    "text_dup_grams",
    "join_asof_tol",
    "dedup_containment",
    "sim_ann_two_level",
    # round-13: the uncapped IVF SemDeDup (empty fit → typed empty
    # relation) and the ADC search (empty seed collect / missing
    # query vector both short-circuit).
    "dedup_semantic_ivf",
    "sim_ann_pq",
    "sim_ivf_pq",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("piper_empty"))
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_SMOKE}/{t}.parquet' LIMIT 0) "
            f"TO '{os.path.join(base, t)}.parquet' (FORMAT PARQUET)"
        )
    return base


#: Queries whose output is a FIXED report grid (rows exist even with
#: zero input): event_funnel always reports its 3 steps (0 users each).
GRID_ROWS = {"event_funnel": 3, "dq_profile": 4, "dq_referential": 2}


@pytest.mark.parametrize("name", RISKY)
def test_query_is_well_defined_on_empty_corpus(spark, empty_dir, name):
    out = registry.all_queries()[name](spark, empty_dir)
    assert out.count() == GRID_ROWS.get(name, 0)


def test_fixpoint_optins_are_well_defined_on_empty_corpus(spark, empty_dir):
    """Round-10 review finding: pagerank's fixpoint delta is a SUM over
    zero rows (NULL) on an empty corpus — every to_fixpoint opt-in must
    return an empty typed relation, not a TypeError/parser error."""
    from piper_spark.functions.graphs import (
        graph_bfs,
        graph_kcore,
        graph_lpa,
        graph_pagerank,
    )

    for fn in (graph_pagerank, graph_bfs, graph_kcore, graph_lpa):
        assert fn(spark, empty_dir, to_fixpoint=True).count() == 0


def test_grouping_sets_on_empty_input_is_a_designed_choice(spark, empty_dir):
    """Round-10 VERDICT item 6: pin the empty-input grouping-sets
    divergence as INTENDED behavior, not an accident the degenerate
    sweep papers over.

    ANSI SQL (and DuckDB) define GROUP BY GROUPING SETS so the grand-
    total () grouping set contributes one row even over zero input rows
    — SQL:2016 7.9 <group by clause>: each grouping set groups the
    table independently, and grouping an empty table by zero columns
    yields one group (the same rule that makes a bare `SELECT count(*)`
    return one row). Spark instead expands grouping sets through its
    Expand operator BEFORE the aggregate, so an empty input expands to
    an empty child and rollup/cube/grouping-sets emit ZERO rows.

    The engine deliberately keeps Spark's native semantics rather than
    unioning in an artificial grand-total row: the operators stay pure
    declarative plans (no empty-probe side job), and real engines
    genuinely differ here (Spark = zero rows; DuckDB/Postgres = the
    ANSI grand-total row). scripts/check_degenerate.py whitelists
    exactly the three keys this affects (KNOWN_DIVERGENCES); this test
    pins both halves so a silent behavior change in EITHER engine
    surfaces as a failure, keeping the whitelist honest."""
    for key in ("agg_rollup", "agg_cube", "agg_gsets"):
        assert registry.all_queries()[key](spark, empty_dir).count() == 0, key
    # The other half of the divergence: DuckDB emits the ANSI
    # grand-total row on the same empty input.
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(empty_dir, 'lineitem')}.parquet'"
    )
    rows = con.execute(
        "SELECT l_returnflag, count(*) AS n FROM lineitem "
        "GROUP BY ROLLUP (l_returnflag)"
    ).fetchall()
    assert rows == [(None, 0)]
