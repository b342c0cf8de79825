"""Physical-plan regression tests — the scale contract (SURVEY.md §4).

Correctness says the operator computes the right answer; these say it
computes it the way that survives 100 TB: pruned scans, pushed filters,
broadcast dimension joins, partial (map-side) aggregation, top-k
without a global sort, and no cartesian products where an equi-join is
intended.
"""

from __future__ import annotations

import pytest

from piper_spark import registry
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    # Plans must be judged on the operator's OWN shape: a relation some
    # earlier test persisted (e.g. text_ccnet_buckets caching its
    # lm-score input) would otherwise splice an InMemoryRelation into
    # this query's plan and hide the joins under test.
    spark.catalog.clearCache()
    df = registry.all_queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prune_reads_only_projected_columns(spark):
    plan = plan_of(spark, "scan_prune")
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_extendedprice" not in scan and "l_comment" not in scan


def test_filter_pred_pushes_predicates_to_scan(spark):
    plan = plan_of(spark, "filter_pred")
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PushedFilters: [" in scan
    assert "o_totalprice" in scan.split("PushedFilters")[1][:200]


def hints_of(spark, name: str) -> int:
    """Count explicit join-strategy hints in the analyzed logical plan."""
    df = registry.all_queries()[name](spark, SF_SMOKE)
    lp = df._jdf.queryExecution().analyzed().toString()
    return lp.count("ResolvedHint") + lp.count("UnresolvedHint")


@pytest.mark.parametrize("name", ["join_multiway", "tpch_q3", "date_arith", "join_inner"])
def test_fact_joins_carry_no_broadcast_hint(spark, name):
    # orders/customer grow linearly with SF: a hard-coded F.broadcast()
    # would OOM executors at 100 TB. The plan must leave the strategy to
    # Catalyst/AQE (which still broadcasts at this tiny SF — asserted
    # below — but from runtime sizes, not a pinned hint).
    assert hints_of(spark, name) == 0
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_join_multiway_auto_broadcasts_small_sides(spark):
    # With no hints, size-based planning still picks broadcast while the
    # build sides are tiny — the fast plan at this SF.
    plan = plan_of(spark, "join_multiway")
    assert plan.count("BroadcastHashJoin") == 2
    assert "CartesianProduct" not in plan


def test_tpch_q5_hints_only_bounded_dimensions(spark):
    # region (5 rows), nation (25), supplier (sub-linear): exactly 3
    # hints, none on the fact-scaled orders/customer/lineitem.
    assert hints_of(spark, "tpch_q5") == 3


def test_labeled_scan_prunes_partitions(spark):
    # The read side of the partitioned layout: the split/lang predicate
    # must land in PartitionFilters (directory-level pruning — pruned
    # partitions' files are never opened), not in the data filter.
    plan = plan_of(spark, "labeled_scan")
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    pf = scan.split("PartitionFilters: [")[1].split("]")[0]
    assert "split" in pf and "lang" in pf


def test_agg_group_has_partial_aggregation(spark):
    plan = plan_of(spark, "agg_group")
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_sort_limit_is_top_k_not_global_sort(spark):
    plan = plan_of(spark, "sort_limit")
    assert "TakeOrderedAndProject" in plan


def test_join_range_is_not_cartesian(spark):
    plan = plan_of(spark, "join_range")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_cell_assignment_is_narrow(spark):
    # assign_cells must be a per-row array-argmin over the broadcast
    # codebook — no Window (the old shape shuffled n×k rows per query).
    plan = plan_of(spark, "sim_ann_ivf")
    assert "Window" not in plan


def test_shuffle_scale_has_no_global_window(spark):
    # The scale form of the deterministic shuffle is a distributed
    # range-partitioned sort; shuffle_det's global row_number window
    # (single-partition bottleneck) must not appear here.
    plan = plan_of(spark, "shuffle_scale")
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower()


def test_tpch_q19_or_predicate_is_still_equi_join(spark):
    # Disjunctive predicates spanning both join sides are the classic
    # BNLJ trap; Catalyst must still extract l_partkey = p_partkey as
    # the join key and evaluate the OR as a filter.
    plan = plan_of(spark, "tpch_q19")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_tpch_q18_having_subquery_is_semi_join(spark):
    plan = plan_of(spark, "tpch_q18")
    assert "LeftSemi" in plan  # the HAVING membership check, not a re-agg
    assert "TakeOrderedAndProject" in plan  # top-100 without global sort


def test_minhash_join_is_equi_join_on_band_hash(spark):
    plan = plan_of(spark, "dedup_minhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_bucket_has_no_join_side_exchange(spark):
    """Bucketed tables joined on their bucket key must sort-merge with
    ZERO Exchange under the join — the only shuffle allowed in the plan
    is the final low-cardinality groupBy on c_mktsegment."""
    import re

    df = registry.all_queries()["join_bucket"](spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(k.startswith("c_mktsegment") for k in keys), keys
    assert "SelectedBucketsCount" in plan  # bucketed scan engaged


def test_lsh_cosine_candidates_come_from_equi_join(spark):
    """dedup_lsh_cosine proposes pairs via a (band_id, band_val)
    equi-join — never an all-pairs comparison. The only permissible
    BNLJ in the ANN twin is the broadcast of the 1-row query vector."""
    plan = plan_of(spark, "dedup_lsh_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["agg_group", "proj_math", "clamp_scale", "text_normalize"])
def test_hot_paths_are_whole_stage_codegen(spark, name):
    df = registry.all_queries()[name](spark, SF_SMOKE)
    df.collect()  # AQE finalizes this DataFrame's own query execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan  # whole-stage-codegen stage marker
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


NEW_TPCH = [
    "tpch_q1", "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q20", "tpch_q21", "tpch_q22",
]

#: Explicit broadcast hints each query is ALLOWED: bounded dimensions
#: (nation 25 rows, region 5) and 1-row scalar aggregates only — a new
#: fact-side hint shows up here as a count mismatch and fails. q2's
#: budget is 4 because its 2-hint candidate subtree appears twice in
#: the analyzed plan (reused for the correlated per-part min).
TPCH_HINT_BUDGET = {
    "tpch_q1": 0, "tpch_q2": 4, "tpch_q4": 0, "tpch_q7": 2, "tpch_q8": 3,
    "tpch_q9": 1,
    "tpch_q11": 1, "tpch_q12": 0, "tpch_q13": 0, "tpch_q15": 1,
    "tpch_q16": 1, "tpch_q17": 0, "tpch_q20": 1, "tpch_q21": 0,
    "tpch_q22": 1,
}

#: Queries whose plan legitimately contains ONE BroadcastNestedLoopJoin:
#: the conditionless join against a broadcast 1-row scalar aggregate
#: whose comparison is an INEQUALITY (threshold / mean / avg-balance).
#: q15's equality-to-max filter is absent: Catalyst extracts it as the
#: join key and plans a hash join. Anything else must stay equi-join.
TPCH_SCALAR_BNLJ = {"tpch_q11", "tpch_q20", "tpch_q22"}


@pytest.mark.parametrize("name", NEW_TPCH)
def test_tpch_suite_hint_budget_and_no_cartesian(spark, name):
    assert hints_of(spark, name) == TPCH_HINT_BUDGET[name]
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj == (1 if name in TPCH_SCALAR_BNLJ else 0)


def test_tpch_q1_is_single_pass_partial_agg(spark):
    # The canonical scan-heavy query: one scan, map-side partial
    # aggregate, one shuffle on the 6-value group key — nothing else.
    plan = plan_of(spark, "tpch_q1")
    assert plan.count("FileScan") == 1
    assert "partial_" in plan  # map-side combine before the shuffle
    assert "Join" not in plan


def test_tpch_q21_multi_exists_is_semi_then_anti(spark):
    # The EXISTS / NOT EXISTS pair must decorrelate to one left-semi
    # and one left-anti equi-join on orderkey, never a per-row subquery
    # or a cross product.
    plan = plan_of(spark, "tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_join_pruning_engages(spark):
    # At 100 TB, Catalyst's runtime bloom-filter injection prunes the
    # probe side of a selective fact-fact shuffle join before the
    # shuffle (SPARK-32268). Local inputs sit under the default size
    # thresholds, so this scopes them down to prove the engine's
    # session leaves the mechanism intact — nothing in our conf or
    # query shapes may suppress it.
    from pyspark.sql import functions as F

    from piper_spark.session import table
    from tests.conftest import SF_SMOKE

    scoped = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in scoped}
    try:
        for k, v in scoped.items():
            spark.conf.set(k, v)
        o = table(spark, SF_SMOKE, "orders").filter(F.col("o_totalprice") > 400000)
        li = table(spark, SF_SMOKE, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloomfilter" in plan or "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_win_dist_has_no_low_cardinality_window_over_base_table(spark):
    # win_dist's naive form windows the whole orders table partitioned
    # by the 3-value o_orderstatus — a third of the table sorted in ONE
    # task at scale. The scale-safe decomposition must (a) run every
    # big-table window partitioned by (status, bucket), never status
    # alone, and (b) join the tiny offset relation back by broadcast.
    plan = plan_of(spark, "win_dist")
    win_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    # Windows over the tiny per-(status,bucket) count relation mention
    # cnt#; every other window runs over the base table and must carry
    # bucket in its partition spec.
    big_table_windows = [l for l in win_lines if "cnt#" not in l]
    assert big_table_windows, "expected a row_number window over the base table"
    for l in big_table_windows:
        assert "bucket#" in l, f"window over base table not bucketed: {l}"
    assert "BroadcastHashJoin" in plan


def test_source_binary_prunes_partitions_and_filters_glob(spark):
    # The binaryFile tree scan must prune lang=<label> directories from
    # the partition predicate — at corpus scale the pruned directories'
    # files are never even listed into tasks — and the decoy .txt file
    # must be excluded by the glob, not by a post-read filter.
    plan = plan_of(spark, "source_binary")
    scan = next(l for l in plan.splitlines() if "FileScan binaryFile" in l)
    part = scan.split("PartitionFilters")[1][:200]
    assert "lang" in part and ("IN (" in part.upper() or "in(lang" in part)
    # all surviving rows come from .png files only (glob did the work)
    rows = registry.all_queries()["source_binary"](spark, SF_SMOKE)
    assert rows.filter("doc_id IS NULL").count() == 0


def test_pipeline_curate_decontam_is_broadcast_semi_join(spark):
    """The curation spine's decontamination stage must probe the
    benchmark-sized gram set by broadcast (semi/anti), never shuffle
    the exploded train side against it, and no stage may cartesian."""
    plan = plan_of(spark, "pipeline_curate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan or "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_sample_mixture_thresholds_broadcast_back(spark):
    """Mixture keep-thresholds (one row per source) must return to the
    big table via broadcast; the only big-table window partitions on
    the bounded source key."""
    plan = plan_of(spark, "sample_mixture")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ts_interp_windows_run_over_bounded_calendar(spark):
    """ts_interp's single-partition carry windows are legal ONLY
    because they run over the date-range-bounded calendar join — the
    plan must show the window above the calendar generator, not above
    the raw events scan."""
    df = registry.all_queries()["ts_interp"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the window's child chain contains the sequence-explode calendar
    assert "Window" in plan and "explode" in plan.lower()


def test_img_phash_candidates_come_from_equi_join(spark):
    """Perceptual-hash near-dup candidates must come from the banded
    equi-join, never an all-pairs comparison; the Hamming verify is a
    codegen'd bit_count, not a per-row string round-trip."""
    plan = plan_of(spark, "img_phash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bit_count" in plan
    assert "regexp" not in plan.lower()


def test_score_eval_scores_exactly_once(spark):
    """The pipeline evaluation form must contain exactly ONE scoring
    pass (one MapInPandas matmul) feeding both the confusion counts and
    the accuracy — never the registry-contract score-twice shape of
    `score_accuracy`."""
    plan = plan_of(spark, "score_eval")
    assert plan.count("MapInPandas") == 1, plan


def test_text_chunks_and_embed_quantize_are_shuffle_free(spark):
    """Chunking and quantization are per-row transforms — their plans
    must contain NO Exchange at all (they scale with the scan)."""
    for name in ("text_chunks", "embed_quantize"):
        plan = plan_of(spark, name)
        assert "Exchange" not in plan, name


def test_text_pack_shuffles_once_on_the_stream_key(spark):
    """Sequence packing is one running-sum window per language stream:
    exactly one hashpartitioning Exchange, keyed on lang."""
    import re

    plan = plan_of(spark, "text_pack")
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert len(keys) == 1 and keys[0].startswith("lang"), keys


def test_winnow_fingerprints_are_shuffle_free(spark):
    """Winnowing fingerprint selection is pure per-row HOFs — no KEYED
    Exchange anywhere (the selection scales with the scan, like
    text_chunks). The single allowed Exchange is fan_out's round-robin
    parallelism spread (round 14), which is conditional on the input
    split count and absent at scale."""
    plan = plan_of(spark, "text_winnow")
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1, plan
    if "Exchange" in plan:
        assert "roundrobin" in plan.lower(), plan


def test_dedup_winnow_candidates_come_from_equi_join(spark):
    """All three joins (df-cap, pair self-join, verify) must be hash
    equi-joins — no cartesian/NLJ anywhere, and no Python in the
    path."""
    plan = plan_of(spark, "dedup_winnow")
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_audio_fingerprint_spreads_then_stays_jvm_side(spark):
    """The acoustic fingerprint is JVM-side codegen with exactly ONE
    round-robin spread exchange (decode-cost parallelism must not be
    hostage to the input file layout — the spread_for_decode contract);
    no key shuffle, no Python crossing."""
    import re

    plan = plan_of(spark, "audio_fingerprint")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "hashpartitioning" not in plan.lower(), plan
    assert len(re.findall(r"(?i)Exchange roundrobinpartitioning", plan)) == 1, plan


def test_dedup_audio_band_join_is_equi_join(spark):
    """Audio near-dup candidates come from the band equi-join — never
    a cartesian — and the Hamming verify stays JVM-side."""
    plan = plan_of(spark, "dedup_audio")
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_text_lm_score_joins_model_once(spark):
    """The LM scoring join must touch the corpus ONCE: one join of the
    bigram stream against the model relation (whose left-context total
    is a window over the model, not a second corpus join)."""
    import re

    plan = plan_of(spark, "text_lm_score")
    assert "Cartesian" not in plan
    n_joins = len(re.findall(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan))
    assert n_joins == 1, plan


def test_dedup_substring_diagonals_are_keyed_windows(spark):
    """The diagonal-run detection must be keyed equi-joins + a window
    partitioned by (pair, diagonal) — no cartesian, no Python, and no
    global (unpartitioned) window."""
    plan = plan_of(spark, "dedup_substring")
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_text_boilerplate_rebuild_is_keyed_and_jvm_side(spark):
    """Boilerplate removal is keyed shuffles end-to-end (gram df agg,
    gram join, position join, per-doc rebuild) — no cartesian, no
    Python crossing."""
    plan = plan_of(spark, "text_boilerplate")
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_sample_temperature_broadcasts_rates_not_corpus(spark):
    """The per-lang rate relation (<= langs rows) must come back as a
    broadcast join — the corpus itself is never shuffled for the
    sampling decision — and there is no global window."""
    plan = plan_of(spark, "sample_temperature")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_ccnet_buckets_have_no_global_sort_window(spark):
    """Tercile cuts are ONE tiny aggregate broadcast back — never an
    ntile()/rank() window funneling the corpus through one partition.
    (The only Window allowed is the inherited lm-score model window,
    keyed on w1.)"""
    import re

    plan = plan_of(spark, "text_ccnet_buckets")
    assert not re.search(r"\bntile\(", plan) and "percent_rank" not in plan
    assert "rangepartitioning" not in plan.lower()  # no global sort
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "w1#" in line, line  # every window is model-keyed


def test_decontam_broadcast_is_size_gated(spark):
    """The decontamination semi-join picks its strategy from the
    footer-derived eval-side bound, not Catalyst's explode-blind
    estimate: under the threshold the eval gram set broadcasts; over it
    (forced here by zeroing the budget) the plan pins a SHUFFLED hash
    join — no driver-side build of a corpus-scaled relation."""
    from unittest import mock

    from piper_spark.functions import text as T

    spark.catalog.clearCache()
    small = registry.all_queries()["text_decontam"](spark, SF_SMOKE)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    spark.catalog.clearCache()
    with mock.patch.object(T, "DECONTAM_BROADCAST_MAX_BYTES", 0):
        big = registry.all_queries()["text_decontam"](spark, SF_SMOKE)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_big
    assert "BroadcastHashJoin" not in plan_big


def test_sample_unimax_waterfill_stays_on_the_count_relation(spark):
    """The waterfill windows run over the per-language COUNT relation
    (<= #languages rows), never the corpus: the only corpus-sized
    window partitions on lang, and the target table returns by
    broadcast."""
    plan = plan_of(spark, "sample_unimax")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower() and "doc_id" in line:
            # the corpus-sized rank window must shard on lang; the
            # unpartitioned waterfill windows never see doc_id (they
            # run over the ≤ #languages count relation).
            assert "[lang#" in line, line


def test_text_substring_clean_is_keyed_end_to_end(spark):
    """The removal transform inherits dedup_substring's shape: gram
    candidates come from an equi-join (never cartesian), islands run
    under (pair, diagonal)-keyed windows, and the rebuild joins on
    (doc_id, pos) — no global sort, no corpus-wide window."""
    plan = plan_of(spark, "text_substring_clean")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "id1#" in line or "id2#" in line, line


def test_video_fingerprint_is_shuffle_free_codegen(spark):
    """The per-frame hash relation is scan → HOF folds → posexplode:
    no Exchange, no Python workers — embarrassingly parallel over
    parquet splits (the round-robin decode spread is the only
    exchange, and it carries raw rows, not computed arrays)."""
    plan = plan_of(spark, "video_fingerprint")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e.startswith("RoundRobin") for e in exchanges), exchanges


def test_dedup_video_band_join_is_equi_join(spark):
    """Video near-dup candidates come from the opening-frame-hash
    equi-join over the persisted signature relation — never cartesian,
    and the verify math stays JVM-side."""
    plan = plan_of(spark, "dedup_video")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_near_incremental_probes_index_not_all_pairs(spark):
    """The incremental near-dedup probe is a fingerprint equi-join
    against the (df-capped) index — never cartesian, never a
    broadcast of a corpus-scaled side."""
    plan = plan_of(spark, "dedup_near_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_bm25_topk_without_global_sort(spark):
    # Top-10 must lower to TakeOrderedAndProject (per-partition top-k +
    # merge), never a full Sort of the scored relation; the only
    # nested-loop joins are the 1-row/3-row broadcast scalar relations.
    plan = plan_of(spark, "text_bm25")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_agg_countmin_counters_join_is_broadcast(spark):
    # The d·w counter relation is sketch-sized by construction; probing
    # it from the top-word rows must be a BroadcastHashJoin, and the
    # only nested-loop join is the 4-row mixer crossJoin.
    plan = plan_of(spark, "agg_countmin")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dedup_semantic_pair_join_is_keyed(spark):
    # The within-cluster pair stage must shuffle on the cluster key —
    # an all-pairs CartesianProduct would defeat SemDeDup's n²/k
    # bound. (The k-row seed crossJoin is the one intended broadcast
    # nested loop; it prints once per pair alias because the persisted
    # assignment subtree is unmaterialized in a fresh plan.)
    plan = plan_of(spark, "dedup_semantic")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin [cluster" in plan or "ShuffledHashJoin [cluster" in plan


def test_win_ewma_single_user_shuffle(spark):
    # One user-keyed Exchange feeding the window; the frame fold is a
    # codegen expression, not a second shuffle or a Python worker.
    plan = plan_of(spark, "win_ewma")
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_upsert_is_anti_join_plus_union(spark):
    plan = plan_of(spark, "merge_upsert")
    assert "LeftAnti" in plan
    assert "Union" in plan
    assert "CartesianProduct" not in plan


def test_dedup_url_partial_agg_single_shuffle(spark):
    # Canonicalization is a per-row map; the keeper decision is one
    # hash aggregate with a map-side partial — exactly one Exchange.
    plan = plan_of(spark, "dedup_url")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_embed_cov_shuffles_only_gram_partials(spark):
    # The corpus pass is ONE Arrow stage emitting d²-sized partials;
    # the only Exchange is the (i, j) hash-agg key — d(d+1)/2 keys
    # regardless of corpus size — with a map-side partial agg before it.
    plan = plan_of(spark, "embed_cov")
    assert "MapInPandas" in plan
    # Exactly one KEYED exchange — the (i, j) hash-agg key; fan_out's
    # conditional round-robin spread (round 14) may add one more
    # locally but never a keyed shuffle of the corpus.
    assert plan.count("hashpartitioning") == 1
    assert plan.count("Exchange") <= 2
    assert plan.count("HashAggregate") == 2  # partial + final
    assert "CartesianProduct" not in plan


def test_embed_pca_projection_is_shuffle_free_codegen(spark):
    # Training collected a bounded artifact while BUILDING the plan;
    # the returned projection itself must be a pure narrow codegen
    # pass: literal model arrays, no Exchange, no Python workers.
    plan = plan_of(spark, "embed_pca")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_dedup_containment_candidates_are_shingle_keyed(spark):
    # Candidate generation must equi-join on the shingle, and the
    # verify must join back by doc id — never an all-pairs product.
    plan = plan_of(spark, "dedup_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # any equi-join flavor is fine (smoke-scale sides broadcast); the
    # contract is the EQUI key: candidates join ON the shingle column.
    assert "Join [g#" in plan


def test_dq_outliers_stats_are_broadcast_back(spark):
    # Both per-type stats relations are tiny grouped aggregates; the
    # corpus joins them via BroadcastHashJoin — the events relation is
    # never shuffled on a data key.
    plan = plan_of(spark, "dq_outliers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_event_cooccur_basket_join_is_keyed(spark):
    # The pair stage shuffles on the basket key (user_id, day); the
    # count relations come back as broadcasts (the 1-row basket count
    # is the one intended nested-loop join).
    plan = plan_of(spark, "event_cooccur")
    assert "CartesianProduct" not in plan
    # the pair stage is an equi-join on the basket key in any flavor
    # (smoke-scale sides broadcast); the 1-row basket count is the one
    # intended nested-loop join.
    assert "Join [user_id#" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" in plan


def test_text_bpe_pairs_runs_on_the_vocab_not_the_corpus(spark):
    # Two hash aggregates (word freq, then pair count) and a
    # TakeOrderedAndProject for the top-k — never a global Sort; the
    # pair explode hangs off the vocab relation, after the word agg.
    plan = plan_of(spark, "text_bpe_pairs")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 2
    assert "CartesianProduct" not in plan


def test_scd2_intervals_window_is_key_partitioned(spark):
    # One lead() window partitioned on the dimension key; the version
    # payload comes back via an equi-join on the version key.
    plan = plan_of(spark, "scd2_intervals")
    assert "Window" in plan
    assert "windowspecdefinition(o_custkey" in plan
    assert "CartesianProduct" not in plan


def test_pipeline_embed_curate_survivors_via_anti_join(spark):
    # The drop set is applied as a key anti-join (never a collected
    # filter list); candidates stay an equi-join on the band value, and
    # the only Python stage is the Arrow signature kernel.
    plan = plan_of(spark, "pipeline_embed_curate")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # Arrow, not row-at-a-time


def test_join_asof_nearest_is_windows_plus_keyed_join(spark):
    # Two union-and-carry windows + an event_id equi-join — never a
    # range/cartesian pairing of the two sides.
    plan = plan_of(spark, "join_asof_nearest")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 2
    assert "Join [event_id#" in plan


def test_event_paths_is_one_window_no_join(spark):
    # The window IS the adjacency: one user-keyed Window feeding both
    # lead slots, a bounded hash agg, and top-k without a global sort.
    plan = plan_of(spark, "event_paths")
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert "TakeOrderedAndProject" in plan


def test_dq_profile_is_one_scan(spark):
    # All sixteen measures come from ONE aggregate over one FileScan
    # (the multi-distinct lowers to Expand, not extra scans); the
    # row-pivot explode runs on a single row.
    plan = plan_of(spark, "dq_profile")
    assert plan.count("FileScan") == 1
    assert "Expand" in plan
    assert "Join" not in plan


def test_embed_whiten_projection_is_shuffle_free(spark):
    # Same contract as embed_pca: training collected a bounded artifact
    # at plan-build time; the projection itself is narrow codegen.
    plan = plan_of(spark, "embed_whiten")
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_graph_pagerank_is_keyed_iterations(spark):
    # Each power iteration is a keyed shuffle — never a cartesian or
    # nested-loop pairing of ranks with edges; the edge⋈degree relation
    # is read from the persisted cache, not recomputed per round.
    plan = plan_of(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan


def test_graph_triangles_is_equi_joins_only(spark):
    # Wedge join + closing probe are equi-joins on (y) and (x, z);
    # the oriented edge relation comes from the persisted cache.
    plan = plan_of(spark, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan


def test_graph_neighbor_jaccard_is_wedge_join(spark):
    plan = plan_of(spark, "graph_neighbor_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_er_match_pairs_come_from_block_equi_join(spark):
    # The ONLY pair generator is the blocking-key equi-join; the
    # levenshtein verify runs above it, never as a pairing condition.
    plan = plan_of(spark, "er_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_er_clusters_is_one_shuffle_blockwise_unionfind(spark):
    # The blocking structure makes clustering embarrassingly block-
    # parallel: exactly ONE Exchange (the blk group shuffle) feeding an
    # Arrow applyInPandas — not an iterative per-hop join loop.
    plan = plan_of(spark, "er_clusters")
    assert plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    assert "Join" not in plan


def test_dedup_bloom_probes_are_broadcast_and_verify_is_single_anti(spark):
    # The bloom word relation (m/64 rows, corpus-size-independent) is
    # broadcast for both probe joins; only the maybe-branch reaches the
    # corpus anti-join — exactly one LeftAnti in the whole plan.
    plan = plan_of(spark, "dedup_bloom")
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("LeftAnti") == 1
    assert "CartesianProduct" not in plan


def test_ts_ohlc_is_one_partial_agg_shuffle(spark):
    # One keyed exchange; min_by/max_by/min/max/sum/count all combine
    # map-side, so the shuffle carries bar-count rows, not ticks.
    plan = plan_of(spark, "ts_ohlc")
    assert plan.count("Exchange") == 1
    assert "partial_min_by" in plan or "partial_minby" in plan.lower()
    assert "Join" not in plan


def test_pipeline_audio_curate_reuses_persisted_fingerprints(spark):
    # The fingerprint relation feeds the band self-join (both aliases)
    # and the survivor anti-join from the SAME persisted cache; no
    # cartesian anywhere; the pipeline stays Arrow/codegen-side.
    plan = plan_of(spark, "pipeline_audio_curate")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("LeftAnti") == 1


def test_join_interval_is_bucket_equi_join_not_bnlj(spark):
    # The exact overlap predicate runs ABOVE a week-bucket equi-join;
    # Catalyst's native plan for the raw range predicate would be a
    # BroadcastNestedLoopJoin — quadratic when both sides scale.
    plan = plan_of(spark, "join_interval")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_text_bpe_encode_merge_table_is_broadcast(spark):
    # The merge table is ONE broadcast row (bounded pair domain); the
    # corpus side never shuffles for the apply stage.
    plan = plan_of(spark, "text_bpe_encode")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_event_rfm_has_no_global_window(spark):
    # Quintiles come from a broadcast percentile aggregate, never an
    # ntile()/rank() window that would single-partition the corpus.
    plan = plan_of(spark, "event_rfm")
    assert "Window" not in plan


def test_join_geo_grid_is_cell_equi_join(spark):
    # Proximity pairs come from the 3×3 cell equi-join — never the
    # O(n²) cross/nested-loop plan the raw distance predicate implies.
    plan = plan_of(spark, "join_geo_grid")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cluster_kmeans_final_assign_is_mapside_over_cache(spark):
    # The returned relation is the FINAL assignment only: one Arrow
    # batch kernel over the persisted quantized vectors — no join, no
    # exchange (the fit's shuffles ran eagerly inside the call).
    plan = plan_of(spark, "cluster_kmeans")
    assert "InMemoryTableScan" in plan
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_graph_kcore_output_reads_cached_final_degrees(spark):
    # All peel rounds materialize eagerly; the returned relation is a
    # filter over the cached final degree relation — nothing else runs
    # at collect time (the executedPlan string nests the CACHED
    # subtree's joins under InMemoryRelation, so assert on the OUTER
    # plan above it).
    plan = plan_of(spark, "graph_kcore")
    outer = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in outer
    assert "Join" not in outer
    assert "Exchange" not in outer


def test_graph_lpa_output_reads_cached_final_labels(spark):
    plan = plan_of(spark, "graph_lpa")
    outer = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in outer
    assert "Join" not in outer
    assert "Exchange" not in outer


def test_embed_pq_is_single_jvm_projection(spark):
    # PQ assignment is one map-side codegen projection: no shuffle, no
    # join, and NO Python crossing (the codebook is parsed literals).
    plan = plan_of(spark, "embed_pq")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_sim_ann_kmeans_is_probe_filtered_topk(spark):
    # Candidates come from the cluster-IN-probes filter over the Arrow
    # assignment; ranking is a top-k (TakeOrdered), never a global
    # sort, and no cartesian pairing anywhere (the 1-row query rides a
    # broadcast).
    plan = plan_of(spark, "sim_ann_kmeans")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan


def test_dq_drift_is_one_scan(spark):
    # ONE corpus scan: the totals come from a window over the bounded
    # (≤10-row) histogram, not a second aggregate branch re-reading
    # the file (the round-9 plan audit caught exactly that).
    plan = plan_of(spark, "dq_drift")
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan") == 1


def test_text_nfc_is_shuffle_free_arrow_map(spark):
    plan = plan_of(spark, "text_nfc")
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan


def test_audio_wav_energy_is_spread_then_arrow(spark):
    # One round-robin spread (decode parallelism), then the wrap UDF +
    # the strict-parse energy fold — no keyed shuffle, no join.
    plan = plan_of(spark, "audio_wav_energy")
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_video_avi_frames_is_spread_then_arrow(spark):
    # Round-10: one round-robin spread (decode parallelism), the
    # containerize UDF + the strict chunk-walk/JPEG-decode map — no
    # keyed shuffle, no join (the audio_wav_energy shape).
    plan = plan_of(spark, "video_avi_frames")
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_img_augment_is_spread_then_arrow(spark):
    # Round-10: flip+rotate+weighted-checksum is one Arrow map over
    # the spread — no keyed shuffle, no join.
    plan = plan_of(spark, "img_augment")
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_agg_hll_registers_avoid_distinct_expand(spark):
    """Round-10 agg_hll: the REGISTER path must never plan an Expand —
    max(rho) over occurrences equals max over distinct keys, so the
    sketch side carries no count(DISTINCT) machinery (the one Expand
    in the full key belongs to the exact comparison column only), no
    Python worker, and no nested-loop join."""
    from piper_spark.operators.aggregates import hll_registers
    from piper_spark.session import table
    from tests.conftest import SF_SMOKE

    regs = hll_registers(
        table(spark, SF_SMOKE, "lineitem"), "l_returnflag", "l_orderkey"
    )
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # one partial-max shuffle
    full = plan_of(spark, "agg_hll")
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full


def test_round10_session_keys_plan_shapes(spark):
    """Round-10 session additions: the two container/codec keys are
    single Arrow passes whose only exchange is the declared
    spread_for_decode round-robin (no keyed shuffle, no join); the
    binned median's corpus-side work is one partial-agg histogram
    shuffle plus broadcast joins of the 3-row stats relation (never a
    data-sized sort); the power-iteration key's corpus touch is the
    cov_partials Arrow pass + d²-key aggregate."""
    for key in ("source_tar_members", "img_phash_int"):
        plan = plan_of(spark, key)
        assert "ArrowEvalPython" in plan or "MapInPandas" in plan, key
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, key
        assert plan.count("Exchange") <= 1, key  # the spread repartition

    plan = plan_of(spark, "agg_median_bins")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan      # stats relation broadcast back
    # the histogram window runs over the bounded ≤1024-bin relation —
    # a global data-sized Sort of `lineitem` would show as a Sort over
    # the scan subtree with no preceding partial aggregate
    assert "Window" in plan

    plan = plan_of(spark, "embed_power_iter")
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_sim_ann_batch_joins_are_equi_and_probe_side_broadcast(spark):
    """Batched IVF search (round 11): the (qid, cid) probe relation and
    the per-query vectors ride as BROADCAST equi-joins; no cartesian or
    nested-loop anywhere, and the only corpus-keyed exchange is the
    vec_id join pulling candidate embeddings."""
    plan = plan_of(spark, "sim_ann_batch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_sim_knn_join_is_cell_keyed_equi_join(spark):
    """The k-NN self-join must shard pairs by cell (hash equi-join on
    cid — the n²/k SemDeDup bound), never a cartesian/NLJ; the top-k
    window runs per vec_id over cell-sized candidates."""
    plan = plan_of(spark, "sim_knn_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_ensemble_votes_without_cartesian(spark):
    """Ensemble voting composes three bounded candidate equi-joins plus
    pair-keyed vote joins — no cartesian/NLJ may appear anywhere in the
    composed plan."""
    plan = plan_of(spark, "dedup_ensemble")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
