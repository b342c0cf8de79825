"""End-to-end training-data pipeline tests (the reference-parity flow)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from piper_spark.pipelines import (
    dedup_exact_docs,
    dedup_near_docs,
    quality_filter,
    run_training_data_pipeline,
    tag_split,
)
from piper_spark.session import table
from tests.conftest import SF_SMOKE


def test_quality_filter_gates(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "the a the a the a"), (3, "one two three four five six")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in quality_filter(df).collect()}
    assert kept == {3}  # 1 too short, 2 stopword-dominated


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "x y z"), (2, "x y z"), (9, "p q r")], "doc_id long, text string"
    )
    out = {(r.doc_id, r.text) for r in dedup_exact_docs(df).collect()}
    assert out == {(2, "x y z"), (9, "p q r")}


def test_dedup_near_removes_larger_member(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup_near_docs(df).collect()}
    assert kept == {1, 3}


def test_full_pipeline_end_to_end(spark):
    out = tempfile.mkdtemp(prefix="piper_pipe_")
    final = run_training_data_pipeline(spark, SF_SMOKE, out)
    back = spark.read.parquet(out)
    assert back.count() == final.count() > 0
    # no duplicate texts survive
    assert back.select("text").distinct().count() == back.count()
    # both splits present, complementary, deterministic tag
    splits = dict(back.groupBy("split").count().collect())
    assert set(splits) == {"train", "val"}
    bad = back.filter(
        ((F.col("doc_id") % 100 < 80) & (F.col("split") != "train"))
        | ((F.col("doc_id") % 100 >= 80) & (F.col("split") != "val"))
    )
    assert bad.count() == 0
    # idempotent: re-run overwrites to the identical result
    # (capture before the rewrite — the old DataFrame's file index
    # goes stale once overwrite replaces the files)
    n_before = back.count()
    ids_before = sorted(r.doc_id for r in back.select("doc_id").collect())
    run_training_data_pipeline(spark, SF_SMOKE, out)
    again = spark.read.parquet(out)
    assert again.count() == n_before
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == ids_before


def test_pipeline_resume_skips_completed_stages(spark, monkeypatch):
    """Kill the pipeline after stage 1, re-run with resume=True, and
    observe stage 1 is read back (files untouched), not recomputed —
    the Luigi-marker behavior (round-2 verdict item 6)."""
    import glob
    import os

    import pytest as _pytest

    import piper_spark.pipelines as P

    out = tempfile.mkdtemp(prefix="piper_resume_")
    os.rmdir(out)  # pipeline creates it

    # First run dies mid near-dup (after `clean` committed).
    real_near = P.dedup_near_docs
    monkeypatch.setattr(
        P, "dedup_near_docs", lambda df: (_ for _ in ()).throw(RuntimeError("boom"))
    )
    with _pytest.raises(RuntimeError, match="boom"):
        run_training_data_pipeline(spark, SF_SMOKE, out, resume=True)
    clean_dir = f"{out}_stages/clean"
    assert P.stage_is_complete(spark, clean_dir)
    assert not P.stage_is_complete(spark, f"{out}_stages/near_dedup")
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(f"{clean_dir}/*.parquet")}
    assert mtimes

    # Resumed run completes and does NOT rewrite the committed stage.
    monkeypatch.setattr(P, "dedup_near_docs", real_near)
    final = run_training_data_pipeline(spark, SF_SMOKE, out, resume=True)
    assert {f: os.path.getmtime(f) for f in glob.glob(f"{clean_dir}/*.parquet")} == mtimes
    assert P.stage_is_complete(spark, f"{out}_stages/near_dedup")

    # Resumed result is identical to the single-lazy-plan result.
    plain_out = tempfile.mkdtemp(prefix="piper_plain_")
    run_training_data_pipeline(spark, SF_SMOKE, plain_out)
    a = sorted(r.doc_id for r in spark.read.parquet(out).select("doc_id").collect())
    b = sorted(
        r.doc_id for r in spark.read.parquet(plain_out).select("doc_id").collect()
    )
    assert a == b and final.count() == len(a)


def test_pipeline_monotone_shrinking(spark):
    docs = table(spark, SF_SMOKE, "documents")
    q = quality_filter(docs)
    e = dedup_exact_docs(q)
    n = dedup_near_docs(e)
    c0, c1, c2, c3 = docs.count(), q.count(), e.count(), n.count()
    assert c0 >= c1 >= c2 >= c3 > 0
    s = tag_split(n)
    assert s.count() == c3


def test_video_curate_composes_its_stages(spark):
    from piper_spark import registry

    qs = registry.all_queries()
    out = qs["pipeline_video_curate"](spark, SF_SMOKE).collect()
    kept = {r["doc_id"] for r in out}
    pairs = qs["dedup_video"](spark, SF_SMOKE).collect()
    drops = {p["id2"] for p in pairs}
    assert kept and not (kept & drops)
    for r in out:
        assert r["split"] == ("train" if r["doc_id"] % 100 < 80 else "val")
        assert r["n_sampled_frames"] >= 2


def test_image_curate_drops_planted_perceptual_copies(spark, tmp_path):
    """Non-vacuous drop check: img_phash's own planted copies live at
    +2^40, OUTSIDE the pipeline's with_payload universe, so asserting
    their absence can never fail.  Instead plant byte-identical copies
    INSIDE the universe (higher real doc_ids) — pHash lands them at
    Hamming 0, and the drop stage must remove exactly the higher ids
    while the consistency check ties kept to the pair relation."""
    import duckdb

    from piper_spark import registry

    base = str(tmp_path)
    con = duckdb.connect()
    # Copies of docs 3/6/9 reappear at 490/493/496 (same text ⇒ same
    # payload ⇒ identical pHash), still inside the 0..499 universe.
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SF_SMOKE}/documents.parquet' WHERE doc_id < 490
          UNION ALL
          SELECT doc_id + 487, text, lang, source, n_chars
          FROM '{SF_SMOKE}/documents.parquet' WHERE doc_id IN (3, 6, 9)
        ) TO '{base}/documents.parquet' (FORMAT PARQUET)
        """
    )
    qs = registry.all_queries()
    out = qs["pipeline_image_curate"](spark, base).collect()
    kept = {r["doc_id"] for r in out}
    assert kept
    # The in-universe byte-identical copies MUST be dropped (they are
    # the higher id of a Hamming-0 pair) and their sources kept.
    assert not (kept & {490, 493, 496})
    assert {3, 6, 9} <= kept
    # Full consistency with the pair stage: kept = universe − {id2}.
    pairs = qs["img_phash"](spark, base).collect()
    drops = {p["id2"] for p in pairs}
    from piper_spark.sources.multimodal import with_payload
    from piper_spark.session import table as _table

    payload_universe = {
        r["doc_id"]
        for r in with_payload(_table(spark, base, "documents"))
        .select("doc_id")
        .collect()
    }
    assert kept == payload_universe - drops
    for r in out:
        assert r["split"] == ("train" if r["doc_id"] % 100 < 80 else "val")
