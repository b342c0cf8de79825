"""Property-based spot checks (SURVEY.md §5 strategy #3, hypothesis).

Algebraic invariants that must hold for ANY input, not just the
synthetic tables. Spark round-trips are expensive, so examples are
capped low — the point is shrinking counterexamples, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from piper_spark.functions.dedup import (
    MINHASH_BANDS,
    dedup_jaccard,
    dedup_minhash,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from piper_spark.functions.numeric import dsum
from piper_spark.session import table
from tests.conftest import SF_SMOKE

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


def test_exact_dedup_keeps_one_row_even_on_order_ties(spark):
    # Two rows tied at the minimum order value: exactly one survives,
    # and the tiebreak column makes WHICH one deterministic.
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 5), (3, "a", 9), (4, "b", 1)],
        "id long, k string, o long",
    )
    out = {(r.k, r.id) for r in exact_dedup(df, ["k"], "o", ["id"]).collect()}
    assert out == {("a", 1), ("b", 4)}


def _lsh_hit_prob(s: float, rows: int = 2, bands: int = MINHASH_BANDS) -> float:
    """Theoretical LSH candidate probability for a pair at Jaccard s."""
    return 1.0 - (1.0 - s**rows) ** bands


def test_minhash_recall_vs_shingle_ground_truth(spark):
    """dedup_minhash signs 3-word shingles, so its ground truth is
    shingle-Jaccard (dedup_jaccard_shingle's unit) — measured over the
    FULL smoke corpus, recall must meet the LSH S-curve bound."""
    d = table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.array_distinct(shingles("text")).alias("sh")
    )
    a, b = d.alias("a"), d.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
        / F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    )
    truth = {
        (r.id1, r.id2): r.j
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(jac >= 0.5)
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            jac.alias("j"),
        )
        .collect()
    }
    assert len(truth) >= 10  # the ground truth itself must be non-vacuous
    cands = {(r.id1, r.id2) for r in dedup_minhash(spark, SF_SMOKE).collect()}
    assert cands  # non-vacuous candidate set
    recall = sum(1 for p in truth if p in cands) / len(truth)
    expected = sum(_lsh_hit_prob(s) for s in truth.values()) / len(truth)
    # Deterministic measurement (fixed hashes, fixed data): it must meet
    # the average S-curve probability of the actual pair similarities,
    # less a small slack for the finite pair count.
    assert recall >= expected - 0.1
    assert recall >= _lsh_hit_prob(0.5) - 0.1  # and the s=0.5 floor


def test_wordset_minhash_recall_vs_jaccard_ground_truth(spark):
    """The word-unit signature twin is validated against the word-set
    ground truth (dedup_jaccard) — same token unit on both sides."""
    truth = {
        (r.id1, r.id2): r.jaccard
        for r in dedup_jaccard(spark, SF_SMOKE).collect()
    }
    assert len(truth) >= 100
    docs = table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    sigs = minhash_signatures(docs, unit="word")
    cands = {(r.id1, r.id2) for r in lsh_candidate_pairs(sigs).collect()}
    recall = sum(1 for p in truth if p in cands) / len(truth)
    expected = sum(_lsh_hit_prob(s) for s in truth.values()) / len(truth)
    assert recall >= expected - 0.05
    assert recall >= _lsh_hit_prob(0.5) - 0.05


def test_ann_ivf_recall_vs_exact_topk(spark):
    """The trained-codebook IVF path must find most of the exact top-10
    while probing only 2 of 8 cells."""
    from piper_spark.functions.similarity import sim_ann_ivf, sim_topk

    exact = {r.vec_id for r in sim_topk(spark, SF_SMOKE).collect()}
    approx = {r.vec_id for r in sim_ann_ivf(spark, SF_SMOKE).collect()}
    assert len(approx) == 10
    assert len(exact & approx) / len(exact) >= 0.7


def test_lsh_cosine_finds_every_planted_pair(spark):
    """Sign-LSH near-dup must recover ALL planted ×1.1 twins (cos 1.0):
    the sign bits of a scaled vector match the original's except where
    the quantized dot sits within quantization noise of zero — with 4
    bands (width derived from the corpus size; 16 bits at this SF) at
    least one full band survives for every pair here, and the
    exact-cosine verify reports 1.0 by scale invariance."""
    from piper_spark.functions.lsh import PLANT_MOD, PLANT_OFFSET, dedup_lsh_cosine

    rows = dedup_lsh_cosine(spark, SF_SMOKE).collect()
    planted = {
        (v, v + PLANT_OFFSET)
        for (v,) in table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") % PLANT_MOD == 0)
        .select("vec_id")
        .collect()
    }
    got = {(r.id1, r.id2) for r in rows}
    assert planted, "fixture must plant at least one pair"
    assert got == planted  # full recall, zero false positives at τ=0.95
    assert all(r.cos_sim == 1.0 for r in rows)


def test_ann_lsh_top1_is_planted_twin(spark):
    """The query vector's planted twin shares all its LSH buckets, so
    bucket-pruned search must rank it first with cosine exactly 1.0."""
    from piper_spark.functions.lsh import PLANT_OFFSET, sim_ann_lsh

    rows = sim_ann_lsh(spark, SF_SMOKE).collect()
    assert rows, "candidate buckets must be non-empty"
    assert rows[0].vec_id == PLANT_OFFSET  # twin of vec_id 0
    assert rows[0].cos_sim == 1.0


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 2**32 - 1),
)
@settings(**SETTINGS)
def test_resize_area_matches_bruteforce_weights(h, w, oh, ow, seed):
    """resize_area == the O(out·in) brute-force area-overlap average for
    ANY shape pair (up- or downscale), to float tolerance."""
    import numpy as np

    from piper_spark.sources.multimodal import _area_weights, resize_area

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = resize_area(img, ow, oh)
    wy, wx = _area_weights(h, oh), _area_weights(w, ow)
    brute = np.einsum("oh,hwc,pw->opc", wy, img.astype(np.float64), wx)
    assert out.shape == (oh, ow, 3)
    np.testing.assert_allclose(
        out, np.clip(np.round(brute), 0, 255).astype(np.uint8), atol=1
    )


@given(st.integers(1, 32), st.integers(1, 32), st.integers(0, 2**32 - 1))
@settings(**SETTINGS)
def test_ppm_roundtrip_any_image(h, w, seed):
    import numpy as np

    from piper_spark.sources.multimodal import decode_image, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


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


def test_event_funnel_pathological_user_is_capped_and_exact(spark, tmp_path):
    # One user with more funnel events than FUNNEL_EVENT_CAP: the
    # per-user state must stay bounded (the cap filter drops the tail)
    # and the funnel result must still be exact, because conversion
    # happens inside the first cap-many events. A second user converts
    # only AFTER the cap — the documented bound ignores that tail.
    import pandas as pd

    from piper_spark.functions.sessions import FUNNEL_EVENT_CAP
    from piper_spark.registry import all_queries

    n = FUNNEL_EVENT_CAP + 2000
    base = pd.Timestamp("2024-01-01")
    step = pd.Timedelta(seconds=1)

    def mk_user(uid, convert_early):
        ts = [base + i * step for i in range(n)]
        types = ["view"] * n
        if convert_early:
            types[1], types[2] = "click", "purchase"
        else:  # conversion events land beyond the cap
            types[n - 2], types[n - 1] = "click", "purchase"
        return pd.DataFrame(
            {
                "event_id": [uid * n + i for i in range(n)],
                "ts": ts,
                "user_id": uid,
                "event_type": types,
                "value": 0.0,
                "props": "{}",
            }
        )

    pdf = pd.concat([mk_user(1, True), mk_user(2, False)])
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["step"]: r["users"]
        for r in all_queries()["event_funnel"](spark, str(tmp_path)).collect()
    }
    # Both users view; only user 1 clicks+purchases within the cap.
    assert out == {"step1_view": 2, "step2_click": 1, "step3_purchase": 1}


def test_simhash_banding_is_exact_at_both_widths(spark):
    """Pigeonhole exactness: with 4 bands and a Hamming ≤ 3 cut, EVERY
    qualifying pair leaves ≥ 1 band untouched (4 bands all hit would
    need ≥ 4 flips), so the banded plan's output must equal the
    brute-force Hamming ≤ 3 pair set EXACTLY — recall by pigeonhole,
    precision by the verify filter. Runs at BOTH signature widths, and
    pins the containment: a 128-bit pair is necessarily a 64-bit pair
    because the low half IS the 64-bit signature."""
    from piper_spark.functions.dedup import (
        dedup_simhash,
        dedup_simhash128,
        simhash128_signatures,
        simhash_signatures,
    )

    docs = table(spark, SF_SMOKE, "documents")
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731

    sigs = {r.doc_id: r.sh for r in simhash_signatures(docs).collect()}
    want64 = {
        (i, j)
        for i in sigs
        for j in sigs
        if i < j and ham(sigs[i], sigs[j]) <= 3
    }
    got64 = {(r.id1, r.id2) for r in dedup_simhash(spark, SF_SMOKE).collect()}
    assert got64 == want64
    assert want64, "fixture must contain at least one near-dup pair"

    s128 = {
        r.doc_id: (r.sh_lo, r.sh_hi)
        for r in simhash128_signatures(docs).collect()
    }
    want128 = {
        (i, j)
        for i in s128
        for j in s128
        if i < j
        and ham(s128[i][0], s128[j][0]) + ham(s128[i][1], s128[j][1]) <= 3
    }
    got128 = {
        (r.id1, r.id2) for r in dedup_simhash128(spark, SF_SMOKE).collect()
    }
    assert got128 == want128
    assert want128 <= want64  # low half == 64-bit signature ⇒ containment


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's core guarantee (Schleimer et al. 2003 §2): any match
    of length >= t = W + K - 1 = 6 words yields a shared fingerprint.
    Plant doc pairs sharing exactly a 6-word run inside otherwise-
    disjoint text and require every pair to collide."""
    from piper_spark.functions.text import winnow_fps

    shared_run = "alpha beta gamma delta epsilon zeta"
    rows = []
    for i in range(20):
        left = " ".join(f"l{i}w{j}" for j in range(12))
        right = " ".join(f"r{i}w{j}" for j in range(12))
        rows.append((2 * i, f"{left} {shared_run} x{i}end"))
        rows.append((2 * i + 1, f"y{i}start {shared_run} {right}"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fps(d).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for i in range(20):
        assert by_doc[2 * i] & by_doc[2 * i + 1], f"pair {i} missed"


def test_winnow_density_and_determinism(spark):
    """Fingerprint density ~ 2/(W+1) of grams (paper §3) — loosely
    bounded here — and the selection is a pure function of text."""
    from piper_spark.functions.text import winnow_fps
    from piper_spark.session import table

    d = table(spark, SF_SMOKE, "documents")
    fps1 = sorted((r.doc_id, r.fp) for r in winnow_fps(d).collect())
    fps2 = sorted(
        (r.doc_id, r.fp) for r in winnow_fps(d.repartition(7)).collect()
    )
    assert fps1 == fps2  # partitioning-invariant
    n_docs = d.count()
    per_doc = len(set(fps1)) / n_docs
    # ~50-word docs -> ~48 grams -> ~19 expected selections, minus
    # cross-window dedup; require a sane band.
    assert 3 <= per_doc <= 40


def test_dedup_winnow_recall_vs_shingle_ground_truth(spark):
    """dedup_winnow must FIND every strong shingle-Jaccard pair the
    exact O(n²) ground truth knows about (winnowing's run-sharing
    guarantee makes high-overlap misses structurally impossible), and
    its own verify stage pins precision: every emitted jaccard >= 0.5."""
    from piper_spark.functions.dedup import (
        dedup_jaccard_shingle,
        dedup_winnow,
    )

    truth = {
        (r.id1, r.id2)
        for r in dedup_jaccard_shingle(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.9
    }
    assert truth, "smoke corpus should contain strong near-dup pairs"
    got = dedup_winnow(spark, SF_SMOKE).collect()
    pairs = {(r.id1, r.id2) for r in got}
    missed = truth - pairs
    assert not missed, f"winnow missed strong pairs: {sorted(missed)[:5]}"
    assert all(r.jaccard >= 0.5 for r in got)


def test_lm_score_ranks_formulaic_text_above_shuffled(spark):
    """A corpus of one repeated formulaic sentence + one scrambled doc:
    the formulaic docs hit max conditional probability (every bigram
    deterministic -> score ~ 1e6), the scrambled doc scores lower."""
    from piper_spark.functions.text import text_lm_score

    base = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, base) for i in range(30)]
    rows.append((99, "dog the over quick lazy jumps fox again brown the"))
    d = spark.createDataFrame(rows, "doc_id long, text string")

    import piper_spark.functions.text as T
    from unittest import mock

    with mock.patch.object(T, "table", lambda s, sf, name: d):
        out = {r.doc_id: r.lm_score for r in text_lm_score(spark, "_").collect()}
    assert out[0] > out[99]
    assert all(out[i] == out[0] for i in range(30))


def test_audio_fingerprint_matches_python_reference(spark):
    """fp bits are exactly 'energy rose between consecutive 4-sample
    micro-frames', little-endian packed — checked against an
    independent pure-Python PCM decode on synthetic docs."""
    import piper_spark.sources.multimodal as M

    rows = [(1, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH"),
            (2, "zzzzaaaazzzzaaaazzzzaaaazzzzaaaazzzzaaaazzzz")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    from unittest import mock

    with mock.patch.object(M, "table", lambda s, sf, name: d):
        got = {r.doc_id: (r.n_bits, r.fp)
               for r in M._audio_fp_rel(spark, "_").collect()}
    for doc_id, text in rows:
        raw = text.encode()
        samples = [raw[2 * i] + 256 * raw[2 * i + 1]
                   for i in range(len(raw) // 2)]
        frames = [sum(s * s for s in samples[4 * f : 4 * f + 4])
                  for f in range(len(samples) // 4)]
        bits = [1 if frames[i + 1] > frames[i] else 0
                for i in range(min(len(frames) - 1, 32))]
        fp = sum(b << i for i, b in enumerate(bits))
        assert got[doc_id] == (len(bits), fp), doc_id


def test_dedup_audio_pairs_are_true_payload_near_dups(spark):
    """Every emitted audio near-dup pair is a genuine text-payload
    near-dup (word-shingle Jaccard >= 0.5), and every exact text dup
    long enough to carry a full band appears with hamming 0."""
    from piper_spark.session import table
    from piper_spark.sources.multimodal import dedup_audio

    got = dedup_audio(spark, SF_SMOKE).collect()
    assert got, "smoke corpus should contain audio near-dup pairs"
    docs = {
        r.doc_id: r.text
        for r in table(spark, SF_SMOKE, "documents").collect()
    }

    def sh(t):
        w = t.split(" ")
        return {tuple(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    for r in got:
        a, b = sh(docs[r.id1]), sh(docs[r.id2])
        j = len(a & b) / len(a | b)
        assert j >= 0.5, (r.id1, r.id2, j)

    # exact dups: same text => same fp; require the pair when long enough
    ham0 = {(r.id1, r.id2) for r in got if r.hamming == 0}
    by_text: dict[str, list[int]] = {}
    for i, t in docs.items():
        by_text.setdefault(t, []).append(i)
    n_bits_ok = lambda t: (len(t.encode()) // 2) // 4 - 1 > 16  # noqa: E731
    for t, ids in by_text.items():
        if len(ids) >= 2 and n_bits_ok(t):
            ids = sorted(ids)
            assert (ids[0], ids[1]) in ham0, ids


def test_dedup_substring_finds_exact_run_length(spark):
    """Plant pairs sharing EXACTLY a 10-word verbatim run inside
    otherwise-disjoint text: dedup_substring must report
    max_shared_words == 10 for each, and a 9-word-run pair (below the
    SUBSTR_MIN_RUN + 2 threshold) must be absent."""
    import piper_spark.functions.dedup as D
    from unittest import mock

    run10 = " ".join(f"shared{j}" for j in range(10))
    run9 = " ".join(f"nine{j}" for j in range(9))
    rows = []
    for i in range(5):
        left = " ".join(f"l{i}w{j}" for j in range(15))
        right = " ".join(f"r{i}w{j}" for j in range(15))
        rows.append((2 * i, f"{left} {run10} l{i}tail"))
        rows.append((2 * i + 1, f"r{i}head {run10} {right}"))
    rows.append((100, f"{'x '.join(f'a{j}' for j in range(12))} {run9} atail"))
    rows.append((101, f"bhead {run9} {' '.join(f'b{j}' for j in range(12))}"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch.object(D, "table", lambda s, sf, name: d):
        got = {(r.id1, r.id2): r.max_shared_words
               for r in D.dedup_substring(spark, "_").collect()}
    for i in range(5):
        assert got.get((2 * i, 2 * i + 1)) == 10, got
    assert (100, 101) not in got


def test_text_boilerplate_removes_exactly_the_repeated_gram(spark):
    """A 5-gram planted verbatim in BOILER_DF docs is removed from all
    of them (those 5 word positions only); a 5-gram in BOILER_DF - 1
    docs survives untouched."""
    import piper_spark.functions.text as T
    from unittest import mock

    boiler = "alpha beta gamma delta epsilon"
    rare = "one two three four five"
    rows = []
    for i in range(3):  # BOILER_DF = 3
        uniq = " ".join(f"u{i}w{j}" for j in range(8))
        rows.append((i, f"{uniq} {boiler} t{i}end"))
    for i in range(2):  # below threshold
        uniq = " ".join(f"v{i}w{j}" for j in range(8))
        rows.append((10 + i, f"{uniq} {rare} s{i}end"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch.object(T, "table", lambda s, sf, name: d):
        out = {r.doc_id: r for r in T.text_boilerplate(spark, "_").collect()}
    for i in range(3):
        r = out[i]
        assert r.n_boiler_words == 5, r
        uniq = " ".join(f"u{i}w{j}" for j in range(8))
        assert r.cleaned == f"{uniq} t{i}end", r.cleaned
    for i in range(2):
        r = out[10 + i]
        assert r.n_boiler_words == 0 and rare in r.cleaned, r


def test_sample_temperature_flattens_language_mix(spark):
    """Temperature resampling must DOWN-weight the dominant language
    and keep rates within (0, 1]; the realized sample must land near
    the target volume and be a deterministic function of doc_id."""
    from piper_spark.operators.sampling import sample_temperature

    rows = {r.lang: r for r in sample_temperature(spark, SF_SMOKE).collect()}
    big = max(rows.values(), key=lambda r: r.n_docs)
    small = min(rows.values(), key=lambda r: r.n_docs)
    assert big.rate < small.rate  # flattening
    assert all(0 < r.rate <= 1 for r in rows.values())
    total = sum(r.n_docs for r in rows.values())
    kept = sum(r.n_kept for r in rows.values())
    assert abs(kept - 0.5 * total) / total < 0.1  # near the target frac
    again = {r.lang: r.n_kept for r in sample_temperature(spark, SF_SMOKE).collect()}
    assert again == {k: r.n_kept for k, r in rows.items()}  # deterministic


def test_sample_unimax_waterfills_the_budget(spark):
    """UNIMAX invariants on the real corpus: every language keeps
    min(its cap, the uniform level) — capped languages keep ALL their
    docs, uncapped ones share one common level; total kept never
    exceeds the ⌊4/5⌋ budget and undershoots it by less than one doc
    per language (floor-division remainders); the realization keeps
    exactly target_kept docs and is deterministic."""
    from piper_spark.operators.sampling import sample_unimax

    rows = {r.lang: r for r in sample_unimax(spark, SF_SMOKE).collect()}
    total = sum(r.n_docs for r in rows.values())
    budget = total * 4 // 5
    kept = sum(r.n_kept for r in rows.values())
    assert kept <= budget
    assert budget - kept < len(rows)  # only floor remainders dropped
    levels = set()
    for r in rows.values():
        assert r.n_kept == r.target_kept  # rank rule realizes exactly
        if r.capped:
            assert r.target_kept == r.n_docs  # full epoch of tail langs
        else:
            levels.add(r.target_kept)
    assert len(levels) <= 1  # one uniform waterfill level
    if levels:
        (u,) = levels
        assert all(r.n_docs >= u for r in rows.values() if not r.capped)
        # every capped language's cap fits under the level it skipped
        assert all(r.n_docs <= u for r in rows.values() if r.capped)
    again = {r.lang: r.n_kept for r in sample_unimax(spark, SF_SMOKE).collect()}
    assert again == {k: r.n_kept for k, r in rows.items()}


def test_sample_unimax_underspent_budget_caps_everything(spark):
    """When the budget exceeds the sum of caps, every language is
    capped at one full epoch and the waterfill level never triggers
    (the rstar-is-null branch)."""
    from unittest import mock

    from piper_spark.operators import sampling as S

    # 3 langs, 12 docs; budget = 12*4//5 = 9 < 12 — waterfill binds.
    # To exercise the null branch we need budget >= total caps, which
    # the 4/5 fraction never gives at EPOCHS=1 — so shrink the corpus
    # seen by the budget: patch UNIMAX_BUDGET_NUM/DEN to 3/2 (> 1).
    rows = [(i, "aa" if i % 3 == 0 else ("bb" if i % 3 == 1 else "cc"))
            for i in range(12)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    with mock.patch.object(S, "table", lambda s, sf, name: d), \
         mock.patch.object(S, "UNIMAX_BUDGET_NUM", 3), \
         mock.patch.object(S, "UNIMAX_BUDGET_DEN", 2):
        out = {r.lang: r for r in S.sample_unimax(spark, "_").collect()}
    assert all(r.capped == 1 and r.n_kept == r.n_docs for r in out.values())


def test_ccnet_buckets_are_balanced_terciles(spark):
    """Bucket sizes are within one tie-group of n/3 each, and bucket
    ordering respects the score ordering (every head score >= every
    middle score >= every tail score)."""
    from piper_spark.functions.text import text_ccnet_buckets

    rows = text_ccnet_buckets(spark, SF_SMOKE).collect()
    by = {}
    for r in rows:
        by.setdefault(r.bucket, []).append(r.lm_score)
    n = len(rows)
    assert set(by) == {"head", "middle", "tail"}
    for b in by.values():
        assert abs(len(b) - n / 3) <= n * 0.1  # ties can skew slightly
    assert min(by["head"]) >= max(by["middle"])
    assert min(by["middle"]) >= max(by["tail"])


def test_pipeline_near_dedup_keeps_one_doc_per_cluster(spark):
    """Every cluster keeps EXACTLY its min doc_id; every dedup_winnow
    pair ends up in one cluster; total kept + dropped = corpus size."""
    from piper_spark.functions.dedup import dedup_winnow, pipeline_near_dedup
    from piper_spark.session import table

    rows = pipeline_near_dedup(spark, SF_SMOKE).collect()
    n_docs = table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    comp = {r.doc_id: r.component for r in rows}
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for c, members in by_comp.items():
        assert c == min(m.doc_id for m in members)
        kept = [m for m in members if m.kept == 1]
        assert len(kept) == 1 and kept[0].doc_id == c
    for p in dedup_winnow(spark, SF_SMOKE).collect():
        assert comp[p.id1] == comp[p.id2], (p.id1, p.id2)


def test_substring_clean_removes_planted_runs_one_sided(spark):
    """A 12-word run planted into three documents must survive ONLY in
    the lowest doc_id holder; unrelated text is untouched; documents
    without shared runs pass through byte-identical."""
    from piper_spark.functions.text import substring_clean_rel

    run = " ".join(f"r{j}" for j in range(12))
    rows = []
    for i in range(3):
        uniq = " ".join(f"u{i}w{j}" for j in range(6))
        rows.append((i * 10, f"{uniq} {run} t{i}end"))
    rows.append((99, "plain doc with no shared material at all"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in substring_clean_rel(d).collect()}
    assert len(out) == 4
    assert run in out[0].cleaned and out[0].n_removed_words == 0
    for i in (10, 20):
        assert run not in out[i].cleaned, out[i].cleaned
        assert out[i].n_removed_words == 12
        # the unique prefix and suffix survive the strip
        assert out[i].cleaned.startswith(f"u{i // 10}w0")
        assert out[i].cleaned.endswith(f"t{i // 10}end")
    assert out[99].cleaned == "plain doc with no shared material at all"
    assert out[99].n_removed_words == 0


def test_substring_clean_is_idempotent_on_corpus(spark):
    """Running the transform on its own output removes nothing more —
    after the one-sided strip, each formerly-shared run has a single
    holder, so the pair relation over the cleaned corpus is empty of
    ≥ 10-word runs (fixed point on the real fixture)."""
    from piper_spark.functions.text import substring_clean_rel
    from piper_spark.session import table

    d = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    once = substring_clean_rel(d).persist()
    assert once.filter("n_removed_words > 0").count() > 0  # non-trivial
    cleaned = once.select("doc_id", F.col("cleaned").alias("text"))
    twice = substring_clean_rel(cleaned)
    assert twice.filter("n_removed_words > 0").count() == 0


def test_boilerplate_lines_removes_whole_repeated_lines(spark):
    """A planted 8-word line shared by three docs is dropped WHOLE from
    each; a line shared by only two docs survives; surrounding lines
    are untouched (aligned-chunk line semantics)."""
    from unittest import mock

    from piper_spark.functions import text as T

    boiler = " ".join(f"b{j}" for j in range(T.LINE_WORDS))
    rare = " ".join(f"r{j}" for j in range(T.LINE_WORDS))
    rows = []
    for i in range(3):
        head = " ".join(f"u{i}w{j}" for j in range(T.LINE_WORDS))
        rows.append((i, f"{head} {boiler} tail{i}"))
    for i in range(2):
        head = " ".join(f"v{i}w{j}" for j in range(T.LINE_WORDS))
        rows.append((10 + i, f"{head} {rare} s{i}"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch.object(T, "table", lambda s, sf, name: d):
        out = {r.doc_id: r for r in T.text_boilerplate_lines(spark, "_").collect()}
    for i in range(3):
        r = out[i]
        assert r.n_lines == 3 and r.n_removed_lines == 1, r
        head = " ".join(f"u{i}w{j}" for j in range(T.LINE_WORDS))
        assert r.cleaned == f"{head} tail{i}", r.cleaned
    for i in range(2):
        r = out[10 + i]
        assert r.n_removed_lines == 0 and rare in r.cleaned, r


def test_dedup_video_pairs_are_true_near_dups(spark):
    """Every emitted video near-dup pair must be a true text-payload
    near-duplicate (shingle-Jaccard >= 0.9) — the banded frame-hash
    path finds real dups, not 24-bit band coincidences — and the pair
    set must be non-empty on the fixture."""
    from piper_spark.functions.dedup import shingles
    from piper_spark.sources.multimodal import dedup_video

    pairs = [(r.id1, r.id2) for r in dedup_video(spark, SF_SMOKE).collect()]
    assert pairs
    d = table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.array_distinct(shingles("text")).alias("sh")
    )
    sh = {r.doc_id: set(r.sh) for r in d.collect()}
    for i, j in pairs:
        jac = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
        assert jac >= 0.9, (i, j, jac)


def test_dedup_video_recovers_planted_perturbed_clips(spark):
    """Planted near-dup clips — same opening frame, one luminance bump
    in a later frame — must ALL be recovered: the band (opening-frame
    hash) is untouched by the edit, and a single +1 byte bump moves
    the aligned-frame Hamming by at most a few near-threshold bits,
    far under the <= 4 gate. A clip rewritten from its first byte must
    NOT pair with its original (different opening frame — the
    documented miss class of opening-band geometry)."""
    from unittest import mock

    from piper_spark.sources import multimodal as M

    base = "".join("abcdefgh"[(i * 7 + i // 9) % 8] for i in range(6 * 72))
    rows = [(0, base)]
    # 5 planted perturbed copies: bump one byte in sampled frame s >= 1
    for k in range(1, 6):
        pos = 144 * k // 2 + 10 + k  # inside a later frame
        pert = base[:pos] + chr(ord(base[pos]) + 1) + base[pos + 1 :]
        rows.append((k, pert))
    # a fully different opening: replace the first frame's bytes
    rows.append((50, "zzzz" * 18 + base[72:]))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    from piper_spark import session as S

    with mock.patch.object(M, "table", lambda s, sf, name: d), \
         mock.patch.object(S, "row_count", lambda s, sf, name: len(rows)):
        got = {
            (r.id1, r.id2): r.hamming
            for r in M.dedup_video(spark, "_").collect()
        }
    for k in range(1, 6):
        assert (0, k) in got, (k, sorted(got))
        assert got[(0, k)] <= M.VIDEO_FP_MAX_HAM
    assert not any(50 in p for p in got), got


def test_ccnet_approx_buckets_drift_is_banded(spark):
    """The approx_percentile swap (the documented 100 TB path) must
    relabel only a banded fraction of documents vs the exact terciles:
    at the default accuracy the sketch's rank error is <= n/accuracy,
    so on any corpus where n << accuracy the buckets must match
    EXACTLY; at a deliberately coarse accuracy the drift stays under
    the rank-error bound n_relabel <= 2 * ceil(n / accuracy) + ties."""
    from piper_spark.functions.text import ccnet_buckets_rel, text_lm_score

    scored = text_lm_score(spark, SF_SMOKE).persist()
    exact = {r.doc_id: r.bucket for r in ccnet_buckets_rel(scored).collect()}
    n = len(exact)
    approx = {
        r.doc_id: r.bucket
        for r in ccnet_buckets_rel(scored, approx=True).collect()
    }
    # n=500 << accuracy=10000 removes SKETCH error entirely, but one
    # systematic difference remains: approx_percentile returns an order
    # STATISTIC while percentile INTERPOLATES between the two straddling
    # values — so only docs whose score falls strictly between them can
    # relabel: at most one tie-group per cut.
    small_drift = sum(1 for k in exact if approx[k] != exact[k]) / n
    assert small_drift <= 2 / n * 2, small_drift
    coarse = {
        r.doc_id: r.bucket
        for r in ccnet_buckets_rel(scored, approx=True, accuracy=50).collect()
    }
    drift = sum(1 for k in exact if coarse[k] != exact[k]) / n
    # two cuts, each off by <= n/accuracy ranks, plus tie-groups at the
    # displaced cuts; 20% is a loose ceiling for accuracy=50 (rank
    # error n/50 = 2% per cut before ties).
    assert drift <= 0.2, drift


def test_near_incremental_matches_winnow_across_the_split(spark):
    """The incremental op must report EXACTLY dedup_winnow's verified
    pairs that straddle the batch/corpus split (in batch→corpus
    orientation), and nothing else: same candidate guarantee, same
    Jaccard gate, evaluated against the index instead of a self-join."""
    from piper_spark.functions.dedup import (
        NEAR_INCR_BATCH_MOD,
        NEAR_INCR_BATCH_RESIDUE,
        dedup_near_incremental,
        dedup_winnow,
    )

    def is_batch(i):
        return i % NEAR_INCR_BATCH_MOD == NEAR_INCR_BATCH_RESIDUE

    winnow = {
        (r.id1, r.id2) for r in dedup_winnow(spark, SF_SMOKE).collect()
    }
    straddle = {
        (a, b) if is_batch(a) else (b, a)
        for a, b in winnow
        if is_batch(a) != is_batch(b)
    }
    got = {
        (r.batch_id, r.corpus_id)
        for r in dedup_near_incremental(spark, SF_SMOKE).collect()
    }
    assert got == straddle
    assert got, "fixture must produce at least one straddling pair"


def test_text_normalize_is_idempotent_and_canonical(spark):
    """Normalized text is a fixed point of the normalization rules
    (lowercase, single-space, alphanumeric+space alphabet, trimmed) —
    the property exact-dedup-after-normalization relies on."""
    import re

    from piper_spark.functions.text import text_normalize

    rows = text_normalize(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n = r.normalized
        assert n == n.lower()
        assert "  " not in n and n == n.strip()
        assert re.fullmatch(r"[a-z0-9 ]*", n), n[:80]
        assert len(n) == r.n_chars_norm and r.n_chars_raw >= r.n_chars_norm


def test_dedup_video_derived_band_widens_with_corpus_size(spark):
    """The band-frame derivation mirrors derived_band_bits (k=1 to ~2M
    docs, 2 past it, 3 at the 63-bit clamp), and the k=2 path works
    end-to-end: with the corpus count mocked past the threshold, the
    band covers the first TWO sampled frames, so a perturbation beyond
    them still pairs while one INSIDE the widened band correctly
    misses (the opening-band geometry, now two frames wide)."""
    from unittest import mock

    from piper_spark import session as S
    from piper_spark.sources import multimodal as M

    assert M.video_band_frames(2_000_000) == 1
    assert M.video_band_frames(3_000_000) == 2
    assert M.video_band_frames(10**12) == 2
    assert M.video_band_frames(2**60) == 3

    base = "".join("abcdefgh"[(i * 7 + i // 9) % 8] for i in range(6 * 72))
    pert_tail = base[:300] + chr(ord(base[300]) + 1) + base[301:]  # frame 4
    pert_band = base[:150] + chr(ord(base[150]) + 1) + base[151:]  # frame 2
    rows = [(0, base), (1, pert_tail), (2, pert_band)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch.object(M, "table", lambda s, sf, name: d), \
         mock.patch.object(S, "row_count", lambda s, sf, name: 3_000_000):
        got = {(r.id1, r.id2) for r in M.dedup_video(spark, "_").collect()}
    assert (0, 1) in got
    # (0, 2) may appear ONLY if the +1 luminance bump left frame 2's
    # hash bits unchanged (no pixel sat on the mean threshold); if the
    # hash moved, the two-frame band must miss it. Either way the
    # tail-perturbed pair above is banded by construction.
    if (0, 2) not in got:
        with mock.patch.object(M, "table", lambda s, sf, name: d), \
             mock.patch.object(S, "row_count", lambda s, sf, name: 3):
            one = {(r.id1, r.id2) for r in M.dedup_video(spark, "_").collect()}
        assert (0, 2) in one  # k=1 band (frame 0 only) does find it


def test_quality_mix_respects_bucket_rates(spark):
    """Per-bucket kept fractions must sit near the configured tenths
    (exactly-deterministic counts; the tolerance covers residue-stream
    granularity at n/3 docs per bucket), and head keeps everything."""
    from piper_spark.functions.text import QMIX_TENTHS, sample_quality_mix

    rows = {r.bucket: r for r in sample_quality_mix(spark, SF_SMOKE).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    assert rows["head"].n_kept == rows["head"].n_docs  # rate 10/10
    for b in ("middle", "tail"):
        frac = rows[b].n_kept / rows[b].n_docs
        assert abs(frac - QMIX_TENTHS[b] / 10) < 0.12, (b, frac)
    again = {
        r.bucket: r.n_kept for r in sample_quality_mix(spark, SF_SMOKE).collect()
    }
    assert again == {b: r.n_kept for b, r in rows.items()}


def test_self_repeat_detects_planted_loops(spark):
    """A document that repeats an 8-word phrase must report a >= 8-word
    self-repeat; a no-repeat document reports 0; the pathological
    one-word page is occurrence-capped, not quadratically joined (it
    still reports a repeat — through the surviving distinct grams —
    but the op completes instantly)."""
    from unittest import mock

    from piper_spark.functions import text as T

    phrase = " ".join(f"p{j}" for j in range(8))
    uniq = " ".join(f"u{j}" for j in range(12))
    rows = [
        (0, f"{uniq} {phrase} mid {phrase} end"),
        (1, "all words here are completely distinct tokens"),
        (2, " ".join(["loop"] * 200)),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch.object(T, "table", lambda s, sf, name: d):
        out = {r.doc_id: r for r in T.text_self_repeat(spark, "_").collect()}
    assert out[0].max_repeat_words >= 8
    assert out[1].max_repeat_words == 0 and out[1].n_repeat_sites == 0
    # 200×"loop" has one gram at 198 occurrences — capped out, so 0.
    assert out[2].max_repeat_words == 0


def test_embed_cov_matches_numpy_exactly(spark):
    """The Arrow Gram-partial path must equal a single-process numpy
    covariance of the SAME quantized values bit-for-bit — partials are
    exact int64, so no partitioning/batching may change any value."""
    import numpy as np

    from piper_spark.functions.similarity import COV_SCALE, embed_cov

    rows = table(spark, SF_SMOKE, "embeddings").orderBy("vec_id").collect()
    E = np.array([r.embedding for r in rows], dtype=np.float64)
    V = np.floor(E * COV_SCALE + 0.5).astype(np.int64)
    n = len(V)
    G, s = V.T @ V, V.sum(axis=0)
    C = (G / n - np.outer(s / n, s / n)) / (COV_SCALE * COV_SCALE)
    iu = np.triu_indices(V.shape[1])
    want = {
        (int(i), int(j)): round(float(C[i, j]), 9)
        for i, j in zip(iu[0], iu[1])
    }
    got = {
        (r.dim_i, r.dim_j): r.cov for r in embed_cov(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_embed_pca_matches_numpy_and_is_orthonormal(spark):
    """The driver-side eigh model must (a) project every vector exactly
    as the same numpy pipeline does, (b) use orthonormal components,
    (c) order components by DESCENDING explained variance, and (d) fix
    signs deterministically (largest-|coordinate| positive)."""
    import numpy as np

    from piper_spark.functions.similarity import COV_SCALE, PCA_K, embed_pca

    rows = table(spark, SF_SMOKE, "embeddings").orderBy("vec_id").collect()
    E = np.array([r.embedding for r in rows], dtype=np.float64)
    V = np.floor(E * COV_SCALE + 0.5).astype(np.int64)
    n = len(V)
    G, s = V.T @ V, V.sum(axis=0)
    # mirror the operator's model build EXACTLY (same float ops)
    d = V.shape[1]
    C2 = np.zeros((d, d))
    mean = np.zeros(d)
    iu = np.triu_indices(d)
    for i, j in zip(iu[0], iu[1]):
        cov = (G[i, j] / n - (s[i] / n) * (s[j] / n)) / (COV_SCALE * COV_SCALE)
        C2[i, j] = C2[j, i] = cov
        if i == j:
            mean[i] = s[i] / n / COV_SCALE
    vals, vecs = np.linalg.eigh(C2)
    W = []
    for k in range(1, PCA_K + 1):
        w = vecs[:, -k]
        if w[int(np.argmax(np.abs(w)))] < 0:
            w = -w
        W.append(w)
    W = np.stack(W)
    # (b) orthonormal; (c) descending variance
    assert np.allclose(W @ W.T, np.eye(PCA_K), atol=1e-10)
    ev = vals[::-1][:PCA_K]
    assert all(ev[k] >= ev[k + 1] - 1e-12 for k in range(PCA_K - 1))
    # (a) exact projection parity. NOT a BLAS matmul here: Spark's
    # aggregate() is a strict left-to-right fold of (e_i − m_i)·w_i
    # starting at 0.0, while dgemm reorders/FMAs — replicate the fold
    # op-for-op so the bit-exact assertion is an invariant, not a
    # BLAS-implementation coincidence.
    want = np.zeros((len(E), PCA_K))
    for c in range(PCA_K):
        acc = np.zeros(len(E))
        for i in range(d):
            acc = acc + (E[:, i] - mean[i]) * W[c][i]
        want[:, c] = acc
    want = np.round(want, 6)
    got = embed_pca(spark, SF_SMOKE).orderBy("vec_id").collect()
    have = np.array([[getattr(r, f"pc{c + 1}") for c in range(PCA_K)] for r in got])
    assert np.array_equal(have, want)


def test_dedup_containment_catches_the_low_jaccard_inclusion(spark):
    """A short doc pasted verbatim into a much longer one: containment
    = 1.0 (every shingle of the small doc is in the big one) while
    whole-doc Jaccard is LOW — the pair class the Jaccard family
    deliberately misses and this operator exists for. A half-contained
    doc under the 0.8 gate must NOT pair."""
    from unittest import mock

    from piper_spark.functions import dedup as D

    quote = " ".join(f"q{i}" for i in range(30))
    host = " ".join(f"h{i}" for i in range(300)) + " " + quote
    half = " ".join(f"q{i}" for i in range(15)) + " " + " ".join(
        f"z{i}" for i in range(15)
    )
    d = spark.createDataFrame(
        [(1, quote), (2, host), (3, half)], "doc_id long, text string"
    )
    with mock.patch.object(D, "table", lambda s, sf, name: d):
        got = {
            (r.id1, r.id2): r.containment
            for r in D.dedup_containment(spark, "_").collect()
        }
    assert got.get((1, 2)) == 1.0, got
    # Jaccard of the same pair is well under the 0.5 near-dup gate
    sh_q, sh_h = 28, 328  # distinct 3-shingles: n_words - 2
    assert sh_q / sh_h < 0.5
    assert (1, 3) not in got and (2, 3) not in got, got


def test_dq_outliers_is_robust_to_the_outliers_themselves(spark):
    """MAD-gate robustness: a planted extreme value must be flagged,
    and planting it must NOT change the median/MAD enough to flag a
    previously-normal value (the failure mode of mean/stddev z-scores,
    where one 1e9 row widens the gate and masks real outliers)."""
    from unittest import mock

    from piper_spark import pipelines as P

    base = [
        (i, "t", float(100 + (i % 21) - 10)) for i in range(200)
    ]  # values 90..110, median 100
    extreme = [(900, "t", 1e9), (901, "t", 150.0)]
    d = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", 1, t, v, "{}") for i, t, v in base + extreme],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with mock.patch.object(P, "table", lambda s, sf, name: d):
        got = {r.event_id: r.robust_z for r in P.dq_outliers(spark, "_").collect()}
    assert 900 in got and got[900] > 1000  # the extreme is flagged hard
    assert 901 in got and got[901] > 3  # a real moderate outlier too
    assert all(i not in got for i in range(200)), sorted(got)  # none normal


def test_event_cooccur_lift_separates_attraction_from_repulsion(spark):
    """Synthetic baskets where A and B ALWAYS co-occur and C never
    joins them: lift(A,B) must exceed 1 (attraction), A-C/B-C must not
    pair at all, and support must be the exact basket fraction."""
    from unittest import mock

    from piper_spark.functions import sessions as S

    rows = []
    eid = 0
    for u in range(10):  # 10 users x 1 day each: 20 baskets total
        for t in ("A", "B"):
            rows.append((eid, f"2024-01-0{1 + u % 9} 10:00:00", u, t)); eid += 1
        rows.append((eid, f"2024-01-0{1 + u % 9} 11:00:00", u + 100, "C")); eid += 1
    d = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with mock.patch.object(S, "table", lambda s, sf, name: d):
        got = {
            (r.type_a, r.type_b): r for r in S.event_cooccur(spark, "_").collect()
        }
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert r.both_cnt == 10 and r.support == 0.5  # 10 of 20 baskets
    # lift = (10 * 20) / (10 * 10) = 2.0: A and B attract
    assert r.lift == 2.0


def test_text_bpe_pairs_counts_are_freq_weighted_and_tiebroken(spark):
    """Pair counts must be exact word-freq-weighted adjacent-symbol
    counts (the Sennrich BPE statistic), single-char words contribute
    nothing, and equal counts tiebreak lexicographically."""
    from unittest import mock

    from piper_spark.functions import text as T

    d = spark.createDataFrame(
        [
            (0, "abc abc x"),   # abc twice here +1 below = freq 3
            (1, "abc zz zz"),   # zz freq 2
            (2, "x y z"),       # single chars: no pairs
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(T, "table", lambda s, sf, name: d):
        got = [(r.pair, r.pair_count) for r in T.text_bpe_pairs(spark, "_").collect()]
    # abc freq 3 -> ab:3, bc:3; zz freq 2 -> zz:2
    assert got == [("ab", 3), ("bc", 3), ("zz", 2)]


def test_scd2_intervals_chain_and_current_flag(spark):
    """SCD2 invariants: per key the intervals CHAIN (each valid_to is
    the next valid_from), exactly ONE row is current (null valid_to),
    and a same-grain double-change resolves to the highest version key
    (deterministic CDC dedup)."""
    import datetime
    from unittest import mock

    from piper_spark.operators import joins as J

    d1, d2, d3 = (datetime.date(2024, 1, i) for i in (1, 5, 9))
    rows = [
        (100, 7, d1, "A", 1.0, "x", 0, "c", "n"),
        (101, 7, d2, "B", 1.0, "x", 0, "c", "n"),
        (102, 7, d2, "C", 1.0, "x", 0, "c", "n"),  # same grain, higher key wins
        (103, 7, d3, "D", 1.0, "x", 0, "c", "n"),
    ]
    d = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string, o_shippriority int, "
        "o_clerk string, o_comment string",
    )
    with mock.patch.object(J, "table", lambda s, sf, name: d):
        got = sorted(
            J.scd2_intervals(spark, "_").collect(), key=lambda r: r.valid_from
        )
    assert [r.status for r in got] == ["A", "C", "D"]  # 102 beat 101
    assert [r.valid_to for r in got] == [d2, d3, None]  # chained
    assert [r.is_current for r in got] == [0, 0, 1]


def test_pipeline_embed_curate_drops_twins_keeps_base(spark):
    """The embedding curation spine must drop every derived near-dup
    twin (cos exactly 1.0 with its base, always the higher id) and keep
    every base vector (the corpus has no natural cos >= 0.95 pairs),
    with the exact modulo split on the survivors."""
    from piper_spark.functions.lsh import PLANT_OFFSET
    from piper_spark.pipelines import pipeline_embed_curate
    from piper_spark.session import table

    base_ids = {
        r.vec_id for r in table(spark, SF_SMOKE, "embeddings").collect()
    }
    got = pipeline_embed_curate(spark, SF_SMOKE).collect()
    surv = {r.vec_id for r in got}
    assert surv == base_ids  # every base kept, every twin dropped
    assert not any(v >= PLANT_OFFSET for v in surv)
    assert all(
        (r.split == "train") == (r.vec_id % 100 < 80) for r in got
    )


def test_join_asof_nearest_direction_ties_and_fallbacks(spark):
    """Nearest-in-time semantics, pinned case by case: closer-backward,
    exact tie (backward wins), closer-forward, no-signup-before
    (forward fallback), no-signup-after (backward fallback)."""
    from unittest import mock

    from piper_spark.operators import asof as A

    def ev(eid, sec, typ, uid=1):
        return (eid, f"2024-01-01 00:00:{sec:02d}", uid, typ, 1.0, "{}")

    rows = [
        ev(100, 10, "signup"), ev(200, 20, "signup"),
        ev(1, 5, "click"),    # before any signup -> forward to the 10s one
        ev(2, 14, "click"),   # 4s back vs 6s fwd -> backward (10)
        ev(3, 15, "click"),   # exact tie -> backward (10)
        ev(4, 16, "click"),   # 6s back vs 4s fwd -> forward (20)
        ev(5, 25, "click"),   # after all signups -> backward (20)
    ]
    d = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with mock.patch.object(A, "table", lambda s, sf, name: d):
        got = {
            r.event_id: r.r_event_id
            for r in A.join_asof_nearest(spark, "_").collect()
        }
    assert got == {1: 100, 2: 100, 3: 100, 4: 200, 5: 200}


def test_event_paths_counts_exact_trigrams(spark):
    """Known timeline -> exact sliding trigram counts, with the
    (ts, event_id) tiebreak making simultaneous events deterministic."""
    from unittest import mock

    from piper_spark.functions import sessions as S

    seq = ["A", "B", "C", "A", "B", "C"]  # trigrams: ABC BCA CAB ABC
    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    # a second user with two SIMULTANEOUS events: event_id breaks the tie
    rows += [
        (10, "2024-01-01 00:00:00", 2, "X", 1.0, "{}"),
        (11, "2024-01-01 00:00:01", 2, "Y", 1.0, "{}"),
        (12, "2024-01-01 00:00:01", 2, "Z", 1.0, "{}"),  # ties with 11
    ]
    d = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with mock.patch.object(S, "table", lambda s, sf, name: d):
        got = {r.path: r.path_count for r in S.event_paths(spark, "_").collect()}
    assert got == {
        "A>B>C": 2, "B>C>A": 1, "C>A>B": 1,  # user 1's sliding trigrams
        "X>Y>Z": 1,  # user 2: event_id 11 before 12 at the tied ts
    }


def test_embed_whiten_output_covariance_is_identity(spark):
    """The whitening invariant — the strongest in the embedding-prep
    family: the POPULATION covariance of the whitened components is
    the identity (decorrelated, unit variance), up to the COV_SCALE
    quantization and the round-6 output rounding."""
    import numpy as np

    from piper_spark.functions.similarity import PCA_K, embed_whiten

    got = embed_whiten(spark, SF_SMOKE).orderBy("vec_id").collect()
    W = np.array([[getattr(r, f"w{c + 1}") for c in range(PCA_K)] for r in got])
    assert not np.isnan(W).any()
    C = np.cov(W.T, bias=True)  # population, matching cov_partials
    assert np.allclose(C, np.eye(PCA_K), atol=2e-3), C


def test_dq_profile_reacts_to_planted_defects(spark):
    """The profiler must count planted nulls exactly and report the
    true distinct cardinality and length range per column."""
    from unittest import mock

    from piper_spark import pipelines as P

    rows = [
        (0, "aaaa", "en", "web", 4),
        (1, None, "en", "web", 4),
        (2, "bb", None, "book", 2),
        (3, "aaaa", "de", None, None),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with mock.patch.object(P, "table", lambda s, sf, name: d):
        got = {r.col: r for r in P.dq_profile(spark, "_").collect()}
    assert (got["text"].n_null, got["text"].n_distinct) == (1, 2)
    assert (got["text"].min_len, got["text"].max_len) == (2, 4)
    assert (got["lang"].n_null, got["lang"].n_distinct) == (1, 2)
    assert (got["source"].n_null, got["source"].n_distinct) == (1, 2)
    assert (got["n_chars"].n_null, got["n_chars"].min_len, got["n_chars"].max_len) == (1, 2, 4)


def test_dedup_bloom_fold_collision_is_not_identity(spark):
    """Round-9 advice pin: the ~30-bit md5 FOLD positions bloom bits,
    but document IDENTITY is the full md5 — a batch doc whose fold
    collides with a corpus doc (different text, same fold) must probe
    positive (the bloom can't tell) yet SURVIVE the exact verify.
    Fold-as-identity would silently drop it (birthday collisions at
    ~n²/2·10⁹ — ~125 lost docs per 500k batch)."""
    import hashlib
    from unittest import mock

    from piper_spark import session as S
    from piper_spark.functions import dedup as D

    def fold(text: str) -> int:
        acc = 0
        for c in hashlib.md5(text.encode()).hexdigest():
            acc = (acc * 31 + ord(c)) % 1_000_000_007
        return acc

    seen: dict[int, str] = {}
    pair = None
    for i in range(500_000):
        t = f"probe-{i}"
        h = fold(t)
        if h in seen:
            pair = (seen[h], t)
            break
        seen[h] = t
    assert pair, "no fold collision in 500k probes (fold changed?)"
    a, b = pair
    rows = [(0, a, len(a)), (300, b, len(b)), (301, a, len(a))]
    d = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    with mock.patch.object(D, "table", lambda s, sf, name: d), \
         mock.patch.object(S, "row_count", lambda s, sf, name: len(rows)):
        got = {r.doc_id: r for r in D.dedup_bloom(spark, "_").collect()}
    # the collider probes positive (same bloom positions) but is NEW
    assert 300 in got and got[300].probed == 1, got
    # the true duplicate of the corpus doc is dropped
    assert 301 not in got, got


def test_ts_ohlc_keeper_key_survives_large_event_ids(spark):
    """Round-9 advice pin: with event_id ≥ 10⁶ (the repo's own 10M-row
    scale corpus reaches 9,999,999) the OLD int64 key rel_us·10⁶+id
    stops being lexicographic — an id of 2·10⁶ outweighs a 1 µs
    timestamp lead and steals the open.  The DECIMAL(38,0)/HUGEINT
    key must pick the true earliest/latest event."""
    import datetime as dt
    from unittest import mock

    from piper_spark import session as S
    from piper_spark.functions import sessions as SS

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 0)
    rows = [
        ("trade", t0, 10.0, 2_000_000),                          # true open
        ("trade", t0 + dt.timedelta(microseconds=1), 20.0, 500), # mid
        ("trade", t0 + dt.timedelta(seconds=5), 30.0, 7_777_777),# true close
    ]
    d = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    with mock.patch.object(SS, "table", lambda s, sf, name: d), \
         mock.patch.object(S, "row_count", lambda s, sf, name: len(rows)):
        bars = SS.ts_ohlc(spark, "_").collect()
    assert len(bars) == 1
    assert (bars[0].open, bars[0].close) == (1000, 3000), bars[0]


def test_agg_moments_degenerate_groups_agree_cross_engine(spark):
    """Round-9 advice pin: a zero-variance group (n=1, or all values
    equal) hits x/0.0 — DuckDB yields NULL, Spark NaN/±Inf — so both
    finishes are guarded to NULL by the same CASE text.  Checked
    CROSS-ENGINE on an injected degenerate corpus (the oracle corpus
    has no degenerate language groups to catch this)."""
    from unittest import mock

    import duckdb

    from piper_spark import registry
    from piper_spark.operators import aggregates as A
    from scripts.check_oracle import compare

    rows = [
        (0, "xx", 7),            # n=1 group
        (1, "yy", 5), (2, "yy", 5),  # all-equal group
        (3, "zz", 1), (4, "zz", 4), (5, "zz", 9), (6, "zz", 20),
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    with mock.patch.object(A, "table", lambda s, sf, name: d):
        sdf = A.agg_moments(spark, "_").toPandas()
    import pandas as pd

    by_lang = dict(zip(sdf["lang"], sdf["skewness"]))
    assert pd.isna(by_lang["xx"]) and pd.isna(by_lang["yy"])
    assert not pd.isna(by_lang["zz"])
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"]),
    )
    ddf = con.execute(registry.all_oracles()["agg_moments"]).df()
    con.close()
    errs = compare("agg_moments", sdf, ddf)
    assert not errs, errs


def test_cluster_kmeans_codebook_powers_both_optins(spark):
    """Round-9: the distributed-Lloyd codebook (`kmeans_codebook`, the
    descaled `cluster_kmeans` centroids) must be consumable by BOTH
    promised downstream opt-ins with no shape change: `sim_ann_ivf`
    keeps the ≥0.7 recall@10 contract under the swapped codebook, and
    `dedup_semantic` under trained seeds still reports only valid
    drops (a lower-id partner in the dropped vec's own cluster)."""
    from piper_spark.functions.dedup import dedup_semantic
    from piper_spark.functions.similarity import (
        derived_kmeans_k,
        kmeans_codebook,
        sim_ann_ivf,
        sim_topk,
    )
    from piper_spark.session import row_count

    KMEANS_K = derived_kmeans_k(row_count(spark, SF_SMOKE, "embeddings"))
    cb = kmeans_codebook(spark, SF_SMOKE)
    assert cb.count() == KMEANS_K
    exact = {r.vec_id for r in sim_topk(spark, SF_SMOKE).collect()}
    approx = {
        r.vec_id for r in sim_ann_ivf(spark, SF_SMOKE, codebook=cb).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) / len(exact) >= 0.7

    seeds = cb.selectExpr("cid AS sid", "cd AS sed")
    rows = dedup_semantic(spark, SF_SMOKE, seeds=seeds).collect()
    assert rows, "planted semantic dups must survive a seed swap"
    assert all(r.dup_of < r.vec_id for r in rows)
    assert all(0 <= r.cluster < KMEANS_K for r in rows)


def test_text_nfc_idempotent_and_collapses_variant_pairs(spark):
    """Round-9: NFC+lower must be idempotent (reapplying the fold to
    its own output is a byte no-op) and must collapse the planted
    precomposed/decomposed variant PAIRS to byte-equal suffixes — the
    property hash dedup depends on. Decomposed rows must actually
    shrink (composition happened); precomposed rows must not."""
    import unicodedata

    from piper_spark.functions.text import NFC_VARIANTS, nfc_fold_udf, text_nfc

    from piper_spark.functions.text import _simple_lower

    fold = lambda s: unicodedata.normalize("NFC", _simple_lower(s))  # noqa: E731
    assert NFC_VARIANTS[0] != NFC_VARIANTS[1]
    assert NFC_VARIANTS[2] != NFC_VARIANTS[3]
    assert fold(NFC_VARIANTS[0]) == fold(NFC_VARIANTS[1])
    assert fold(NFC_VARIANTS[2]) == fold(NFC_VARIANTS[3])
    # Round-10 (ADVICE 1): the dotted-İ pair must NOT collapse — simple
    # case mapping drops İ's dot but keeps an explicit U+0307 — and the
    # folds must differ from Python's FULL str.lower on both probes.
    assert fold(NFC_VARIANTS[4]) != fold(NFC_VARIANTS[5])
    assert fold(NFC_VARIANTS[4]) != unicodedata.normalize(
        "NFC", NFC_VARIANTS[4].lower()
    )
    assert fold(NFC_VARIANTS[4]).endswith("σ")  # simple: non-final sigma
    assert NFC_VARIANTS[4].lower().endswith("ς")  # full: final sigma

    out = text_nfc(spark, SF_SMOKE).withColumn(
        "n2", nfc_fold_udf()(F.col("normalized"))
    )
    rows = out.collect()
    assert rows
    assert all(r.normalized == r.n2 for r in rows)  # idempotent
    for r in rows:
        assert r.normalized.endswith(fold(NFC_VARIANTS[r.doc_id % 6]))
        if r.doc_id % 6 in (1, 3):  # decomposed suffix composed away
            assert r.n_chars_nfc < r.n_chars_aug
        elif r.doc_id % 6 == 4:  # İ loses its dot under simple mapping
            assert r.n_chars_nfc == r.n_chars_aug
        elif r.doc_id % 6 == 5:  # I+U+0307 keeps both codepoints
            assert r.n_chars_nfc == r.n_chars_aug
        else:  # precomposed: fold changes case only, never length
            assert r.n_chars_nfc == r.n_chars_aug


def test_embed_pq_matches_numpy_and_seeds_reconstruct_exactly(spark):
    """Round-9: PQ codes/error must equal a direct numpy product
    quantization on the same integer grid, and the codebook seeds
    must reconstruct themselves exactly (err 0, code = own index)."""
    import numpy as np

    from piper_spark.functions.similarity import PQ_K, PQ_M, PQ_SUB, embed_pq
    from piper_spark.session import table

    rows = (
        table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    C = X[:PQ_K]
    expect = {}
    for rid, x in zip((r["vec_id"] for r in rows), X):
        packed, err = 0, 0
        for m in range(PQ_M):
            sl = slice(m * PQ_SUB, (m + 1) * PQ_SUB)
            d = ((C[:, sl] - x[sl]) ** 2).sum(axis=1)
            code = int(np.argmin(d))  # first min = lowest code
            packed += code * PQ_K**m
            err += int(d[code])
        expect[rid] = (packed, err)
    got = {
        r.vec_id: (r.codes_packed, r.recon_err)
        for r in embed_pq(spark, SF_SMOKE).collect()
    }
    assert got == expect
    for j in range(PQ_K):
        packed_j = sum(j * PQ_K**m for m in range(PQ_M))
        assert got[j] == (packed_j, 0)


def test_sim_ann_kmeans_recall_and_probe_subset(spark):
    """Round-9: the oracle-exact kmeans-IVF key must keep the ANN
    recall contract vs exact sim_topk, and every result must genuinely
    come from the probed cells (a candidate outside them would mean
    the filter is not the plan's pruning predicate)."""
    from piper_spark.functions.similarity import (
        cluster_kmeans,
        derived_kmeans_k,
        derived_probes,
        sim_ann_kmeans,
        sim_topk,
    )
    from piper_spark.session import row_count

    exact = {r.vec_id for r in sim_topk(spark, SF_SMOKE).collect()}
    got = sim_ann_kmeans(spark, SF_SMOKE).collect()
    assert len(got) == 10
    assert len(exact & {r.vec_id for r in got}) / 10 >= 0.7
    clusters = {
        r.vec_id: r.cluster for r in cluster_kmeans(spark, SF_SMOKE).collect()
    }
    probed = {clusters[r.vec_id] for r in got}
    # default probe width derives from the corpus-size-derived cell count
    k = derived_kmeans_k(row_count(spark, SF_SMOKE, "embeddings"))
    assert len(probed) <= derived_probes(k)


def test_sim_ann_two_level_contract(spark):
    """Round-12 (updated round-14 to the node-relation fit): the
    hierarchical IVF must keep the family's recall contract vs exact
    sim_topk; its leaf-codebook rows must refine exactly the fitted
    coarse cells (every cell ≤ FINE_K leaves with dense 0..k2-1
    codes); every MEMBER row must land in a leaf that exists in the
    codebook (the one-pass union's internal consistency — round-14
    item 2); and the whole fit must be deterministic (two fits
    bit-equal — the oracle-exactness precondition)."""
    from piper_spark.functions.similarity import (
        FINE_K,
        derived_coarse_k,
        derived_fine_depth,
        hier_fit,
        sim_ann_two_level,
        sim_topk,
    )
    from piper_spark.session import row_count

    exact = {r.vec_id for r in sim_topk(spark, SF_SMOKE).collect()}
    got = sim_ann_two_level(spark, SF_SMOKE).collect()
    assert len(got) == 10
    assert len(exact & {r.vec_id for r in got}) / 10 >= 0.7

    n = row_count(spark, SF_SMOKE, "embeddings")
    d = max(1, derived_fine_depth(n))
    anc = FINE_K**d
    vecs, cents, nodes = hier_fit(spark, SF_SMOKE)
    all1 = nodes.collect()
    vecs.unpersist()
    assert len(cents) == derived_coarse_k(n)
    cb1 = sorted((r.cid, tuple(r.fc)) for r in all1 if r.vec_id is None)
    members1 = sorted((r.vec_id, r.cid) for r in all1 if r.vec_id is not None)
    assert len(members1) == n
    # leaf codes are dense 0..k2-1 within each IMMEDIATE parent cell,
    # and every leaf's top ancestor is a fitted coarse cell
    assert {cid // anc for cid, _ in cb1} <= set(range(len(cents)))
    per: dict[int, list[int]] = {}
    for cid, _fc in cb1:
        per.setdefault(cid // FINE_K, []).append(cid % FINE_K)
    for c2s in per.values():
        assert sorted(c2s) == list(range(len(c2s))) and len(c2s) <= FINE_K
    cb_cids = {cid for cid, _ in cb1}
    assert {cid for _, cid in members1} <= cb_cids
    vecs2, _c2, nodes2 = hier_fit(spark, SF_SMOKE)
    all2 = nodes2.collect()
    vecs2.unpersist()
    cb2 = sorted((r.cid, tuple(r.fc)) for r in all2 if r.vec_id is None)
    members2 = sorted((r.vec_id, r.cid) for r in all2 if r.vec_id is not None)
    assert cb1 == cb2 and members1 == members2


def test_kmeans_keys_leave_no_orphan_cache(spark):
    """Round-10 (ADVICE 2): cluster_kmeans/sim_ann_kmeans must hand
    the CALLER the persisted handle and release the corpus-sized
    quantized relation internally — after unpersisting the returned
    DataFrame, the session's cache manager must be empty (previously
    each call leaked one corpus-sized cache no caller could drop)."""
    from piper_spark.functions.similarity import cluster_kmeans, sim_ann_kmeans

    spark.catalog.clearCache()
    for fn in (cluster_kmeans, sim_ann_kmeans):
        out = fn(spark, SF_SMOKE)
        assert out.count() > 0
        lvl = out.storageLevel
        assert lvl.useMemory or lvl.useDisk  # the handle IS the cache
        out.unpersist(blocking=True)
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
            f"{fn.__name__} left an orphan cached relation"
        )


def test_embed_pq_trained_subspace_codebook_improves_objective(spark):
    """Round-9: the docstring's production path — training a subspace
    codebook with the distributed Lloyd instead of pinning seeds —
    must be EXECUTABLE with the existing machinery and must not
    worsen the quantization objective: Lloyd's update never increases
    within-cell SSE, so the trained subspace-0 codebook's total
    reconstruction error is <= the pinned-seed one."""
    from piper_spark.functions.similarity import (
        PQ_K,
        PQ_SUB,
        _km_kk_udf,
        _pq_kk_sql,
        lloyd_centroids,
    )
    from piper_spark.session import table

    vecs = (
        table(spark, SF_SMOKE, "embeddings")
        .select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1_000_000.0 + F.lit(0.5))
                .cast("long"),
            ).alias("xq"),
        )
        .persist()
    )
    vecs.count()
    sub0 = vecs.select("vec_id", F.slice("xq", 1, PQ_SUB).alias("xq")).persist()
    sub0.count()
    pinned = [list(r["xq"]) for r in sub0.orderBy("vec_id").limit(PQ_K).collect()]
    trained = lloyd_centroids(sub0, dims=PQ_SUB)
    assert len(trained) == PQ_K

    def sse(cents):
        k = len(cents)
        return (
            sub0.select(_km_kk_udf(cents)(F.col("xq")).alias("kk"))
            .selectExpr(f"sum(kk div {k}) AS s")
            .collect()[0]["s"]
        )

    assert sse(trained) <= sse(pinned)
    sub0.unpersist()
    vecs.unpersist()


def test_embed_pq_registered_shape_runs_on_trained_codebooks(spark):
    """Round-10 (VERDICT item 6): the registered embed_pq shape must
    CONSUME the per-subspace distributed-Lloyd fit end to end — same
    schema, same Horner packing, and a total quantization objective
    never worse than the pinned-seed codebooks (Lloyd is initialized
    at those seeds and never increases within-cell SSE)."""
    from piper_spark.functions.similarity import embed_pq, pq_train_codebooks

    pinned = {r.vec_id: (r.codes_packed, r.recon_err)
              for r in embed_pq(spark, SF_SMOKE).collect()}
    books = pq_train_codebooks(spark, SF_SMOKE)
    trained = {r.vec_id: (r.codes_packed, r.recon_err)
               for r in embed_pq(spark, SF_SMOKE, codebooks=books).collect()}
    assert set(trained) == set(pinned) and trained
    err_pinned = sum(v[1] for v in pinned.values())
    err_trained = sum(v[1] for v in trained.values())
    assert err_trained <= err_pinned
    assert err_trained < err_pinned  # genuinely improves on this corpus


def test_simhash_distinct_word_cap_agrees_cross_engine(spark):
    """Round-10 review finding, twice over: (a) the simhash oracle
    must mirror the Spark side's distinct-word SWAR cap
    (first-occurrence order) — without the capped `words` CTE the
    vote counts and n diverge; (b) writing the test found the cap
    itself was UNSAFE at its old 65535 value: Spark 4's default ANSI
    mode throws ARITHMETIC_OVERFLOW once the top SWAR lane's count
    reaches 2^15, so the cap is now SIMHASH_MAX_WORDS = 32767.  A
    40k-distinct-word document exercises both."""
    import duckdb

    from piper_spark.functions.dedup import _simhash_sig_sql, simhash_signatures

    text = " ".join(f"w{i}" for i in range(40_000))
    df = spark.createDataFrame([(1, text), (2, "a b a")], "doc_id long, text string")
    got = {r.doc_id: r.sh for r in simhash_signatures(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?), (2, 'a b a')", [text])
    want = dict(
        con.execute(_simhash_sig_sql(2) + "\nSELECT doc_id, sh FROM sig").fetchall()
    )
    assert got == want and set(got) == {1, 2}


def test_power_iteration_converges_on_planted_spike():
    """Round-10 embed_power_iter: the integer iteration must align with
    the true dominant eigenvector (cos >= 0.99) whenever an eigengap
    exists — pinned on a planted-spike scatter because the fixture
    corpus is near-isotropic (λ1/λ2 ≈ 1.013, where 12 rounds provably
    cannot separate); the registered key's contract is the
    deterministic iterate, which the oracle checks bit-for-bit."""
    import numpy as np

    from piper_spark.functions.similarity import POWER_VSCALE, power_iterate

    rng = np.random.default_rng(0)
    Y = rng.integers(-50, 51, (400, 16)).astype(np.int64)
    Y[:, 3] += rng.integers(-500, 501, 400)  # dominant direction ≈ e3
    S = len(Y) * (Y.T @ Y) - np.outer(Y.sum(0), Y.sum(0))
    v = power_iterate(S)
    assert int(np.abs(v).max()) == POWER_VSCALE
    w = np.linalg.eigh(S.astype(np.float64))[1][:, -1]
    cos = abs(w @ v) / (np.linalg.norm(w) * np.linalg.norm(v))
    assert cos >= 0.99, cos
    # all-zero scatter degenerates to the zero vector, not a crash
    assert (power_iterate(np.zeros((4, 4), dtype=np.int64)) == 0).all()


@given(
    payload=st.binary(min_size=1, max_size=700),
    doc_id=st.integers(min_value=0, max_value=1 << 40),
)
@settings(max_examples=60, deadline=None)
def test_tar_roundtrip_property(payload, doc_id):
    """Round-10 source_tar_members: for ANY non-empty payload (edge
    sizes: 1 byte, exactly TAR_CHUNK, TAR_CHUNK+1, ...) the stdlib-
    written archive must survive the strict parse with the declared
    member layout, and the decompressed members must concatenate back
    to the exact payload — the framing invariant the registered key's
    position-weighted checksum is built on."""
    import gzip

    from piper_spark.sources.multimodal import TAR_CHUNK, decode_tar, encode_tar

    members = decode_tar(encode_tar(payload, doc_id))
    want_n = (len(payload) + TAR_CHUNK - 1) // TAR_CHUNK
    assert len(members) == want_n
    chunks = []
    for i, (name, data) in enumerate(members):
        assert name == f"{doc_id}/{i:06d}.txt" + (".gz" if i % 2 else "")
        chunks.append(gzip.decompress(data) if i % 2 else data)
    assert b"".join(chunks) == payload
    assert all(len(c) == TAR_CHUNK for c in chunks[:-1])
    assert 1 <= len(chunks[-1]) <= TAR_CHUNK


def test_two_level_leaf_assignment_matches_oracle_chain(spark):
    """Round-13 (VERDICT item 1): the Spark leaf assignment the
    switched consumers ride (`_assign_fine_cell` over the coarse
    assignment) must match the unrolled fine CTE chain's `fleaves`
    relation BIT-FOR-BIT — the exactness precondition for the
    branched oracles of sim_knn_join / sim_ann_batch /
    dedup_semantic_ivf above the switch."""
    import duckdb
    from pyspark.sql import functions as F

    from piper_spark.functions.similarity import (
        _V_CTE,
        _assign_fine_cell,
        _hier_ctes,
        _km_kk_udf,
        _km_xq_col,
        derived_coarse_k,
        lloyd_centroids,
    )
    from piper_spark.session import row_count, table

    vecs = (
        table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", _km_xq_col().alias("xq"))
        .persist()
    )
    n = vecs.count()
    cents = lloyd_centroids(vecs, k=derived_coarse_k(n, 1))
    k1 = len(cents)
    asg1 = vecs.select(
        "vec_id", "xq", (_km_kk_udf(cents)(F.col("xq")) % k1).alias("pcid")
    )
    got = {
        (r["vec_id"], r["cid"])
        for r in asg1.groupBy("pcid")
        .applyInPandas(_assign_fine_cell, "vec_id long, cid long")
        .collect()
    }
    vecs.unpersist()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF_SMOKE}/embeddings.parquet'"
    )
    want = {
        (r[0], r[1])
        for r in con.sql(
            _V_CTE + _hier_ctes(1) + "\nSELECT vec_id, cid FROM tleaves"
        ).fetchall()
    }
    con.close()
    assert len(got) == n and got == want


def test_clamped_consumers_switch_to_two_level(spark, monkeypatch):
    """Round-13 (VERDICT item 1): past HIER_SWITCH_N, sim_knn_join and
    sim_ann_batch must ride the two-level LEAF cells. Forcing the
    switch at this corpus size must (a) execute the two-level branch
    end to end, (b) keep the output contracts (per-vector <= KNN_K
    dense-ranked neighbors; 10 rows per batch query), (c) stay
    deterministic, and (d) keep batch recall against the single-level
    answer (same corpus, finer cells — the probe sets overlap)."""
    from piper_spark.functions import similarity as S

    base_batch = {}
    for r in S.sim_ann_batch(spark, SF_SMOKE).collect():
        base_batch.setdefault(r.qid, set()).add(r.vec_id)

    # 400 < 500 <= 400·FINE_K: forces depth exactly 1 (the round-13
    # switch shape; depth 2 is forced cross-engine in
    # test_forced_recursion_matches_regenerated_oracle)
    monkeypatch.setattr(S, "HIER_SWITCH_N", 400)
    knn = S.sim_knn_join(spark, SF_SMOKE).collect()
    per = {}
    for r in knn:
        per.setdefault(r.vec_id, []).append((r.rank, r.nbr_id, r.cos_sim))
    assert per, "two-level knn returned nothing"
    for vid, rows in per.items():
        ranks = sorted(rank for rank, _, _ in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= S.KNN_K
        assert all(-1.0001 <= cs <= 1.0001 for _, _, cs in rows)
    knn2 = S.sim_knn_join(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, knn)) == sorted(map(tuple, knn2))

    got_batch = {}
    for r in S.sim_ann_batch(spark, SF_SMOKE).collect():
        got_batch.setdefault(r.qid, set()).add(r.vec_id)
    assert set(got_batch) == set(base_batch)
    assert all(len(v) == 10 for v in got_batch.values())
    mean_overlap = sum(
        len(got_batch[q] & base_batch[q]) / 10 for q in base_batch
    ) / len(base_batch)
    assert mean_overlap >= 0.5

    from piper_spark.functions.dedup import dedup_semantic_ivf

    sem = dedup_semantic_ivf(spark, SF_SMOKE)
    rows = sem.collect()
    sem.unpersist()
    # leaf-scoped SemDeDup: drops reference a lower-id partner
    assert all(r.dup_of < r.vec_id for r in rows)


def test_sim_ann_pq_adc_self_consistency(spark):
    """Round-13: the ADC distances must equal a driver-side
    recomputation from the embed_pq codes and the query LUT (the
    asymmetric-distance definition), ascending with vec_id ties."""
    from piper_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUB,
        embed_pq,
        sim_ann_pq,
    )
    from piper_spark.session import table
    from pyspark.sql import functions as F

    out = sim_ann_pq(spark, SF_SMOKE).collect()
    assert len(out) == 10
    dists = [r.adc_dist2 for r in out]
    assert dists == sorted(dists)

    vecs = {
        r.vec_id: [int(v) for v in r.xq]
        for r in table(spark, SF_SMOKE, "embeddings")
        .select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    x.cast("double") * 1_000_000.0 + F.lit(0.5)
                ).cast("long"),
            ).alias("xq"),
        )
        .collect()
    }
    seeds = [vecs[i] for i in sorted(vecs)[:PQ_K]]
    books = [
        [s[m * PQ_SUB : (m + 1) * PQ_SUB] for s in seeds] for m in range(PQ_M)
    ]
    qx = vecs[0]
    lut = [
        [
            sum(
                (a - b) * (a - b)
                for a, b in zip(qx[m * PQ_SUB : (m + 1) * PQ_SUB], c)
            )
            for c in books[m]
        ]
        for m in range(PQ_M)
    ]
    codes = {
        r.vec_id: [
            (r.codes_packed // PQ_K**m) % PQ_K for m in range(PQ_M)
        ]
        for r in embed_pq(spark, SF_SMOKE).collect()
    }
    for r in out:
        want = sum(lut[m][codes[r.vec_id][m]] for m in range(PQ_M))
        assert r.adc_dist2 == want


def test_sim_ivf_pq_two_level_branch(spark, monkeypatch):
    """Round-13: past HIER_SWITCH_N the IVFPQ coarse stage must ride
    the two-level candidates; forcing the switch must execute that
    branch end to end with the ADC values unchanged for vectors in
    both candidate sets (same codes, same LUT)."""
    from piper_spark.functions import similarity as S

    base = {r.vec_id: r.adc_dist2 for r in S.sim_ivf_pq(spark, SF_SMOKE).collect()}
    monkeypatch.setattr(S, "HIER_SWITCH_N", 400)  # forces depth 1 at 500 rows
    two = S.sim_ivf_pq(spark, SF_SMOKE).collect()
    assert len(two) == 10
    d = [r.adc_dist2 for r in two]
    assert d == sorted(d)
    for r in two:
        if r.vec_id in base:
            assert r.adc_dist2 == base[r.vec_id]


def test_sim_ivf_pq_composes_prune_and_adc(spark):
    """Round-13: the IVFPQ key must (a) return only vectors assigned
    to the query's probed coarse cells (the prune contract), and
    (b) rank them by exactly the ADC distances sim_ann_pq's LUT
    defines (the compress contract) — i.e. its result equals the
    full-corpus ADC ranking RESTRICTED to probed-cell members."""
    from piper_spark.functions.similarity import (
        cluster_kmeans,
        derived_kmeans_k,
        derived_probes,
        sim_ann_pq,
        sim_ivf_pq,
    )
    from piper_spark.session import row_count

    out = sim_ivf_pq(spark, SF_SMOKE).collect()
    assert len(out) == 10
    dists = [r.adc_dist2 for r in out]
    assert dists == sorted(dists)

    clusters = {
        r.vec_id: r.cluster for r in cluster_kmeans(spark, SF_SMOKE).collect()
    }
    probed = {clusters[r.vec_id] for r in out}
    k = derived_kmeans_k(row_count(spark, SF_SMOKE, "embeddings"))
    assert len(probed) <= derived_probes(k)

    # every ADC distance agrees with the full-corpus ADC key's value
    # for the same vec_id (same codes, same LUT)
    full = {r.vec_id: r.adc_dist2 for r in sim_ann_pq(spark, SF_SMOKE).collect()}
    for r in out:
        if r.vec_id in full:
            assert r.adc_dist2 == full[r.vec_id]


def test_derived_fine_depth_keeps_leaf_target():
    """Round-14 (VERDICT item 1): the hierarchical depth derivation
    must keep expected leaf population ≈ KM_CELL_TARGET at ANY corpus
    size — the coarse clamp never binds (one coarse cell per
    KM_CELL_TARGET·FINE_K^d vectors fits under KMEANS_K_MAX by the
    depth's construction), and the depth is minimal (one level less
    would clamp). This is the math that retired the round-13
    two-level fit's own ~2M-vector ceiling."""
    from piper_spark.functions.similarity import (
        FINE_K,
        HIER_SWITCH_N,
        KM_CELL_TARGET,
        KMEANS_K_MAX,
        derived_coarse_k,
        derived_fine_depth,
    )

    assert HIER_SWITCH_N == KMEANS_K_MAX * KM_CELL_TARGET
    for n in [
        1,
        500,
        HIER_SWITCH_N,
        HIER_SWITCH_N + 1,
        HIER_SWITCH_N * FINE_K,
        HIER_SWITCH_N * FINE_K + 1,  # the round-13 ceiling, crossed
        HIER_SWITCH_N * FINE_K**2,
        HIER_SWITCH_N * FINE_K**2 + 1,
        10**9,
        10**12,
    ]:
        d = derived_fine_depth(n)
        if n <= HIER_SWITCH_N:
            assert d == 0
            continue
        per = KM_CELL_TARGET * FINE_K**d
        k1 = derived_coarse_k(n, d)
        # the clamp never binds and leaves average <= KM_CELL_TARGET
        assert (n + per - 1) // per <= KMEANS_K_MAX
        assert k1 * FINE_K**d * KM_CELL_TARGET >= n
        # minimality: one level less would clamp the coarse k
        assert n > HIER_SWITCH_N * FINE_K ** (d - 1)


def test_forced_recursion_matches_regenerated_oracle(spark, monkeypatch):
    """Round-14 (VERDICT item 1 + ADVICE 1): the hierarchical branches
    of the registered oracles must be EXECUTED in DuckDB, not just
    reachable — lowering the switch constant makes the 500-row fixture
    run at depth 1 AND depth 2 on BOTH engines (the oracle generators
    read HIER_SWITCH_N at call time, so the regenerated SQL carries
    the lowered gates), and every switched key's values must match
    exactly: the cells relation, the pair consumers, the batched and
    single-query searches, and the IVFPQ composition."""
    import duckdb

    from piper_spark.functions import dedup as D
    from piper_spark.functions import similarity as S
    from piper_spark.session import row_count

    n = row_count(spark, SF_SMOKE, "embeddings")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF_SMOKE}/embeddings.parquet'"
    )

    def duck(sql: str) -> list:
        return sorted(tuple(r) for r in con.sql(sql).fetchall())

    for switch, depth in [(400, 1), (32, 2)]:
        monkeypatch.setattr(S, "HIER_SWITCH_N", switch)
        assert S.derived_fine_depth(n) == depth

        vecs, cells = S.ivf_cell_assignment(spark, SF_SMOKE)
        got_cells = sorted((r.vec_id, r.cid) for r in cells.collect())
        vecs.unpersist()
        assert got_cells == duck(
            S._branched_cells_ctes() + "\nSELECT vec_id, cid FROM cells"
        ), f"cells mismatch at depth {depth}"

        out = S.sim_knn_join(spark, SF_SMOKE)
        got = sorted(
            (r.vec_id, r.nbr_id, r.cos_sim, r.rank) for r in out.collect()
        )
        out.unpersist()
        assert got == duck(S._knn_join_oracle()), f"knn depth {depth}"

        out = S.sim_ann_batch(spark, SF_SMOKE)
        got = sorted((r.qid, r.vec_id, r.cos_sim) for r in out.collect())
        out.unpersist()
        assert got == duck(S._ann_batch_oracle()), f"batch depth {depth}"

        out = S.sim_ann_two_level(spark, SF_SMOKE)
        got = sorted((r.vec_id, r.cos_sim) for r in out.collect())
        out.unpersist()
        assert got == duck(S._two_level_oracle()), f"two_level depth {depth}"

        out = S.sim_ivf_pq(spark, SF_SMOKE)
        got = sorted((r.vec_id, r.adc_dist2) for r in out.collect())
        out.unpersist()
        assert got == duck(S._ivf_pq_oracle()), f"ivf_pq depth {depth}"

        out = D.dedup_semantic_ivf(spark, SF_SMOKE)
        got = sorted(
            (r.vec_id, r.cluster, r.dup_of, r.n_dups) for r in out.collect()
        )
        out.unpersist()
        assert got == duck(D._semantic_ivf_oracle()), f"semantic depth {depth}"
    con.close()


def test_adc_search_on_trained_codebooks(spark):
    """Round-14 (VERDICT item 4): the registered ADC/IVFPQ serving
    shapes must consume `pq_train_codebooks`' per-subspace distributed
    Lloyd fits end to end — same schema, ascending integer distances,
    a recall floor, and ADC values that are SELF-CONSISTENT with the
    trained codes and LUT (the asymmetric-distance definition, the
    sim_ann_pq contract applied to the trained books). Honest caveat,
    measured on both 500-row fixtures: at 24-bit codes on isotropic
    data the trained books do NOT reliably beat the pinned seeds on
    top-k overlap (sf0.001: 6 vs 7 within exact-top-50; sf0.01: 9 vs
    8) — quantization SSE improves (pinned by
    test_embed_pq_registered_shape_runs_on_trained_codebooks) but
    recall at this code budget is tie-noise, so the floor, not a
    strict ordering, is the stable retrieval contract."""
    import numpy as np

    from piper_spark.functions.similarity import (
        pq_train_codebooks,
        sim_ann_pq,
        sim_ivf_pq,
    )
    from piper_spark.session import table

    rows = (
        table(spark, SF_SMOKE, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .collect()
    )
    X = {
        r.vec_id: np.floor(np.array(r.e) * 1_000_000.0 + 0.5).astype(np.int64)
        for r in rows
    }
    q = X[0]
    exact = sorted(
        (int(((v - q) ** 2).sum()), vid) for vid, v in X.items() if vid != 0
    )
    truth50 = {vid for _, vid in exact[:50]}

    books = pq_train_codebooks(spark, SF_SMOKE)
    trained_rows = sim_ann_pq(spark, SF_SMOKE, codebooks=books).collect()
    assert len(trained_rows) == 10
    dists = [r.adc_dist2 for r in trained_rows]
    assert dists == sorted(dists)
    trained = {r.vec_id for r in trained_rows}
    # recall floor (measured 6/10 within exact-top-50 on this fixture)
    assert len(trained & truth50) >= 5

    # ADC self-consistency on the TRAINED books: codes = per-subspace
    # argmin vs the trained centroids, distance = Sum lut[m][code_m]
    from piper_spark.functions.similarity import PQ_M, PQ_SUB

    B = [[np.array(c, dtype=np.int64) for c in books[m]] for m in range(PQ_M)]
    lut = [
        [int(((q[m * PQ_SUB : (m + 1) * PQ_SUB] - c) ** 2).sum()) for c in B[m]]
        for m in range(PQ_M)
    ]
    for r in trained_rows:
        v = X[r.vec_id]
        want = 0
        for m in range(PQ_M):
            sub = v[m * PQ_SUB : (m + 1) * PQ_SUB]
            d = [int(((sub - c) ** 2).sum()) for c in B[m]]
            want += lut[m][int(np.argmin(d))]
        assert r.adc_dist2 == want

    out = sim_ivf_pq(spark, SF_SMOKE, codebooks=books)
    rows2 = out.collect()
    out.unpersist()
    assert len(rows2) == 10
    d2 = [r.adc_dist2 for r in rows2]
    assert d2 == sorted(d2)
