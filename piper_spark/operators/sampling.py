"""Deterministic sampling / split (SURVEY.md §2B "Sampling / split").

Re-expresses the reference's seeded shuffle + 80/20 train/val split
(reference: src/burn-nn/src/data/loader.rs:21-45) as a deterministic
key-hash split. The modulo form (`doc_id % 100 < 80`) is used for the
oracle because xxhash64 differs between Spark and DuckDB; the
xxhash64-based form for keys without uniform ids lives in
piper_spark.functions.dedup.hash_split.

Scale notes: a split is a narrow filter — no shuffle, no sort, and
(unlike randomSplit) no re-scan inconsistency between the two halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table


@register(
    "shuffle_det",
    oracle="""
SELECT vec_id,
       row_number() OVER (ORDER BY (vec_id * 48271) % 65537, vec_id) AS pos
FROM embeddings
""",
)
def shuffle_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset shuffle (reference R2: seeded permutation,
    loader.rs:37-39) — rank by an LCG of the key, so both engines (and
    every re-run) agree on the permutation. orderBy(rand(seed)) would
    NOT be partition-stable in Spark.

    Scale note: the global row_number is for the oracle; at 100 TB you
    keep only the sort key (`(key*48271) % 65537`) and let the shuffle
    write order rows — no global window needed.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    key = (F.col("vec_id") * 48271) % 65537
    w = Window.orderBy(key, "vec_id")
    return e.select("vec_id", F.row_number().over(w).cast("long").alias("pos"))


@register(
    "shuffle_scale",
    oracle="""
SELECT vec_id, CAST((vec_id * 48271) % 65537 AS BIGINT) AS shuffle_key
FROM embeddings
""",
)
def shuffle_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the deterministic shuffle: compute the LCG
    sort key and range-repartition + sort WITHIN partitions — a fully
    distributed sort with no global window (shuffle_det above is the
    oracle twin that materializes explicit positions; its single-
    partition window is the shape to avoid at scale). Downstream
    writers consume partition-ordered rows; the explicit `pos` column
    is unnecessary when the storage order IS the permutation.
    """
    e = table(spark, sf_dir, "embeddings")
    key = ((F.col("vec_id") * 48271) % 65537).cast("long")
    return (
        e.select("vec_id", key.alias("shuffle_key"))
        .repartitionByRange(F.col("shuffle_key"))
        .sortWithinPartitions("shuffle_key", "vec_id")
    )


@register(
    "sample_stratified",
    oracle="""
SELECT lang, count(*) AS sampled, CAST(min(doc_id) AS BIGINT) AS min_id
FROM documents
WHERE doc_id % 10 < 3
GROUP BY lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~30% key-hash sample with per-stratum counts.

    Unlike df.sample(), re-runs and retries see the same rows — the
    property the reference gets from fixed seeds (loader.rs:37-39),
    without depending on partition layout.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 < 3)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("sampled"),
        F.min("doc_id").alias("min_id"),
    )


@register(
    "split_hash",
    oracle="""
SELECT CASE WHEN doc_id % 100 < 80 THEN 'train' ELSE 'val' END AS split,
       count(*) AS cnt,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM documents
GROUP BY 1
""",
)
def split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 split tag + per-split stats."""
    d = table(spark, sf_dir, "documents")
    split = F.when(F.col("doc_id") % 100 < 80, F.lit("train")).otherwise(F.lit("val"))
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "sample_capped",
    oracle="""
SELECT source, doc_id
FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 5
ORDER BY source, doc_id
""",
)
def sample_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the domain-capping pass a pretraining
    corpus runs so no single source dominates the mixture. Keeps at
    most 5 docs per source, chosen by a deterministic pseudo-random
    order (a Knuth multiplicative scramble of doc_id — injective, so
    tie-free; no RNG, both engines compute it with the same integer
    arithmetic). Window partitioned on the bounded source key, so at
    100 TB each partition ranks independently after one shuffle on
    source; heavy sources never collect to one machine beyond their
    own group, and a skewed source can pre-aggregate with the same
    scramble as a filter threshold before ranking.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    # Reduce doc_id mod p BEFORE multiplying: the raw product overflows
    # int64 once doc_id exceeds ~3.5e9 (Spark wraps silently, DuckDB
    # raises — divergence exactly at corpus scale). (x % p) * m stays
    # below 2.66e18 < 2^63 and is congruent mod p, so the order — and
    # every tested result — is unchanged; ids ≥ p fall back to the
    # doc_id tiebreak, deterministically on both engines.
    order = ((F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761)) % F.lit(
        1000000007
    )
    w = Window.partitionBy("source").orderBy(order, "doc_id")
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@register(
    "sample_mixture",
    oracle="""
WITH c AS (
  SELECT source, count(*) AS n,
         1 + CAST(substr(source, 4) AS BIGINT) % 4 AS w
  FROM documents GROUP BY 1
),
tt AS (SELECT min(CAST(floor(n / CAST(w AS DOUBLE)) AS BIGINT)) AS t FROM c),
k AS (SELECT source, w, w * t AS keep FROM c, tt),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
           ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007,
                    doc_id) AS rn
  FROM documents
)
SELECT r.source,
       CAST(count(*) AS BIGINT) AS kept,
       CAST(min(k.keep) AS BIGINT) AS target_kept,
       CAST(min(k.w) AS BIGINT) AS weight
FROM r JOIN k ON r.source = k.source
WHERE r.rn <= k.keep
GROUP BY 1
""",
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining MIXTURE construction: resample sources to target
    proportions. Each source s gets an integer weight w_s (derived here
    from the source name so the demo is self-contained); the pass keeps
    exactly T·w_s docs per source where T = min_s ⌊n_s / w_s⌋ — the
    largest total for which every source can fill its share — chosen by
    the same Knuth-scramble order as `sample_capped` (its sibling: cap
    bounds a source's absolute count, mixture sets RELATIVE shares).

    Everything is integer arithmetic (T·w_s, scramble), so both engines
    agree bit-for-bit. Scale shape: per-source counts are one tiny hash
    agg; T is a 1-row broadcast; the keep-threshold table (one row per
    source) broadcasts back; the only per-row work is the same
    source-partitioned rank window as sample_capped. No driver-side
    data, no floats in the decision path.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    wexpr = 1 + F.substring("source", 4, 10).cast("long") % 4
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).withColumn("w", wexpr)
    tt = c.agg(F.min(F.floor(F.col("n") / F.col("w")).cast("long")).alias("t"))
    k = c.crossJoin(F.broadcast(tt)).select(
        "source", "w", (F.col("w") * F.col("t")).alias("keep")
    )
    order = ((F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761)) % F.lit(
        1000000007
    )
    rn = F.row_number().over(Window.partitionBy("source").orderBy(order, "doc_id"))
    r = d.select("doc_id", "source").withColumn("rn", rn)
    return (
        r.join(F.broadcast(k), "source")
        .filter(F.col("rn") <= F.col("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.min("keep").alias("target_kept"),
            F.min("w").alias("weight"),
        )
    )


#: Temperature resampling knobs: α = 0.5 (square-root temperature — the
#: sqrt is IEEE-correctly-rounded in BOTH engines, unlike pow(x, 0.7),
#: so the oracle stays bit-exact), target volume = half the corpus,
#: deterministic keep rule on a doc_id Knuth-hash residue.
TEMP_TARGET_FRAC, TEMP_MOD = 0.5, 1_000_003


@register(
    "sample_temperature",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), tot AS (
  SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z, sum(n_docs) AS n FROM counts
), rates AS (
  SELECT lang, n_docs,
         least(1.0, (sqrt(CAST(n_docs AS DOUBLE)) / tot.z)
                     * (tot.n * {TEMP_TARGET_FRAC}) / n_docs) AS rate
  FROM counts, tot
)
SELECT d.lang, r.n_docs, round(r.rate, 4) AS rate,
       CAST(sum(CASE WHEN ((d.doc_id % 1000000007) * 2654435761) % {TEMP_MOD}
                          < CAST(floor(r.rate * {TEMP_MOD}) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang, r.n_docs, r.rate
""",
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-BASED language rebalancing — the multilingual
    training-mix sampler (mT5 / UNIMAX family): sampling mass ∝ n_l^α
    with α = 0.5 flattens the language distribution so high-resource
    languages stop drowning the tail, then a DETERMINISTIC per-doc keep
    rule (Knuth multiplicative hash residue vs the language's rate)
    realizes the mix reproducibly — rerunning selects the SAME docs, so
    the sample is auditable and incremental batches stay consistent.

    α is 0.5 (not the common 0.3/0.7) deliberately: sqrt is correctly
    rounded in IEEE 754 in both engines while pow(x, 0.3) is libm-
    dependent in its last ulp — the oracle stays value-exact without
    weakening the operator's semantics. Shape: one tiny per-lang count
    agg (≤ langs rows, broadcast back) + one narrow map — the corpus is
    never shuffled. At 100 TB the rate table is still ≤ langs rows."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
        F.sum("n_docs").alias("n"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.least(
            F.lit(1.0),
            (F.sqrt(F.col("n_docs").cast("double")) / F.col("z"))
            * (F.col("n") * TEMP_TARGET_FRAC)
            / F.col("n_docs"),
        ).alias("rate"),
    )
    # Reduce doc_id mod p BEFORE multiplying (the sample_stratified /
    # sample_capped overflow rule): the raw product wraps int64 past
    # doc_id ~3.5e9 — silently in Spark, an error in DuckDB — exactly
    # at corpus scale. (x % p) * m stays < 2.66e18 and the residue
    # stream it feeds the keep rule is unchanged for all tested ids.
    keep = ((F.col("doc_id") % 1000000007) * 2654435761) % TEMP_MOD < F.floor(
        F.col("rate") * TEMP_MOD
    ).cast("long")
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", "rate")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept")
        )
        .select(
            "lang", "n_docs", F.round("rate", 4).alias("rate"), "n_kept"
        )
    )


#: UNIMAX knobs: epoch cap (max fraction of a language's data the mix
#: may take — 1 keeps the realization a subset-keep rule; higher caps
#: mean repetition factors, a writer concern, not a relational one) and
#: the total budget as a corpus fraction (4/5, integer-exact).
UNIMAX_EPOCHS, UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN = 1, 4, 5


@register(
    "sample_unimax",
    oracle=f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), b AS (
  SELECT (sum(n_docs) * {UNIMAX_BUDGET_NUM}) // {UNIMAX_BUDGET_DEN} AS budget
  FROM c
), o AS (
  SELECT lang, n_docs,
         {UNIMAX_EPOCHS} * n_docs AS cap,
         row_number() OVER (ORDER BY {UNIMAX_EPOCHS} * n_docs, lang) AS r,
         coalesce(sum({UNIMAX_EPOCHS} * n_docs) OVER (
           ORDER BY {UNIMAX_EPOCHS} * n_docs, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
         count(*) OVER () AS k
  FROM c
), u AS (
  SELECT o.*, (b.budget - cum_prev) // (k - r + 1) AS u_r FROM o, b
), star AS (
  SELECT min(r) AS rstar FROM u WHERE cap > u_r
), ust AS (
  SELECT star.rstar, u.u_r AS ustar FROM star LEFT JOIN u ON u.r = star.rstar
), t AS (
  SELECT lang, n_docs,
         CASE WHEN ust.rstar IS NULL OR u.r < ust.rstar
              THEN cap ELSE ust.ustar END AS target_kept,
         CAST(CASE WHEN ust.rstar IS NULL OR u.r < ust.rstar
                   THEN 1 ELSE 0 END AS BIGINT) AS capped
  FROM u, ust
), rn AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
           ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007,
                    doc_id) AS rn
  FROM documents
)
SELECT rn.lang, t.n_docs, CAST(t.target_kept AS BIGINT) AS target_kept,
       t.capped, CAST(count(*) AS BIGINT) AS n_kept
FROM rn JOIN t USING (lang)
WHERE rn.rn <= t.target_kept
GROUP BY rn.lang, t.n_docs, t.target_kept, t.capped
""",
)
def sample_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIMAX language sampling (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining") — `sample_temperature`'s epoch-capped sibling: instead
    of a power-law rate, distribute a total budget UNIFORMLY across
    languages, capping each language at UNIMAX_EPOCHS passes over its
    data. The classic waterfill: ascending by capacity, a language whose
    cap fits under the current uniform share takes its whole cap (the
    tail languages — fully used, never over-repeated), and the first
    language whose cap exceeds the share fixes the uniform level u* for
    itself and everything larger (the head languages — truncated to u*).

    Everything is integer arithmetic: budget = ⌊total·4/5⌋, shares are
    floor divisions (the ≤ k-row remainder is deliberately dropped —
    documented underspend, never overspend), and the realization is the
    same deterministic Knuth-scramble rank rule as `sample_mixture`, so
    reruns keep the SAME documents and both engines agree bit-for-bit
    (residues reduced mod p before multiplying — the overflow rule).

    Scale shape: the waterfill runs entirely on the per-language count
    relation (≤ #languages rows — the unpartitioned windows over it are
    broadcast-sized by construction), the target table broadcasts back,
    and the per-row work is one source-partitioned rank window. The
    corpus is never globally shuffled. EPOCHS > 1 changes cap to E·n
    and the over-capacity targets into repetition factors — a writer-
    side concern (emit ⌈t/n⌉ copies) with the same target table."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    b = c.agg(
        F.expr(
            f"(sum(n_docs) * {UNIMAX_BUDGET_NUM}) div {UNIMAX_BUDGET_DEN}"
        ).alias("budget")
    )
    cap = (F.lit(UNIMAX_EPOCHS) * F.col("n_docs")).alias("cap")
    # Windows over the ≤ #languages count relation: unpartitioned BY
    # DESIGN (the relation is tiny at any corpus scale — languages, not
    # documents).
    wf = Window.orderBy("cap", "lang")
    o = (
        c.select("lang", "n_docs", cap)
        .withColumn("r", F.row_number().over(wf))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("cap").over(
                    wf.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("k", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    # persist: three consumers (the threshold scan, the level lookup,
    # and the target projection) read the waterfill relation, and its
    # LINEAGE is a corpus-sized groupBy — without this the per-language
    # count aggregate would re-scan the corpus once per consumer. The
    # relation itself is ≤ #languages rows (caller owns the cache).
    u = (
        o.crossJoin(F.broadcast(b))
        .withColumn("u_r", F.expr("(budget - cum_prev) div (k - r + 1)"))
        .persist()
    )
    star = u.filter(F.col("cap") > F.col("u_r")).agg(F.min("r").alias("rstar"))
    ust = star.join(
        u.select(F.col("r").alias("rstar"), F.col("u_r").alias("ustar")),
        "rstar",
        "left",
    )
    takes_cap = F.col("rstar").isNull() | (F.col("r") < F.col("rstar"))
    t = u.crossJoin(F.broadcast(ust)).select(
        "lang",
        "n_docs",
        F.when(takes_cap, F.col("cap")).otherwise(F.col("ustar")).alias(
            "target_kept"
        ),
        F.when(takes_cap, 1).otherwise(0).cast("long").alias("capped"),
    )
    order = ((F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761)) % F.lit(
        1000000007
    )
    rn = F.row_number().over(Window.partitionBy("lang").orderBy(order, "doc_id"))
    return (
        d.select("lang", "doc_id")
        .withColumn("rn", rn)
        .join(F.broadcast(t), "lang")
        .filter(F.col("rn") <= F.col("target_kept"))
        .groupBy("lang", "n_docs", "target_kept", "capped")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .select("lang", "n_docs", "target_kept", "capped", "n_kept")
    )


#: Planted duplication for `sample_soft_dedup`: every 5th doc reappears
#: shifted (the planted_union precedent) so group sizes are non-trivial
#: on a corpus whose natural texts are unique.
SOFT_DEDUP_MOD, SOFT_DEDUP_OFFSET = 5, 5_000_000


@register(
    "sample_soft_dedup",
    oracle=f"""
WITH un AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {SOFT_DEDUP_OFFSET}, text FROM documents
  WHERE doc_id % {SOFT_DEDUP_MOD} = 0
),
g AS (SELECT md5(text) AS h, count(*) AS s FROM un GROUP BY md5(text))
SELECT un.doc_id, CAST(g.s AS BIGINT) AS group_size,
       1000000 // g.s AS weight_ppm
FROM un JOIN g ON md5(un.text) = g.h
""",
)
def sample_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup — the down-weighting alternative to dropping (the
    SoftDeDup idea: duplicated content contributes 1/s of a copy's
    sampling mass instead of being removed, preserving rare in-dup
    phrasing the hard drop loses): every doc keeps a
    weight_ppm = ⌊10⁶ / group_size⌋ over exact md5 content groups, the
    statistic a temperature/mixture sampler consumes downstream
    (`sample_temperature` applies such rates).  The corpus's natural
    texts are unique, so planted copies (every {SOFT_DEDUP_MOD}th doc,
    shifted by {SOFT_DEDUP_OFFSET}) make group sizes non-trivial IN
    BOTH ENGINES.

    Scale: one md5-keyed count aggregate (16-byte keys shuffle, never
    bodies — the dedup_incremental rule) joined back on the same key;
    two hash shuffles total, the `dedup_exact_hash` linear profile.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    # persist: the md5 projection feeds BOTH the group-size aggregate
    # and the join-back side — without it the full scan + hashing runs
    # twice (the multi-consumer re-evaluation trap; caller owns the
    # cache lifetime).
    un = d.unionAll(
        d.filter(F.col("doc_id") % SOFT_DEDUP_MOD == 0).select(
            (F.col("doc_id") + SOFT_DEDUP_OFFSET).alias("doc_id"), "text"
        )
    ).select("doc_id", F.md5(F.encode("text", "utf-8")).alias("h")).persist()
    g = un.groupBy("h").agg(F.count(F.lit(1)).alias("s"))
    return un.join(g, "h").select(
        "doc_id",
        F.col("s").cast("long").alias("group_size"),
        F.expr("1000000 div s").alias("weight_ppm"),
    )
