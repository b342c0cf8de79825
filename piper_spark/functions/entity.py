"""Entity resolution (record linkage): blocked fuzzy matching +
match-graph clustering — the Fellegi & Sunter (1969) pipeline in its
modern blocking-then-compare form (Christen 2012), the record-level
sibling of the document near-dup family.

The TPC-H customer names are a uniform 'Customer#NNN' template (every
pair within edit distance of the digits), useless for demonstrating
fuzzy matching, so distinctive names are synthesized IN BOTH ENGINES
from the customer key (the `dedup_url` / graph `link_edges`
precedent): each of the seven zero-padded digits maps to a two-letter
syllable whose first AND second letters are unique per digit — so two
DIFFERENT keys always differ by ≥ 2 edits and cannot coincidentally
match, while the planted dirty variants (one char dropped / one char
doubled) sit at exactly edit distance 1 from their source record.
Variant rows reuse the source key + a disjoint id offset, giving the
property tests an exact planted truth: every (source, variant) pair
MUST be matched (recall 1.0 by construction), every cross-entity
match is a deterministic, explainable transitive chain.

Scale shape: candidate pairs come ONLY from a blocking-key equi-join
(prefix block ≡ the first four syllables ⇒ bounded ~contiguous key
ranges), never an all-pairs comparison — the same
candidates-then-verify discipline as every dedup operator here.
Production ER runs multiple blocking passes (phonetic, q-gram, sorted
neighborhood) unioned before the verify; one pass suffices for the
fixture because variants preserve their source's block by
construction (edits land at positions 11+, past the 10-char block)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import fan_out, table


def _lev_le1(s: str, t: str) -> bool:
    """Levenshtein ≤ 1 in one O(len) scan (substitute / insert /
    delete / equal) — the k-bounded special case; full DP would be
    wasted work inside the per-block verify loop."""
    ls, lt = len(s), len(t)
    if abs(ls - lt) > 1:
        return False
    if ls == lt:
        return sum(1 for a, b in zip(s, t) if a != b) <= 1
    if ls > lt:
        s, t, ls, lt = t, s, lt, ls
    # len(t) == len(s) + 1: allow exactly one gap in t.
    i = j = 0
    used_gap = False
    while i < ls and j < lt:
        if s[i] == t[j]:
            i += 1
            j += 1
        elif not used_gap:
            used_gap = True
            j += 1
        else:
            return False
    return True

def _pairs_lev_le1(names: list[str]) -> list[tuple[int, int]]:
    """All index pairs (i < j) with Levenshtein ≤ 1, VECTORIZED — the
    in-block verify is Python-CPU-bound: the scalar double loop cost
    ~12 s at 150k customers where this numpy form holds 1.5M customers
    (2.3M records) under 7 s.  Lev ≤ 1
    decomposes exactly by length: equal length ⇒ ≤ 1 substitution
    (pairwise byte-mismatch counts via one broadcast compare); length
    diff 1 ⇒ one deletion from the longer equals the shorter (try each
    gap position, one equality compare per gap); diff ≥ 2 ⇒ never.
    Equivalence with the scalar `_lev_le1` is property-tested."""
    import numpy as np

    by_len: dict[int, list[int]] = {}
    for i, nm in enumerate(names):
        by_len.setdefault(len(nm), []).append(i)

    def as_bytes(idxs: list[int], width: int) -> "np.ndarray | None":
        if width == 0:
            return np.zeros((len(idxs), 0), dtype=np.uint8)
        buf = "".join(names[i] for i in idxs).encode("utf-8")
        if len(buf) != len(idxs) * width:
            return None  # multi-byte chars: char-width ≠ byte-width
        return np.frombuffer(buf, dtype=np.uint8).reshape(len(idxs), width)

    out: list[tuple[int, int]] = []
    for length, idxs in by_len.items():
        long_idxs = by_len.get(length + 1)
        arr = as_bytes(idxs, length)
        larr = as_bytes(long_idxs, length + 1) if long_idxs else None
        if arr is None or (long_idxs and larr is None):
            # Non-ASCII names (never this fixture's): scalar fallback
            # for this length bucket, same semantics.
            for a, i in enumerate(idxs):
                for j in idxs[a + 1 :]:
                    if _lev_le1(names[i], names[j]):
                        out.append((i, j))
                for j in long_idxs or []:
                    if _lev_le1(names[i], names[j]):
                        out.append((min(i, j), max(i, j)))
            continue
        if len(idxs) >= 2:
            mism = (arr[:, None, :] != arr[None, :, :]).sum(axis=2)
            ii, jj = np.nonzero(np.triu(mism <= 1, k=1))
            out.extend(
                (min(idxs[a], idxs[b]), max(idxs[a], idxs[b]))
                for a, b in zip(ii.tolist(), jj.tolist())
            )
        if long_idxs:
            ok = np.zeros((len(idxs), len(long_idxs)), dtype=bool)
            for g in range(length + 1):
                deleted = np.delete(larr, g, axis=1)
                ok |= (arr[:, None, :] == deleted[None, :, :]).all(axis=2)
            si, li = np.nonzero(ok)
            out.extend(
                (min(idxs[a], long_idxs[b]), max(idxs[a], long_idxs[b]))
                for a, b in zip(si.tolist(), li.tolist())
            )
    return out


#: digit → two-letter syllable; first letters b..m and second letters
#: a,e,i,o,u,r,s,t,v,z are each 10-way distinct, so distinct digits
#: differ in BOTH characters (edit distance 2 per differing digit).
SYLLABLES = ("ba", "ce", "di", "fo", "gu", "hr", "js", "kt", "lv", "mz")

#: Variant id offsets (disjoint from any custkey) and plant rates.
ER_V1_OFFSET, ER_V2_OFFSET = 10_000_000, 20_000_000
ER_V1_MOD, ER_V2_MOD = 3, 5

#: Blocking prefix: 10 chars = the first five syllables = custkey // 100.
ER_BLOCK_LEN = 10
#: Match threshold: Levenshtein ≤ 1 (the planted edits are single-char).
ER_MAX_LEV = 1


def _name_expr(cast_type: str) -> str:
    """The 14-char syllable name as a SQL expression string — chained
    replace() over the zero-padded key, identical text in Spark
    (cast_type='STRING') and DuckDB (cast_type='VARCHAR')."""
    e = f"lpad(CAST(c_custkey AS {cast_type}), 7, '0')"
    for d, pair in enumerate(SYLLABLES):
        e = f"replace({e}, '{d}', '{pair}')"
    return e


def _records_sql(cast_type: str) -> str:
    """Shared CTE chain `records(rec_id, name)` + `blocked(…, blk)`:
    originals ∪ drop-one-char variants (every {ER_V1_MOD}rd key) ∪
    double-one-char variants (every {ER_V2_MOD}th key)."""
    return f"""
base AS (SELECT c_custkey AS rec_id, {_name_expr(cast_type)} AS name FROM customer),
v1 AS (
  SELECT rec_id + {ER_V1_OFFSET} AS rec_id,
         substr(name, 1, 10) || substr(name, 12) AS name
  FROM base WHERE rec_id % {ER_V1_MOD} = 0
),
v2 AS (
  SELECT rec_id + {ER_V2_OFFSET} AS rec_id,
         substr(name, 1, 12) || substr(name, 12, 1) || substr(name, 13) AS name
  FROM base WHERE rec_id % {ER_V2_MOD} = 0
),
records AS (SELECT * FROM base UNION ALL SELECT * FROM v1
            UNION ALL SELECT * FROM v2),
blocked AS (SELECT rec_id, name, substr(name, 1, {ER_BLOCK_LEN}) AS blk
            FROM records)"""


def er_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rec_id, name, blk) — the blocked record set, built with the
    SAME SQL text the oracle uses (run through Spark SQL over a temp
    view would drag session state; instead the expression strings are
    evaluated as columns — identical semantics, one codegen scan)."""
    c = table(spark, sf_dir, "customer")
    name = F.expr(_name_expr("STRING"))
    base = c.select(F.col("c_custkey").alias("rec_id"), name.alias("name"))
    v1 = base.filter(F.col("rec_id") % ER_V1_MOD == 0).select(
        (F.col("rec_id") + ER_V1_OFFSET).alias("rec_id"),
        F.expr("substr(name, 1, 10) || substr(name, 12)").alias("name"),
    )
    v2 = base.filter(F.col("rec_id") % ER_V2_MOD == 0).select(
        (F.col("rec_id") + ER_V2_OFFSET).alias("rec_id"),
        F.expr(
            "substr(name, 1, 12) || substr(name, 12, 1) || substr(name, 13)"
        ).alias("name"),
    )
    rec = base.unionAll(v1).unionAll(v2)
    return rec.select(
        "rec_id", "name", F.substring("name", 1, ER_BLOCK_LEN).alias("blk")
    )


def er_match_pairs(records: DataFrame) -> DataFrame:
    """Blocked candidate pairs verified at Levenshtein ≤ {ER_MAX_LEV}.
    The block equi-join is the ONLY pair generator; the edit-distance
    verify runs on the bounded in-block candidates.

    fan_out (round 14): the verify is CPU-bound (levenshtein per
    candidate) and the broadcast-join STREAM side otherwise inherits
    the union-of-scans split count — 3 tasks on a one-split local
    corpus (measured 5.3 s); no-op at scale."""
    records = fan_out(records)
    a = records.select(
        F.col("rec_id").alias("id1"), F.col("name").alias("name1"), "blk"
    )
    b = records.select(
        F.col("rec_id").alias("id2"), F.col("name").alias("name2"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            "name1",
            "name2",
            F.levenshtein("name1", "name2").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= ER_MAX_LEV)
    )


@register(
    "er_match",
    oracle="WITH "
    + _records_sql("VARCHAR")
    + f"""
SELECT a.rec_id AS id1, b.rec_id AS id2, a.name AS name1, b.name AS name2,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.rec_id < b.rec_id
WHERE levenshtein(a.name, b.name) <= {ER_MAX_LEV}
""",
)
def er_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage MATCH pairs: blocking-key equi-join + Levenshtein
    verify over the synthesized dirty-customer record set (originals ∪
    planted single-edit variants).  Levenshtein is plain edit distance
    in both engines, so the key is value-exact; the planted variants
    give an exact recall truth (pinned at 1.0 in the property tests —
    a matcher that misses a planted variant is wrong, not unlucky).

    Scale: in-block candidate fan-out is bounded by the block size
    (~hundreds of records for the 10-char prefix ≡ custkey // 100);
    production adds a df-cap on megablocks and further blocking passes
    — the `dedup_winnow` discipline, stated in the module docstring.
    """
    return er_match_pairs(er_records(spark, sf_dir))


@register(
    "er_clusters",
    oracle="WITH RECURSIVE "
    + _records_sql("VARCHAR")
    + f""",
m AS (
  SELECT a.rec_id AS u, b.rec_id AS v
  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.rec_id <> b.rec_id
  WHERE levenshtein(a.name, b.name) <= {ER_MAX_LEV}
),
walk AS (
  SELECT rec_id AS start, rec_id AS node FROM records
  UNION
  SELECT w.start, m.v FROM walk w JOIN m ON w.node = m.u
),
comp AS (SELECT start AS rec_id, CAST(min(node) AS BIGINT) AS entity_id
         FROM walk GROUP BY start)
SELECT rec_id, entity_id FROM comp
""",
)
def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity ids from the match graph: connected components over the
    `er_match` pairs, each record labeled with the minimum rec_id of
    its component (singletons keep their own id) — the transitive-
    closure step that turns pairwise matches into entities, including
    its documented hazard: single-edit chains through shared-variant
    collisions merge into multi-record entities (max ≈ 12 on the
    fixture), exactly why production ER reviews cluster sizes.

    The clustering EXPLOITS THE BLOCKING STRUCTURE instead of running
    the generic iterative min-label loop: a match pair can only exist
    inside one block (the pair generator is the block equi-join), so
    components never cross block boundaries and the transitive closure
    is an embarrassingly block-parallel union-find — ONE blk-keyed
    shuffle + an Arrow `applyInPandas` over bounded blocks (in-block
    verify vectorized, `_pairs_lev_le1`), where the generic
    `connected_components` (kept for truly global graphs like
    `dedup_clusters`) pays one shuffle round PER DIAMETER HOP — ~12
    rounds on these chain-shaped entities, measured 22 s at sf0.001
    vs under 7 s for 1.5M customers here.  The oracle walks the same
    graph with a recursive CTE (the `dedup_clusters` pattern), blind
    to either execution strategy.
    """
    records = er_records(spark, sf_dir)

    def _cluster(pdf):
        import pandas as pd

        ids = pdf["rec_id"].to_numpy()
        parent = list(range(len(ids)))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i, j in _pairs_lev_le1(pdf["name"].tolist()):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        # Union by index order + min-id relabel: component label = the
        # minimum rec_id in the set (ids are not sorted within the
        # block, so map roots to their set's min id explicitly).
        root_min: dict[int, int] = {}
        for i in range(len(ids)):
            r = find(i)
            root_min[r] = min(root_min.get(r, int(ids[i])), int(ids[i]))
        return pd.DataFrame(
            {
                "rec_id": [int(x) for x in ids],
                "entity_id": [root_min[find(i)] for i in range(len(ids))],
            }
        )

    # Explicit-width repartition on the block key: the union-find is
    # PYTHON-CPU-bound (O(block²) verifies per block), and AQE's
    # byte-based coalescing would funnel thousands of blocks into 2-3
    # post-shuffle partitions (measured: 17 s at 150k customers, the
    # Arrow workers serialized).  hashpartitioning(blk, N) satisfies
    # applyInPandas' clustered-distribution requirement for any N, so
    # this stays the plan's ONLY exchange (pinned in
    # test_plan_shapes.py) — the spread_for_decode lesson applied to a
    # grouped map.
    spread = records.repartition(
        spark.sparkContext.defaultParallelism, "blk"
    )
    return spread.groupBy("blk").applyInPandas(
        _cluster, schema="rec_id long, entity_id long"
    )
