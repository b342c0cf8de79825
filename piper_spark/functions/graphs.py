"""Graph operators: PageRank, triangle counting, neighbor-set link
prediction — the iterative/structural family the engine's dedup
clustering (functions/dedup.py connected_components) already borders
on, promoted to first-class graph analytics.

The corpus carries no explicit link column, so a deterministic link
graph is synthesized from doc_ids IN BOTH ENGINES (the `dedup_url` /
`text_pii` augmentation precedent): each document links to up to
three targets of a fixed quadratic map.  The quadratic term is what
makes the graph non-regular — an affine map `(a·id + c) % n` is a
bijection per link slot (every in-degree exactly 3, PageRank exactly
uniform, measured before this design), while `id² · 7 + id · 31 + 97c`
folds 0/2/4 quadratic-residue preimages onto each target, giving the
skewed in-degree distribution (0..~20 at sf0.01) iterative ranking
needs to be non-trivial.  The third link exists only for even ids so
out-degree varies too.  In production the edge relation is a real
(src, dst) table and every query below runs on it unchanged; the
synthesis also bounds id² · 7 < 2³·10¹² at the 500k-doc scale corpus,
far inside int64.

Scale shape notes live on each operator; the common principle: every
stage is a keyed equi-join or keyed aggregate on (src|dst|node), never
all-pairs, and iteration state (ranks, labels) is persisted per round
with the previous generation unpersisted, so lineage stays
one-iteration deep (the connected_components discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import row_count, table

#: PageRank geometry: ranks are integers scaled by 10¹² (exact across
#: engines — no float sums), damping 0.85 as the exact rational
#: (15·base + 85·Σcontrib) div 100, a fixed 3 power-iterations
#: (unrolled verbatim in the oracle — same arithmetic, same floor
#: divisions).  Worst-case per-node inflow ≈ indeg_max · SCALE ≈
#: 20 · 10¹² and ×85 stays < 2·10¹⁵, no overflow headroom concerns.
PR_SCALE = 1_000_000_000_000
PR_ITERS = 3

#: Wedge-join hub cap for `graph_neighbor_jaccard`: wedges routed
#: through a common neighbor of degree > NEIGHBOR_HUB_CAP are dropped
#: (the WINNOW_MAX_DF discipline applied to graphs — a celebrity node
#: would otherwise fan out deg² candidate pairs).  A no-op on the
#: fixture (max degree ≈ 20) but bounds the 100 TB worst case by
#: construction; mirrored in the oracle so the key stays value-exact.
NEIGHBOR_HUB_CAP = 64

#: Shared directed-edge CTE (`edges(src, dst)`) for all three oracles.
_EDGES_SQL = """
n AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id * doc_id * 7 + doc_id * 31 + c * 97) % n.n AS dst
  FROM documents CROSS JOIN n, (VALUES (1), (2), (3)) AS t(c)
  WHERE (doc_id * doc_id * 7 + doc_id * 31 + c * 97) % n.n <> doc_id
    AND NOT (c = 3 AND doc_id % 2 = 1)
)"""

#: Shared undirected view: symmetrized distinct edges + degrees.
_UND_SQL = """
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
dg AS (SELECT u, count(*) AS d FROM sym GROUP BY u)"""


def link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized directed edge relation (src, dst) — one codegen
    projection over the documents scan.  `n` comes from the parquet
    footer (`row_count` — no Spark job), the same metadata-only count
    `derived_band_bits` uses; the oracle's `count(*)` CTE sees the
    identical value."""
    n = row_count(spark, sf_dir, "documents")
    d = table(spark, sf_dir, "documents").select("doc_id")
    e = d.select(
        "doc_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("c")
    )
    dst = (
        F.col("doc_id") * F.col("doc_id") * 7
        + F.col("doc_id") * 31
        + F.col("c") * 97
    ) % F.lit(n)
    return (
        e.filter(~((F.col("c") == 3) & (F.col("doc_id") % 2 == 1)))
        .select(F.col("doc_id").alias("src"), dst.alias("dst"))
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )


def undirected(edges: DataFrame) -> DataFrame:
    """Symmetrized simple graph as (u, v) with BOTH directions present
    (each undirected edge contributes two rows)."""
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    return und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _pr_iter_sql(t: int, p: int) -> str:
    return f"""
r{t} AS (
  SELECT d.doc_id AS id,
         ({15 * PR_SCALE} + 85 * COALESCE(s.contrib, 0)) // 100 AS rank
  FROM documents d LEFT JOIN (
    SELECT e.dst, sum(r.rank // g.outdeg) AS contrib
    FROM edges e JOIN r{p} r ON r.id = e.src JOIN deg g ON g.src = e.src
    GROUP BY e.dst) s ON s.dst = d.doc_id
)"""


_PAGERANK_SQL = (
    "WITH "
    + _EDGES_SQL
    + """,
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS id, 1000000000000::BIGINT AS rank FROM documents),"""
    + ",".join(_pr_iter_sql(t, t - 1) for t in range(1, PR_ITERS + 1))
    + f"""
SELECT id AS doc_id, CAST(rank AS BIGINT) AS pagerank FROM r{PR_ITERS}
"""
)


@register("graph_pagerank", oracle=_PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (Page et al. 1999) over the synthesized link graph —
    fixed {PR_ITERS} power iterations in EXACT integer arithmetic
    (rank·10¹², damping as the rational (15·base + 85·Σ) div 100 with
    both floor divisions mirrored), so the unrolled-CTE oracle matches
    bit-for-bit where a float formulation would drift with summation
    order.  Fixed iteration count ⇒ no driver-side convergence
    `collect()` at all; production runs to an epsilon with the one
    scalar-per-round pattern of connected_components.

    Scale shape (the Pregel shuffle profile): per iteration ONE
    dst-keyed shuffle of (dst, contrib) partial aggregates — map-side
    combine applies because contrib sums — plus one node-keyed left
    join for dangling/no-inlink nodes.  The edge⋈degree relation is
    persisted AND MATERIALIZED (an eager `count()`) before the loop —
    persist alone is lazy, so without an action the cache would be
    built and torn down inside one job and every iteration would
    recompute the join — and each rank generation is materialized the
    same way before the previous one is unpersisted, keeping lineage
    one round deep for real.  The {PR_ITERS} materializing counts are
    the iterative-algorithm tax (same shape as connected_components'
    one scalar per round).  The FINAL generation stays cached —
    repo convention: the caller owns the returned relation's cache
    lifetime (unpersisting it here would force the collect to replay
    all {PR_ITERS} rounds from the unpersisted intermediates).  No
    broadcast of anything corpus-sized; nothing driver-side.
    """
    edges = link_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # persist + eager count: read once per iteration from the
    # contribution join (the count also materializes the cache —
    # a lazy persist never fills before a lazy unpersist drops it).
    ed = edges.join(deg, "src").persist()
    ed.count()
    nodes = table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    ranks = nodes.select("id", F.lit(PR_SCALE).cast("long").alias("rank"))
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                F.expr(
                    f"(cast({15 * PR_SCALE} as bigint)"
                    " + 85 * coalesce(contrib, cast(0 as bigint))) div 100"
                ).alias("rank"),
            )
            .persist()
        )
        new.count()
        ranks.unpersist()
        ranks = new
    ed.unpersist()
    return ranks.select(
        F.col("id").alias("doc_id"), F.col("rank").cast("long").alias("pagerank")
    )


@register(
    "graph_triangles",
    oracle="WITH "
    + _EDGES_SQL
    + ","
    + _UND_SQL
    + """,
ori AS (
  SELECT s.u, s.v FROM sym s JOIN dg du ON du.u = s.u JOIN dg dv ON dv.u = s.v
  WHERE (du.d, s.u) < (dv.d, s.v)
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM ori e1 JOIN ori e2 ON e1.v = e2.u
  JOIN ori e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY node
""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts by degree-ordered wedge join (the
    Schank & Wagner 2005 / Cohen 2009 MapReduce formulation): orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher, join oriented wedges u→v→w, then probe for the closing
    edge u→w.  Orientation caps every node's oriented out-degree at
    O(√m), so wedge fan-out is bounded even under power-law degrees —
    THE standard trick that makes distributed triangle counting
    feasible; without it a celebrity node generates deg² wedges.

    Shape: three keyed equi-joins (wedge join on v, closing probe on
    (u, w)) + one final node aggregate — no all-pairs stage anywhere.
    The oriented edge relation is persisted once and read three times
    (both wedge aliases + the closing probe).
    """
    sym = undirected(link_edges(spark, sf_dir))
    dg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = dg.select(F.col("u").alias("_u"), F.col("d").alias("du"))
    dv = dg.select(F.col("u").alias("_v"), F.col("d").alias("dv"))
    # persist: read from three aliases by the wedge + closing joins.
    ori = (
        sym.join(du, sym["u"] == du["_u"])
        .join(dv, sym["v"] == dv["_v"])
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .persist()
    )
    e1 = ori.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = ori.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = ori.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


@register(
    "graph_neighbor_jaccard",
    oracle="WITH "
    + _EDGES_SQL
    + ","
    + _UND_SQL
    + f""",
common AS (
  SELECT s1.u AS x, s2.u AS y, CAST(count(*) AS BIGINT) AS common
  FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
  JOIN dg hub ON hub.u = s1.v
  WHERE hub.d <= {NEIGHBOR_HUB_CAP}
  GROUP BY s1.u, s2.u HAVING count(*) >= 2
)
SELECT c.x, c.y, c.common,
       c.common * 1000000 // (dx.d + dy.d - c.common) AS jacc_ppm
FROM common c JOIN dg dx ON dx.u = c.x JOIN dg dy ON dy.u = c.y
""",
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard (Liben-Nowell &
    Kleinberg 2003): for every node pair sharing ≥ 2 common neighbors,
    |Γ(x)∩Γ(y)| · 10⁶ div |Γ(x)∪Γ(y)| as an exact scaled integer
    (inclusion-exclusion on degrees — no per-pair set materialization,
    the same trick `dedup_jaccard_shingle` uses).

    Shape: the candidate pairs come from a WEDGE join keyed on the
    common neighbor — never an all-pairs comparison — with hubs above
    degree {NEIGHBOR_HUB_CAP} excluded as wedge centers (mirrored in
    the oracle), so per-center fan-out is ≤ C({NEIGHBOR_HUB_CAP}, 2)
    by construction: the df-cap discipline of `dedup_winnow` applied
    to graphs.  Then two node-keyed degree joins finish the score.
    """
    sym = undirected(link_edges(spark, sf_dir)).persist()
    dg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d")).persist()
    hub = dg.select(F.col("u").alias("_hub"), F.col("d").alias("hub_d"))
    s1 = sym.select(F.col("u").alias("x"), F.col("v").alias("w"))
    s2 = sym.select(F.col("u").alias("y"), F.col("v").alias("w"))
    common = (
        s1.join(s2, "w")
        .filter(F.col("x") < F.col("y"))
        .join(hub, F.col("w") == F.col("_hub"))
        .filter(F.col("hub_d") <= NEIGHBOR_HUB_CAP)
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= 2)
    )
    dx = dg.select(F.col("u").alias("x"), F.col("d").alias("dx"))
    dy = dg.select(F.col("u").alias("y"), F.col("d").alias("dy"))
    return (
        common.join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            "common",
            F.expr("common * 1000000 div (dx + dy - common)").alias("jacc_ppm"),
        )
    )


#: BFS geometry: multi-source frontier (every BFS_SOURCE_MOD-th doc),
#: fixed BFS_ROUNDS relaxations (unrolled verbatim in the oracle).
BFS_SOURCE_MOD, BFS_ROUNDS = 100, 3


def _bfs_round_sql(t: int, p: int) -> str:
    return f"""
d{t} AS (SELECT id, min(dist) AS dist FROM (
  SELECT * FROM d{p} UNION ALL
  SELECT e.dst AS id, d{p}.dist + 1 FROM edges e JOIN d{p} ON d{p}.id = e.src)
  GROUP BY id)"""


@register(
    "graph_bfs",
    oracle="WITH "
    + _EDGES_SQL
    + f""",
d0 AS (SELECT doc_id AS id, 0 AS dist FROM documents
       WHERE doc_id % {BFS_SOURCE_MOD} = 0),"""
    + ",".join(_bfs_round_sql(t, t - 1) for t in range(1, BFS_ROUNDS + 1))
    + f"""
SELECT id AS doc_id, CAST(dist AS BIGINT) AS dist FROM d{BFS_ROUNDS}
""",
)
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS distances — the traversal member of the graph
    family (PageRank ranks, triangles count structure, this measures
    REACH): hop distance ≤ {BFS_ROUNDS} from the source set (every
    {BFS_SOURCE_MOD}th doc), exact integer levels, the unrolled-CTE
    oracle mirroring each relaxation.  Fixed rounds keep the key
    value-exact; production BFS runs to frontier exhaustion with the
    one-scalar-per-round convergence check of `connected_components`.

    Scale shape: per round ONE src-keyed join (frontier ⋈ edges) + a
    min-aggregate — frontier-proportional work, the Pregel profile
    again; distances persisted AND materialized per generation (eager
    `count()` — a lazy persist never fills before a lazy unpersist
    drops it), previous generation unpersisted, lineage one round
    deep.  The final generation stays cached (caller-owned lifetime,
    the `graph_pagerank` convention).  Unreached nodes never enter
    the relation (no dense |V| state until reached — at 100 TB the
    early frontiers are tiny and so are the shuffles).
    """
    edges = link_edges(spark, sf_dir).persist()
    edges.count()
    d = table(spark, sf_dir, "documents")
    dist = d.filter(F.col("doc_id") % BFS_SOURCE_MOD == 0).select(
        F.col("doc_id").alias("id"), F.lit(0).alias("dist")
    ).persist()
    for _ in range(BFS_ROUNDS):
        relaxed = (
            edges.join(dist, edges["src"] == dist["id"])
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        new = (
            dist.unionAll(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        new.count()
        dist.unpersist()
        dist = new
    edges.unpersist()
    return dist.select(
        F.col("id").alias("doc_id"), F.col("dist").cast("long").alias("dist")
    )


#: k-core geometry: fixed KCORE_ROUNDS peel rounds at k = KCORE_K,
#: unrolled verbatim in the oracle.  K=4 peels ACTIVELY on the fixture
#: (216 → 204 → 194 survivors — not yet converged at round 4, so the
#: iteration is provably load-bearing); production peels to fixpoint
#: with the one-scalar-per-round convergence check of
#: connected_components.
KCORE_K, KCORE_ROUNDS = 4, 4


def _kcore_round_sql(t: int) -> str:
    return f"""
deg{t} AS (SELECT s.u AS id, count(*) AS d FROM sym s
           JOIN alive{t - 1} a ON a.id = s.u
           JOIN alive{t - 1} b ON b.id = s.v
           GROUP BY s.u),
alive{t} AS (SELECT id FROM deg{t} WHERE d >= {KCORE_K})"""


@register(
    "graph_kcore",
    oracle="WITH "
    + _EDGES_SQL
    + ","
    + _UND_SQL
    + """,
alive0 AS (SELECT DISTINCT u AS id FROM sym),"""
    + ",".join(_kcore_round_sql(t) for t in range(1, KCORE_ROUNDS + 1))
    + f"""
SELECT id AS doc_id, CAST(d AS BIGINT) AS deg
FROM deg{KCORE_ROUNDS} WHERE d >= {KCORE_K}
""",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-CORE decomposition (fixed-round peeling, Seidman 1983 /
    Batagelj-Zaveršnik) — the COHESION member completing the graph
    family (PageRank ranks, triangles count local structure, BFS
    measures reach, this finds the dense backbone): repeatedly drop
    nodes whose degree within the surviving subgraph is < {KCORE_K},
    {KCORE_ROUNDS} rounds, output the survivors with their
    last-round degree.  Exact integer counts ⇒ the unrolled-CTE
    oracle matches bit-for-bit.

    Scale shape: per round two node-keyed equi-joins (edge ⋈ alive on
    each endpoint — alive is node-sized, never broadcast) + ONE
    u-keyed count aggregate; work is proportional to SURVIVING edges,
    so rounds get cheaper as the graph peels.  The symmetrized edge
    relation is persisted + materialized once; each alive generation
    is persisted, materialized (eager count — the lazy-persist lesson,
    see graph_pagerank), and the previous generation unpersisted;
    lineage one round deep.  The final round's degree relation stays
    cached (caller-owned lifetime) and is the returned relation.
    """
    sym = undirected(link_edges(spark, sf_dir)).persist()
    sym.count()
    alive = sym.select(F.col("u").alias("id")).distinct().persist()
    alive.count()
    deg = None
    for t in range(1, KCORE_ROUNDS + 1):
        a1 = alive.select(F.col("id").alias("au"))
        a2 = alive.select(F.col("id").alias("av"))
        deg = (
            sym.join(a1, sym["u"] == F.col("au"))
            .join(a2, sym["v"] == F.col("av"))
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        if t == KCORE_ROUNDS:
            # Final round: only the degree relation is needed (the
            # output filters it directly) — building and eagerly
            # counting one more alive generation would be a wasted
            # job + cache fill.
            deg = deg.persist()
            deg.count()
            alive.unpersist()
            break
        new_alive = (
            deg.filter(F.col("d") >= KCORE_K)
            .select(F.col("u").alias("id"))
            .persist()
        )
        new_alive.count()
        alive.unpersist()
        alive = new_alive
    sym.unpersist()
    return deg.filter(F.col("d") >= KCORE_K).select(
        F.col("u").alias("doc_id"), F.col("d").cast("long").alias("deg")
    )


#: Label-propagation geometry: fixed LPA_ROUNDS synchronous rounds,
#: unrolled verbatim in the oracle.  The deterministic update rule is
#: "adopt the most frequent neighbor label, ties to the SMALLEST
#: label" — argmax made total, so the key stays value-exact where
#: classic randomized LPA is not reproducible.  R=3 on the fixture
#: leaves 97 communities (still coarsening: 114 at R=2, 83 at R=4),
#: so the iteration is provably load-bearing.
LPA_ROUNDS = 3


def _lpa_round_sql(t: int) -> str:
    return f"""
v{t} AS (SELECT s.u AS id, l.lab, count(*) AS c
         FROM sym s JOIN l{t - 1} l ON l.id = s.v GROUP BY s.u, l.lab),
l{t} AS (SELECT id, CAST(min(lab) FILTER (WHERE c = mc) AS BIGINT) AS lab
         FROM (SELECT id, lab, c, max(c) OVER (PARTITION BY id) AS mc
               FROM v{t})
         GROUP BY id)"""


@register(
    "graph_lpa",
    oracle="WITH "
    + _EDGES_SQL
    + ","
    + _UND_SQL
    + """,
l0 AS (SELECT DISTINCT u AS id, u AS lab FROM sym),"""
    + ",".join(_lpa_round_sql(t) for t in range(1, LPA_ROUNDS + 1))
    + f"""
SELECT id AS doc_id, lab AS community FROM l{LPA_ROUNDS}
""",
)
def graph_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al. 2007, made deterministic): every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors, ties to the smallest — {LPA_ROUNDS} fixed rounds,
    unrolled verbatim in the oracle.  Completes the graph family's
    GROUPING axis (k-core finds the dense backbone, this partitions
    the whole graph; connected_components in functions/dedup.py is
    the degenerate always-adopt-min rule).

    Scale shape: per round one v-keyed join (labels ⋈ edges) feeding
    a (node, label) partial-agg count, then one node-keyed argmax
    reduce — the argmax is a single `max(struct(count, -label))`
    aggregate, partial-agg-able, NOT a per-node window (the oracle's
    window form is the same math; the engine keeps the combiner
    shape).  Label generations persisted + materialized (eager count,
    the graph_pagerank lazy-persist lesson), previous unpersisted,
    final cached caller-owned.
    """
    sym = undirected(link_edges(spark, sf_dir)).persist()
    sym.count()
    labels = sym.select(F.col("u").alias("id"), F.col("u").alias("lab")).distinct().persist()
    labels.count()
    for _ in range(LPA_ROUNDS):
        votes = (
            sym.join(labels, sym["v"] == labels["id"])
            .select(F.col("u"), F.col("lab"))
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        new = (
            votes.groupBy("u")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).alias("nl"))).alias("m"))
            .select(F.col("u").alias("id"), (-F.col("m.nl")).cast("long").alias("lab"))
            .persist()
        )
        new.count()
        labels.unpersist()
        labels = new
    sym.unpersist()
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lab").cast("long").alias("community")
    )
