"""Fixed-point PageRank over the part co-purchase graph.

Iterative graph algorithms are the canonical "Spark can, a warehouse
can't comfortably" workload (the reference delegates everything relational
to PostgreSQL/Vertica and has no graph surface at all — SURVEY §2
C-extensions). This module runs PageRank over the undirected co-purchase
graph already mined by ``part_copurchase_pairs`` (plans/analytics.py):
nodes are parts, an edge links two parts that ever co-occur in an order.

Design decisions, all scale- or determinism-driven:

- **Edges are built with an order-blocked self-join** (shuffle on
  l_orderkey, pairs explode only within a basket — O(rows x basket), never
  O(parts^2)), then symmetrized. Same shape as the pair-mining query.
- **Fixed-point integer arithmetic.** Float PageRank is order-dependent:
  SUM(double) over incoming contributions reduces in engine- and
  partition-dependent order, so Spark and DuckDB would diverge in the last
  bits and the driver's value-hash would flap. Instead ranks live in
  integer units of 1e-12: contribution = units div degree, damping =
  (85 * sum) div 100 — every op is exact BIGINT arithmetic, identical on
  any engine and any partitioning. (Same trick as the exact-integer
  mixture plan in llmprep.py.)
- **3 unrolled iterations in ONE Catalyst plan.** Each iteration is an
  equi-join of ranks with edges on the source key plus a groupBy on the
  destination — both hash-partition on the part key, so AQE coalesces and
  re-uses the exchange family. At cluster scale the ranks side is tiny
  relative to edges; Catalyst broadcast-joins it automatically under the
  threshold. Unbounded iteration counts would checkpoint per round like
  operators/clustering.py; 3 rounds is plan-depth-safe without it.
- Dangling nodes cannot exist: the graph is symmetrized, so every node has
  degree >= 1; the left join from the node set is belt-and-braces.

Output: top 30 parts by rank with exact integer rank units (hash-stable)
and a human-readable double derived from them by one exact division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.operators.lineage import (
    truncate as _truncate,
    truncate_eager as _truncate_eager,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

UNIT = 1_000_000_000_000  # rank fixed-point denominator (1e-12 units)
PR_ITERS = 3
PR_TOP = 30


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric distinct edge list (src, dst) of parts sharing an order."""
    lines = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = lines.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = lines.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("pa") < F.col("pb")))
        .select("pa", "pb").distinct()
    )
    return pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )


# The symmetric edge list is the shared input of the whole graph family
# (PageRank, k-core; the triangle census uses the support-filtered variant).
# PageRank and k-core each used to rebuild it — distinct + order-blocked
# self-join + distinct, ~2s of the 5.6s/7.1s walls at sf0.1 — so the build
# is checkpointed ONCE per (session, sf_dir) and reused (round-9 verdict
# task #2). The cache is tiny (one edge DataFrame per sf_dir; the sf0.1
# list is ~100k rows of two BIGINTs) and keyed by applicationId so a new
# session never sees another session's dead checkpoint blocks.
_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}


def shared_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGE_CACHE.get(key)
    if cached is None:
        li = load_table(spark, "lineitem", sf_dir)
        cached = copurchase_edges(li).transform(_truncate_eager)
        _EDGE_CACHE.clear()  # one live entry: drop stale sf_dirs' blocks
        _EDGE_CACHE[key] = cached
    return cached


def pagerank(edges: DataFrame, iters: int = PR_ITERS,
             materialized: bool = False) -> DataFrame:
    """Fixed-point PageRank. edges: symmetric (src, dst). Returns
    (part, rank_units) for every node."""
    # materialize the edge list ONCE: it is referenced in every iteration's
    # contribution join, and without this the order-blocked edge build
    # (distinct + self-join + distinct) re-executes per round. Callers that
    # pass an already-checkpointed list (shared_copurchase_edges) skip the
    # redundant re-copy.
    if not materialized:
        edges = edges.transform(_truncate_eager)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("part"), "deg")
    n = nodes.groupBy().agg(F.count("*").alias("n"))
    # every node starts with UNIT div N units; base = (15 * u0) div 100
    init = nodes.crossJoin(F.broadcast(n)).select(
        "part", "deg",
        F.expr(f"{UNIT} div n").alias("u0"),
    )
    ranks = init.select("part", "deg", F.col("u0").alias("units"),
                        F.expr(f"(15 * u0) div 100").alias("base"))
    for _ in range(iters):
        contrib = (
            ranks.select(F.col("part").alias("src"),
                         F.expr("units div deg").alias("c"))
            .join(edges, "src")
            .groupBy("dst").agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.select("part", "deg", "base")
            .join(contrib, ranks.part == contrib.dst, "left")
            .select(
                "part", "deg", "base",
                (F.col("base")
                 + F.expr("(85 * coalesce(inflow, 0)) div 100")).alias("units"),
            )
        )
    return ranks.select("part", "units")


def _pagerank_oracle_sql() -> str:
    it = """
    it{i} AS (
      -- CAST: SUM(BIGINT) is HUGEINT in DuckDB, which pandas renders as
      -- float and the driver would hash 8.3e8 vs Spark's long
      SELECT n.part, n.deg, n.base,
             CAST(n.base + (85 * COALESCE(s.inflow, 0)) // 100 AS BIGINT) AS units
      FROM n LEFT JOIN (
        SELECT e.dst, SUM(r.units // r.deg) AS inflow
        FROM it{p} r JOIN edges e ON e.src = r.part
        GROUP BY e.dst
      ) s ON s.dst = n.part
    )"""
    chain = ",".join(it.format(i=i, p=i - 1) for i in range(1, PR_ITERS + 1))
    return f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION ALL
      SELECT pb AS src, pa AS dst FROM pairs
    ),
    deg AS (SELECT src AS part, COUNT(*) AS deg FROM edges GROUP BY src),
    n AS (
      SELECT part, deg,
             {UNIT} // (SELECT COUNT(*) FROM deg) AS u0,
             (15 * ({UNIT} // (SELECT COUNT(*) FROM deg))) // 100 AS base
      FROM deg
    ),
    it0 AS (SELECT part, deg, base, u0 AS units FROM n),
    {chain}
    -- rank is ONE exact double division of the integer units — no ROUND:
    -- units/1e12 has up to 12 exact decimal digits, so rounding at 10
    -- digits hits a genuine decimal half-tie whenever the last two digits
    -- are 50 (~1% of rows), and the engines' tie handling on the binary
    -- approximation is the one place they can disagree
    SELECT part, units AS rank_units,
           CAST(units AS DOUBLE) / {UNIT} AS rank
    FROM it{PR_ITERS}
    ORDER BY rank_units DESC, part
    LIMIT {PR_TOP}
    """


@register(
    "pagerank_copurchase",
    oracle=_pagerank_oracle_sql(),
    doc=f"{PR_ITERS}-iteration fixed-point PageRank over the symmetric part "
    "co-purchase graph (order-blocked edge build, integer rank units for "
    "cross-engine hash stability). The iterative-graph workload class the "
    "reference's warehouse delegation cannot express.",
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(shared_copurchase_edges(spark, sf_dir), materialized=True)
    return (
        pr.select(
            "part",
            F.col("units").alias("rank_units"),
            # exact division only — see the oracle note on ROUND half-ties
            (F.col("units").cast("double") / UNIT).alias("rank"),
        )
        .orderBy(F.col("rank_units").desc(), "part")
        .limit(PR_TOP)
    )


# --- triangle counting -------------------------------------------------------

TRI_MIN_SUPPORT = 2


def support_pairs(lineitem: DataFrame, min_support: int = TRI_MIN_SUPPORT) -> DataFrame:
    """Oriented (pa < pb) co-purchase edges kept only when the pair
    co-occurs in >= min_support orders — the noise floor that keeps the
    triangle-graph dense structure and drops one-off coincidences (and, at
    scale, bounds the wedge space)."""
    lines = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = lines.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = lines.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb").agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_support)
        .select("pa", "pb")
    )


def degree_oriented_edges(pairs: DataFrame) -> DataFrame:
    """Re-orient each undirected edge from its lower-(degree, id) endpoint
    to the higher one. Output: (src, dst, dd, dst_id ordering struct
    columns sd/dd carried for the wedge ordering).

    This is THE skew cap for triangle counting on power-law graphs: a hub
    with degree h receives all its edges as IN-edges (every neighbor has
    lower degree), so the hub generates ZERO wedge candidates instead of
    C(h, 2) — per-node out-degree is bounded by O(sqrt(m)) and the wedge
    join's worst key disappears. Output stats are orientation-invariant,
    so the DuckDB oracle keeps the simpler id-orientation and still
    hash-matches."""
    sym = pairs.select(F.col("pa").alias("p"), F.col("pb").alias("q")).unionAll(
        pairs.select(F.col("pb").alias("p"), F.col("pa").alias("q"))
    )
    deg = sym.groupBy("p").agg(F.count("*").alias("d"))
    e = (
        pairs.join(deg.select(F.col("p").alias("pa"), F.col("d").alias("da")), "pa")
        .join(deg.select(F.col("p").alias("pb"), F.col("d").alias("db")), "pb")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    return e.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )


def oriented_wedge_candidates(oriented: DataFrame) -> DataFrame:
    """Wedge candidates (v, w) from pairs of out-edges at each source,
    ordered so each unordered out-neighbor pair appears once. The count of
    these rows is the actual join work — the planted-hub test pins that a
    hub contributes zero."""
    e1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col("dst_deg").alias("dv"),
    )
    e2 = oriented.select(
        F.col("src").alias("u2"), F.col("dst").alias("w"),
        F.col("dst_deg").alias("dw"),
    )
    lower = (F.col("dv") < F.col("dw")) | (
        (F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w"))
    )
    return e1.join(e2, (F.col("u") == F.col("u2")) & lower).select("v", "w")


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Global triangle census: nodes, edges, wedges (= sum of C(deg,2)
    over undirected degrees — computed from the degree table, NO join),
    triangles, and the global clustering coefficient 3T/W.

    Triangles come from the DEGREE-ORDERED wedge join (see
    ``degree_oriented_edges``): candidates are pairs of out-neighbors
    under the (degree, id) acyclic orientation, closed by an equi-probe
    against the oriented edge set. Each triangle has exactly one vertex
    with two out-edges in an acyclic orientation, so it is counted exactly
    once — for ANY acyclic orientation, which is why the oracle can count
    with plain id-orientation and the outputs still agree."""
    # the support-filtered pair build (distinct + order-blocked self-join +
    # groupBy) feeds FOUR branches (sym x2, the orientation joins, edge
    # count) — materialize it once
    pairs = pairs.transform(_truncate_eager)
    sym = pairs.select(F.col("pa").alias("p"), F.col("pb").alias("q")).unionAll(
        pairs.select(F.col("pb").alias("p"), F.col("pa").alias("q"))
    )
    deg = sym.groupBy("p").agg(F.count("*").alias("d"))
    node_stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum(F.expr("d * (d - 1) div 2"))).alias("n_wedges"),
    )
    oriented = degree_oriented_edges(pairs).transform(_truncate_eager)
    closed = oriented_wedge_candidates(oriented).join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    )
    tri = closed.agg(F.count("*").alias("n_triangles"))
    edge_n = pairs.agg(F.count("*").alias("n_edges"))
    return (
        node_stats.crossJoin(F.broadcast(edge_n))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            # exact ppm integer division, then one exact double division:
            # 3T/W is a small rational, exactly the shape where ROUND()'s
            # decimal half-tie handling can differ between engines
            (F.expr("(3 * n_triangles * 1000000) div greatest(n_wedges, 1)")
             .cast("double") / F.lit(1000000.0)).alias("global_clustering"),
        )
    )


@register(
    "copurchase_triangles",
    oracle=f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
    ),
    sym AS (
      SELECT pa AS p, pb AS q FROM pairs
      UNION ALL SELECT pb AS p, pa AS q FROM pairs
    ),
    deg AS (SELECT p, COUNT(*) AS d FROM sym GROUP BY p),
    node_stats AS (
      SELECT COUNT(*) AS n_nodes,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e1.pb = e2.pa
      JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    edges AS (SELECT COUNT(*) AS n_edges FROM pairs)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CAST((3 * n_triangles * 1000000) // greatest(n_wedges, 1) AS DOUBLE)
             / 1000000.0 AS global_clustering
    FROM node_stats, edges, tri
    """,
    doc=f"Triangle census of the support>={TRI_MIN_SUPPORT} co-purchase "
    "graph: oriented wedge join closed by an edge probe (each triangle "
    "counted once), wedge count from the degree table alone, global "
    "clustering coefficient 3T/W.",
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return triangle_stats(support_pairs(li))


# --------------------------------------------------------------------------
# K-core peeling over the co-purchase graph.
# --------------------------------------------------------------------------

KCORE_K = 3       # minimum in-core degree
KCORE_ROUNDS = 4  # unrolled peel rounds (fixed on both engines)


def kcore_trajectory(edges: DataFrame, k: int = KCORE_K,
                     rounds: int = KCORE_ROUNDS,
                     materialized: bool = False) -> DataFrame:
    """K-core peeling trajectory: repeatedly delete nodes of degree < k
    and report (round, n_nodes, n_edges, min_degree) after each of
    ``rounds`` fixed peel rounds (round 0 = the input graph) — the
    dense-subgraph extraction a recommender or fraud pipeline runs on the
    co-occurrence graph. A fixed round budget replays exactly on both
    engines (the oracle unrolls the same rounds CTE-for-CTE); a graph
    that stabilizes earlier just repeats its fixed point, so an engine
    early-break would be equivalent by induction.

    100 TB shape: each round is two node-keyed semi joins (surviving
    edges) + one map-side-combined degree groupBy — the same
    exchange-reuse family as PageRank's contribution join; the edge list
    checkpoints per round so lineage stays O(1) and the per-round stat
    aggregates don't re-execute the whole peel chain. Counts are exact
    integers throughout (n_edges = sum(deg) div 2 on the symmetric
    list), so the trajectory is engine-identical.

    The per-round checkpoints are LAZY (round-9 verdict task #2: eager
    checkpoints paid ~0.5s of dedicated-job shuffle latency per round —
    a latency floor, not data work). Nothing data-dependent controls the
    loop (fixed round budget), so no per-round probe is needed at all:
    the single stats-union job at the end materializes the chain
    edges_1 -> ... -> edges_R in order on first touch — the whole peel
    runs in ONE job instead of 1 + 2*rounds.
    """
    if not materialized:
        edges = edges.transform(_truncate_eager)
    stats = []
    for r in range(rounds + 1):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        stats.append(
            deg.agg(
                F.lit(r).cast("int").alias("round"),
                F.count("*").alias("n_nodes"),
                F.coalesce(F.expr("sum(deg) div 2"), F.lit(0))
                .alias("n_edges"),
                F.min("deg").alias("min_degree"),
            )
        )
        if r == rounds:
            break
        keep = deg.filter(F.col("deg") >= k).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .transform(_truncate)
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")


def _kcore_oracle_sql() -> str:
    # AS MATERIALIZED: each round's edge list is referenced by the next
    # round AND its stat row — without it DuckDB inlines multi-referenced
    # CTEs and the peel chain expands exponentially
    rnd = """
    k{p} AS MATERIALIZED (SELECT src FROM d{p} WHERE deg >= {K}),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{p} e
      JOIN k{p} a ON e.src = a.src
      JOIN k{p} b ON e.dst = b.src
    ),
    d{i} AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e{i} GROUP BY src
    )"""
    chain = ",".join(
        rnd.format(i=i, p=i - 1, K=KCORE_K)
        for i in range(1, KCORE_ROUNDS + 1)
    )
    stat = ("SELECT CAST({i} AS INTEGER) AS round, "
            "CAST(COUNT(*) AS BIGINT) AS n_nodes, "
            "CAST(COALESCE(SUM(deg) // 2, 0) AS BIGINT) AS n_edges, "
            "CAST(MIN(deg) AS BIGINT) AS min_degree FROM d{i}")
    stats = " UNION ALL ".join(
        stat.format(i=i) for i in range(KCORE_ROUNDS + 1)
    )
    return f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e0 AS MATERIALIZED (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION ALL
      SELECT pb AS src, pa AS dst FROM pairs
    ),
    d0 AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e0 GROUP BY src
    ),
    {chain}
    SELECT * FROM ({stats}) ORDER BY round
    """


@register(
    "kcore_copurchase",
    oracle=_kcore_oracle_sql(),
    doc=f"{KCORE_ROUNDS}-round {KCORE_K}-core peeling trajectory over the "
    "symmetric part co-purchase graph: per round, nodes of degree < "
    f"{KCORE_K} are deleted and (n_nodes, n_edges, min_degree) reported — "
    "the dense-subgraph extraction beside PageRank and the triangle "
    "count. Two node-keyed semi joins + one degree groupBy per round, "
    "edge list checkpointed per round, exact integer counts; the oracle "
    "unrolls the identical rounds with materialized CTEs.",
)
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore_trajectory(shared_copurchase_edges(spark, sf_dir),
                            materialized=True)


# --------------------------------------------------------------------------
# Stationary distribution of the event-type Markov chain.
# --------------------------------------------------------------------------

MC_ROUNDS = 12
MC_UNIT = 1_000_000_000_000


def markov_stationary(events: DataFrame, rounds: int = MC_ROUNDS) -> DataFrame:
    """(event_type, pi_units, pi) — the stationary distribution of the
    per-user event-type Markov chain (the long-run share of time a user
    path spends in each state), by ``rounds`` unrolled power-iteration
    steps on the transition-count matrix. The analytical capstone of the
    transition matrix: where the chain settles, not just where it steps.

    Exactness: the chain reduces to exact BIGINT transition counts with
    ONE user-keyed window shuffle; every iteration step is integer
    arithmetic —  contribution = (pi_i * n_ij) div r_i  in 1e-12 units —
    so all rounds are engine-identical (the oracle unrolls them
    CTE-for-CTE). The sub-unit mass DIV truncation drops per round is
    identical on both engines and bounded by types*rounds units (~1e-11).

    100 TB shape: the corpus-wide work is the lag window + pair groupBy
    (same as event_transition_matrix); the iteration then runs on the
    O(types^2) count table — sketch-sized regardless of corpus.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(_truncate_eager)   # every round re-reads this tiny table
    )
    row_tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("r"))
    trans = pairs.join(row_tot, "prev_type")
    states = row_tot.select(F.col("prev_type").alias("event_type"))
    n_states = states.agg(F.count(F.lit(1)).alias("k"))
    pi = states.crossJoin(F.broadcast(n_states)).select(
        "event_type", F.expr(f"{MC_UNIT} div k").alias("units"))
    for _ in range(rounds):
        pi = (
            pi.join(trans, pi.event_type == trans.prev_type)
            .select(
                F.col("curr_type").alias("event_type"),
                F.expr("(units * n) div r").alias("c"),
            )
            .groupBy("event_type")
            .agg(F.sum("c").alias("units"))
        )
    return pi.select(
        "event_type", F.col("units").alias("pi_units"),
        F.round(F.expr(f"CAST(units AS DOUBLE) / {MC_UNIT}"), 6).alias("pi"),
    ).orderBy("event_type")


def _markov_oracle_sql() -> str:
    it = """
    it{i} AS MATERIALIZED (
      SELECT t.curr_type AS event_type,
             CAST(SUM((p.units * t.n) // t.r) AS BIGINT) AS units
      FROM it{p} p JOIN trans t ON t.prev_type = p.event_type
      GROUP BY t.curr_type
    )"""
    chain = ",".join(it.format(i=i, p=i - 1)
                     for i in range(1, MC_ROUNDS + 1))
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS MATERIALIZED (
      SELECT prev_type, event_type AS curr_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    row_tot AS MATERIALIZED (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS r
      FROM pairs GROUP BY prev_type
    ),
    trans AS MATERIALIZED (
      SELECT p.prev_type, p.curr_type, p.n, rt.r
      FROM pairs p JOIN row_tot rt ON rt.prev_type = p.prev_type
    ),
    it0 AS MATERIALIZED (
      SELECT prev_type AS event_type,
             {MC_UNIT} // (SELECT COUNT(*) FROM row_tot) AS units
      FROM row_tot
    ),
    {chain}
    SELECT event_type, units AS pi_units,
           ROUND(CAST(units AS DOUBLE) / {MC_UNIT}, 6) AS pi
    FROM it{MC_ROUNDS}
    ORDER BY event_type
    """


@register(
    "event_markov_stationary",
    oracle=_markov_oracle_sql(),
    doc=f"{MC_ROUNDS}-step fixed-point power iteration to the stationary "
    "distribution of the per-user event-type Markov chain: one user-keyed "
    "lag window + pair groupBy reduces the corpus to BIGINT transition "
    "counts; every iteration step is (pi*n) div r integer arithmetic on "
    "the O(types^2) table (oracle unrolled CTE-for-CTE, materialized) — "
    "the long-run state share behind the transition matrix.",
)
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_stationary(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Neighborhood Jaccard similarity — "parts bought in the same contexts":
# the graph-structural notion of substitutability (two parts are similar
# when their co-purchase NEIGHBORHOODS overlap, whether or not they ever
# share an order themselves). The link-prediction / recommendation
# primitive beside PageRank (importance), triangles (cohesion), and
# k-core (density).
# --------------------------------------------------------------------------

JAC_MAX_DEG = 64   # hub cap: see docstring
JAC_TOP = 20
JAC_FX = 1_000_000


def jaccard_neighbors(pairs: DataFrame, max_deg: int = JAC_MAX_DEG,
                      top: int = JAC_TOP) -> DataFrame:
    """Top ``top`` part pairs by neighborhood Jaccard
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over the support-filtered co-purchase
    graph: (part_a, part_b, common, deg_a, deg_b, jaccard).

    Skew cap: common-neighbor enumeration is a wedge join — Σ C(deg, 2)
    work, quadratic in hub degrees — so nodes with degree > ``max_deg``
    are dropped from the graph FIRST (both as centers and as endpoints).
    This is principled, not just cheap: a hub co-occurs with everything,
    so it carries no substitutability signal and only inflates every
    pair's union term; capped-degree wedge space is bounded by
    n * max_deg^2 at any corpus size. Degrees are recomputed on the
    capped graph so the ratio is self-consistent. Jaccard compares as
    exact integer fixed-point (common * 1e6 div union) with (a, b)
    tiebreak, so top-k is engine-deterministic.
    """
    sym = pairs.select(F.col("pa").alias("p"), F.col("pb").alias("q")) \
        .unionAll(pairs.select(F.col("pb").alias("p"),
                               F.col("pa").alias("q")))
    deg0 = sym.groupBy("p").agg(F.count("*").alias("d"))
    keep = deg0.where(F.col("d") <= max_deg).select("p")
    capped = (
        sym.join(keep, "p", "left_semi")
        .join(keep.select(F.col("p").alias("q")), "q", "left_semi")
        .transform(_truncate)  # feeds degrees + both wedge sides
    )
    deg = capped.groupBy("p").agg(F.count("*").alias("d"))
    e1 = capped.select(F.col("p").alias("u"), F.col("q").alias("a"))
    e2 = capped.select(F.col("p").alias("u2"), F.col("q").alias("b"))
    common = (
        e1.join(e2, (F.col("u") == F.col("u2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
    )
    scored = (
        common
        .join(deg.select(F.col("p").alias("a"), F.col("d").alias("deg_a")),
              "a")
        .join(deg.select(F.col("p").alias("b"), F.col("d").alias("deg_b")),
              "b")
        .withColumn("jac_fx", F.expr(
            f"(common * {JAC_FX}) div (deg_a + deg_b - common)"))
    )
    return (
        scored.select(
            F.col("a").alias("part_a"), F.col("b").alias("part_b"),
            "common", "deg_a", "deg_b",
            (F.col("jac_fx").cast("double") / JAC_FX).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "part_a", "part_b")
        .limit(top)
    )


@register(
    "copurchase_jaccard_neighbors",
    oracle=f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
    ),
    sym AS (
      SELECT pa AS p, pb AS q FROM pairs
      UNION ALL SELECT pb AS p, pa AS q FROM pairs
    ),
    deg0 AS (SELECT p, COUNT(*) AS d FROM sym GROUP BY p),
    keep AS (SELECT p FROM deg0 WHERE d <= {JAC_MAX_DEG}),
    capped AS (
      SELECT s.p, s.q FROM sym s
      JOIN keep k1 ON s.p = k1.p JOIN keep k2 ON s.q = k2.p
    ),
    deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
            FROM capped GROUP BY p),
    common AS (
      SELECT e1.q AS a, e2.q AS b, CAST(COUNT(*) AS BIGINT) AS common
      FROM capped e1 JOIN capped e2
        ON e1.p = e2.p AND e1.q < e2.q
      GROUP BY a, b
    )
    SELECT c.a AS part_a, c.b AS part_b, c.common,
           da.d AS deg_a, db.d AS deg_b,
           CAST((c.common * {JAC_FX}) // (da.d + db.d - c.common)
                AS DOUBLE) / {JAC_FX} AS jaccard
    FROM common c
    JOIN deg da ON da.p = c.a JOIN deg db ON db.p = c.b
    ORDER BY jaccard DESC, part_a, part_b
    LIMIT {JAC_TOP}
    """,
    doc=f"Top-{JAC_TOP} co-purchase part pairs by neighborhood Jaccard "
    "(common co-purchase contexts / union) over the support-filtered "
    f"graph with a degree-{JAC_MAX_DEG} hub cap — hubs carry no "
    "substitutability signal and their wedges are the one quadratic "
    "term, so capping bounds the wedge join at n*cap^2 at any corpus "
    "size. Exact fixed-point comparison + (a,b) tiebreak makes the "
    "top-k engine-deterministic. The link-prediction primitive of the "
    "graph family.",
)
def copurchase_jaccard_neighbors(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return jaccard_neighbors(support_pairs(li))


# --------------------------------------------------------------------------
# BFS reachability profile — how far the co-purchase neighborhood of the
# busiest part spreads, in unrolled breadth-first rounds. The reachability
# / ego-network primitive beside importance (PageRank), cohesion
# (triangles), density (k-core), and similarity (Jaccard).
# --------------------------------------------------------------------------

BFS_ROUNDS = 4


def bfs_depths(edges: DataFrame, rounds: int = BFS_ROUNDS) -> DataFrame:
    """(depth, n_nodes) — nodes first reached at each BFS depth 0..rounds
    from the deterministic seed (max degree, ties to the smallest part
    id) over the symmetric edge list.

    Unrolled rounds in one plan: frontier -> neighbor join -> anti-join
    against the visited set, each round one edge-keyed equi-join + one
    distinct — the iterative-reachability shape; per-round frontiers are
    checkpointed lazily so lineage stays O(1) and the final union runs
    as one job (the k-core pattern). Counts are exact integers, so the
    profile is engine-identical.
    """
    edges = edges.transform(_truncate)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    seed = (
        deg.orderBy(F.col("d").desc(), F.col("src").asc()).limit(1)
        .select(F.col("src").alias("node"))
        .transform(_truncate)
    )
    frontier = seed
    visited = seed
    stats = [frontier.agg(F.lit(0).cast("int").alias("depth"),
                          F.count(F.lit(1)).alias("n_nodes"))]
    for r in range(1, rounds + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node")).distinct()
            .join(visited, "node", "left_anti")
            .transform(_truncate)
        )
        stats.append(nxt.agg(F.lit(r).cast("int").alias("depth"),
                             F.count(F.lit(1)).alias("n_nodes")))
        visited = visited.unionByName(nxt).transform(_truncate)
        frontier = nxt
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.orderBy("depth")


def _bfs_oracle_sql() -> str:
    rnd = """
    f{i} AS MATERIALIZED (
      SELECT DISTINCT e.dst AS node
      FROM f{p} f JOIN edges e ON e.src = f.node
      WHERE e.dst NOT IN (SELECT node FROM v{p})
    ),
    v{i} AS MATERIALIZED (
      SELECT node FROM v{p} UNION SELECT node FROM f{i}
    )"""
    chain = ",".join(rnd.format(i=i, p=i - 1)
                     for i in range(1, BFS_ROUNDS + 1))
    stats = " UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS depth, "
        f"CAST(COUNT(*) AS BIGINT) AS n_nodes FROM f{i}"
        for i in range(BFS_ROUNDS + 1)
    )
    return f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS MATERIALIZED (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION ALL SELECT pb AS src, pa AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    f0 AS MATERIALIZED (
      SELECT src AS node FROM deg ORDER BY d DESC, src LIMIT 1
    ),
    v0 AS MATERIALIZED (SELECT node FROM f0),
    {chain}
    SELECT * FROM ({stats}) ORDER BY depth
    """


@register(
    "copurchase_bfs_depths",
    oracle=_bfs_oracle_sql(),
    doc=f"{BFS_ROUNDS}-round BFS reachability profile from the busiest "
    "part (max degree, deterministic tiebreak) over the symmetric "
    "co-purchase graph: per depth, the count of nodes FIRST reached "
    "there. Each round is one edge-keyed equi-join + distinct + "
    "anti-join against the visited set, frontiers lazily checkpointed "
    "so the whole walk runs as one job — the ego-network / 'how "
    "connected is the catalog' readout, exact integers throughout.",
)
def copurchase_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bfs_depths(shared_copurchase_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# Adamic-Adar link prediction — the degree-discounted common-neighbor
# score: a shared RARE neighbor is strong evidence two parts belong
# together, a shared popular one is weak. The standard upgrade over raw
# common-neighbor counts and the Jaccard ratio above.
# --------------------------------------------------------------------------


def adamic_adar_neighbors(pairs: DataFrame, max_deg: int = JAC_MAX_DEG,
                          top: int = JAC_TOP) -> DataFrame:
    """Top ``top`` part pairs by Adamic-Adar score
    sum over common neighbors u of 1/ln(deg(u)) —
    (part_a, part_b, common, aa_score).

    Same hub-capped wedge enumeration as the Jaccard operator (degree >
    ``max_deg`` nodes dropped, wedge space bounded by n*cap^2); the
    per-CENTER weight 1/ln(deg(u)) attaches BEFORE the wedge join (one
    broadcast-sized degree table), is fixed-pointed to exact 1e-9 BIGINT
    (ln is correctly rounded on both engines, drift.py's rule), and the
    per-pair score is an exact integer SUM — association-order-free, so
    the top-k ordering with (a, b) tiebreak is engine-deterministic.
    Degree-1 centers are excluded from the weight table before the
    expression evaluates (they generate no wedge, and ln(1) = 0 would
    raise under ANSI).
    """
    sym = pairs.select(F.col("pa").alias("p"), F.col("pb").alias("q")) \
        .unionAll(pairs.select(F.col("pb").alias("p"),
                               F.col("pa").alias("q")))
    deg0 = sym.groupBy("p").agg(F.count("*").alias("d"))
    keep = deg0.where(F.col("d") <= max_deg).select("p")
    capped = (
        sym.join(keep, "p", "left_semi")
        .join(keep.select(F.col("p").alias("q")), "q", "left_semi")
        .transform(_truncate)
    )
    deg = capped.groupBy("p").agg(F.count("*").alias("d"))
    # center weight: 1/ln(d) in 1e-9 fixed point, attached pre-wedge.
    # deg-1 nodes are excluded BEFORE the expression evaluates: they
    # generate no wedge anyway, but ln(1) = 0 would raise under ANSI
    # the moment the weight column is computed for them
    wdeg = deg.where(F.col("d") >= 2).selectExpr(
        "p",
        "CAST(FLOOR(1.0 / ln(CAST(d AS DOUBLE)) * 1000000000 + 0.5) "
        "AS BIGINT) AS w_fx")
    e1 = capped.join(wdeg, "p").select(
        F.col("p").alias("u"), F.col("q").alias("a"), "w_fx")
    e2 = capped.select(F.col("p").alias("u2"), F.col("q").alias("b"))
    scored = (
        e1.join(e2, (F.col("u") == F.col("u2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"),
             F.sum("w_fx").alias("aa_fx"))
    )
    return (
        scored.select(
            F.col("a").alias("part_a"), F.col("b").alias("part_b"),
            "common",
            F.round(F.col("aa_fx").cast("double") / 1e9, 6)
            .alias("aa_score"),
        )
        .orderBy(F.col("aa_fx").desc(), "part_a", "part_b")
        .limit(top)
    )


@register(
    "copurchase_adamic_adar",
    oracle=f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
    ),
    sym AS (
      SELECT pa AS p, pb AS q FROM pairs
      UNION ALL SELECT pb AS p, pa AS q FROM pairs
    ),
    deg0 AS (SELECT p, COUNT(*) AS d FROM sym GROUP BY p),
    keep AS (SELECT p FROM deg0 WHERE d <= {JAC_MAX_DEG}),
    capped AS (
      SELECT s.p, s.q FROM sym s
      JOIN keep k1 ON s.p = k1.p JOIN keep k2 ON s.q = k2.p
    ),
    deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
            FROM capped GROUP BY p),
    wdeg AS (
      SELECT p, CAST(FLOOR(1.0 / ln(CAST(d AS DOUBLE)) * 1000000000 + 0.5)
                     AS BIGINT) AS w_fx
      FROM deg WHERE d >= 2
    ),
    scored AS (
      SELECT e1.q AS a, e2.q AS b,
             CAST(COUNT(*) AS BIGINT) AS common,
             CAST(SUM(w.w_fx) AS BIGINT) AS aa_fx
      FROM capped e1
      JOIN wdeg w ON w.p = e1.p
      JOIN capped e2 ON e2.p = e1.p AND e1.q < e2.q
      GROUP BY a, b
    )
    SELECT a AS part_a, b AS part_b, common,
           ROUND(CAST(aa_fx AS DOUBLE) / 1e9, 6) AS aa_score
    FROM scored
    ORDER BY aa_fx DESC, part_a, part_b
    LIMIT {JAC_TOP}
    """,
    doc=f"Top-{JAC_TOP} Adamic-Adar link predictions over the hub-capped "
    "co-purchase graph: common neighbors weighted 1/ln(degree) — rare "
    "shared contexts count, popular ones barely — with the weight "
    "fixed-pointed per CENTER before the wedge join so the per-pair "
    "score is an exact integer sum (order-free, deterministic top-k). "
    "Same n*cap^2 wedge bound as the Jaccard twin.",
)
def copurchase_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return adamic_adar_neighbors(support_pairs(li))


# --------------------------------------------------------------------------
# Entropy rate of the event-type Markov chain — how predictable user
# behavior is, in nats per step: H = -sum_i pi_i sum_j p_ij ln p_ij.
# Composes the stationary distribution (power iteration above the
# transition table) with one entropy fold — all on the O(types^2) table.
# --------------------------------------------------------------------------

ER_FX = 1_000_000_000


def entropy_rate(events: DataFrame) -> DataFrame:
    """One row: (n_states, n_transitions, entropy_rate, uniform_bound) —
    the chain's entropy rate in nats/step next to its ln(k) ceiling.

    Every per-(i, j) term pi_i * p_ij * (-ln p_ij) is ONE shared
    fixed-order double expression over exact integers (pi in 1e-12 units
    from the unrolled power iteration, counts and row totals BIGINT),
    fixed-pointed to 1e-9 before the sum — association-order-free, so
    the scalar matches bit-for-bit. 100 TB shape: identical to the
    stationary distribution — one user-keyed lag window reduces the
    corpus; everything after is sketch-sized.
    """
    pi = markov_stationary(events).select("event_type", "pi_units")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("r"))
    terms = (
        pairs.join(row_tot, "prev_type")
        .join(F.broadcast(pi),
              F.col("prev_type") == F.col("event_type"))
        .selectExpr(
            "CAST(FLOOR((CAST(pi_units AS DOUBLE) / 1e12) "
            "* (CAST(n AS DOUBLE) / r) "
            f"* (-ln(CAST(n AS DOUBLE) / r)) * {ER_FX} + 0.5) AS BIGINT)"
            " AS h_fx",
            "n",
        )
    )
    k = row_tot.agg(F.count(F.lit(1)).alias("n_states"))
    return (
        terms.agg(F.sum("h_fx").alias("h_fx"),
                  F.sum("n").alias("n_transitions"))
        .crossJoin(F.broadcast(k))
        .selectExpr(
            "CAST(n_states AS BIGINT) AS n_states",
            "CAST(n_transitions AS BIGINT) AS n_transitions",
            f"ROUND(CAST(h_fx AS DOUBLE) / {ER_FX}, 6) AS entropy_rate",
            "ROUND(ln(CAST(n_states AS DOUBLE)), 6) AS uniform_bound",
        )
    )


def _entropy_rate_oracle_sql() -> str:
    it = """
    it{i} AS MATERIALIZED (
      SELECT t.curr_type AS event_type,
             CAST(SUM((p.units * t.n) // t.r) AS BIGINT) AS units
      FROM it{p} p JOIN trans t ON t.prev_type = p.event_type
      GROUP BY t.curr_type
    )"""
    chain = ",".join(it.format(i=i, p=i - 1)
                     for i in range(1, MC_ROUNDS + 1))
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS MATERIALIZED (
      SELECT prev_type, event_type AS curr_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    row_tot AS MATERIALIZED (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS r
      FROM pairs GROUP BY prev_type
    ),
    trans AS MATERIALIZED (
      SELECT p.prev_type, p.curr_type, p.n, rt.r
      FROM pairs p JOIN row_tot rt ON rt.prev_type = p.prev_type
    ),
    it0 AS MATERIALIZED (
      SELECT prev_type AS event_type,
             {MC_UNIT} // (SELECT COUNT(*) FROM row_tot) AS units
      FROM row_tot
    ),
    {chain},
    terms AS (
      SELECT CAST(FLOOR((CAST(pi.units AS DOUBLE) / 1e12)
                        * (CAST(t.n AS DOUBLE) / t.r)
                        * (-ln(CAST(t.n AS DOUBLE) / t.r)) * {ER_FX} + 0.5)
                  AS BIGINT) AS h_fx,
             t.n
      FROM trans t JOIN it{MC_ROUNDS} pi ON pi.event_type = t.prev_type
    ),
    k AS (SELECT COUNT(*) AS n_states FROM row_tot)
    SELECT CAST(n_states AS BIGINT) AS n_states,
           CAST((SELECT SUM(n) FROM terms) AS BIGINT) AS n_transitions,
           ROUND(CAST((SELECT SUM(h_fx) FROM terms) AS DOUBLE) / {ER_FX}, 6)
             AS entropy_rate,
           ROUND(ln(CAST(n_states AS DOUBLE)), 6) AS uniform_bound
    FROM k
    """


@register(
    "event_entropy_rate",
    oracle=_entropy_rate_oracle_sql(),
    doc="Entropy rate of the user event-type Markov chain (nats/step, "
    "next to its ln(k) uniform ceiling): the stationary distribution "
    "from the unrolled integer power iteration weighted into one "
    "fixed-point entropy fold over the O(types^2) transition table — "
    "how PREDICTABLE behavior is, the information-theoretic capstone of "
    "the transition/stationary/paths family, at one corpus-wide lag "
    "window of cost.",
)
def event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entropy_rate(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Densest-subgraph extraction (Charikar's greedy peel, parallel
# variant): repeatedly remove every node whose degree is <= (1+eps) x
# the current average, tracking density per round — the max-density
# round is a 2(1+eps)-approximation of the densest subgraph
# (Bahmani-Kumar-Vassilvitskii 2012), in O(log n / eps) rounds for ANY
# graph. The community-core extraction beside the k-core's fixed
# threshold.
# --------------------------------------------------------------------------

DS_ROUNDS = 6
DS_FX = 1_000_000  # density fixed-point (edges per node, 1e-6 units)


def densest_subgraph_trajectory(edges: DataFrame,
                                rounds: int = DS_ROUNDS) -> DataFrame:
    """(round, n_nodes, n_edges, density, is_best) — the peel
    trajectory: per round, the surviving graph's stats, density in
    exact 1e-6 fixed point (undirected edges per node), and whether
    this round attains the running maximum (ties to the EARLIEST
    round). Removal rule: drop v when 10 * deg(v) * n <= 11 * sum_deg
    — an exact-integer statement of deg <= 1.1 x average, so rounds
    are engine-identical.

    100 TB shape: per round one degree groupBy + a broadcast one-row
    stats table + two node-keyed semi joins (the k-core exchange
    family); frontiers checkpoint lazily so the whole peel is one job.
    """
    edges = edges.transform(_truncate)
    stats = []
    for r in range(rounds + 1):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        gstat = deg.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("deg"), F.lit(0)).alias("sumdeg"))
        stats.append(gstat.select(
            F.lit(r).cast("int").alias("round"),
            F.col("n").cast("long").alias("n_nodes"),
            F.expr("sumdeg div 2").alias("n_edges"),
            F.expr(f"CAST((sumdeg div 2) * {DS_FX} AS BIGINT) "
                   "div greatest(n, 1)").alias("density_fx"),
        ))
        if r == rounds:
            break
        keep = (
            deg.crossJoin(F.broadcast(gstat))
            .where(F.expr("10 * deg * n > 11 * sumdeg"))
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .transform(_truncate)
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    w = Window.orderBy(F.lit(1)).rowsBetween(  # <= rounds+1 rows: harmless
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        out.withColumn("_best", F.max("density_fx").over(w))
        .withColumn(
            "is_best",
            (F.col("density_fx") == F.col("_best"))
            & (F.col("round") == F.min(F.when(
                F.col("density_fx") == F.col("_best"), F.col("round")))
               .over(w)),
        )
        .select(
            "round", "n_nodes", "n_edges",
            (F.col("density_fx").cast("double") / DS_FX).alias("density"),
            "is_best",
        )
        .orderBy("round")
    )


def _densest_oracle_sql() -> str:
    rnd = """
    s{p} AS (SELECT COUNT(*) AS n, COALESCE(SUM(deg), 0) AS sumdeg
             FROM d{p}),
    k{p} AS MATERIALIZED (
      SELECT d.src FROM d{p} d, s{p} s
      WHERE 10 * d.deg * s.n > 11 * s.sumdeg
    ),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{p} e
      JOIN k{p} a ON e.src = a.src
      JOIN k{p} b ON e.dst = b.src
    ),
    d{i} AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e{i} GROUP BY src
    )"""
    chain = ",".join(rnd.format(i=i, p=i - 1)
                     for i in range(1, DS_ROUNDS + 1))
    stat = ("SELECT CAST({i} AS INTEGER) AS round, "
            "CAST(COUNT(*) AS BIGINT) AS n_nodes, "
            "CAST(COALESCE(SUM(deg), 0) // 2 AS BIGINT) AS n_edges, "
            f"CAST(((COALESCE(SUM(deg), 0) // 2) * {DS_FX}) "
            "// greatest(COUNT(*), 1) AS BIGINT) AS density_fx "
            "FROM d{i}")
    stats = " UNION ALL ".join(
        stat.format(i=i) for i in range(DS_ROUNDS + 1))
    return f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
    ),
    e0 AS MATERIALIZED (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION ALL SELECT pb AS src, pa AS dst FROM pairs
    ),
    d0 AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e0 GROUP BY src
    ),
    {chain},
    traj AS ({stats}),
    best AS (SELECT MAX(density_fx) AS b FROM traj),
    first_best AS (
      SELECT MIN(round) AS br FROM traj, best WHERE density_fx = b
    )
    SELECT round, n_nodes, n_edges,
           CAST(density_fx AS DOUBLE) / {DS_FX} AS density,
           (round = (SELECT br FROM first_best)) AS is_best
    FROM traj ORDER BY round
    """


@register(
    "densest_copurchase_subgraph",
    oracle=_densest_oracle_sql(),
    doc=f"Charikar greedy densest-subgraph peel ({DS_ROUNDS} parallel "
    "rounds, remove deg <= 1.1x average as the exact integer comparison "
    "10*deg*n <= 11*sumdeg) over the support-filtered co-purchase "
    "graph: per-round stats + 1e-6 fixed-point density with the "
    "earliest max-density round flagged — a 2(1+eps)-approximation in "
    "O(log n) rounds (Bahmani et al. 2012), one degree groupBy + two "
    "semi joins per round, lazily checkpointed into one job.",
)
def densest_copurchase_subgraph(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    pairs = support_pairs(li)
    sym = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")) \
        .unionAll(pairs.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
    return densest_subgraph_trajectory(sym)


# --- label-propagation communities + modularity ------------------------------
# Community detection — the partition the component family cannot see
# (connected components merge everything reachable; communities split a
# connected graph along its density structure). Synchronous LPA
# (Raghavan et al. 2007) with a deterministic tie-break: each round every
# node adopts the most frequent label among its neighbors' PREVIOUS
# labels, ties broken toward the smaller label, for a FIXED round budget
# (the pagerank/kcore precedent: a fixed iteration count is the contract,
# and the DuckDB oracle replays every round CTE-for-CTE — no convergence
# probe, no randomness). Modularity is read off the final partition from
# exact integer counts.
#
# 100 TB shape: each round is one groupBy((node, lbl)) count + one
# per-node top-1 window — the same node-keyed exchange family as
# PageRank's contribution join; labels checkpoint LAZILY per round so
# the whole fixed-budget chain materializes in the single final job
# (the kcore lazy pattern). The modularity readout is two more
# node/community-keyed rollups.

LPA_ROUNDS = 4
LPA_TOP = 20


def label_communities(sym: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """(node, lbl) after ``rounds`` synchronous LPA rounds over the
    symmetric edge list ``sym`` (src, dst). Label init = own id."""
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .transform(_truncate)
    )
    for _ in range(rounds):
        nbr = sym.join(labels, sym["dst"] == labels["node"]).select(
            sym["src"].alias("node"), "lbl"
        )
        cnt = nbr.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("node").orderBy(
            F.col("cnt").desc(), F.col("lbl").asc()
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
            .transform(_truncate)  # lineage O(1); kcore lazy pattern
        )
    return labels


# per-community modularity term in 1e-6 fixed point; the expression STRING
# is shared verbatim with the oracle (identical association order and
# int->double promotions => bit-identical doubles; floor(x*1e6 + 0.5) is
# the repo-wide tie-free rounding)
_Q_TERM_SQL = (
    "CAST(FLOOR((CAST(lc AS DOUBLE) / m"
    " - (CAST(dc AS DOUBLE) / (2 * m)) * (CAST(dc AS DOUBLE) / (2 * m)))"
    " * 1000000 + 0.5) AS BIGINT)"
)


def community_modularity(sym: DataFrame, labels: DataFrame,
                         top: int = LPA_TOP) -> DataFrame:
    """Top-``top`` communities by size with their exact-integer modularity
    ingredients and the per-community Newman Q term
    (L_c/m - (d_c/2m)^2) in 1e-6 fixed point."""
    lu = labels.select(F.col("node").alias("src"), F.col("lbl").alias("cu"))
    lv = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("cv"))
    tagged = sym.join(lu, "src").join(lv, "dst")
    internal = (
        tagged.where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.expr("COUNT(*) div 2").alias("lc"))
    )
    degsum = (
        sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        .join(lu, "src")
        .groupBy(F.col("cu").alias("community"))
        .agg(F.sum("d").alias("dc"))
    )
    size = labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("size")
    )
    totals = sym.agg(F.expr("COUNT(*) div 2").alias("m"))
    return (
        size.join(internal, "community", "left")
        .join(degsum, "community")
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "community",
            "size",
            "CAST(COALESCE(lc, 0) AS BIGINT) AS internal_edges",
            "dc AS degree_sum",
            f"{_Q_TERM_SQL.replace('lc', 'COALESCE(lc, 0)')} AS q_term_1e6",
        )
        .orderBy(F.col("size").desc(), "community")
        .limit(top)
    )


def _lpa_oracle_sql() -> str:
    rnd = """
    n{i} AS (
      SELECT s.src AS node, l.lbl AS lbl
      FROM sym s JOIN l{p} l ON s.dst = l.node
    ),
    c{i} AS (
      SELECT node, lbl, COUNT(*) AS cnt FROM n{i} GROUP BY node, lbl
    ),
    l{i} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, lbl) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )"""
    chain = ",".join(rnd.format(i=i, p=i - 1)
                     for i in range(1, LPA_ROUNDS + 1))
    q_term = _Q_TERM_SQL.replace("lc", "COALESCE(lc, 0)")
    return f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    spairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
    ),
    sym AS MATERIALIZED (
      SELECT pa AS src, pb AS dst FROM spairs
      UNION ALL SELECT pb AS src, pa AS dst FROM spairs
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS lbl FROM sym
    ),
    {chain},
    internal AS (
      SELECT lu.lbl AS community, COUNT(*) // 2 AS lc
      FROM sym s
      JOIN l{LPA_ROUNDS} lu ON s.src = lu.node
      JOIN l{LPA_ROUNDS} lv ON s.dst = lv.node
      WHERE lu.lbl = lv.lbl GROUP BY lu.lbl
    ),
    degsum AS (
      SELECT lu.lbl AS community, CAST(SUM(d.d) AS BIGINT) AS dc
      FROM (SELECT src, COUNT(*) AS d FROM sym GROUP BY src) d
      JOIN l{LPA_ROUNDS} lu ON d.src = lu.node
      GROUP BY lu.lbl
    ),
    sizes AS (
      SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS size
      FROM l{LPA_ROUNDS} GROUP BY lbl
    ),
    tot AS (SELECT COUNT(*) // 2 AS m FROM sym)
    SELECT s.community, s.size,
           CAST(COALESCE(i.lc, 0) AS BIGINT) AS internal_edges,
           g.dc AS degree_sum,
           {q_term} AS q_term_1e6
    FROM sizes s
    LEFT JOIN internal i ON i.community = s.community
    JOIN degsum g ON g.community = s.community
    CROSS JOIN tot
    ORDER BY s.size DESC, s.community LIMIT {LPA_TOP}
    """


@register(
    "copurchase_label_communities",
    oracle=_lpa_oracle_sql(),
    doc=f"Community detection over the support>={TRI_MIN_SUPPORT} "
    f"co-purchase graph: {LPA_ROUNDS} synchronous label-propagation "
    "rounds (most-frequent neighbor label, min-label ties — fully "
    "deterministic, oracle replays every round CTE-for-CTE), then the "
    f"top-{LPA_TOP} communities by size with exact integer modularity "
    "ingredients and the Newman Q term per community in tie-free 1e-6 "
    "fixed point. The density partition the connected-component family "
    "cannot express; each round is one node-keyed count + one top-1 "
    "window, the PageRank exchange family.",
)
def copurchase_label_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    pairs = support_pairs(li)
    sym = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")) \
        .unionAll(pairs.select(F.col("pb").alias("src"),
                               F.col("pa").alias("dst")))
    sym = sym.transform(_truncate)  # rounds + 3 readouts reuse it
    return community_modularity(sym, label_communities(sym))


# --- temporal graph: densification curve -------------------------------------
# Graphs over time densify: e(t) ~ n(t)^alpha with alpha in (1, 2)
# (Leskovec, Kleinberg & Faloutsos, KDD 2005). The curve of cumulative
# nodes/edges per month — each edge and node dated by its FIRST
# appearance — plus the fitted log-log slope is the one-look readout of
# how a relationship graph is growing (alpha near 1: sparse/linear;
# near 2: clique-like). Shape: first-appearance via min-aggregations
# (the vocab_growth first-seen trick on pairs), cumulative sums over the
# O(calendar-months) table, and the OLS slope as one fixed-order fold —
# nothing scales with edge count except the two first-seen shuffles.

def densification_curve(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(month, cum_nodes, cum_edges, alpha_1e6): cumulative co-purchase
    graph size at each month end, with the densification exponent fitted
    over ALL months repeated per row (ln-ln OLS slope, tie-free 1e-6
    fixed point)."""
    dated = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(orders.selectExpr(
            "o_orderkey AS l_orderkey",
            "CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)"
            " AS month"), "l_orderkey")
    )
    lines = dated.select("l_orderkey", "l_partkey", "month").distinct()
    a = lines.selectExpr("l_orderkey AS ok", "l_partkey AS pa", "month")
    b = lines.selectExpr("l_orderkey AS ok2", "l_partkey AS pb",
                         "month AS m2")
    pair_first = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.min("month").alias("month"))
        .groupBy("month").agg(F.count(F.lit(1)).alias("new_edges"))
    )
    node_first = (
        lines.groupBy("l_partkey").agg(F.min("month").alias("month"))
        .groupBy("month").agg(F.count(F.lit(1)).alias("new_nodes"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        node_first.join(pair_first, "month", "outer")
        .select(
            "month",
            F.coalesce("new_nodes", F.lit(0)).alias("new_nodes"),
            F.coalesce("new_edges", F.lit(0)).alias("new_edges"),
        )
        .withColumn("cum_nodes", F.sum("new_nodes").over(w))
        .withColumn("cum_edges", F.sum("new_edges").over(w))
        .where(F.col("cum_edges") > 0)
    )
    # ln-ln OLS over the O(months) curve: slope = (n*Sxy - Sx*Sy) /
    # (n*Sxx - Sx^2), every moment an order-independent SUM of identical
    # doubles (ln of exact BIGINTs)
    fit = curve.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("ln(CAST(cum_nodes AS DOUBLE))")).alias("sx"),
        F.sum(F.expr("ln(CAST(cum_edges AS DOUBLE))")).alias("sy"),
        F.sum(F.expr("ln(CAST(cum_nodes AS DOUBLE))"
                     " * ln(CAST(cum_nodes AS DOUBLE))")).alias("sxx"),
        F.sum(F.expr("ln(CAST(cum_nodes AS DOUBLE))"
                     " * ln(CAST(cum_edges AS DOUBLE))")).alias("sxy"),
    ).selectExpr(
        "CAST(FLOOR((CAST(n AS DOUBLE) * sxy - sx * sy)"
        " / NULLIF(CAST(n AS DOUBLE) * sxx - sx * sx, 0)"
        " * 1000000 + 0.5) AS BIGINT) AS alpha_1e6"
    )
    return (
        curve.select("month", "cum_nodes", "cum_edges")
        .crossJoin(F.broadcast(fit))
        .orderBy("month")
    )


@register(
    "copurchase_densification_curve",
    oracle="""
    WITH dated AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey,
             CAST(date_trunc('month', CAST(o.o_orderdate AS DATE)) AS DATE)
               AS month
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pair_first AS (
      SELECT month, COUNT(*) AS new_edges FROM (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, MIN(a.month) AS month
        FROM dated a JOIN dated b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa, pb
      ) GROUP BY month
    ),
    node_first AS (
      SELECT month, COUNT(*) AS new_nodes FROM (
        SELECT l_partkey, MIN(month) AS month FROM dated GROUP BY l_partkey
      ) GROUP BY month
    ),
    curve AS (
      SELECT month,
             CAST(SUM(COALESCE(new_nodes, 0)) OVER (ORDER BY month
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_nodes,
             CAST(SUM(COALESCE(new_edges, 0)) OVER (ORDER BY month
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_edges
      FROM node_first FULL OUTER JOIN pair_first USING (month)
    ),
    pos AS (SELECT * FROM curve WHERE cum_edges > 0),
    fit AS (
      SELECT CAST(FLOOR((CAST(COUNT(*) AS DOUBLE)
                         * SUM(ln(CAST(cum_nodes AS DOUBLE))
                               * ln(CAST(cum_edges AS DOUBLE)))
                         - SUM(ln(CAST(cum_nodes AS DOUBLE)))
                           * SUM(ln(CAST(cum_edges AS DOUBLE))))
                        / NULLIF(CAST(COUNT(*) AS DOUBLE)
                                 * SUM(ln(CAST(cum_nodes AS DOUBLE))
                                       * ln(CAST(cum_nodes AS DOUBLE)))
                                 - SUM(ln(CAST(cum_nodes AS DOUBLE)))
                                   * SUM(ln(CAST(cum_nodes AS DOUBLE))), 0)
                        * 1000000 + 0.5) AS BIGINT) AS alpha_1e6
      FROM pos
    )
    SELECT month, cum_nodes, cum_edges, alpha_1e6
    FROM pos, fit ORDER BY month
    """,
    doc="Temporal-graph densification curve (Leskovec et al. 2005): "
    "cumulative co-purchase nodes/edges at each month end (edges and "
    "nodes dated by FIRST appearance — the first-seen min-aggregation "
    "trick, so the cumulative-distinct never re-scans history) plus the "
    "fitted log-log densification exponent alpha (e ~ n^alpha) in "
    "tie-free 1e-6 fixed point. The growth readout that tells a graph "
    "deployment whether edge storage is heading linear or quadratic.",
)
def copurchase_densification_curve(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return densification_curve(li, o)


# --------------------------------------------------------------------------
# Weighted single-source shortest paths — the missing sibling of the
# unweighted BFS profile above. Edge distance derives from co-purchase
# support (frequently co-bought parts are CLOSE), so the readout is "how
# far, in affinity units, does the catalog sit from its hub part". The
# reference has no graph surface at all (SURVEY §2 C-extensions); on a
# warehouse this is exactly the workload that doesn't fit.
# --------------------------------------------------------------------------

SSSP_ROUNDS = 4
SSSP_MAX_W = 10  # support >= SSSP_MAX_W collapses to distance 1


def weighted_copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric (src, dst, w) with integer distance
    w = max(1, SSSP_MAX_W + 1 - support) where support = number of
    distinct orders containing both parts: strong co-purchase = short
    edge. One order-blocked self-join + one pair groupBy — O(rows x
    basket) like every edge build in this family, never O(parts^2)."""
    lines = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = lines.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("pa"))
    b = lines.select(F.col("l_orderkey").alias("ok2"),
                     F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "w",
            F.expr(f"CAST(CASE WHEN cnt >= {SSSP_MAX_W} THEN 1 "
                   f"ELSE {SSSP_MAX_W} + 1 - cnt END AS BIGINT)"),
        )
    )
    return pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"),
                        "w").unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w")
    )


def weighted_sssp(edges: DataFrame, rounds: int = SSSP_ROUNDS) -> DataFrame:
    """(node, dist) — exact shortest distance from the deterministic seed
    (max out-degree, ties to the smallest part id) using paths of at most
    ``rounds`` edges: Bellman-Ford with the standard FRONTIER refinement.

    Round r relaxes only nodes whose distance IMPROVED in round r-1 (one
    edge-keyed equi-join on the frontier + one min-groupBy + one outer
    merge against the running dist table), which is exactly the set of
    paths with <= r edges — so the final table equals the textbook full
    relaxation the oracle unrolls, at O(frontier x degree) per round
    instead of O(E). Distances are exact BIGINTs (engine-identical);
    per-round frames are lazily checkpointed so lineage stays O(1) and
    the readout runs as one job. The production dial at cluster scale is
    delta-stepping (bucketing the frontier by distance range); the
    per-round plan shape is unchanged.
    """
    edges = edges.transform(_truncate)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    seed = (
        deg.orderBy(F.col("d").desc(), F.col("src").asc()).limit(1)
        .select(F.col("src").alias("node"),
                F.lit(0).cast("bigint").alias("dist"))
        .transform(_truncate)
    )
    dist = seed
    frontier = seed
    for _ in range(rounds):
        cand = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("cand"))
            .groupBy("node").agg(F.min("cand").alias("cand"))
        )
        # round 14 (guide §1.2 driver work): checkpoint MERGED once and
        # derive dist/frontier as trivial selects over it — each
        # _truncate compiles the cumulative plan eagerly on the driver
        # (localCheckpoint plans to RDD at call time even when lazy), so
        # two truncates per round made Catalyst planning, not data work,
        # the wall (measured: 4.5 s build vs 0.2 s execute at sf0.1).
        merged = (
            dist.join(cand, "node", "full_outer")
            .select(
                "node",
                F.least(F.col("dist"), F.col("cand")).alias("new_dist"),
                (F.col("cand") < F.coalesce(F.col("dist"),
                                            F.lit(None).cast("bigint")))
                .alias("_improved"),
                F.col("dist").isNull().alias("_new"),
            )
            .transform(_truncate)
        )
        dist = merged.select("node", F.col("new_dist").alias("dist"))
        frontier = (
            merged.where(F.coalesce(F.col("_improved"), F.lit(False))
                         | F.col("_new"))
            .select("node", F.col("new_dist").alias("dist"))
        )
    return dist


def sssp_profile(edges: DataFrame, rounds: int = SSSP_ROUNDS) -> DataFrame:
    """(dist, n_nodes) — how many nodes sit at each exact affinity
    distance from the hub within ``rounds`` hops. Distances are bounded
    by rounds x max edge weight, so the profile is O(rounds x w) rows at
    ANY corpus size."""
    return (
        weighted_sssp(edges, rounds)
        .groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("dist")
    )


def _sssp_oracle_sql() -> str:
    rnd = """
    d{i} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{p}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d{p} d JOIN edges e ON e.src = d.node
      ) GROUP BY node
    )"""
    chain = ",".join(rnd.format(i=i, p=i - 1)
                     for i in range(1, SSSP_ROUNDS + 1))
    return f"""
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    wpairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(CASE WHEN COUNT(*) >= {SSSP_MAX_W} THEN 1
                  ELSE {SSSP_MAX_W} + 1 - COUNT(*) END AS BIGINT) AS w
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    edges AS MATERIALIZED (
      SELECT pa AS src, pb AS dst, w FROM wpairs
      UNION ALL SELECT pb AS src, pa AS dst, w FROM wpairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    d0 AS MATERIALIZED (
      SELECT src AS node, CAST(0 AS BIGINT) AS dist FROM deg
      ORDER BY d DESC, src LIMIT 1
    ),
    {chain}
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM d{SSSP_ROUNDS} GROUP BY dist ORDER BY dist
    """


@register(
    "copurchase_weighted_sssp",
    oracle=_sssp_oracle_sql(),
    doc=f"Weighted single-source shortest paths ({SSSP_ROUNDS} Bellman-"
    "Ford rounds with the frontier refinement) from the hub part over "
    "the co-purchase graph, edge distance = max(1, "
    f"{SSSP_MAX_W + 1} - support): per exact BIGINT distance, the node "
    "count. Each round is one frontier-keyed equi-join + min-groupBy + "
    "outer merge (O(frontier x degree), never O(E) re-relaxation); the "
    "oracle unrolls the textbook full relaxation, which provably agrees "
    "on paths of <= r edges. The weighted sibling of the BFS depth "
    "profile; delta-stepping is the documented cluster-scale dial.",
)
def copurchase_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return sssp_profile(weighted_copurchase_edges(li))
