"""Graph analytics over the events stream: PageRank on the
event-type transition graph.

Which screens/actions are central to user flows? Build the directed
transition graph (consecutive events per user), weight edges by
transition probability, and run damped PageRank with dangling-mass
redistribution — the standard centrality the reference's relational
surface has no answer to, and the canonical "iterative algorithm on
Spark" shape (cf. the Pregel/GraphX formulation; implemented here as
plain DataFrame joins because the node set is an event-type vocabulary,
not a billion-node web graph).

Exactness (what makes an ITERATIVE float computation oracle-able):
every per-node sum (rank inflow, dangling mass) is a DECIMAL(28,14)
exact sum of per-edge double products, so intra-iteration addition is
order-independent; each iteration's ranks are rounded to 12 dp before
feeding the next, keeping both engines in bit-lockstep for any number
of unrolled rounds. The SQL twin unrolls the same iterations as CTEs
generated from the same constants.

Scale: ONE corpus-sized shuffle (user_id window for consecutive
pairs → transition counts), cached; each iteration is then
broadcast-joined tiny tables with its result localCheckpoint-ed —
NOT left lazy, because a round references the previous ranks twice
(inflow + dangling mass) and an un-materialized lineage re-executes
the events shuffle ~3^n times (measured 8.8 s → <1 s at sf0.1). For a
billion-NODE graph this dataframe loop is the wrong shape (use the
bucketed label-propagation pattern of dedup.connected_components);
for vocabulary-sized graphs it is optimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.events import EV_CTE

PR_DAMPING = 0.85
PR_ITERS = 5


def event_type_pagerank(
    events: DataFrame,
    n_iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """(event_type, rank) — damped PageRank over the per-user
    consecutive-event transition graph. Deterministic ordering ties
    (ts, event_id) define "consecutive"."""
    d = float(damping)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    # the corpus-sized work happens ONCE: cache the vocabulary-sized
    # aggregates, and cut each round's lineage with a localCheckpoint —
    # every iteration references r twice (inflow + dangling mass), so
    # an un-materialized plan re-executes the events shuffle ~3^n
    # times (measured: 8.8 s -> sub-second at sf0.1)
    cnt = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    edges = cnt.join(tot, "src").select(
        "src", "dst",
        (F.col("c").cast("double") / F.col("t").cast("double")).alias("p"),
    ).cache()
    nodes = events.select(
        F.col("event_type").alias("node")
    ).distinct().cache()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    # r0 = 1/N, rounded like every later iteration
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node",
        F.round(F.lit(1.0) / F.col("n").cast("double"), 12).alias("rank"),
        "n",
    ).localCheckpoint()
    has_out = tot.select(F.col("src").alias("node"))
    for _ in range(max(1, n_iters)):
        inflow = (
            r.join(edges, r["node"] == edges["src"])
            .groupBy("dst")
            .agg(
                F.sum(
                    (F.col("rank") * F.col("p")).cast("decimal(28,14)")
                ).alias("inflow_dec")
            )
            .select(
                F.col("dst").alias("node"),
                F.col("inflow_dec").cast("double").alias("inflow"),
            )
        )
        dang = (
            r.join(F.broadcast(has_out), "node", "left_anti")
            .agg(
                F.sum(F.col("rank").cast("decimal(28,14)")).alias("dm_dec")
            )
            .select(
                F.coalesce(F.col("dm_dec").cast("double"), F.lit(0.0)).alias(
                    "dm"
                )
            )
        )
        r = (
            r.select("node", "n")
            .join(F.broadcast(inflow), "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - F.lit(d)) / F.col("n").cast("double")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dm") / F.col("n").cast("double")
                    ),
                    12,
                ).alias("rank"),
                "n",
            )
            .localCheckpoint()
        )
    return r.select(
        "node", F.round(F.col("rank"), 6).alias("rank")
    ).orderBy(F.col("rank").desc(), "node")


def event_type_pagerank_sql(
    n_iters: int = PR_ITERS, damping: float = PR_DAMPING
) -> str:
    d = float(damping)
    iters = []
    for i in range(max(1, n_iters)):
        prev = f"r{i}"
        iters.append(f"""
inflow{i} AS (
  SELECT e.dst AS node,
         CAST(sum(CAST(r.rank * e.p AS DECIMAL(28,14))) AS DOUBLE)
           AS inflow
  FROM {prev} r JOIN edges e ON r.node = e.src
  GROUP BY 1),
dang{i} AS (
  SELECT coalesce(CAST(sum(CAST(r.rank AS DECIMAL(28,14))) AS DOUBLE),
                  0.0) AS dm
  FROM {prev} r LEFT JOIN has_out h ON r.node = h.node
  WHERE h.node IS NULL),
r{i + 1} AS (
  SELECT r.node,
         round((1.0 - {d!r}) / CAST(r.n AS DOUBLE)
               + {d!r} * (coalesce(i.inflow, 0.0)
                          + g.dm / CAST(r.n AS DOUBLE)), 12) AS rank,
         r.n
  FROM {prev} r
  LEFT JOIN inflow{i} i ON r.node = i.node
  CROSS JOIN dang{i} g)""".strip())
    chain = ",\n".join(iters)
    return f"""
{EV_CTE},
trans AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM ev),
cnt AS (SELECT src, dst, count(*) AS c FROM trans
        WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(c) AS t FROM cnt GROUP BY 1),
edges AS (
  SELECT src, dst, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
  FROM cnt JOIN tot USING (src)),
nodes AS (SELECT DISTINCT event_type AS node FROM ev),
nn AS (SELECT count(*) AS n FROM nodes),
has_out AS (SELECT src AS node FROM tot),
r0 AS (
  SELECT node, round(1.0 / CAST(n AS DOUBLE), 12) AS rank, n
  FROM nodes CROSS JOIN nn),
{chain}
SELECT node, round(rank, 6) AS rank
FROM r{max(1, n_iters)}
ORDER BY rank DESC, node
""".strip()


# ---------------------------------------------------------------------------
# degree-ordered triangle counting over the co-purchase graph
# ---------------------------------------------------------------------------


def copurchase_triangles(lineitem: DataFrame) -> DataFrame:
    """(part_id, n_triangles) — per-part triangle participation in the
    co-purchase graph: nodes are parts, an (undirected) edge links two
    parts that appear in the same order. The census behind
    "frequently bought together" neighborhoods and graph-feature
    extraction.

    Scale — the classic degree-ordered (Cohen / "rank-by-degree")
    distributed triangle count, NOT the naive wedge join:

    * edge construction: one self-join per order key — per-order
      quadratic bounded by order size (≤7 lineitems here), linear in
      the fact table overall;
    * every edge is ORIENTED from its (degree, id)-smaller endpoint to
      the larger. Wedges are then built only from each apex's
      out-neighbors, so wedge count is Σ d_out² with d_out = O(√m) on
      any graph — the skew-proof bound the unordered join lacks (a
      celebrity node with degree 10⁶ never becomes an apex);
    * triangles close via per-edge adjacency intersection, NOT a
      materialized wedge join: each oriented edge (y, z) picks up the
      out-neighbor arrays of both endpoints (two hash joins of |E|
      rows against the n-row adjacency table) and
      `array_intersect(N_out(y), N_out(z))` lists exactly the apexes
      w with y→w AND z→w — i.e. each triangle a→b, a→c, b→c surfaces
      exactly once, at its closing edge (a, b) with w = c. The
      intersection runs in-memory per row (whole-stage codegen), so
      the Σ d_out² wedge set is never shuffled — the dominant cost of
      the classic two-leg wedge join at this density. Out-neighbor
      arrays are O(√m) by the orientation bound, so the carried
      arrays stay bounded on any degree distribution;
    * per-part counts: each triangle fans out to its 3 corners (map
      side) and one partial-agg groupBy produces the census.
    """
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
        # r12 (guide §1.2/§3.3): the edge list feeds degree (twice),
        # orientation and the closing join — unmaterialized lineage
        # re-ran the per-order self-join once per reference and the
        # downstream tree multiplied it combinatorially (measured
        # plan: 154 Exchanges / 46 joins, ZERO ReusedExchange, for a
        # 3-join algorithm). |E| rows, shrinking lineage — the same
        # localCheckpoint discipline as connected_components.
        .localCheckpoint()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    dedges = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()  # consumed by adj AND the closing join (r12)
    adj = dedges.groupBy("src").agg(
        F.collect_list("dst").alias("nbrs")
    ).localCheckpoint()  # consumed twice (ny, nz) (r12)
    ny = adj.select(F.col("src").alias("y"), F.col("nbrs").alias("ny"))
    nz = adj.select(F.col("src").alias("z"), F.col("nbrs").alias("nz"))
    tri = (
        dedges.select(F.col("src").alias("y"), F.col("dst").alias("z"))
        .join(ny, "y")
        .join(nz, "z")
        .select(
            "y",
            "z",
            F.explode(F.array_intersect("ny", "nz")).alias("w"),
        )
    )
    corners = tri.select(
        F.explode(F.array("y", "z", "w")).alias("part_id")
    )
    return corners.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def copurchase_triangles_sql() -> str:
    """Oracle twin of :func:`copurchase_triangles`."""
    return """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY 1),
dedges AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN dv.d ELSE du.d END AS ddeg
  FROM edges
  JOIN deg du ON u = du.node
  JOIN deg dv ON v = dv.node),
tri AS (
  SELECT w.src, w.y, w.z FROM (
    SELECT d1.src, d1.dst AS y, d2.dst AS z
    FROM dedges d1 JOIN dedges d2 ON d1.src = d2.src
    WHERE (d1.ddeg < d2.ddeg)
       OR (d1.ddeg = d2.ddeg AND d1.dst < d2.dst)) w
  WHERE EXISTS (SELECT 1 FROM dedges e
                WHERE e.src = w.y AND e.dst = w.z))
SELECT part_id, count(*) AS n_triangles
FROM (
  SELECT src AS part_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# k-core extraction over the repeat-co-purchase graph
# ---------------------------------------------------------------------------
KCORE_K = 3
KCORE_MIN_WEIGHT = 2
KCORE_ROUNDS = 14


def copurchase_kcore(
    lineitem: DataFrame,
    k: int = KCORE_K,
    min_weight: int = KCORE_MIN_WEIGHT,
    rounds: int = KCORE_ROUNDS,
) -> DataFrame:
    """(part_id, core_degree) — the k-core of the REPEAT-co-purchase
    graph (edges = part pairs bought together in ≥ ``min_weight``
    distinct orders): iteratively peel nodes with degree < k until
    fixpoint; survivors form the densest stable neighborhoods (the
    graph-curation step before community mining, and the classic
    anti-noise cut for recommendation candidates).

    Scale:

    * edge construction is the same order-bounded self-join as
      :func:`copurchase_triangles`, plus ONE groupBy to count pair
      multiplicity — the ``min_weight`` cut keeps only statistically
      repeated pairs (and makes the graph sparse);
    * peeling runs a FIXED ``rounds`` budget, not a driver-side
      convergence loop: each round is one alive-set semi-join pair +
      one partial-agg degree count. Peeling is MONOTONE (the alive
      set only shrinks; a round at fixpoint is the identity), so any
      ``rounds`` ≥ the true peel depth yields the exact k-core —
      tests pin fixpoint-by-R on the driver data, and the DuckDB
      oracle replays the identical R rounds so the comparison is
      exact even if R were undersized;
    * every round's alive list is localCheckpoint-ed — it is O(|V|)
      rows and SHRINKING, and each round references it twice, so an
      un-materialized lineage re-executes the edge build 2^R times
      (the event_type_pagerank lesson in this module's header,
      re-confirmed by measurement here: lazy 10-round plan >500 s at
      sf0.01, checkpointed seconds). The edge list is cached once.
    """
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= min_weight)
        .select("u", "v")
        # r12: the symmetric union reads `half` twice and union
        # branches don't share exchanges (the connected_components
        # lesson) — materialize the half-edge list so the per-order
        # self-join runs once, not twice
        .localCheckpoint()
    )
    edges = half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).cache()
    alive = (
        edges.select(F.col("u").alias("node")).distinct().localCheckpoint()
    )
    for _ in range(rounds):
        kept = (
            edges.join(alive.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
        )
        alive = (
            kept.groupBy(F.col("u").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("node")
            .localCheckpoint()
        )
    final = (
        edges.join(alive.withColumnRenamed("node", "u"), "u", "left_semi")
        .join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
    )
    return final.groupBy(F.col("u").alias("part_id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def copurchase_kcore_sql(
    k: int = KCORE_K,
    min_weight: int = KCORE_MIN_WEIGHT,
    rounds: int = KCORE_ROUNDS,
) -> str:
    """Oracle twin of :func:`copurchase_kcore` — the identical
    ``rounds`` peel iterations unrolled into materialized CTEs."""
    parts = [f"""
WITH half AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {min_weight}),
edges AS MATERIALIZED (
  SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half),
alive0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM edges)"""]
    for r in range(rounds):
        parts.append(f""",
alive{r + 1} AS MATERIALIZED (
  SELECT e.u AS node, count(*) AS d
  FROM edges e
  JOIN alive{r} au ON e.u = au.node
  JOIN alive{r} av ON e.v = av.node
  GROUP BY 1 HAVING count(*) >= {k})""")
    parts.append(f"""
SELECT e.u AS part_id, CAST(count(*) AS BIGINT) AS core_degree
FROM edges e
JOIN alive{rounds} au ON e.u = au.node
JOIN alive{rounds} av ON e.v = av.node
GROUP BY 1""")
    return "".join(parts).strip()


# ---------------------------------------------------------------------------
# community detection — synchronous label propagation (Raghavan et al.
# 2007) on the repeat-co-purchase graph, made DETERMINISTIC: every
# round each node adopts the label with the max total edge weight
# among its neighbors, ties to the smaller label; a fixed round budget
# replaces the usual convergence loop (the kcore/pagerank contract in
# this module — the oracle replays the identical rounds, so the
# comparison is exact regardless of convergence).
# ---------------------------------------------------------------------------
LP_ROUNDS = 4
LP_MIN_WEIGHT = 2
LP_MIN_SIZE = 2


def copurchase_communities(
    lineitem: DataFrame,
    min_weight: int = LP_MIN_WEIGHT,
    rounds: int = LP_ROUNDS,
    min_size: int = LP_MIN_SIZE,
) -> DataFrame:
    """(community, n_members) — label-propagation communities of the
    repeat-co-purchase graph (edges = part pairs bought together in
    ≥ ``min_weight`` distinct orders), communities of ≥ ``min_size``
    members after ``rounds`` synchronous updates; community id = the
    propagated label (a member part id).

    Scale: the same order-bounded edge build + multiplicity cut as
    :func:`copurchase_kcore`; each round is ONE shuffle pair (edge ×
    label hash join, (node, label) partial-agg weight sum) + a
    node-partitioned window argmax — O(|E|) per round, R rounds, no
    driver loop state beyond the fixed count. Labels localCheckpoint
    per round (O(|V|), referenced twice next round — the pagerank
    lineage lesson)."""
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= min_weight)
        # r12: the symmetric union reads `half` twice (see kcore)
        .localCheckpoint()
    )
    edges = half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).cache()
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(int(rounds)):
        nb = edges.join(
            labels.withColumnRenamed("node", "v"), "v"
        )
        scores = nb.groupBy("u", "label").agg(F.sum("w").alias("s"))
        # per-node argmax as one hash aggregation: max over
        # struct(s, -label, label) = highest weight, ties to the
        # LOWEST label — the identical winner to the old rn=1 window
        # ordered by (s desc, label asc); (s, label) is a total order
        # within a node so the payload is never compared (r12, guide
        # §2.3 — partial aggregation, no sort)
        labels = (
            scores.groupBy("u")
            .agg(
                F.max(
                    F.struct(
                        F.col("s"),
                        (-F.col("label")).alias("nl"),
                        F.col("label"),
                    )
                ).alias("b")
            )
            .select(
                F.col("u").alias("node"), F.col("b.label").alias("label")
            )
            .localCheckpoint()
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") >= int(min_size))
        .orderBy("community")
    )


def copurchase_communities_sql(
    min_weight: int = LP_MIN_WEIGHT,
    rounds: int = LP_ROUNDS,
    min_size: int = LP_MIN_SIZE,
) -> str:
    """Oracle twin: the identical rounds unrolled (the pagerank/kcore
    unrolling contract)."""
    ctes = [
        f"""half AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {int(min_weight)})""",
        """edges AS MATERIALIZED (
  SELECT u, v, w FROM half UNION ALL SELECT v, u, w FROM half)""",
        """l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges)""",
    ]
    for r in range(1, int(rounds) + 1):
        ctes.append(
            f"""s{r} AS (
  SELECT e.u, l.label, sum(e.w) AS s
  FROM edges e JOIN l{r - 1} l ON l.node = e.v GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT u AS node, label FROM (
    SELECT u, label,
           row_number() OVER (PARTITION BY u ORDER BY s DESC, label)
             AS rn
    FROM s{r}) WHERE rn = 1)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
FROM l{int(rounds)} GROUP BY 1 HAVING count(*) >= {int(min_size)}
""".strip()


# ---------------------------------------------------------------------------
# association rules — support / confidence / lift over co-purchase
# pairs (Agrawal-Srikant market-basket mining, depth 2): the ranked
# "customers who bought u also bought v" table with the statistical
# guardrails (lift > 1) that raw co-occurrence counts lack.
# ---------------------------------------------------------------------------
RULES_MIN_PAIRS = 2
RULES_TOPK = 25


def copurchase_rules(
    lineitem: DataFrame,
    min_pairs: int = RULES_MIN_PAIRS,
    k: int = RULES_TOPK,
) -> DataFrame:
    """(antecedent, consequent, n_pair, support_ppm, confidence_ppm,
    lift, rank) — directed association rules u→v over distinct
    orders: support = P(u ∧ v), confidence = P(v | u), lift =
    P(u ∧ v) / (P(u)·P(v)); pairs below ``min_pairs`` co-occurrences
    are cut; top ``k`` by confidence, then support, then (u, v).
    support/confidence are floored integer ppm — bigint ``div`` on
    both engines (r9 ADVICE: floor over double division is exact only
    below 2^53); lift is one double expression over exact integers,
    round 6.

    Scale: the order-bounded pair self-join + multiplicity groupBy
    (the kcore edge build); per-part order counts are one groupBy of
    the distinct fact projection, broadcast into the |pairs|-row rule
    table with the 1-row order total; top-k is TakeOrdered."""
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= int(min_pairs))
    )
    pairs = half.unionAll(
        half.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "n_pair"
        )
    )
    per_part = li.groupBy(F.col("l_partkey").alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("n_u")
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    scored = (
        pairs.join(F.broadcast(per_part), "u")
        .join(
            F.broadcast(
                per_part.select(
                    F.col("u").alias("v"), F.col("n_u").alias("n_v")
                )
            ),
            "v",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("u").alias("antecedent"),
            F.col("v").alias("consequent"),
            "n_pair",
            F.expr("n_pair * 1000000 div n_orders")
            .cast("long")
            .alias("support_ppm"),
            F.expr("n_pair * 1000000 div n_u")
            .cast("long")
            .alias("confidence_ppm"),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("n_u").cast("double") * F.col("n_v").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    top = scored.orderBy(
        F.col("confidence_ppm").desc(),
        F.col("support_ppm").desc(),
        "antecedent",
        "consequent",
    ).limit(int(k))
    w = Window.orderBy(
        F.col("confidence_ppm").desc(),
        F.col("support_ppm").desc(),
        F.col("antecedent"),
        F.col("consequent"),
    )
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def copurchase_rules_sql(
    min_pairs: int = RULES_MIN_PAIRS, k: int = RULES_TOPK
) -> str:
    return f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
half AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {int(min_pairs)}),
pairs AS (
  SELECT u, v, n_pair FROM half
  UNION ALL SELECT v, u, n_pair FROM half),
per_part AS (
  SELECT l_partkey AS u, CAST(count(*) AS BIGINT) AS n_u FROM li
  GROUP BY 1),
n_orders AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
  FROM li),
scored AS (
  SELECT p.u AS antecedent, p.v AS consequent, p.n_pair,
         CAST(p.n_pair * 1000000 // o.n_orders AS BIGINT)
           AS support_ppm,
         CAST(p.n_pair * 1000000 // pu.n_u AS BIGINT)
           AS confidence_ppm,
         round(CAST(p.n_pair AS DOUBLE) * CAST(o.n_orders AS DOUBLE)
               / (CAST(pu.n_u AS DOUBLE) * CAST(pv.n_u AS DOUBLE)), 6)
           AS lift
  FROM pairs p
  JOIN per_part pu ON pu.u = p.u
  JOIN per_part pv ON pv.u = p.v
  CROSS JOIN n_orders o)
SELECT antecedent, consequent, n_pair, support_ppm, confidence_ppm,
       lift, rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY confidence_ppm DESC,
            support_ppm DESC, antecedent, consequent) AS INT) AS rank
  FROM scored)
WHERE rank <= {int(k)}
""".strip()
