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
