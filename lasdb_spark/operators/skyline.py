"""Skyline (Pareto-front) queries over two criteria.

Inspired by the published line of work on skyline operators for
Spark SQL (e.g. "Integration of Skyline Queries into Spark SQL",
EDBT 2023 — public paper; independent implementation). A row is in
the skyline iff no other row dominates it: at least as good on both
criteria and strictly better on one. Both criteria MINIMIZE here;
negate a column to maximize it.

Distributed two-phase plan (no global sort, no partition-less window):

1. PRUNE (sound, map-side): bucket the x axis into equal-width ranges
   (bounds from one tiny min/max agg); compute each bucket's min-y
   (one small agg); the EXCLUSIVE prefix-min of those mins gives a
   per-bucket threshold t(b) — any row with y ≥ t(b) is dominated by
   some row in an earlier bucket (strictly smaller x), so the filter
   ``y < t(b)`` drops it map-side. Skyline rows are never dropped
   (the dominating chain for any pruned row ends at a surviving row).
2. EXACT: a broadcast dominance anti-join of the surviving candidates
   against themselves. Candidates ≈ the skyline plus boundary noise —
   tiny relative to the input — so the quadratic check is on a
   broadcast-sized set. (If a pathological distribution leaves many
   candidates, raise ``buckets``: pruning sharpens as the staircase is
   sampled more finely.)

Driver actions: two small aggregates (bounds + bucket mins) — planning
statistics, the same pattern as ingest's metadata pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Rows of ``df`` on the Pareto front minimizing (``x``, ``y``).

    Ties survive: two rows equal on both criteria dominate neither."""
    row = df.agg(
        F.min(x).alias("mn"), F.max(x).alias("mx"), F.count(F.lit(1)).alias("n")
    ).first()
    if row.n == 0:
        return df
    mn, mx = float(row.mn), float(row.mx)
    width = (mx - mn) / buckets if mx > mn else 1.0
    bucket_col = F.least(
        F.floor((F.col(x) - F.lit(mn)) / F.lit(width)).cast("int"),
        F.lit(buckets - 1),
    )
    bmins = {
        r.b: float(r.my)
        for r in df.select(bucket_col.alias("b"), F.col(y).alias(y))
        .groupBy("b")
        .agg(F.min(y).alias("my"))
        .collect()
    }
    # exclusive prefix-min: threshold for bucket b comes from buckets < b
    thresholds, running = [], float("inf")
    for b in range(buckets):
        thresholds.append(running)
        running = min(running, bmins.get(b, float("inf")))
    thr = F.element_at(
        F.array(*[F.lit(t) for t in thresholds]), bucket_col + 1
    )
    cand = df.filter(F.col(y) < thr)

    a = cand.alias("a")
    b_ = cand.alias("b")
    dominated = (
        (F.col("b." + x) <= F.col("a." + x))
        & (F.col("b." + y) <= F.col("a." + y))
        & ((F.col("b." + x) < F.col("a." + x)) | (F.col("b." + y) < F.col("a." + y)))
    )
    return a.join(F.broadcast(b_), dominated, "left_anti")


def _dominance_sql(table: str, x: str, y: str) -> str:
    return f"""
SELECT * FROM {table} a WHERE NOT EXISTS (
  SELECT 1 FROM {table} b
  WHERE b.{x} <= a.{x} AND b.{y} <= a.{y}
    AND (b.{x} < a.{x} OR b.{y} < a.{y}))
""".strip()


def pareto_orders(orders: DataFrame) -> DataFrame:
    """Orders on the (cheapest, most recent) Pareto front: minimize
    o_totalprice, maximize o_orderdate — the 'best deal per recency'
    frontier a reporting layer asks for. Date maximization becomes
    minimization of negated epoch days."""
    prepared = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        (-F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))).alias("neg_day"),
    )
    return skyline_2d(prepared, "o_totalprice", "neg_day").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )


def pareto_orders_sql() -> str:
    return f"""
WITH prepared AS (
  SELECT o_orderkey, o_totalprice, o_orderdate,
         -datediff('day', DATE '1970-01-01', o_orderdate) AS neg_day
  FROM orders)
SELECT o_orderkey, o_totalprice, o_orderdate
FROM ({_dominance_sql('prepared', 'o_totalprice', 'neg_day')})
""".strip()
