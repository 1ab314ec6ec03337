"""Radius outlier detection over the point cloud.

The reference stores and queries points but never cleans them; real
LiDAR pipelines run a radius / statistical outlier filter (PDAL
``filters.outlier``-style) before any derived product. This is the
Spark-native batch form: for every distinct site, the number of cloud
points within a planimetric radius, and the sites whose neighborhood
is sparser than ``min_pts``.

Plan (the 100 TB shape): the naive expression is a self-join on a
distance predicate — a BroadcastNestedLoopJoin, O(n²), dead on
arrival. Instead the cloud is collapsed to DISTINCT sites with
multiplicity (one groupBy, map-side partials), each site derives its
``radius``-sized grid cell, the probe side fans out to its 3×3 cell
neighborhood (a 9× explode of the *site* table, already ≤ cloud
size), and the join is CELL EQUALITY — a hash join whose output is
bounded by true neighborhood density, never n². The exact d2 refine
runs map-side inside the join stage. Total: two shuffles (sites agg,
cell join), both on uniform keys.

Duplicate coordinates are handled exactly: a site's neighbor count
sums the multiplicities of every site in range (its own copies
included), so the result is independent of how duplicates are
distributed across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: neighborhood radius (metres) and sparsity threshold
RADIUS = 10.0
MIN_PTS = 5


def radius_neighbor_counts(
    points: DataFrame, radius: float = RADIUS, materialize_sites: bool = False
) -> DataFrame:
    """(x, y, z, n_neighbors) per distinct site — count of cloud points
    (multiplicity-weighted, self included) within planimetric
    ``radius``. Distance is 2D (x, y): the standard ground-density
    criterion; z rides along as payload.

    ``materialize_sites``: the sites table feeds BOTH join sides, and
    their lazy subtrees canonicalize differently (the probe side adds
    the explode), so Catalyst cannot reuse one exchange — the raw cloud
    is scanned and aggregated twice. Cheap at test scale; at corpus
    scale pass True to ``localCheckpoint`` the sites table so the cloud
    is read and aggregated once."""
    r = float(radius)
    if r <= 0:
        raise ValueError(f"need radius > 0, got {radius}")
    sites = (
        points.groupBy("x", "y", "z").agg(F.count(F.lit(1)).alias("m"))
    )
    if materialize_sites:
        sites = sites.localCheckpoint()
    cx = F.floor(F.col("x") / r).cast("long")
    cy = F.floor(F.col("y") / r).cast("long")
    sites = sites.select("x", "y", "z", "m", cx.alias("cx"), cy.alias("cy"))
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probes = (
        sites.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            F.col("z").alias("pz"),
            (F.col("cx") + F.col("dx")).alias("ncx"),
            (F.col("cy") + F.col("dy")).alias("ncy"),
        )
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    # SHUFFLE_HASH: avoids sort-merge's sort of both shuffled sides
    # (order nobody uses); build side is one cell's site list per key —
    # bounded by density × cell², never by corpus size. Measured 3.2×
    # on the sibling shape operator's identical join.
    pairs = probes.join(
        sites.select("x", "y", "m", "cx", "cy").hint("SHUFFLE_HASH"),
        (F.col("cx") == F.col("ncx")) & (F.col("cy") == F.col("ncy")),
    ).filter(d2 <= r * r)
    return (
        pairs.groupBy("px", "py", "pz")
        .agg(F.sum("m").alias("n_neighbors"))
        .select(
            F.col("px").alias("x"),
            F.col("py").alias("y"),
            F.col("pz").alias("z"),
            "n_neighbors",
        )
    )


def radius_outliers(
    points: DataFrame, radius: float = RADIUS, min_pts: int = MIN_PTS
) -> DataFrame:
    """Sites with fewer than ``min_pts`` points (self included) within
    ``radius`` — the rows a cleaning pass would drop or flag."""
    return radius_neighbor_counts(points, radius).filter(
        F.col("n_neighbors") < int(min_pts)
    )


def radius_outliers_sql(
    points_cte: str, radius: float = RADIUS, min_pts: int = MIN_PTS
) -> str:
    """Oracle twin: identical cell-grid construction (the cell join is
    exact — the 3×3 neighborhood is a superset of the radius disc, and
    the d2 refine matches), so both engines compute the same pairs."""
    r = float(radius)
    return f"""
{points_cte},
sites AS (SELECT x, y, z, count(*) AS m FROM points GROUP BY 1, 2, 3),
cells AS (SELECT x, y, z, m,
                 CAST(floor(x / {r!r}) AS BIGINT) AS cx,
                 CAST(floor(y / {r!r}) AS BIGINT) AS cy
          FROM sites),
probes AS (SELECT c.x AS px, c.y AS py, c.z AS pz,
                  c.cx + dx.d AS ncx, c.cy + dy.d AS ncy
           FROM cells c,
                (VALUES (-1), (0), (1)) dx(d),
                (VALUES (-1), (0), (1)) dy(d)),
pairs AS (SELECT p.px, p.py, p.pz, s.m
          FROM probes p JOIN cells s
            ON s.cx = p.ncx AND s.cy = p.ncy
           AND (s.x - p.px) * (s.x - p.px)
             + (s.y - p.py) * (s.y - p.py) <= {r!r} * {r!r})
SELECT px AS x, py AS y, pz AS z, CAST(sum(m) AS BIGINT) AS n_neighbors
FROM pairs GROUP BY 1, 2, 3 HAVING sum(m) < {int(min_pts)}
""".strip()
