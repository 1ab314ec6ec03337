"""Grid (raster-style) aggregation over point clouds.

The reference emits a per-block histogram at ingest
(pcsfc/point_processor.py:74-79) but has no query-time rasterization;
real LiDAR workflows (AHN's own products) derive gridded elevation
surfaces — DSM/DTM-style min/max/mean z per cell — constantly. This is
the Spark-native version: one hash aggregation keyed on the cell id.

Scale: groupBy (cell_x, cell_y) with map-side partial aggregation —
the canonical one-shuffle raster; cells are dense and uniform so no
skew. Mean elevation uses exact integer centi-unit sums (z is
centimetre-precision after quantized ingest), so results are identical
under any partitioning and hash-checkable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL = 100.0  # metres per cell edge


def grid_zstats(points: DataFrame, cell: float = CELL) -> DataFrame:
    """(cell_x, cell_y, n_points, z_min, z_max, z_avg) per grid cell."""
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    zq = F.round(F.col("z") * 100).cast("long")  # exact centi-units
    return (
        points.select(cx.alias("cell_x"), cy.alias("cell_y"), zq.alias("zq"))
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.min("zq") / 100.0).alias("z_min"),
            (F.max("zq") / 100.0).alias("z_max"),
            F.round(F.sum("zq") / (F.count(F.lit(1)) * 100.0), 6).alias("z_avg"),
        )
    )


def grid_zstats_sql(points_cte: str, cell: float = CELL) -> str:
    """Oracle twin; ``points_cte`` is a WITH prefix defining ``points``."""
    return f"""
{points_cte}, cells AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         CAST(round(z * 100) AS BIGINT) AS zq
  FROM points)
SELECT cell_x, cell_y, count(*) AS n_points,
       min(zq) / 100.0 AS z_min, max(zq) / 100.0 AS z_max,
       round(SUM(zq) / (count(*) * 100.0), 6) AS z_avg
FROM cells GROUP BY 1, 2
""".strip()
