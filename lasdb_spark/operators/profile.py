"""Corridor elevation profile along a polyline alignment.

The reference's B-suite queries select points NEAR a polyline
(scripts/query_*.json polygon corridors; our ``polyline_buffer``
covers that shape) but never produce the artifact surveyors actually
want from a corridor: the PROFILE — elevation statistics per station
(chainage) bin along the alignment, i.e. "the cross-section every
``step`` metres of this road/dike". This operator projects each
in-buffer point onto its nearest segment, computes its chainage, and
aggregates per station bin.

Plan (the 100 TB shape): bbox prefilter (pushdown-prunable x/y range
→ row-group pruning on the sorted layout), one map-side projection
stage (named per-segment columns keep expressions linear and inside
whole-stage codegen), then ONE groupBy on the station bin with
map-side partials — output is |corridor length / step| rows, never
corpus-sized.

Exactness: segment constants, cumulative chainage and the clamped
projection are embedded as IDENTICAL python-float literals in both
engines (functions/geometry.py:station_*), the argmin over segments is
a first-match-on-least fold (deterministic ties), and elevation stats
aggregate exact centi-unit BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import (
    parse_wkt_linestring,
    polyline_bbox,
    station_fold_cols,
    station_fold_sql,
    station_stage_cols,
    station_stage_sql,
)

STEP = 50.0  # station bin width (m)


def corridor_profile(
    points: DataFrame, wkt: str, buffer: float, step: float = STEP
) -> DataFrame:
    """(bin, station_m, n, z_min, z_max, z_avg) per station bin —
    ``bin`` = floor(chainage / step), ``station_m`` its start chainage.
    Only points within planimetric ``buffer`` of the alignment count."""
    if buffer <= 0 or step <= 0:
        raise ValueError(f"need buffer > 0 and step > 0, got {buffer}, {step}")
    pts = parse_wkt_linestring(wkt)
    xmin, xmax, ymin, ymax = polyline_bbox(pts, buffer)
    staged = points.filter(
        F.col("x").between(xmin, xmax) & F.col("y").between(ymin, ymax)
    ).select("x", "y", "z", *station_stage_cols(pts, F.col("x"), F.col("y")))
    st, d2 = station_fold_cols(len(pts) - 1)
    proj = staged.select(
        "z", st.alias("station"), d2.alias("d2")
    ).filter(F.col("d2") <= float(buffer) * float(buffer))
    zq = F.round(F.col("z") * 100).cast("long")
    return (
        proj.select(
            F.floor(F.col("station") / step).cast("long").alias("bin"),
            zq.alias("zq"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("zq") / 100.0).alias("z_min"),
            (F.max("zq") / 100.0).alias("z_max"),
            F.round(F.sum("zq") / (F.count(F.lit(1)) * 100.0), 6).alias("z_avg"),
        )
        .select(
            "bin",
            (F.col("bin").cast("double") * step).alias("station_m"),
            "n",
            "z_min",
            "z_max",
            "z_avg",
        )
    )


def corridor_profile_sql(
    points_cte: str, wkt: str, buffer: float, step: float = STEP
) -> str:
    """Oracle twin; ``points_cte`` is a WITH prefix defining
    ``points`` (x, y, z)."""
    pts = parse_wkt_linestring(wkt)
    xmin, xmax, ymin, ymax = polyline_bbox(pts, buffer)
    stage_items = ",\n         ".join(station_stage_sql(pts))
    st, dmin = station_fold_sql(len(pts) - 1)
    return f"""
{points_cte},
staged AS (
  SELECT z, {stage_items}
  FROM points
  WHERE x BETWEEN {xmin!r} AND {xmax!r} AND y BETWEEN {ymin!r} AND {ymax!r}),
dstage AS (
  SELECT *, {dmin} AS dmin FROM staged),
proj AS (
  SELECT z, {st} AS station
  FROM dstage WHERE dmin <= {float(buffer) * float(buffer)!r}),
binned AS (
  SELECT CAST(floor(station / {step!r}) AS BIGINT) AS bin,
         CAST(round(z * 100) AS BIGINT) AS zq
  FROM proj)
SELECT bin, CAST(bin AS DOUBLE) * {step!r} AS station_m,
       count(*) AS n,
       min(zq) / 100.0 AS z_min, max(zq) / 100.0 AS z_max,
       round(sum(zq) / (count(*) * 100.0), 6) AS z_avg
FROM binned GROUP BY bin
""".strip()
