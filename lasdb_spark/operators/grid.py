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


def height_above_ground(
    points: DataFrame, cell: float = CELL, broadcast_ground: bool = False
) -> DataFrame:
    """(x, y, z, ground_z, hag) — per-point height above a gridded
    ground estimate (the min elevation of the point's cell), the
    standard LiDAR normalization step (PDAL ``filters.hag``-style, on a
    grid instead of a TIN). The reference has no normalization at all —
    its z survives ingest untouched (pcsfc/point_processor.py:45-47) —
    but every vegetation/building analysis over an AHN-style cloud
    starts by subtracting ground.

    Scale: ground table = one groupBy with map-side partial
    aggregation, reducing the cloud to |cells| rows (area / cell² —
    millions at country scale, never corpus-sized), then one equi-join
    back on the cell id. The join side grows with AREA not point
    density, so AQE auto-broadcasts it when it fits; ``broadcast_ground``
    forces the hint for callers that know their extent is bounded.
    No window over the full cloud: a cell-partitioned window would
    shuffle every point, the agg+join shape only shuffles cell partials.

    Exactness: ground_z is an exact min (centi-unit longs, same as
    :func:`grid_zstats`) and ``z - ground_z`` is one IEEE subtraction of
    identical doubles on both engines — hash-stable."""
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    pts = points.select(
        "x", "y", "z", cx.alias("cell_x"), cy.alias("cell_y")
    )
    ground = (
        pts.groupBy("cell_x", "cell_y")
        .agg((F.min(F.round(F.col("z") * 100).cast("long")) / 100.0).alias("ground_z"))
    )
    if broadcast_ground:
        ground = F.broadcast(ground)
    return (
        pts.join(ground, ["cell_x", "cell_y"])
        .select(
            "x", "y", "z", "ground_z",
            # "+ 0.0" collapses IEEE -0.0 (the min point's z can sit
            # one ulp below the re-quantized ground_z) so both engines
            # emit the identical zero
            (F.round(F.col("z") - F.col("ground_z"), 2) + 0.0).alias("hag"),
        )
    )


def height_above_ground_sql(points_cte: str, cell: float = CELL) -> str:
    """Oracle twin of :func:`height_above_ground` (window-min form —
    semantically the agg+join, DuckDB picks its own plan)."""
    return f"""
{points_cte}, cells AS (
  SELECT x, y, z,
         CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y
  FROM points),
g AS (
  SELECT x, y, z,
         min(CAST(round(z * 100) AS BIGINT)) OVER (
             PARTITION BY cell_x, cell_y) / 100.0 AS ground_z
  FROM cells)
SELECT x, y, z, ground_z, round(z - ground_z, 2) + 0.0 AS hag FROM g
""".strip()


#: height-above-ground class breaks (metres): ground / low vegetation /
#: medium vegetation / high vegetation-or-structure — the ASPRS-style
#: coarse split every AHN-derived product starts from
HAG_BREAKS = (0.1, 2.0, 10.0)
HAG_CLASSES = ("ground", "low_veg", "med_veg", "high")


def classify_by_hag(
    points: DataFrame, cell: float = CELL, broadcast_ground: bool = False
) -> DataFrame:
    """(x, y, z, hag, cls) — each point labeled by its height above
    the gridded ground estimate: ``ground`` (< 0.1 m), ``low_veg``
    (< 2 m), ``med_veg`` (< 10 m), ``high`` (rest). A heuristic
    stand-in for an ASPRS classifier, but the full Spark shape of one:
    normalization (agg + cell join) feeding a map-side labeling pass.

    Scale: exactly :func:`height_above_ground`'s cost — the CASE adds
    zero shuffles. Thresholds on the rounded(2) hag, so both engines
    bucket identical doubles."""
    hag = height_above_ground(points, cell, broadcast_ground)
    c = F.col("hag")
    lo, mid, hi = HAG_BREAKS
    cls = (
        F.when(c < lo, HAG_CLASSES[0])
        .when(c < mid, HAG_CLASSES[1])
        .when(c < hi, HAG_CLASSES[2])
        .otherwise(HAG_CLASSES[3])
    )
    return hag.select("x", "y", "z", "hag", cls.alias("cls"))


def classify_by_hag_sql(points_cte: str, cell: float = CELL) -> str:
    lo, mid, hi = HAG_BREAKS
    g0, g1, g2, g3 = HAG_CLASSES
    return f"""
SELECT x, y, z, hag,
       CASE WHEN hag < {lo} THEN '{g0}'
            WHEN hag < {mid} THEN '{g1}'
            WHEN hag < {hi} THEN '{g2}'
            ELSE '{g3}' END AS cls
FROM ({height_above_ground_sql(points_cte, cell)})
""".strip()


def dem_gradient(points: DataFrame, cell: float = CELL) -> DataFrame:
    """(cell_x, cell_y, ground_z, dzdx_cm, dzdy_cm) — central-difference
    elevation gradient over the gridded ground surface (the raster
    derivative every slope/aspect/drainage product starts from; AHN
    ships exactly such DTM derivatives). ``dzdx_cm`` = ground(east) −
    ground(west) in exact centi-units, NULL at surface edges where a
    neighbor cell is missing — integers, so the oracle matches
    bit-for-bit.

    Scale: the cloud collapses to the DEM (one groupBy, map-side
    partials, |cells| ∝ area); the four neighbor lookups are
    equi-joins of that small table against shifted copies of itself on
    the SAME (cell_x, cell_y) key — co-partitioned after one exchange,
    and broadcast-able whenever the extent is bounded. No window over
    points, no second pass over the cloud."""
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    zq = F.round(F.col("z") * 100).cast("long")
    dem = (
        points.select(cx.alias("cell_x"), cy.alias("cell_y"), zq.alias("gq"))
        .groupBy("cell_x", "cell_y")
        .agg(F.min("gq").alias("gq"))
    )

    def shifted(dx: int, dy: int, alias: str) -> DataFrame:
        return dem.select(
            (F.col("cell_x") - dx).alias("cell_x"),
            (F.col("cell_y") - dy).alias("cell_y"),
            F.col("gq").alias(alias),
        )

    return (
        dem.join(shifted(1, 0, "eq"), ["cell_x", "cell_y"], "left")
        .join(shifted(-1, 0, "wq"), ["cell_x", "cell_y"], "left")
        .join(shifted(0, 1, "nq"), ["cell_x", "cell_y"], "left")
        .join(shifted(0, -1, "sq"), ["cell_x", "cell_y"], "left")
        .select(
            "cell_x",
            "cell_y",
            (F.col("gq") / 100.0).alias("ground_z"),
            (F.col("eq") - F.col("wq")).alias("dzdx_cm"),
            (F.col("nq") - F.col("sq")).alias("dzdy_cm"),
        )
    )


def dem_gradient_sql(points_cte: str, cell: float = CELL) -> str:
    """Oracle twin of :func:`dem_gradient`."""
    return f"""
{points_cte}, dem AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         min(CAST(round(z * 100) AS BIGINT)) AS gq
  FROM points GROUP BY 1, 2)
SELECT d.cell_x, d.cell_y, d.gq / 100.0 AS ground_z,
       e.gq - w.gq AS dzdx_cm,
       n.gq - s.gq AS dzdy_cm
FROM dem d
LEFT JOIN dem e ON e.cell_x = d.cell_x + 1 AND e.cell_y = d.cell_y
LEFT JOIN dem w ON w.cell_x = d.cell_x - 1 AND w.cell_y = d.cell_y
LEFT JOIN dem n ON n.cell_x = d.cell_x AND n.cell_y = d.cell_y + 1
LEFT JOIN dem s ON s.cell_x = d.cell_x AND s.cell_y = d.cell_y - 1
""".strip()


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


def grid_z_percentile(
    points: DataFrame, cell: float = CELL, p: float = 0.95
) -> DataFrame:
    """(cell_x, cell_y, n_points, z_p) — per-cell exact z percentile
    (default p95): the canopy-height-model / obstruction-surface
    raster (forestry CHM, obstacle clearance) the min/max/avg stats of
    :func:`grid_zstats` cannot express.

    Exact order statistic: the ceil(p·n)-th smallest centi-unit z per
    cell — value-deterministic under ties without a tiebreaker column
    (equal values at the boundary yield the same selected VALUE). One
    shuffle of the cloud by cell id with a cell-partitioned rank —
    bounded per-cell sorts (density x cell², a data property), never a
    global sort; for a sketch-shaped alternative at extreme densities
    see operators.sketch.quantile_sketch's histogram approach."""
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    zq = F.round(F.col("z") * 100).cast("long")
    from pyspark.sql import Window

    cells = points.select(
        cx.alias("cell_x"), cy.alias("cell_y"), zq.alias("zq")
    )
    wcell = Window.partitionBy("cell_x", "cell_y")
    ranked = cells.withColumn(
        "rn", F.row_number().over(wcell.orderBy("zq"))
    ).withColumn("n", F.count(F.lit(1)).over(wcell))
    kth = F.ceil(F.lit(float(p)) * F.col("n").cast("double")).cast("long")
    return (
        ranked.filter(F.col("rn") == kth)
        .select(
            "cell_x",
            "cell_y",
            F.col("n").cast("long").alias("n_points"),
            (F.col("zq") / 100.0).alias("z_p"),
        )
        .orderBy("cell_x", "cell_y")
    )


def grid_z_percentile_sql(
    points_cte: str, cell: float = CELL, p: float = 0.95
) -> str:
    return f"""
{points_cte}, cells AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         CAST(round(z * 100) AS BIGINT) AS zq
  FROM points),
ranked AS (
  SELECT cell_x, cell_y, zq,
         row_number() OVER (PARTITION BY cell_x, cell_y ORDER BY zq) AS rn,
         count(*) OVER (PARTITION BY cell_x, cell_y) AS n
  FROM cells)
SELECT cell_x, cell_y, CAST(n AS BIGINT) AS n_points, zq / 100.0 AS z_p
FROM ranked
WHERE rn = CAST(ceil(CAST({float(p)!r} AS DOUBLE) * CAST(n AS DOUBLE))
                AS BIGINT)
ORDER BY cell_x, cell_y
""".strip()


# ---------------------------------------------------------------------------
# progressive morphological ground filter (grid PMF)
# ---------------------------------------------------------------------------

#: PMF stage windows (Chebyshev cell radii) and the final ground
#: acceptance threshold in metres — the classic progressively-widening
#: opening schedule, fixed so both engines compute the identical
#: surface
PMF_CELL = 20.0
PMF_WINDOWS = (1, 2)
PMF_THRESHOLD = 0.5


def _morph(dem: DataFrame, footprint: DataFrame, w: int, op) -> DataFrame:
    """Morphological erosion (op=min) / dilation (op=max) of the
    sparse cell surface with a (2w+1)^2 square element, restricted to
    the original cell footprint.

    Shape: ONE scan of the input surface with a map-side explode of
    the (2w+1)^2 literal offset array, then one partial-aggregated
    groupBy — no joins in the aperture, no windows, never a
    range/nested-loop join. Critically NOT a union of shifted copies:
    a union references the input once per shift, and chaining stages
    would rescan the upstream lineage multiplicatively (the classic
    iterative-lineage blowup). Missing neighbors simply don't
    contribute (standard sparse-grid morphology)."""
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-w, w + 1)
            for dy in range(-w, w + 1)
        ]
    )
    fanned = dem.select(
        "cell_x", "cell_y", "gq", F.explode(offs).alias("o")
    ).select(
        (F.col("cell_x") + F.col("o.dx")).alias("cell_x"),
        (F.col("cell_y") + F.col("o.dy")).alias("cell_y"),
        "gq",
    )
    agg = fanned.groupBy("cell_x", "cell_y").agg(op("gq").alias("gq"))
    return agg.join(footprint, ["cell_x", "cell_y"], "leftsemi")


def pmf_ground(
    points: DataFrame,
    cell: float = PMF_CELL,
    windows: tuple = PMF_WINDOWS,
    threshold: float = PMF_THRESHOLD,
) -> DataFrame:
    """(x, y, z, ground_est, is_ground) — progressive morphological
    ground filter (grid variant of Zhang et al. 2003, the PDAL
    ``filters.pmf`` lineage): the per-cell min surface is opened
    (eroded then dilated) with progressively wider windows, erasing
    bumps — buildings, vegetation — up to each window's size while
    terrain ramps survive; a point is ground iff it sits within
    ``threshold`` metres of the opened surface at its cell.

    All surface math is exact centi-unit BIGINT min/max, so the
    estimate is bit-identical across engines and partitionings; the
    only float op is the final ground_est/100.0 presentation.

    Scale: the cloud collapses once to |cells| ∝ area rows; each PMF
    stage is 2 single-scan explode aggregations of that small table
    (one shuffle each); the final labeling is ONE equi-join of the
    cloud against the cell surface (AQE broadcasts it when the extent
    is bounded). Nothing rescans the cloud per stage."""
    pts = _pts_cells(points, cell)
    surface = pmf_surface(points, cell, windows)
    thr_cm = int(round(threshold * 100))
    return (
        pts.join(surface, ["cell_x", "cell_y"])
        .select(
            "x", "y", "z",
            (F.col("gq") / 100.0).alias("ground_est"),
            (F.col("zq") - F.col("gq") <= thr_cm).alias("is_ground"),
        )
    )


def _pts_cells(points: DataFrame, cell: float) -> DataFrame:
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    zq = F.round(F.col("z") * 100).cast("long")
    return points.select(
        "x", "y", "z", cx.alias("cell_x"), cy.alias("cell_y"),
        zq.alias("zq"),
    )


def pmf_surface(
    points: DataFrame,
    cell: float = PMF_CELL,
    windows: tuple = PMF_WINDOWS,
) -> DataFrame:
    """(cell_x, cell_y, gq) — the opened (PMF) ground surface in exact
    centi-units, the shared core of :func:`pmf_ground` and
    :func:`canopy_height`."""
    pts = _pts_cells(points, cell)
    dem = pts.groupBy("cell_x", "cell_y").agg(F.min("zq").alias("gq"))
    footprint = dem.select("cell_x", "cell_y")
    surface = dem
    for w in windows:
        eroded = _morph(surface, footprint, w, F.min)
        surface = _morph(eroded, footprint, w, F.max)
    return surface


def pmf_ground_sql(
    points_cte: str,
    cell: float = PMF_CELL,
    windows: tuple = PMF_WINDOWS,
    threshold: float = PMF_THRESHOLD,
) -> str:
    """Oracle twin of :func:`pmf_ground` — each morphology stage is a
    neighborhood self-join aggregation over the cell table (DuckDB
    scale is fine with the quadratic-per-cell form; the Spark side
    uses single-scan explode apertures instead)."""
    thr_cm = int(round(threshold * 100))
    stage_sql, prev = _pmf_stages_sql(windows)
    return f"""
{points_cte}, cells AS (
  SELECT x, y, z,
         CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         CAST(round(z * 100) AS BIGINT) AS zq
  FROM points),
dem AS (
  SELECT cell_x, cell_y, min(zq) AS gq
  FROM cells GROUP BY 1, 2),
{stage_sql}
SELECT c.x, c.y, c.z, s.gq / 100.0 AS ground_est,
       (c.zq - s.gq) <= {thr_cm} AS is_ground
FROM cells c JOIN {prev} s
  ON s.cell_x = c.cell_x AND s.cell_y = c.cell_y
""".strip()


def _pmf_stages_sql(windows: tuple) -> tuple[str, str]:
    """The erosion/dilation CTE chain over ``dem`` (shared by the PMF
    and CHM oracles); returns (stage_sql, final_cte_name)."""
    stages = []
    prev = "dem"
    for i, w in enumerate(windows):
        stages.append(
            f"er{i} AS (\n"
            f"  SELECT d.cell_x, d.cell_y, min(n.gq) AS gq\n"
            f"  FROM dem d JOIN {prev} n\n"
            f"    ON n.cell_x BETWEEN d.cell_x - {w} AND d.cell_x + {w}\n"
            f"   AND n.cell_y BETWEEN d.cell_y - {w} AND d.cell_y + {w}\n"
            f"  GROUP BY 1, 2)"
        )
        stages.append(
            f"op{i} AS (\n"
            f"  SELECT d.cell_x, d.cell_y, max(n.gq) AS gq\n"
            f"  FROM dem d JOIN er{i} n\n"
            f"    ON n.cell_x BETWEEN d.cell_x - {w} AND d.cell_x + {w}\n"
            f"   AND n.cell_y BETWEEN d.cell_y - {w} AND d.cell_y + {w}\n"
            f"  GROUP BY 1, 2)"
        )
        prev = f"op{i}"
    return ",\n".join(stages), prev


# ---------------------------------------------------------------------------
# canopy height model (CHM): percentile surface minus opened ground
# ---------------------------------------------------------------------------

CHM_P = 0.95


def canopy_height(
    points: DataFrame,
    cell: float = PMF_CELL,
    p: float = CHM_P,
    windows: tuple = PMF_WINDOWS,
) -> DataFrame:
    """(cell_x, cell_y, n_points, ground_z, top_z, chm) — the canopy
    height model: per-cell p95 elevation minus the PMF-opened ground
    surface, the standard forestry/obstruction raster (top minus
    terrain on a common grid).

    Both surfaces come from exact centi-unit order statistics/min-max,
    so chm is one exact integer difference presented /100 — hash-
    stable. Shape: the percentile's cell shuffle + the PMF's small
    cell-table stages + one cell-table equi-join; the cloud is
    scanned twice (once per surface), never more."""
    from pyspark.sql import Window

    pts = _pts_cells(points, cell)
    wcell = Window.partitionBy("cell_x", "cell_y")
    ranked = pts.withColumn(
        "rn", F.row_number().over(wcell.orderBy("zq"))
    ).withColumn("n", F.count(F.lit(1)).over(wcell))
    kth = F.ceil(F.lit(float(p)) * F.col("n").cast("double")).cast("long")
    top = ranked.filter(F.col("rn") == kth).select(
        "cell_x", "cell_y",
        F.col("n").cast("long").alias("n_points"),
        F.col("zq").alias("topq"),
    )
    surface = pmf_surface(points, cell, windows)
    return (
        top.join(surface, ["cell_x", "cell_y"])
        .select(
            "cell_x", "cell_y", "n_points",
            (F.col("gq") / 100.0).alias("ground_z"),
            (F.col("topq") / 100.0).alias("top_z"),
            ((F.col("topq") - F.col("gq")) / 100.0).alias("chm"),
        )
        .orderBy("cell_x", "cell_y")
    )


def canopy_height_sql(
    points_cte: str,
    cell: float = PMF_CELL,
    p: float = CHM_P,
    windows: tuple = PMF_WINDOWS,
) -> str:
    stage_sql, prev = _pmf_stages_sql(windows)
    return f"""
{points_cte}, cells AS (
  SELECT x, y, z,
         CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         CAST(round(z * 100) AS BIGINT) AS zq
  FROM points),
dem AS (
  SELECT cell_x, cell_y, min(zq) AS gq
  FROM cells GROUP BY 1, 2),
{stage_sql},
ranked AS (
  SELECT cell_x, cell_y, zq,
         row_number() OVER (PARTITION BY cell_x, cell_y ORDER BY zq) AS rn,
         count(*) OVER (PARTITION BY cell_x, cell_y) AS n
  FROM cells),
top AS (
  SELECT cell_x, cell_y, CAST(n AS BIGINT) AS n_points, zq AS topq
  FROM ranked
  WHERE rn = CAST(ceil(CAST({float(p)!r} AS DOUBLE) * CAST(n AS DOUBLE))
                  AS BIGINT))
SELECT t.cell_x, t.cell_y, t.n_points,
       s.gq / 100.0 AS ground_z,
       t.topq / 100.0 AS top_z,
       (t.topq - s.gq) / 100.0 AS chm
FROM top t JOIN {prev} s
  ON s.cell_x = t.cell_x AND s.cell_y = t.cell_y
ORDER BY t.cell_x, t.cell_y
""".strip()


# ---------------------------------------------------------------------------
# Contour extraction census (r7): marching squares over the mean surface
# ---------------------------------------------------------------------------
#: default contour levels (metres) — bracket the fixture's mean-z band
CONTOUR_LEVELS = (16.0, 17.5, 19.0)


def contour_segments(
    points: DataFrame, cell: float = CELL, levels: tuple = CONTOUR_LEVELS
) -> DataFrame:
    """(level, n_crossed, n_segments) — marching-squares contour census
    of the gridded MEAN surface: for every 2×2 cell square and every
    level, classify the 16-case corner pattern (corner mean above /
    below the level) and count crossed squares and emitted contour
    segments (saddle cases 5 and 10 emit two). The cartographic
    contour-extraction kernel (AHN-style DTM products ship isolines),
    reduced to its countable census so the result is integer-exact.

    Exactness: a corner is 'above' iff mean > level ⟺
    sum(z_centi) > level_centi · n — BIGINT on both sides, so Spark
    and DuckDB agree bit-for-bit with no float division anywhere.

    Scale: the cloud collapses to the DEM (one groupBy, |cells| ∝
    area); corners come from three equi-joins of that small table
    against shifted copies on the same key — co-partitioned after one
    exchange; levels explode map-side over the squares (|levels|×
    fan-out of a cells-sized table); one final groupBy on level."""
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    zq = F.round(F.col("z") * 100).cast("long")
    dem = (
        points.select(cx.alias("cell_x"), cy.alias("cell_y"), zq.alias("q"))
        .groupBy("cell_x", "cell_y")
        .agg(
            F.sum("q").alias("sq"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )

    def shifted(dx: int, dy: int, tag: str) -> DataFrame:
        return dem.select(
            (F.col("cell_x") - dx).alias("cell_x"),
            (F.col("cell_y") - dy).alias("cell_y"),
            F.col("sq").alias(f"sq_{tag}"),
            F.col("n").alias(f"n_{tag}"),
        )

    squares = (
        dem.join(shifted(1, 0, "b"), ["cell_x", "cell_y"])
        .join(shifted(1, 1, "c"), ["cell_x", "cell_y"])
        .join(shifted(0, 1, "d"), ["cell_x", "cell_y"])
    )
    lv = squares.select(
        "*",
        F.explode(
            F.array(*[F.lit(float(l)) for l in levels])
        ).alias("level"),
    ).withColumn("lq", F.round(F.col("level") * 100).cast("long"))

    def above(sq_col: str, n_col: str):
        return F.when(
            F.col(sq_col) > F.col("lq") * F.col(n_col), F.lit(1)
        ).otherwise(F.lit(0))

    cased = lv.withColumn(
        "cs",
        above("sq", "n")
        + above("sq_b", "n_b") * 2
        + above("sq_c", "n_c") * 4
        + above("sq_d", "n_d") * 8,
    )
    segs = (
        F.when(F.col("cs").isin(0, 15), F.lit(0))
        .when(F.col("cs").isin(5, 10), F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        cased.select("level", segs.alias("segs"))
        .groupBy("level")
        .agg(
            F.sum(F.when(F.col("segs") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_crossed"),
            F.sum("segs").cast("long").alias("n_segments"),
        )
        .orderBy("level")
    )


def contour_segments_sql(
    points_cte: str, cell: float = CELL, levels: tuple = CONTOUR_LEVELS
) -> str:
    """Oracle twin of :func:`contour_segments`."""
    lits = ", ".join(repr(float(l)) for l in levels)
    return f"""
{points_cte}, dem AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         SUM(CAST(round(z * 100) AS BIGINT)) AS sq,
         CAST(count(*) AS BIGINT) AS n
  FROM points GROUP BY 1, 2),
squares AS (
  SELECT a.cell_x, a.cell_y, a.sq, a.n,
         b.sq AS sq_b, b.n AS n_b, c.sq AS sq_c, c.n AS n_c,
         d.sq AS sq_d, d.n AS n_d
  FROM dem a
  JOIN dem b ON b.cell_x = a.cell_x + 1 AND b.cell_y = a.cell_y
  JOIN dem c ON c.cell_x = a.cell_x + 1 AND c.cell_y = a.cell_y + 1
  JOIN dem d ON d.cell_x = a.cell_x AND d.cell_y = a.cell_y + 1),
cased AS (
  SELECT lv.level,
         (CASE WHEN sq > lq * n THEN 1 ELSE 0 END)
         + (CASE WHEN sq_b > lq * n_b THEN 1 ELSE 0 END) * 2
         + (CASE WHEN sq_c > lq * n_c THEN 1 ELSE 0 END) * 4
         + (CASE WHEN sq_d > lq * n_d THEN 1 ELSE 0 END) * 8 AS cs
  FROM squares, LATERAL (
    -- DuckDB types the literal list DECIMAL(3,1); Spark emits double,
    -- and the driver hash is representation-sensitive
    SELECT CAST(t.level AS DOUBLE) AS level,
           CAST(round(t.level * 100) AS BIGINT) AS lq
    FROM (SELECT unnest([{lits}]) AS level) t) lv),
segs AS (
  SELECT level,
         CASE WHEN cs IN (0, 15) THEN 0
              WHEN cs IN (5, 10) THEN 2 ELSE 1 END AS s
  FROM cased)
SELECT level,
       CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossed,
       CAST(SUM(s) AS BIGINT) AS n_segments
FROM segs GROUP BY level ORDER BY level
""".strip()


DENSITY_CELL = 10.0  # metres per density/coverage cell edge


def point_density(points: DataFrame, cell: float = DENSITY_CELL) -> DataFrame:
    """(cell_x, cell_y, n_points, density, is_gap) — per-cell point
    density over the FULL survey extent including empty cells: the
    coverage QA report every acquisition runs before accepting a
    delivery (density floor + hole detection). ``density`` is points
    per m²; ``is_gap`` flags cells with zero returns.

    Scale: one partial-agg groupBy reduces the cloud to occupied-cell
    counts (area-bounded, never point-bounded); the dense grid is
    generated INSIDE the plan from the 1-row cell-span aggregate via
    two sequence() explodes (area/cell² rows — no driver collect, no
    literal enumeration), and the counts LEFT-join onto it — grid side
    grows with surveyed area, counts side with occupancy, both
    area-bounded, so the join is AQE-gated and at 100 TB the whole
    report costs one fact shuffle plus an area-sized join. Density is
    one double division of an exact BIGINT by the literal cell area —
    bit-stable across engines."""
    cx = F.floor(F.col("x") / cell).cast("long")
    cy = F.floor(F.col("y") / cell).cast("long")
    counts = (
        points.select(cx.alias("cell_x"), cy.alias("cell_y"))
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = counts.agg(
        F.min("cell_x").alias("mnx"),
        F.max("cell_x").alias("mxx"),
        F.min("cell_y").alias("mny"),
        F.max("cell_y").alias("mxy"),
    )
    grid = span.select(
        F.explode(F.sequence("mnx", "mxx")).alias("cell_x"), "mny", "mxy"
    ).select(
        "cell_x", F.explode(F.sequence("mny", "mxy")).alias("cell_y")
    )
    area = cell * cell
    return grid.join(counts, ["cell_x", "cell_y"], "left").select(
        "cell_x",
        "cell_y",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_points"),
        F.round(
            F.coalesce(F.col("n"), F.lit(0)).cast("double") / area, 6
        ).alias("density"),
        (F.coalesce(F.col("n"), F.lit(0)) == 0).alias("is_gap"),
    )


def point_density_sql(points_cte: str, cell: float = DENSITY_CELL) -> str:
    """Oracle twin of :func:`point_density`."""
    return f"""
{points_cte}, counts AS (
  SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x,
         CAST(floor(y / {cell}) AS BIGINT) AS cell_y,
         count(*) AS n
  FROM points GROUP BY 1, 2),
span AS (
  SELECT min(cell_x) AS mnx, max(cell_x) AS mxx,
         min(cell_y) AS mny, max(cell_y) AS mxy
  FROM counts),
gx AS (
  SELECT unnest(generate_series(mnx, mxx)) AS cell_x, mny, mxy FROM span),
grid AS (
  SELECT cell_x, unnest(generate_series(mny, mxy)) AS cell_y FROM gx)
SELECT g.cell_x, g.cell_y,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_points,
       round(CAST(coalesce(c.n, 0) AS DOUBLE) / {cell * cell}, 6)
         AS density,
       coalesce(c.n, 0) = 0 AS is_gap
FROM grid g
LEFT JOIN counts c ON g.cell_x = c.cell_x AND g.cell_y = c.cell_y
""".strip()
