"""Epoch change detection between two point clouds of one extent.

The reference ingests AHN LiDAR (scripts/import_20m.json:10-17), and
AHN is exactly the dataset that ships in epochs (AHN2/3/4/5) — "what
changed between surveys" (new construction, demolition, terrain
works) is the canonical multi-epoch question. The reference has no
multi-epoch surface at all; this is the Spark-native version: grid
both epochs to per-cell occupancy + elevation summaries, align the
grids with one full-outer join, and classify each cell.

Scale: each epoch collapses to |cells| rows via one map-side-partial
groupBy (cost ∝ points, output ∝ area / cell²), then the two CELL
tables join on the cell id — the join inputs grow with AREA, never
with point density, so at 100 TB the shuffle moves only cell
summaries. No point-to-point matching, no windows over the cloud.

Exactness: elevations compare in centi-unit longs (the ingest
quantization, reference scripts ratio docs), so the delta and the
threshold test are integer-exact and the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL = 50.0  # metres per change-detection cell edge
Z_THRESH = 0.5  # metres of max-elevation delta that counts as change


def _cells(points: DataFrame, cell: float) -> DataFrame:
    return (
        points.select(
            F.floor(F.col("x") / cell).cast("long").alias("cell_x"),
            F.floor(F.col("y") / cell).cast("long").alias("cell_y"),
            F.round(F.col("z") * 100).cast("long").alias("zq"),
        )
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).alias("n"), F.max("zq").alias("zqmax"))
    )


def epoch_diff(
    cloud_a: DataFrame,
    cloud_b: DataFrame,
    cell: float = CELL,
    z_thresh: float = Z_THRESH,
) -> DataFrame:
    """(cell_x, cell_y, n_a, n_b, zmax_a, zmax_b, dz, change) — one row
    per cell occupied in EITHER epoch, classified as:

    - ``added``   — empty in epoch A, occupied in B (new construction)
    - ``removed`` — occupied in A, empty in B (demolition)
    - ``raised`` / ``lowered`` — both occupied, max elevation moved by
      more than ``z_thresh`` metres
    - ``stable``  — both occupied, delta within the threshold

    ``dz`` is NULL for added/removed cells (no pairing exists);
    ``n_a``/``n_b`` are 0, not NULL, on the missing side."""
    a = _cells(cloud_a, cell)
    b = _cells(cloud_b, cell)
    tq = int(round(z_thresh * 100))
    joined = a.alias("a").join(
        b.alias("b"), ["cell_x", "cell_y"], "full_outer"
    )
    n_a = F.coalesce(F.col("a.n"), F.lit(0)).alias("n_a")
    n_b = F.coalesce(F.col("b.n"), F.lit(0)).alias("n_b")
    dzq = F.col("b.zqmax") - F.col("a.zqmax")
    change = (
        F.when(F.col("a.n").isNull(), "added")
        .when(F.col("b.n").isNull(), "removed")
        .when(dzq > tq, "raised")
        .when(dzq < -tq, "lowered")
        .otherwise("stable")
    )
    return joined.select(
        "cell_x",
        "cell_y",
        n_a,
        n_b,
        (F.col("a.zqmax") / 100.0).alias("zmax_a"),
        (F.col("b.zqmax") / 100.0).alias("zmax_b"),
        (dzq / 100.0).alias("dz"),
        change.alias("change"),
    )


def epoch_diff_sql(
    with_prefix: str,
    cte_a: str = "points",
    cte_b: str = "epoch_b",
    cell: float = CELL,
    z_thresh: float = Z_THRESH,
) -> str:
    """Oracle twin; ``with_prefix`` is a WITH prefix defining the two
    epoch CTEs (each exposing x, y, z)."""
    tq = int(round(z_thresh * 100))

    def grid(src: str) -> str:
        return (
            f"SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x, "
            f"CAST(floor(y / {cell}) AS BIGINT) AS cell_y, "
            f"count(*) AS n, max(CAST(round(z * 100) AS BIGINT)) AS zqmax "
            f"FROM {src} GROUP BY 1, 2"
        )

    return f"""
{with_prefix},
ga AS ({grid(cte_a)}),
gb AS ({grid(cte_b)})
SELECT COALESCE(ga.cell_x, gb.cell_x) AS cell_x,
       COALESCE(ga.cell_y, gb.cell_y) AS cell_y,
       CAST(COALESCE(ga.n, 0) AS BIGINT) AS n_a,
       CAST(COALESCE(gb.n, 0) AS BIGINT) AS n_b,
       ga.zqmax / 100.0 AS zmax_a,
       gb.zqmax / 100.0 AS zmax_b,
       (gb.zqmax - ga.zqmax) / 100.0 AS dz,
       CASE WHEN ga.n IS NULL THEN 'added'
            WHEN gb.n IS NULL THEN 'removed'
            WHEN gb.zqmax - ga.zqmax > {tq} THEN 'raised'
            WHEN gb.zqmax - ga.zqmax < -{tq} THEN 'lowered'
            ELSE 'stable' END AS change
FROM ga FULL OUTER JOIN gb
  ON ga.cell_x = gb.cell_x AND ga.cell_y = gb.cell_y
""".strip()


def estimate_epoch_shift(
    cloud_a: DataFrame, cloud_b: DataFrame, cell: float = CELL
) -> DataFrame:
    """(n_cells, dz_shift) — robust vertical offset between two
    surveys of one extent: per-cell MEDIAN elevation in each epoch,
    then the MEDIAN of the per-cell differences over cells occupied in
    both. Real change (construction, demolition) shifts a minority of
    cells and is rejected by the outer median, so the estimate is the
    datum/sensor offset — run it BEFORE :func:`epoch_diff`, which
    assumes aligned epochs, and feed ``dz_shift`` back as a z
    correction.

    Exactness: medians run on centi-unit longs; for even counts both
    engines average the two middle values — every intermediate is an
    exact multiple of 0.005 m, so the rounded estimate hash-matches.

    Scale: two map-side-partial groupBys collapse each epoch to
    |cells| rows; the join and the final median see cell tables
    bounded by area / cell², never by point count. The global median
    funnels |cells| rows through one aggregation — area-bounded, the
    same envelope every epoch_diff consumer already accepts."""
    def med_cells(points: DataFrame):
        return (
            points.select(
                F.floor(F.col("x") / cell).cast("long").alias("cell_x"),
                F.floor(F.col("y") / cell).cast("long").alias("cell_y"),
                F.round(F.col("z") * 100).cast("long").alias("zq"),
            )
            .groupBy("cell_x", "cell_y")
            .agg(F.percentile(F.col("zq"), F.lit(0.5)).alias("med"))
        )

    a = med_cells(cloud_a)
    b = med_cells(cloud_b)
    dz = (
        a.join(b.withColumnRenamed("med", "med_b"), ["cell_x", "cell_y"])
        .select((F.col("med_b") - F.col("med")).alias("dzq"))
    )
    return dz.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.percentile(F.col("dzq"), F.lit(0.5)) / 100.0, 6
        ).alias("dz_shift"),
    )


def estimate_epoch_shift_sql(
    with_prefix: str,
    cte_a: str = "points",
    cte_b: str = "epoch_b",
    cell: float = CELL,
) -> str:
    """Oracle twin of :func:`estimate_epoch_shift`."""
    def grid(src: str) -> str:
        return (
            f"SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x, "
            f"CAST(floor(y / {cell}) AS BIGINT) AS cell_y, "
            f"median(CAST(round(z * 100) AS BIGINT)) AS med "
            f"FROM {src} GROUP BY 1, 2"
        )

    return f"""
{with_prefix},
ma AS ({grid(cte_a)}),
mb AS ({grid(cte_b)}),
dz AS (
  SELECT mb.med - ma.med AS dzq
  FROM ma JOIN mb USING (cell_x, cell_y))
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(median(dzq) / 100.0, 6) AS dz_shift
FROM dz
""".strip()
