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


def estimate_epoch_registration(
    cloud_a: DataFrame, cloud_b: DataFrame, cell: float = CELL
) -> DataFrame:
    """(n_cells, dx_shift, dy_shift, dz_shift) — full planar
    registration between two surveys: solve B(x,y) ≈ A(x−dx, y−dy)+dz
    by gradient least squares over the shared DEM grid. Linearizing,
    each co-occupied cell contributes db ≈ −gx·dx − gy·dy + dz with
    gx/gy the central-difference surface gradient of epoch A and db
    the per-cell min-elevation difference; the 3×3 normal equations
    are solved in closed form.

    Exactness (the part that makes a least-squares fit hash-stable):
    gradients and deltas stay in INTEGER centi-units, so every
    normal-equation sum (Σgx², Σgx·gy, Σgx·db, …) is an exact BIGINT,
    Cramer's rule runs on DECIMAL(38,0) integer determinants, and the
    only float operations are the three final divisions — identical
    in both engines. Determinant magnitude is bounded by
    |cells|³·max(grad_cm)⁴·(200·cell)² — comfortably inside 1e38 for
    survey-scale extents; at continental scale, register on a sampled
    cell subset.

    Scale: identical envelope to :func:`estimate_epoch_shift` — two
    map-side-partial groupBys to |cells| rows, the gradient's
    self-joins on the cell key, one one-row aggregation. Flat terrain
    (singular system) yields NULL dx/dy; ``dz`` from
    :func:`estimate_epoch_shift` is the robust fallback there."""
    k = int(round(200 * cell))  # gradient denominator, integer by spec
    if k != 200 * cell:
        raise ValueError(f"cell must make 200*cell integral, got {cell}")

    def dem(points: DataFrame):
        return (
            points.select(
                F.floor(F.col("x") / cell).cast("long").alias("cell_x"),
                F.floor(F.col("y") / cell).cast("long").alias("cell_y"),
                F.round(F.col("z") * 100).cast("long").alias("gq"),
            )
            .groupBy("cell_x", "cell_y")
            .agg(F.min("gq").alias("gq"))
        )

    da = dem(cloud_a)
    db_ = dem(cloud_b)

    def shifted(src, dx, dy, alias):
        return src.select(
            (F.col("cell_x") - dx).alias("cell_x"),
            (F.col("cell_y") - dy).alias("cell_y"),
            F.col("gq").alias(alias),
        )

    g = (
        da.join(shifted(da, 1, 0, "eq"), ["cell_x", "cell_y"])
        .join(shifted(da, -1, 0, "wq"), ["cell_x", "cell_y"])
        .join(shifted(da, 0, 1, "nq"), ["cell_x", "cell_y"])
        .join(shifted(da, 0, -1, "sq"), ["cell_x", "cell_y"])
        .join(db_.withColumnRenamed("gq", "gqb"), ["cell_x", "cell_y"])
        .select(
            (F.col("eq") - F.col("wq")).alias("u"),  # dzdx centi-units
            (F.col("nq") - F.col("sq")).alias("v"),  # dzdy centi-units
            (F.col("gqb") - F.col("gq")).alias("d"),  # db centi-units
        )
    )
    s = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u") * F.col("u")).alias("sxx"),
        F.sum(F.col("u") * F.col("v")).alias("sxy"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
        F.sum("u").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("u") * F.col("d")).alias("sxd"),
        F.sum(F.col("v") * F.col("d")).alias("syd"),
        F.sum("d").alias("sd"),
    )

    dec = "decimal(38,0)"
    def C(name):
        return F.col(name).cast(dec)

    kL = F.lit(k).cast(dec)
    two_cell = F.lit(int(round(2 * cell))).cast(dec)  # = k/100
    a11, a12, a13 = C("sxx"), C("sxy"), -kL * C("sx")
    a22, a23 = C("syy"), -kL * C("sy")
    a31, a32, a33 = -C("sx"), -C("sy"), kL * C("n")
    b1, b2, b3 = -two_cell * C("sxd"), -two_cell * C("syd"), two_cell * C("sd")
    det = (
        a11 * (a22 * a33 - a23 * a32)
        - a12 * (a12 * a33 - a23 * a31)
        + a13 * (a12 * a32 - a22 * a31)
    )
    det_x = (
        b1 * (a22 * a33 - a23 * a32)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a32 - a22 * b3)
    )
    det_y = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a31)
        + a13 * (a12 * b3 - b2 * a31)
    )
    det_z = (
        a11 * (a22 * b3 - b2 * a32)
        - a12 * (a12 * b3 - b2 * a31)
        + b1 * (a12 * a32 - a22 * a31)
    )
    nz = F.nullif(det.cast("double"), F.lit(0.0))
    return s.select(
        F.col("n").alias("n_cells"),
        F.round(det_x.cast("double") / nz, 6).alias("dx_shift"),
        F.round(det_y.cast("double") / nz, 6).alias("dy_shift"),
        F.round(det_z.cast("double") / nz, 6).alias("dz_shift"),
    )


def estimate_epoch_registration_sql(
    with_prefix: str,
    cte_a: str = "points",
    cte_b: str = "epoch_b",
    cell: float = CELL,
) -> str:
    """Oracle twin of :func:`estimate_epoch_registration` — the same
    integer sums and Cramer determinants, DECIMAL(38,0) on both
    sides."""
    k = int(round(200 * cell))
    tc = int(round(2 * cell))

    def dem(src: str) -> str:
        return (
            f"SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x, "
            f"CAST(floor(y / {cell}) AS BIGINT) AS cell_y, "
            f"min(CAST(round(z * 100) AS BIGINT)) AS gq "
            f"FROM {src} GROUP BY 1, 2"
        )

    D = "CAST({} AS DECIMAL(38,0))"
    a11, a12 = D.format("sxx"), D.format("sxy")
    a13 = f"(-{k} * {D.format('sx')})"
    a22, a23 = D.format("syy"), f"(-{k} * {D.format('sy')})"
    a31, a32 = f"(-{D.format('sx')})", f"(-{D.format('sy')})"
    a33 = f"({k} * {D.format('n')})"
    b1 = f"(-{tc} * {D.format('sxd')})"
    b2 = f"(-{tc} * {D.format('syd')})"
    b3 = f"({tc} * {D.format('sd')})"
    det = (
        f"({a11} * ({a22} * {a33} - {a23} * {a32}) "
        f"- {a12} * ({a12} * {a33} - {a23} * {a31}) "
        f"+ {a13} * ({a12} * {a32} - {a22} * {a31}))"
    )
    det_x = (
        f"({b1} * ({a22} * {a33} - {a23} * {a32}) "
        f"- {a12} * ({b2} * {a33} - {a23} * {b3}) "
        f"+ {a13} * ({b2} * {a32} - {a22} * {b3}))"
    )
    det_y = (
        f"({a11} * ({b2} * {a33} - {a23} * {b3}) "
        f"- {b1} * ({a12} * {a33} - {a23} * {a31}) "
        f"+ {a13} * ({a12} * {b3} - {b2} * {a31}))"
    )
    det_z = (
        f"({a11} * ({a22} * {b3} - {b2} * {a32}) "
        f"- {a12} * ({a12} * {b3} - {b2} * {a31}) "
        f"+ {b1} * ({a12} * {a32} - {a22} * {a31}))"
    )
    nz = f"nullif(CAST({det} AS DOUBLE), 0.0)"
    return f"""
{with_prefix},
dem_a AS ({dem(cte_a)}),
dem_b AS ({dem(cte_b)}),
grads AS (
  SELECT e.gq - w.gq AS u, n2.gq - s2.gq AS v, b.gq - d.gq AS d
  FROM dem_a d
  JOIN dem_a e ON e.cell_x = d.cell_x + 1 AND e.cell_y = d.cell_y
  JOIN dem_a w ON w.cell_x = d.cell_x - 1 AND w.cell_y = d.cell_y
  JOIN dem_a n2 ON n2.cell_x = d.cell_x AND n2.cell_y = d.cell_y + 1
  JOIN dem_a s2 ON s2.cell_x = d.cell_x AND s2.cell_y = d.cell_y - 1
  JOIN dem_b b ON b.cell_x = d.cell_x AND b.cell_y = d.cell_y),
sums AS (
  SELECT count(*) AS n, sum(u * u) AS sxx, sum(u * v) AS sxy,
         sum(v * v) AS syy, sum(u) AS sx, sum(v) AS sy,
         sum(u * d) AS sxd, sum(v * d) AS syd, sum(d) AS sd
  FROM grads)
SELECT CAST(n AS BIGINT) AS n_cells,
       round(CAST({det_x} AS DOUBLE) / {nz}, 6) AS dx_shift,
       round(CAST({det_y} AS DOUBLE) / {nz}, 6) AS dy_shift,
       round(CAST({det_z} AS DOUBLE) / {nz}, 6) AS dz_shift
FROM sums
""".strip()


def volume_change(
    cloud_a: DataFrame, cloud_b: DataFrame, cell: float = CELL
) -> DataFrame:
    """ONE row (n_cells, cut_volume, fill_volume, net_volume) — the
    earthworks cut/fill balance between two epochs: per common cell,
    the mean-elevation delta × cell area, split into material removed
    (cut, B below A) and added (fill, B above A). The quantity a
    terrain-works / mining / coastal-monitoring pipeline reports.

    Exactness: per-cell mean elevations derive from centi-unit BIGINT
    sums; the cell's delta quantizes ONCE to micro-metres, so the
    corpus-wide cut/fill totals are order-independent integer sums
    with a single float multiply (× cell²) at the end. Cells occupied
    in only one epoch carry no pairing and are excluded (they are
    `added`/`removed` in :func:`epoch_diff`, not volume).

    Scale: two map-side-partial grid collapses (output ∝ area/cell²),
    one cell-id join, one global one-row agg."""
    def grid(points):
        return (
            points.select(
                F.floor(F.col("x") / cell).cast("long").alias("cell_x"),
                F.floor(F.col("y") / cell).cast("long").alias("cell_y"),
                F.round(F.col("z") * 100).cast("long").alias("zq"),
            )
            .groupBy("cell_x", "cell_y")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("zq").alias("zqsum"),
            )
        )

    a = grid(cloud_a).alias("a")
    b = grid(cloud_b).alias("b")
    joined = a.join(b, ["cell_x", "cell_y"])
    dq = F.round(
        (
            F.col("b.zqsum").cast("double")
            / (F.col("b.n").cast("double") * 100.0)
            - F.col("a.zqsum").cast("double")
            / (F.col("a.n").cast("double") * 100.0)
        )
        * 1e6
    ).cast("long")
    per = joined.select(dq.alias("dq"))
    area = float(cell) * float(cell)
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(F.when(F.col("dq") < 0, -F.col("dq")).otherwise(F.lit(0)))
        .alias("cut_q"),
        F.sum(F.when(F.col("dq") > 0, F.col("dq")).otherwise(F.lit(0)))
        .alias("fill_q"),
    )
    return agg.select(
        "n_cells",
        (F.col("cut_q").cast("double") / 1e6 * area).alias("cut_volume"),
        (F.col("fill_q").cast("double") / 1e6 * area).alias("fill_volume"),
        (
            (F.col("fill_q") - F.col("cut_q")).cast("double") / 1e6 * area
        ).alias("net_volume"),
    )


def volume_change_sql(
    with_prefix: str,
    cte_a: str = "points",
    cte_b: str = "epoch_b",
    cell: float = CELL,
) -> str:
    """Oracle twin of :func:`volume_change`; ``with_prefix`` defines
    the two epoch CTEs (each exposing x, y, z)."""
    area = float(cell) * float(cell)

    def grid(src: str) -> str:
        return (
            f"SELECT CAST(floor(x / {cell}) AS BIGINT) AS cell_x, "
            f"CAST(floor(y / {cell}) AS BIGINT) AS cell_y, "
            f"count(*) AS n, SUM(CAST(round(z * 100) AS BIGINT)) AS zqsum "
            f"FROM {src} GROUP BY 1, 2"
        )

    return f"""
{with_prefix},
ga AS ({grid(cte_a)}),
gb AS ({grid(cte_b)}),
per AS (
  SELECT CAST(round((CAST(gb.zqsum AS DOUBLE) / (CAST(gb.n AS DOUBLE) * 100.0)
               - CAST(ga.zqsum AS DOUBLE) / (CAST(ga.n AS DOUBLE) * 100.0))
               * 1e6) AS BIGINT) AS dq
  FROM ga JOIN gb ON ga.cell_x = gb.cell_x AND ga.cell_y = gb.cell_y)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN dq < 0 THEN -dq ELSE 0 END) AS DOUBLE)
         / 1e6 * {area!r} AS cut_volume,
       CAST(SUM(CASE WHEN dq > 0 THEN dq ELSE 0 END) AS DOUBLE)
         / 1e6 * {area!r} AS fill_volume,
       CAST(SUM(CASE WHEN dq > 0 THEN dq ELSE 0 END)
          - SUM(CASE WHEN dq < 0 THEN -dq ELSE 0 END) AS DOUBLE)
         / 1e6 * {area!r} AS net_volume
FROM per
""".strip()
