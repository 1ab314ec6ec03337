"""Epoch change detection (operators/change.py) — classification
semantics on hand-built two-epoch clouds, plus the no-scale-killer
plan property (cell tables join, never point tables)."""

import pytest


def _cloud(spark, rows):
    return spark.createDataFrame(rows, "x double, y double, z double")


@pytest.mark.spark
def test_epoch_diff_classifications(spark):
    from lasdb_spark.operators.change import epoch_diff

    # cell edge 10 m → cell ids are floor(x/10), floor(y/10)
    a = _cloud(spark, [
        (5.0, 5.0, 10.0), (5.1, 5.1, 12.0),   # cell (0,0): zmax 12
        (15.0, 5.0, 8.0),                     # cell (1,0): removed in B
        (25.0, 5.0, 3.0),                     # cell (2,0): raised in B
        (35.0, 5.0, 9.0),                     # cell (3,0): lowered in B
        (45.0, 5.0, 1.0),                     # cell (4,0): stable (dz 0.5)
    ])
    b = _cloud(spark, [
        (5.0, 5.0, 12.3),                     # (0,0): dz 0.3 → stable
        (25.0, 5.0, 6.0),                     # (2,0): dz 3.0 → raised
        (35.0, 5.0, 7.0),                     # (3,0): dz -2.0 → lowered
        (45.0, 5.0, 1.5),                     # (4,0): dz exactly thresh
        (55.0, 5.0, 4.0),                     # (5,0): added
    ])
    out = {
        (r.cell_x, r.cell_y): r
        for r in epoch_diff(a, b, cell=10.0, z_thresh=0.5).collect()
    }
    assert len(out) == 6
    assert out[(0, 0)].change == "stable"
    assert out[(1, 0)].change == "removed"
    assert out[(2, 0)].change == "raised"
    assert out[(3, 0)].change == "lowered"
    # dz == z_thresh exactly is NOT change (strict inequality)
    assert out[(4, 0)].change == "stable"
    assert out[(5, 0)].change == "added"

    r = out[(1, 0)]
    assert (r.n_a, r.n_b) == (1, 0) and r.zmax_b is None and r.dz is None
    r = out[(5, 0)]
    assert (r.n_a, r.n_b) == (0, 1) and r.zmax_a is None and r.dz is None
    r = out[(0, 0)]
    assert (r.n_a, r.n_b) == (2, 1)
    assert (r.zmax_a, r.zmax_b, r.dz) == (12.0, 12.3, 0.3)


@pytest.mark.spark
def test_epoch_diff_joins_cell_tables_not_points(spark):
    """The full-outer join must sit ABOVE both aggregations (cell
    summaries join, area-sized), never below them (point tables join,
    corpus-sized) — the property that carries to 100 TB."""
    from lasdb_spark.operators.change import epoch_diff

    a = _cloud(spark, [(5.0, 5.0, 1.0)])
    b = _cloud(spark, [(5.0, 5.0, 2.0)])
    plan = epoch_diff(a, b)._jdf.queryExecution().optimizedPlan().toString()
    join_at = plan.find("Join FullOuter")
    assert join_at != -1
    # both aggregates appear BELOW (after, in tree print order) the join
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("Aggregate", i)
    ]
    assert len(agg_positions) >= 2
    assert all(p > join_at for p in agg_positions)


@pytest.mark.spark
def test_epoch_shift_rejects_local_change(spark):
    """A global +0.2 m datum shift plus a 'new building' (+10 m on one
    cell) must estimate 0.2 exactly — per-cell medians absorb point
    noise, the outer median rejects the changed cell."""
    from lasdb_spark.operators.change import estimate_epoch_shift

    rows = []
    for cx in range(5):
        for cy in range(5):
            for i in range(9):
                rows.append(
                    (cx * 50.0 + 5.0 * i, cy * 50.0 + 5.0 * i, 10.0 + i)
                )
    a = spark.createDataFrame(rows, "x double, y double, z double")
    from pyspark.sql import functions as F

    b = a.withColumn(
        "z",
        F.col("z")
        + 0.2
        + F.when((F.col("x") < 50.0) & (F.col("y") < 50.0), 10.0).otherwise(
            0.0
        ),
    )
    got = estimate_epoch_shift(a, b, cell=50.0).collect()[0]
    assert got.n_cells == 25
    assert got.dz_shift == 0.2


@pytest.mark.spark
def test_registration_recovers_planar_shift(spark):
    """Curved surface + translation (5, -10, 0.4): dx/dy come back
    exact, dz within the linearization bias; on a PERFECT plane the
    system is singular (horizontal vs vertical shift indistinguishable)
    and dx/dy must be NULL rather than garbage."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.change import estimate_epoch_registration

    rows = [
        (xi * 5.0, yi * 5.0,
         0.02 * xi * 5.0 + 0.01 * yi * 5.0 + 0.0002 * xi * 5.0 * yi * 5.0)
        for xi in range(100) for yi in range(100)
    ]
    a = spark.createDataFrame(rows, "x double, y double, z double")
    b = a.select(
        (F.col("x") + 5.0).alias("x"),
        (F.col("y") - 10.0).alias("y"),
        (F.col("z") + 0.4).alias("z"),
    )
    r = estimate_epoch_registration(a, b, cell=50.0).collect()[0]
    assert (r.dx_shift, r.dy_shift) == (5.0, -10.0)
    assert abs(r.dz_shift - 0.4) < 0.05

    flat = [(x, y, 0.02 * x + 0.01 * y) for x, y, _ in rows]
    fa = spark.createDataFrame(flat, "x double, y double, z double")
    fb = fa.select("x", "y", (F.col("z") + 1.0).alias("z"))
    rf = estimate_epoch_registration(fa, fb, cell=50.0).collect()[0]
    assert rf.dx_shift is None and rf.dy_shift is None
