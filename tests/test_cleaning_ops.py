"""Cleaning / normalization / packing operators: height-above-ground,
radius outlier removal, sequence packing."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# height above ground
# ---------------------------------------------------------------------------
@pytest.mark.spark
def test_hag_nonnegative_and_cell_min_is_zero(spark, sf_dir):
    from lasdb_spark.operators.grid import height_above_ground
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, sf_dir)
    hag = height_above_ground(pts, 25.0).cache()
    try:
        assert hag.count() == pts.count()  # join drops nothing
        assert hag.filter(F.col("hag") < 0).count() == 0
        # every cell's minimum point sits exactly on the ground
        cells = hag.withColumn("cx", F.floor(F.col("x") / 25.0)).withColumn(
            "cy", F.floor(F.col("y") / 25.0)
        )
        zero_cells = (
            cells.groupBy("cx", "cy").agg(F.min("hag").alias("mn"))
        )
        assert zero_cells.filter(F.col("mn") != 0.0).count() == 0
    finally:
        hag.unpersist()


@pytest.mark.spark
def test_hag_ground_is_cell_min(spark):
    from lasdb_spark.operators.grid import height_above_ground

    df = spark.createDataFrame(
        [
            (1.0, 1.0, 10.0),
            (2.0, 2.0, 4.0),   # same cell (cell=5) → ground 4.0
            (7.0, 1.0, 9.0),   # its own cell → ground 9.0
        ],
        "x double, y double, z double",
    )
    out = {(r["x"], r["y"]): (r["ground_z"], r["hag"])
           for r in height_above_ground(df, 5.0).collect()}
    assert out[(1.0, 1.0)] == (4.0, 6.0)
    assert out[(2.0, 2.0)] == (4.0, 0.0)
    assert out[(7.0, 1.0)] == (9.0, 0.0)


# ---------------------------------------------------------------------------
# DEM gradient
# ---------------------------------------------------------------------------
@pytest.mark.spark
def test_dem_gradient_central_difference(spark):
    """3x1 strip of cells with known ground minima: the center cell's
    dzdx is east-minus-west in exact centi-units; edge cells (missing
    a neighbor) are NULL in that axis."""
    from lasdb_spark.operators.grid import dem_gradient

    df = spark.createDataFrame(
        [
            (1.0, 1.0, 2.0), (2.0, 2.0, 5.0),     # cell (0,0): min 2.0
            (7.0, 1.0, 10.0),                      # cell (1,0): 10.0
            (12.0, 1.0, 3.5), (13.0, 3.0, 4.0),   # cell (2,0): 3.5
        ],
        "x double, y double, z double",
    )
    rows = {
        (r.cell_x, r.cell_y): r for r in dem_gradient(df, 5.0).collect()
    }
    assert rows[(0, 0)].ground_z == 2.0
    # center cell: east(3.5) - west(2.0) = 1.5 m = 150 centi-units
    assert rows[(1, 0)].dzdx_cm == 150
    # strip edges lack an east or west neighbor → NULL gradient
    assert rows[(0, 0)].dzdx_cm is None
    assert rows[(2, 0)].dzdx_cm is None
    # no north/south neighbors anywhere on a 3x1 strip
    assert all(r.dzdy_cm is None for r in rows.values())


# ---------------------------------------------------------------------------
# radius outliers
# ---------------------------------------------------------------------------
@pytest.mark.spark
def test_outlier_isolated_point_flagged(spark):
    from lasdb_spark.operators.outliers import radius_outliers

    # a 3-point cluster within r=2 of each other, plus one isolated site
    df = spark.createDataFrame(
        [
            (0.0, 0.0, 1.0),
            (1.0, 0.0, 1.0),
            (0.0, 1.0, 1.0),
            (100.0, 100.0, 1.0),
        ],
        "x double, y double, z double",
    )
    outs = radius_outliers(df, radius=2.0, min_pts=3).collect()
    assert [(r["x"], r["y"], r["n_neighbors"]) for r in outs] == [
        (100.0, 100.0, 1)
    ]


@pytest.mark.spark
def test_outlier_duplicates_weighted(spark):
    from lasdb_spark.operators.outliers import radius_neighbor_counts

    # one site duplicated 3× plus a distinct neighbor in range: every
    # site's count is multiplicity-weighted and self-inclusive
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0)] * 3 + [(1.0, 0.0, 2.0)],
        "x double, y double, z double",
    )
    counts = {
        (r["x"], r["y"]): r["n_neighbors"]
        for r in radius_neighbor_counts(df, radius=5.0).collect()
    }
    assert counts == {(0.0, 0.0): 4, (1.0, 0.0): 4}


@pytest.mark.spark
def test_outlier_plan_has_no_nested_loop(spark, sf_dir):
    """The distance join must be a HASH join on the cell key (broadcast
    or shuffled) — a BroadcastNestedLoopJoin / CartesianProduct here is
    the O(n²) plan this operator exists to avoid."""
    from lasdb_spark.operators.outliers import radius_outliers
    from lasdb_spark.sources.points import points_df

    plan = radius_outliers(
        points_df(spark, sf_dir)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.spark
def test_outlier_materialize_sites_same_result(spark):
    from lasdb_spark.operators.outliers import radius_neighbor_counts

    df = spark.createDataFrame(
        [(float(i % 7), float(i % 5), 1.0) for i in range(40)],
        "x double, y double, z double",
    )
    a = sorted(map(tuple, radius_neighbor_counts(df, 3.0).collect()))
    b = sorted(
        map(tuple, radius_neighbor_counts(df, 3.0, materialize_sites=True).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------
@pytest.mark.spark
def test_pack_sequences_stream_is_contiguous(spark, sf_dir):
    """Within a bucket (ordered by doc_id) each doc starts exactly
    where the previous one ended: start = seq_id*seq_len + offset is
    the running token total."""
    from lasdb_spark.operators.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seq_len = 128
    packed = pack_sequences(docs, seq_len=seq_len, n_buckets=8).collect()
    assert len(packed) == docs.count()
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert 0 <= r["offset"] < seq_len
            assert r["seq_id"] * seq_len + r["offset"] == pos
            pos += r["n_tokens"]


@pytest.mark.spark
def test_pack_sequences_partitioning_invariant(spark, sf_dir):
    from lasdb_spark.operators.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs, 64, 4).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), 64, 4).collect()))
    assert a == b


@pytest.mark.spark
def test_grid_z_percentile_bounds(spark, sf_dir):
    """p95 lies within [z_min, z_max] of its cell and never below the
    cell median; degenerate single-point cells report the point."""
    from lasdb_spark.operators.grid import grid_z_percentile, grid_zstats
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, sf_dir)
    p95 = {(r.cell_x, r.cell_y): r for r in grid_z_percentile(pts).collect()}
    p50 = {
        (r.cell_x, r.cell_y): r
        for r in grid_z_percentile(pts, p=0.5).collect()
    }
    stats = {(r.cell_x, r.cell_y): r for r in grid_zstats(pts).collect()}
    assert set(p95) == set(stats)
    for key, r in p95.items():
        s = stats[key]
        assert s.z_min <= r.z_p <= s.z_max
        assert r.n_points == s.n_points
        assert r.z_p >= p50[key].z_p


@pytest.mark.spark
def test_pmf_ground_removes_building_keeps_ramp(spark):
    """A flat terrain ramp with a planted 20 m 'building' block: PMF
    must label ramp points ground and rooftop points non-ground (the
    opening erases bumps narrower than the window schedule)."""
    import numpy as np

    from lasdb_spark.operators.grid import pmf_ground

    rng = np.random.default_rng(42)
    n = 4000
    x = rng.uniform(0, 400, n)
    y = rng.uniform(0, 400, n)
    z = x * 0.01  # gentle 1% ramp
    # plant a sharp 20 m-tall block covering ONE 20 m cell
    roof = (x >= 100) & (x < 120) & (y >= 100) & (y < 120)
    z = np.where(roof, z + 20.0, z)
    rows = [
        (float(xi), float(yi), float(zi))
        for xi, yi, zi in zip(x, y, z)
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = pmf_ground(df).collect()
    by_roof = {True: [], False: []}
    for r in out:
        by_roof[100 <= r.x < 120 and 100 <= r.y < 120].append(r)
    # rooftop points: far above the opened surface -> non-ground
    assert all(not r.is_ground for r in by_roof[True])
    # ramp points: within threshold of the opened min surface almost
    # everywhere (cell-quantized ramp rise 0.2m/cell < 0.5m threshold)
    ramp = by_roof[False]
    frac = sum(r.is_ground for r in ramp) / len(ramp)
    assert frac > 0.95


@pytest.mark.spark
def test_pmf_ground_footprint_and_exactness(spark):
    """The opened surface stays on the original cell footprint and the
    output row count equals the input (every point labeled once)."""
    import numpy as np

    from lasdb_spark.operators.grid import pmf_ground

    rng = np.random.default_rng(1)
    rows = [
        (float(a), float(b), float(c))
        for a, b, c in zip(
            rng.uniform(0, 100, 500),
            rng.uniform(0, 100, 500),
            rng.uniform(0, 5, 500),
        )
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = pmf_ground(df)
    assert out.count() == 500
    # ground_est never exceeds the point's own cell min (it IS a
    # min-derived surface): est <= every z in the cell, up to the
    # half-centi-unit quantization of round(z*100)
    bad = out.filter("ground_est > z + 0.005 + 1e-9").count()
    assert bad == 0


@pytest.mark.spark
def test_point_density_grid_and_gaps(spark):
    """The dense grid spans the full occupied-cell bbox; empty interior
    cells are flagged as gaps with zero density."""
    from lasdb_spark.operators.grid import point_density

    pts = spark.createDataFrame(
        [(5.0, 5.0, 0.0), (6.0, 5.0, 0.0), (25.0, 5.0, 0.0)],
        "x double, y double, z double",
    )
    rows = {(r.cell_x, r.cell_y): r for r in point_density(pts, cell=10.0).collect()}
    # grid spans cells x in 0..2, y = 0 -> exactly 3 rows
    assert set(rows) == {(0, 0), (1, 0), (2, 0)}
    assert rows[(0, 0)].n_points == 2 and not rows[(0, 0)].is_gap
    assert rows[(0, 0)].density == pytest.approx(0.02)
    assert rows[(1, 0)].n_points == 0 and rows[(1, 0)].is_gap
    assert rows[(1, 0)].density == 0.0
    assert rows[(2, 0)].n_points == 1 and not rows[(2, 0)].is_gap
