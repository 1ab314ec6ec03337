"""LOD operators: voxel downsampling + deterministic hash thinning."""

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stores(spark, sf_dir):
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.operators.window_query import WindowQuerier
    from lasdb_spark.sources.points import points_df

    base = tempfile.mkdtemp(prefix="lasdb_lod_")
    pts = points_df(spark, sf_dir)
    ingest_points(pts, "lodf", base)
    ingest_points(pts, "lodb", base, layout="block")
    qf = WindowQuerier(*load_dataset(spark, base, "lodf"))
    qb = WindowQuerier(*load_dataset(spark, base, "lodb"))
    return pts, qf, qb


@pytest.mark.spark
def test_voxel_counts_partition_the_cloud(stores):
    """Occupancy counts sum to the point count; each representative
    lies inside its own cell (cell == rep key >> 2L)."""
    pts, qf, _ = stores
    lod = qf.voxel_lod(4).cache()
    assert lod.agg(F.sum("n_points")).first()[0] == pts.count()
    # re-encode each representative and check its cell id
    from lasdb_spark.pcsfc.columns import morton_encode_col, quantize_col

    enc = morton_encode_col(
        quantize_col(F.col("x"), 1.0, 0.0), quantize_col(F.col("y"), 1.0, 0.0)
    )
    bad = lod.filter(F.shiftright(enc, 8) != F.col("cell")).count()
    assert bad == 0
    lod.unpersist()


@pytest.mark.spark
def test_voxel_level0_is_per_key(stores):
    """At level 0 every distinct stored key is its own cell."""
    pts, qf, _ = stores
    n_keys = qf.df.select("sfc_key").distinct().count()
    assert qf.voxel_lod(0).count() == n_keys


@pytest.mark.spark
def test_voxel_representative_is_struct_min(stores):
    """The representative must be the lexicographic (key, z, x, y) min
    of its cell — the determinism contract the oracle relies on."""
    pts, qf, _ = stores
    level = 6
    full = qf.df.withColumn("cell", F.shiftright("sfc_key", 2 * level))
    from pyspark.sql import Window

    w = Window.partitionBy("cell").orderBy("sfc_key", "z", "x", "y")
    want = (
        full.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", "x", "y", "z")
    )
    got = qf.voxel_lod(level).select("cell", "x", "y", "z")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


@pytest.mark.spark
def test_voxel_block_layout_matches_flat_on_cells(stores):
    """Block layout decodes to the same quantized grid, so cell ids and
    occupancy must agree with flat exactly."""
    _, qf, qb = stores
    a = {r.cell: r.n_points for r in qf.voxel_lod(5).collect()}
    b = {r.cell: r.n_points for r in qb.voxel_lod(5).collect()}
    assert a == b


@pytest.mark.spark
def test_thin_is_deterministic_subset(stores):
    pts, qf, _ = stores
    t1, t2 = qf.thin(4), qf.thin(4)
    n = t1.count()
    assert 0 < n < pts.count()
    assert t1.exceptAll(t2).count() == 0
    # thinned points are a subset of the cloud
    assert t1.exceptAll(qf.df.select("x", "y", "z")).count() == 0


@pytest.mark.spark
def test_lod_plans(stores):
    """thin = map-only (no shuffle Exchange); voxel = ONE hash agg with
    a map-side partial, no Python eval anywhere."""
    _, qf, _ = stores
    thin_plan = qf.thin(4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in thin_plan
    assert "Exchange rangepartitioning" not in thin_plan
    vox_plan = qf.voxel_lod(5)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in vox_plan
    assert vox_plan.count("Exchange hashpartitioning") == 1
    for p in (thin_plan, vox_plan):
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


@pytest.mark.spark
def test_lod_validation(stores):
    _, qf, _ = stores
    with pytest.raises(ValueError):
        qf.voxel_lod(-1)
    with pytest.raises(ValueError):
        qf.thin(0)


def test_lod_pyramid_levels_match_direct(stores):
    """Each pyramid tier must equal the independent voxel_downsample
    at that level (min-of-mins/sum-of-counts associativity), and the
    plan must REUSE the finest level's exchange across tiers instead
    of rescanning the cloud per level."""
    _, qf, _ = stores
    levels = [4, 7, 10]
    pyr = qf.lod_pyramid(levels)
    for l in levels:
        tier = pyr.filter(F.col("level") == l).drop("level")
        direct = qf.voxel_lod(l)
        assert tier.exceptAll(direct).count() == 0
        assert direct.exceptAll(tier).count() == 0
    # AQE defers exchange reuse to runtime stages (the static plan
    # string shows none before execution) — assert on the non-adaptive
    # plan, where ReuseExchange is a static rule
    spark = pyr.sparkSession
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            qf.lod_pyramid(levels)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in plan
