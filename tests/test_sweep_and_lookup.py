"""Storage-parameter sweep harness + Q12 head lookup."""

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stored(spark, sf_dir):
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.sources.points import points_df

    base = tempfile.mkdtemp(prefix="lasdb_lookup_")
    ingest_points(points_df(spark, sf_dir), "p", base)
    return load_dataset(spark, base, "p")


@pytest.mark.spark
def test_head_lookup_flat(spark, stored):
    from lasdb_spark.operators.window_query import head_lookup
    from lasdb_spark.pcsfc.columns import split_head_col

    df, meta, layout = stored
    heads = [
        r.h
        for r in df.select(
            split_head_col(F.col("sfc_key"), meta.tail_length).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(3)
        .collect()
    ]
    got = head_lookup(df, heads, meta, layout)
    expected = df.filter(
        split_head_col(F.col("sfc_key"), meta.tail_length).isin(heads)
    ).count()
    assert got.count() == expected > 0
    # the key-range predicates must reach the Parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "sfc_key" in plan.split("PushedFilters")[1][:400]


@pytest.mark.spark
def test_head_lookup_empty(spark, stored):
    from lasdb_spark.operators.window_query import head_lookup

    df, meta, layout = stored
    assert head_lookup(df, [], meta, layout).count() == 0


@pytest.mark.spark
def test_head_lookup_block(spark, sf_dir):
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.operators.window_query import head_lookup
    from lasdb_spark.sources.points import points_df

    base = tempfile.mkdtemp(prefix="lasdb_lookup_blk_")
    ingest_points(points_df(spark, sf_dir), "b", base, layout="block")
    df, meta, layout = load_dataset(spark, base, "b")
    heads = [r.sfc_head for r in df.select("sfc_head").orderBy("sfc_head").limit(2).collect()]
    n = head_lookup(df, heads, meta, layout).count()
    expected = (
        df.filter(F.col("sfc_head").isin([int(h) for h in heads]))
        .select(F.explode("sfc_tail"))
        .count()
    )
    assert n == expected > 0


@pytest.mark.spark
def test_block_zslab_prunes_and_preserves_answer(spark, sf_dir):
    """Block-layout z-slab queries must return exactly the unpruned
    block answer post-filtered by z (pruning is an optimization, never
    a semantics change), and must skip non-intersecting blocks before
    unpacking."""
    from lasdb_spark.operators.ingest import ingest_points, load_dataset
    from lasdb_spark.operators.window_query import WindowQuerier
    from lasdb_spark.sources.points import points_df

    base = tempfile.mkdtemp(prefix="lasdb_zslab_blk_")
    ingest_points(points_df(spark, sf_dir), "bz", base, layout="block")
    dfb, metab, layb = load_dataset(spark, base, "bz")
    qb = WindowQuerier(dfb, metab, layb)

    bbox = [85100.0, 85900.0, 446100.0, 447400.0]
    baseline = [tuple(r) for r in qb.bbox(bbox).collect()]
    for kw, keep in (
        ({"maxz": 2.0}, lambda z: z <= 2.0),
        ({"minz": 30.0}, lambda z: z >= 30.0),
        ({"minz": 5.0, "maxz": 10.0}, lambda z: 5.0 <= z <= 10.0),
    ):
        got = sorted(tuple(r) for r in qb.bbox(bbox, **kw).collect())
        want = sorted(t for t in baseline if keep(t[2]))
        assert got == want and len(want) > 0
    # pruning really skips blocks: a slab far above the data unpacks none
    assert (
        qb._pruned(bbox[0], bbox[1], bbox[2], bbox[3], minz=1e6).count() == 0
    )


@pytest.mark.spark
def test_storage_sweep(spark, sf_dir):
    from lasdb_spark.cli.sweep import sweep_storage_params
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, sf_dir)
    rows = sweep_storage_params(
        pts,
        ratios=(0.5, 0.8),
        probe_bbox=[85200.0, 85400.0, 446300.0, 446800.0],
    )
    assert [r["ratio"] for r in rows] == [0.5, 0.8]
    lo, hi = rows
    # longer head (higher ratio) => strictly more, smaller blocks
    assert hi["head_length"] > lo["head_length"]
    assert hi["blocks"] > lo["blocks"]
    assert hi["avg_points_per_block"] < lo["avg_points_per_block"]
    # identical probe answers regardless of layout ratio
    assert lo["probe_rows"] == hi["probe_rows"] > 0
    total = pts.count()
    for r in rows:
        assert r["blocks"] * r["avg_points_per_block"] == pytest.approx(total, rel=0.01)
