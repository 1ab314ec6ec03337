"""Euclidean voxel segmentation (r8) — two-level CC correctness."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_long_snake_is_one_segment(spark):
    """The regression that motivated two-level CC: a serpentine
    component whose voxel diameter is in the hundreds must come back
    as ONE segment (single-level min-label propagation crawled ~1 hop
    per round on this shape and split it at the round cap)."""
    from lasdb_spark.operators.segment import euclidean_segments

    # serpentine path over a 60x60 voxel grid at cell=5: sweep right
    # along each row, connect rows at alternating ends -> diameter 3600
    cells = []
    for ry in range(60):
        xs = range(60) if ry % 2 == 0 else range(59, -1, -1)
        cells.extend((x, ry) for x in xs)
    pts = spark.createDataFrame(
        [(cx * 5.0 + 2.0, cy * 5.0 + 2.0, 39.0) for cx, cy in cells],
        "x double, y double, z double",
    )
    segs = euclidean_segments(pts).collect()
    assert len(segs) == 1
    assert segs[0].n_voxels == 3600
    assert segs[0].n_points == 3600


@pytest.mark.spark
def test_segments_match_local_union_find(spark, sf_dir):
    """Spark labels == a driver-side exact union-find over the same
    voxel adjacency (independent implementation, same semantics)."""
    from lasdb_spark.operators.segment import (
        SEG_CELL,
        SEG_ZMIN,
        _OFFSETS26,
        euclidean_segments,
    )
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, sf_dir)
    vox = (
        pts.where(F.col("z") >= SEG_ZMIN)
        .select(
            F.floor(F.col("x") / SEG_CELL).alias("vx"),
            F.floor(F.col("y") / SEG_CELL).alias("vy"),
            F.floor(F.col("z") / SEG_CELL).alias("vz"),
        )
        .groupBy("vx", "vy", "vz")
        .count()
        .collect()
    )
    pos = {(r.vx, r.vy, r.vz): i for i, r in enumerate(vox)}
    parent = list(range(len(vox)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for (x, y, z), i in pos.items():
        for dx, dy, dz in _OFFSETS26:
            j = pos.get((x + dx, y + dy, z + dz))
            if j is not None:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    from collections import Counter

    truth = sorted(Counter(find(i) for i in range(len(vox))).values())
    got = sorted(
        r.n_voxels for r in euclidean_segments(pts).collect()
    )
    assert got == truth


@pytest.mark.spark
def test_shared_labels_match_inline(spark):
    """labels= reuse: census and shape from a precomputed (even
    parquet-round-tripped) label table must emit row-identical output
    to the inline-labeled path."""
    import tempfile

    from lasdb_spark.operators.segment import (
        euclidean_segments,
        segment_labels,
        segment_shape,
    )
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, "/root/testdata/sf0.001")
    path = tempfile.mkdtemp() + "/labels"
    segment_labels(pts).write.parquet(path)
    labels = spark.read.parquet(path)

    seg_inline = euclidean_segments(pts).collect()
    seg_shared = euclidean_segments(pts, labels=labels).collect()
    assert [tuple(r) for r in seg_shared] == [tuple(r) for r in seg_inline]

    shp_inline = segment_shape(pts).collect()
    shp_shared = segment_shape(pts, labels=labels).collect()
    assert [tuple(r) for r in shp_shared] == [tuple(r) for r in shp_inline]
