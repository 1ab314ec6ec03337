"""COPC: octree round-trip, hierarchy pruning, bbox queries, Spark read."""

import numpy as np
import pytest

from lasdb_spark.sources.copc import (
    copc_nodes,
    copc_query_bbox,
    copc_read_all,
    read_copc_info,
    write_copc,
)
from lasdb_spark.sources.las import point_dtype


def _mk(n, seed=7):
    rng = np.random.default_rng(seed)
    pts = np.zeros(n, dtype=point_dtype(6))
    pts["X"] = rng.integers(0, 1_000_000, n)
    pts["Y"] = rng.integers(0, 1_000_000, n)
    pts["Z"] = rng.integers(0, 50_000, n)
    pts["intensity"] = rng.integers(0, 3000, n)
    pts["returns"] = 0x11
    pts["classification"] = rng.choice([1, 2, 6], n)
    pts["point_source_id"] = 7001
    pts["gps_time"] = np.sort(rng.random(n)) * 100.0
    return pts


SCALES = (0.001, 0.001, 0.001)


def test_copc_roundtrip_all_points():
    pts = _mk(5000)
    buf = write_copc(pts, 6, SCALES, max_node_points=800)
    info = read_copc_info(buf)
    assert info is not None and info["halfsize"] > 0
    nodes = copc_nodes(buf, info)
    assert len(nodes) > 1  # the budget forced an octree split
    assert sum(e["point_count"] for e in nodes) == 5000
    out = copc_read_all(buf)
    key = lambda a: np.sort(
        a[["X", "Y", "Z", "classification"]],
        order=["X", "Y", "Z"],
    )
    np.testing.assert_array_equal(key(out), key(pts))


def test_copc_bbox_query_prunes_and_matches_bruteforce():
    pts = _mk(6000, seed=3)
    buf = write_copc(pts, 6, SCALES, max_node_points=500)
    # a corner window: most octree nodes must be skipped
    bbox = (0.0, 250.0, 0.0, 250.0)  # world units (X*0.001)
    got, (n_total, n_hit) = copc_query_bbox(buf, bbox, return_stats=True)
    assert n_hit < n_total  # hierarchy pruning actually happened
    gx = pts["X"] * SCALES[0]
    gy = pts["Y"] * SCALES[1]
    want = pts[(gx >= 0) & (gx <= 250) & (gy >= 0) & (gy <= 250)]
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        np.sort(got["X"]), np.sort(want["X"])
    )


def test_copc_empty_window():
    pts = _mk(1000, seed=5)
    buf = write_copc(pts, 6, SCALES, max_node_points=400)
    got, (n_total, n_hit) = copc_query_bbox(
        buf, (5000.0, 6000.0, 5000.0, 6000.0), return_stats=True
    )
    assert len(got) == 0 and n_hit == 0


def test_copc_node_cubes_cover_their_points():
    """Soundness of the octree build: every point decoded from a node
    lies inside that node's cube."""
    pts = _mk(3000, seed=11)
    buf = write_copc(pts, 6, SCALES, max_node_points=300)
    info = read_copc_info(buf)
    from lasdb_spark.sources.copc import _decode_nodes

    for e in copc_nodes(buf, info):
        arr = _decode_nodes(buf, info["header"], [e])
        gx = arr["X"] * SCALES[0]
        gy = arr["Y"] * SCALES[1]
        gz = arr["Z"] * SCALES[2]
        x0, y0, z0, x1, y1, z1 = e["cube"]
        assert (gx >= x0).all() and (gx <= x1).all()
        assert (gy >= y0).all() and (gy <= y1).all()
        assert (gz >= z0).all() and (gz <= z1).all()


def test_copc_non_copc_input_rejected():
    from lasdb_spark.sources.laszip_v3 import compress_points_to_laz14

    plain = compress_points_to_laz14(_mk(100), 6, SCALES)
    assert read_copc_info(plain) is None
    with pytest.raises(ValueError, match="not a COPC"):
        copc_read_all(plain)


@pytest.mark.spark
def test_copc_to_df_distributed_read(spark, tmp_path):
    from lasdb_spark.sources.copc import copc_to_df

    pts = _mk(2000, seed=21)
    (tmp_path / "tile.copc.laz").write_bytes(
        write_copc(pts, 6, SCALES, max_node_points=400)
    )
    df = copc_to_df(spark, str(tmp_path / "*.copc.laz"))
    assert df.count() == 2000
    bbox = (0.0, 400.0, 0.0, 400.0)
    dfq = copc_to_df(spark, str(tmp_path / "*.copc.laz"), bbox=bbox)
    gx = pts["X"] * SCALES[0]
    gy = pts["Y"] * SCALES[1]
    want = int(((gx >= 0) & (gx <= 400) & (gy >= 0) & (gy <= 400)).sum())
    assert dfq.count() == want


@pytest.mark.spark
def test_copc_to_df_node_distributed(spark, tmp_path):
    """distribute='nodes': a single huge tile spreads across tasks —
    the work-list has one row per octree node, the decode stage has
    the requested partition count, and results match the file mode."""
    from lasdb_spark.sources.copc import copc_file_nodes, copc_nodes_df, copc_to_df

    pts = _mk(4000, seed=33)
    p = tmp_path / "big.copc.laz"
    p.write_bytes(write_copc(pts, 6, SCALES, max_node_points=300))
    hdr, info, nodes = copc_file_nodes(str(p))
    assert hdr["point_count"] == 4000 and len(nodes) > 4

    work = copc_nodes_df(spark, str(p))
    assert work.count() == len(nodes)

    df = copc_to_df(spark, str(p), distribute="nodes", target_tasks=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 4000

    bbox = (0.0, 300.0, 0.0, 300.0)
    got = copc_to_df(spark, str(p), distribute="nodes", target_tasks=4)
    filt = copc_to_df(spark, str(p), bbox=bbox, distribute="nodes",
                      target_tasks=4)
    gx = pts["X"] * SCALES[0]
    gy = pts["Y"] * SCALES[1]
    want = int(((gx >= 0) & (gx <= 300) & (gy >= 0) & (gy <= 300)).sum())
    assert filt.count() == want
    # node-pruning really cut the planned work-list
    assert copc_nodes_df(spark, str(p), bbox=bbox).count() < len(nodes)
    # both distribution modes agree row-for-row
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in copc_to_df(spark, str(p)).collect())
    assert a == b

    with pytest.raises(ValueError, match="distribute"):
        copc_to_df(spark, str(p), distribute="chunks")


@pytest.mark.spark
def test_copc_to_df_attribute_columns(spark, tmp_path):
    """attrs= surfaces decoded attribute columns next to xyz in both
    distribution modes, aligned per point (including under a bbox
    refine)."""
    from lasdb_spark.sources.copc import copc_to_df

    pts = _mk(1500, seed=41)
    p = tmp_path / "a.copc.laz"
    p.write_bytes(write_copc(pts, 6, SCALES, max_node_points=400))
    want = {
        (round(x * SCALES[0], 9), int(i), int(c))
        for x, i, c in zip(pts["X"], pts["intensity"], pts["classification"])
    }
    for mode in ("files", "nodes"):
        df = copc_to_df(
            spark, str(p), distribute=mode,
            attrs=("intensity", "classification"),
        )
        assert df.columns == ["x", "y", "z", "intensity", "classification"]
        got = {
            (round(r["x"], 9), r["intensity"], r["classification"])
            for r in df.collect()
        }
        assert got == want, mode
    # bbox keeps attrs aligned with the surviving points
    bb = (0.0, 500.0, 0.0, 500.0)
    gx = pts["X"] * SCALES[0]
    gy = pts["Y"] * SCALES[1]
    sel = (gx >= bb[0]) & (gx <= bb[1]) & (gy >= bb[2]) & (gy <= bb[3])
    want_sel = {
        (round(x * SCALES[0], 9), int(i))
        for x, i in zip(pts["X"][sel], pts["intensity"][sel])
    }
    got_sel = {
        (round(r["x"], 9), r["intensity"])
        for r in copc_to_df(
            spark, str(p), bbox=bb, distribute="nodes",
            attrs=("intensity",),
        ).collect()
    }
    assert got_sel == want_sel
    with pytest.raises(ValueError, match="unknown COPC attribute"):
        copc_to_df(spark, str(p), attrs=("bogus",)).count()


@pytest.mark.spark
def test_df_to_copc_tiles_roundtrip_and_prune(spark, tmp_path):
    """Distributed COPC export: points shuffle to spatial tiles, each
    task writes a complete COPC file; the tileset reads back exactly
    and a corner bbox query rejects non-intersecting tiles by header
    alone."""
    import numpy as np
    from pyspark.sql import functions as F

    from lasdb_spark.sources.copc import copc_to_df, df_to_copc_tiles

    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 1000, 3000).round(3)
    ys = rng.uniform(0, 1000, 3000).round(3)
    zs = rng.uniform(0, 50, 3000).round(3)
    df = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in zip(xs, ys, zs)],
        "x double, y double, z double",
    )
    out = tmp_path / "tiles"
    manifest = df_to_copc_tiles(
        df, str(out), tile_size=500.0, max_node_points=400
    ).collect()
    assert len(manifest) == 4  # 2x2 tiling of the 1000x1000 extent
    assert sum(r.n_points for r in manifest) == 3000
    back = copc_to_df(spark, str(out / "*.copc.laz"))
    assert back.count() == 3000
    got = sorted(r["x"] for r in back.select("x").collect())
    assert np.allclose(got, np.sort(xs))
    # corner query: only 1 tile intersects; counts match brute force
    bb = (0.0, 200.0, 0.0, 200.0)
    want = int(((xs >= 0) & (xs <= 200) & (ys >= 0) & (ys <= 200)).sum())
    assert copc_to_df(spark, str(out / "*.copc.laz"), bbox=bb).count() == want
