"""Corridor profile (operators/profile.py) — station math on
hand-built alignments where chainage is known in closed form."""

import pytest


def _cloud(spark, rows):
    return spark.createDataFrame(rows, "x double, y double, z double")


@pytest.mark.spark
def test_straight_line_stations(spark):
    """Alignment = x axis from (0,0) to (100,0): chainage == x, so the
    bin and stats are exactly predictable."""
    from lasdb_spark.operators.profile import corridor_profile

    cloud = _cloud(spark, [
        (0.0, 1.0, 5.0),     # station 0   → bin 0
        (9.9, -2.0, 7.0),    # station 9.9 → bin 0
        (10.0, 0.0, 1.0),    # station 10  → bin 1
        (55.5, 3.0, 2.0),    # station 55.5→ bin 5
        (99.0, 0.0, 9.0),    # station 99  → bin 9
        (50.0, 30.0, 100.0),  # 30 m off-axis: outside buffer, dropped
        (120.0, 0.0, 8.0),   # beyond the end: clamps to station 100,
                             # but d2 = 20² > buffer² → dropped
    ])
    wkt = "LINESTRING (0 0, 100 0)"
    out = {r.bin: r for r in
           corridor_profile(cloud, wkt, buffer=5.0, step=10.0).collect()}
    assert set(out) == {0, 1, 5, 9}
    assert out[0].n == 2 and out[0].z_min == 5.0 and out[0].z_max == 7.0
    assert out[0].z_avg == 6.0
    assert out[1].n == 1 and out[1].station_m == 10.0
    assert out[5].n == 1 and out[9].n == 1


@pytest.mark.spark
def test_multi_segment_chainage_continues(spark):
    """Chainage accumulates across vertices: on an L-shaped alignment
    (0,0)→(10,0)→(10,10), a point near the second leg's middle sits at
    station 10 + 5."""
    from lasdb_spark.operators.profile import corridor_profile

    cloud = _cloud(spark, [
        (5.0, 0.5, 1.0),    # leg 1, station 5
        (10.5, 5.0, 2.0),   # leg 2, station 15
        (10.0, 10.0, 3.0),  # leg 2 end, station 20
    ])
    wkt = "LINESTRING (0 0, 10 0, 10 10)"
    out = {r.bin: r for r in
           corridor_profile(cloud, wkt, buffer=2.0, step=5.0).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1].n == 1 and out[1].station_m == 5.0
    assert out[3].n == 1  # station 15 → bin 3
    assert out[4].n == 1  # station 20 → bin 4


@pytest.mark.spark
def test_vertex_tie_takes_earliest_segment(spark):
    """A point exactly above a vertex is equidistant to both legs; the
    first-match fold must assign it to the EARLIER segment's clamped
    projection (station = vertex chainage either way — assert the op
    is deterministic and counts it once)."""
    from lasdb_spark.operators.profile import corridor_profile

    cloud = _cloud(spark, [(10.0, 1.0, 4.0)])
    wkt = "LINESTRING (0 0, 10 0, 20 0)"
    rows = corridor_profile(cloud, wkt, buffer=2.0, step=10.0).collect()
    assert len(rows) == 1
    assert rows[0].bin == 1 and rows[0].n == 1  # station 10 → bin 1


def test_bad_params_raise(spark):
    from lasdb_spark.operators.profile import corridor_profile

    cloud = _cloud(spark, [(0.0, 0.0, 0.0)])
    with pytest.raises(ValueError):
        corridor_profile(cloud, "LINESTRING (0 0, 1 0)", buffer=0.0)
    with pytest.raises(ValueError):
        corridor_profile(cloud, "LINESTRING (0 0, 1 0)", buffer=1.0, step=-1)
