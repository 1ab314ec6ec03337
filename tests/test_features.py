"""Neighborhood shape features: brute-force numpy eigen cross-check and
the no-cartesian plan gate. Value-exact DuckDB parity runs in
tests/test_entry_oracle.py (`pc_shape`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    from lasdb_spark.sources.points import points_df

    return points_df(spark, sf_dir)


def test_eigen_matches_numpy(pts):
    """The closed-form eigenvalues must agree with numpy's symmetric
    eigensolver on the same neighborhoods (brute-force recomputed)."""
    from lasdb_spark.operators.features import neighborhood_shape
    from lasdb_spark.operators.outliers import RADIUS

    feats = {
        (r.x, r.y, r.z): r for r in neighborhood_shape(pts).collect()
    }
    raw = np.array(pts.collect())
    checked = 0
    for (x, y, z), r in list(feats.items())[:: max(1, len(feats) // 50)]:
        d2 = (raw[:, 0] - x) ** 2 + (raw[:, 1] - y) ** 2
        nb = raw[d2 <= RADIUS * RADIUS]
        assert len(nb) == r.n
        if len(nb) < 3:
            continue
        rel = np.round((nb - np.array([x, y, z])) * 100.0)
        cov = np.cov(rel.T, bias=True) / 1e4
        ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
        assert abs(r.l1 - ev[0]) < 1e-4
        assert abs(r.l2 - ev[1]) < 1e-4
        assert abs(r.l3 - ev[2]) < 1e-4
        if ev[0] > 0:
            assert abs(r.linearity - (ev[0] - ev[1]) / ev[0]) < 1e-3
            assert abs(r.planarity - (ev[1] - ev[2]) / ev[0]) < 1e-3
            assert abs(r.sphericity - ev[2] / ev[0]) < 1e-3
        checked += 1
    assert checked >= 20


def test_eigen_sorted_and_nonnegative(pts):
    # assert driver-side rather than with a .filter(): a predicate on
    # the eigen columns would be pushdown-substituted through the
    # staged projections into one giant expression (see the operator
    # docstring) — and this suite runs with codegen.fallback=false
    from lasdb_spark.operators.features import neighborhood_shape

    for r in neighborhood_shape(pts).collect():
        assert r.l1 >= r.l2 >= r.l3 >= -1e-6, r


def test_plan_never_cartesian(pts):
    from lasdb_spark.operators.features import neighborhood_shape

    plan = (
        neighborhood_shape(pts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.spark
def test_surface_normals_geometry(spark):
    """A flat horizontal sheet points straight up (verticality 0); a
    vertical wall's normal is horizontal (verticality 1)."""
    from lasdb_spark.operators.features import surface_normals

    sheet = [
        (float(i), float(j), 5.0) for i in range(5) for j in range(5)
    ]
    # wall in the x-z plane, offset far from the sheet (different cells)
    wall = [
        (100.0 + float(i), 200.0, float(k))
        for i in range(5)
        for k in range(5)
    ]
    pts = spark.createDataFrame(
        sheet + wall, "x double, y double, z double"
    )
    rows = surface_normals(pts, radius=10.0).collect()
    by_site = {(r.x, r.y, r.z): r for r in rows}
    flat = by_site[(2.0, 2.0, 5.0)]  # sheet interior
    assert abs(flat.nz - 1.0) < 1e-6 and abs(flat.verticality) < 1e-6
    wall_mid = by_site[(102.0, 200.0, 2.0)]
    assert abs(wall_mid.verticality - 1.0) < 1e-6
    assert abs(wall_mid.nz) < 1e-6
    # unit length everywhere (within rounding)
    for r in rows:
        assert abs(r.nx**2 + r.ny**2 + r.nz**2 - 1.0) < 1e-4
