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
