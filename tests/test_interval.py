"""Interval (range) join: bucketed-equi-join correctness vs a brute
reference, boundary/bin-edge cases, and the no-nested-loop plan gate."""

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.mark.spark
def test_interval_join_matches_brute_force(spark):
    import random

    from lasdb_spark.operators.interval import interval_join

    rng = random.Random(11)
    pts = [(i, rng.randrange(0, 10_000)) for i in range(300)]
    ivs = []
    for j in range(40):
        a = rng.randrange(0, 10_000)
        ivs.append((j, a, a + rng.randrange(0, 2_000)))
    left = _mk(spark, pts, "pid long, t long")
    ints = _mk(spark, ivs, "iid long, t0 long, t1 long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            left, ints, "t", "t0", "t1", bin_width=700
        ).collect()
    }
    want = {
        (p, i) for p, t in pts for i, a, b in ivs if a <= t <= b
    }
    assert got == want


@pytest.mark.spark
def test_interval_join_bin_edges_and_keys(spark):
    """Inclusive bounds on exact bin boundaries; partition keys
    restrict matches."""
    from lasdb_spark.operators.interval import interval_join

    left = _mk(
        spark,
        [(1, 1, 1000), (2, 1, 2000), (3, 2, 1000)],
        "pid long, user long, t long",
    )
    ints = _mk(
        spark,
        [(10, 1, 1000, 2000), (20, 2, 0, 999)],
        "iid long, user long, t0 long, t1 long",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            left, ints, "t", "t0", "t1", keys=("user",), bin_width=1000
        ).collect()
    }
    # pid 1: t=1000 == t0 (inclusive); pid 2: t=2000 == t1 (inclusive);
    # pid 3 is user 2 whose interval ends at 999 < 1000
    assert got == {(1, 10), (2, 10)}
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(left, ints, "t", "t0", "t1", bin_width=0)


@pytest.mark.spark
def test_incident_impact_plan_has_no_nested_loop(spark, sf_dir):
    from lasdb_spark.operators.interval import incident_impact
    from lasdb_spark.sources.events import events_df

    df = incident_impact(events_df(spark, sf_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert df.count() > 0
