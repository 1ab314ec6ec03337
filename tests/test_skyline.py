"""Skyline operator: two-phase distributed result == brute force."""

import random

import pytest


def _brute_skyline(rows):
    out = set()
    for i, xi, yi in rows:
        dominated = any(
            (xj <= xi and yj <= yi and (xj < xi or yj < yi))
            for _, xj, yj in rows
        )
        if not dominated:
            out.add(i)
    return out


@pytest.mark.spark
def test_skyline_matches_bruteforce(spark):
    from lasdb_spark.operators.skyline import skyline_2d

    rng = random.Random(5)
    rows = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(500)]
    # exact ties on the front: neither dominates, both must survive
    rows += [(1000, -1.0, 200.0), (1001, -1.0, 200.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id for r in skyline_2d(df, "x", "y").collect()}
    assert got == _brute_skyline(rows)
    assert {1000, 1001} <= got


@pytest.mark.spark
def test_skyline_edge_shapes(spark):
    from lasdb_spark.operators.skyline import skyline_2d

    # all-identical input: every row is on the front
    same = spark.createDataFrame(
        [(i, 5.0, 5.0) for i in range(10)], "id long, x double, y double"
    )
    assert skyline_2d(same, "x", "y").count() == 10
    # strictly increasing staircase: every row on the front
    stair = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(50)],
        "id long, x double, y double",
    )
    assert skyline_2d(stair, "x", "y").count() == 50
    # total order: single winner
    chain = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(50)],
        "id long, x double, y double",
    )
    rows = skyline_2d(chain, "x", "y").collect()
    assert len(rows) == 1 and rows[0].id == 0
    # empty input
    empty = spark.createDataFrame([], "id long, x double, y double")
    assert skyline_2d(empty, "x", "y").count() == 0
