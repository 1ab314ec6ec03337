"""Z-order relational clustering: key parity, query correctness vs
brute force, and the pruning plan property."""

import re
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def zstore(spark, sf_dir):
    from lasdb_spark.operators.zorder import write_zordered
    from lasdb_spark.sources.events import events_df

    path = tempfile.mkdtemp(prefix="lasdb_zorder_test_") + "/events"
    write_zordered(events_df(spark, sf_dir), path)
    return path


@pytest.mark.spark
def test_zorder_query_matches_bruteforce(spark, sf_dir, zstore):
    from lasdb_spark.operators.zorder import (
        BASE_HOUR,
        HOUR_MS,
        zorder_query,
    )
    from lasdb_spark.sources.events import events_df

    ur, hr = (10, 40), (BASE_HOUR + 50, BASE_HOUR + 300)
    got = sorted(
        (r.event_id, r.user_id, r.hour_idx)
        for r in zorder_query(spark, zstore, ur, hr).collect()
    )
    ev = events_df(spark, sf_dir)
    brute = sorted(
        (r.event_id, r.user_id, r.h - BASE_HOUR)
        for r in ev.select(
            "event_id",
            "user_id",
            F.expr(f"unix_millis(ts) div {HOUR_MS}").alias("h"),
        )
        .filter(
            F.col("user_id").between(*ur)
            & F.col("h").between(*hr)
        )
        .collect()
    )
    assert got == brute and got


@pytest.mark.spark
def test_zorder_empty_window(spark, zstore):
    from lasdb_spark.operators.zorder import BASE_HOUR, zorder_query

    out = zorder_query(
        spark, zstore, (9000, 9100), (BASE_HOUR, BASE_HOUR + 10)
    )
    assert out.count() == 0


@pytest.mark.spark
def test_zorder_plan_pushes_key_ranges(spark, zstore):
    """The zkey range predicates must reach the Parquet scan
    (PushedFilters), the whole point of the layout."""
    from lasdb_spark.operators.zorder import BASE_HOUR, zorder_query

    q = zorder_query(
        spark, zstore, (30, 60), (BASE_HOUR + 100, BASE_HOUR + 200)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "zkey" in m.group(1)


@pytest.mark.spark
def test_zorder_grid_covers_out_of_grid_users(spark):
    """Round-4 ADVICE (high): users >= 2^10 must NOT be silently
    dropped — the writer derives the grid from data maxima and the
    query planner reads it back from the sidecar."""
    from lasdb_spark.operators.zorder import (
        read_zorder_meta,
        zorder_query_nd,
        write_zordered_nd,
    )

    df = spark.range(2000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 1500).alias("user_id"),
        (F.col("id") % 7).alias("hour_idx"),
    )
    path = tempfile.mkdtemp(prefix="lasdb_zorder_wide_") + "/t"
    write_zordered_nd(df, path, ["user_id", "hour_idx"])
    meta = read_zorder_meta(path)
    assert meta["bits"] == 11  # widened past the 2^10 floor for 1499
    got = zorder_query_nd(
        spark, path, {"user_id": (1000, 1499)}
    ).count()
    brute = df.filter(F.col("user_id").between(1000, 1499)).count()
    assert got == brute and got > 0


@pytest.mark.spark
def test_zorder_write_rejects_negative_and_too_small_bits(spark):
    from lasdb_spark.operators.zorder import write_zordered_nd

    neg = spark.range(10).select((F.col("id") - 5).alias("d"))
    with pytest.raises(ValueError, match="negative"):
        write_zordered_nd(neg, tempfile.mkdtemp() + "/t", ["d"])
    big = spark.range(5000).select(F.col("id").alias("d"))
    with pytest.raises(ValueError, match="cannot hold"):
        write_zordered_nd(big, tempfile.mkdtemp() + "/t", ["d"], bits=10)


@pytest.mark.spark
def test_zorder_3d_matches_bruteforce(spark, sf_dir):
    from lasdb_spark.operators.zorder import (
        BASE_HOUR,
        HOUR_MS,
        write_zordered_3d,
        zorder_query_3d,
    )
    from lasdb_spark.sources.events import events_df

    ev = events_df(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lasdb_zorder_3d_") + "/events"
    write_zordered_3d(ev, path)
    ur, hr = (10, 60), (BASE_HOUR + 20, BASE_HOUR + 400)
    got = zorder_query_3d(
        spark, path, ur, hr, ["click", "error"]
    ).count()
    brute = (
        ev.select(
            "user_id",
            "event_type",
            F.expr(f"unix_millis(ts) div {HOUR_MS}").alias("h"),
        )
        .filter(
            F.col("user_id").between(*ur)
            & F.col("h").between(*hr)
            & F.col("event_type").isin("click", "error")
        )
        .count()
    )
    assert got == brute and got > 0


def test_decompose_box_nd_soundness():
    """Every in-box cell must be covered by some emitted range (3-D)."""
    from lasdb_spark.operators.zorder import (
        decompose_box_nd,
        encode_morton_nd,
    )

    bits = 4
    mins, maxs = [3, 1, 0], [9, 14, 6]
    ranges = decompose_box_nd(mins, maxs, bits, max_ranges=40)
    assert len(ranges) <= 40

    def covered(k):
        return any(lo <= k <= hi for lo, hi in ranges)

    for x in range(mins[0], maxs[0] + 1):
        for y in range(mins[1], maxs[1] + 1):
            for z in range(mins[2], maxs[2] + 1):
                assert covered(encode_morton_nd((x, y, z), bits))
