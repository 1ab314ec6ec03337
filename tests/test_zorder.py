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
