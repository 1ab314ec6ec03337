"""Semantics tests for the r7 TPC-H-shape operators (Q4/Q14) and the
snapshot DIFF — hand-checkable fixtures; value-exactness vs DuckDB is
proven separately by the all-entries oracle mirror."""

import pytest


@pytest.mark.spark
def test_order_priority_check_exists_semantics(spark):
    """An order counts once no matter how many late lineitems it has;
    orders with no late lineitem, or outside the window, don't count."""
    from lasdb_spark.operators.relational import order_priority_check

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", "1996-07-10"),   # two late lines -> 1
            (2, "1-URGENT", "1996-08-01"),   # only on-time lines -> 0
            (3, "5-LOW", "1996-09-30"),      # one late line -> 1
            (4, "5-LOW", "1996-12-01"),      # late line, out of window
        ],
        "o_orderkey long, o_orderpriority string, d string",
    ).selectExpr(
        "o_orderkey", "o_orderpriority", "CAST(d AS TIMESTAMP) AS o_orderdate"
    )
    li = spark.createDataFrame(
        [
            (1, "1996-07-15"), (1, "1996-07-20"),
            (2, "1996-08-01"),               # same day, not strictly after
            (3, "1996-10-05"),
            (4, "1997-01-01"),
        ],
        "l_orderkey long, d string",
    ).selectExpr("l_orderkey", "CAST(d AS TIMESTAMP) AS l_shipdate")
    got = {
        r.o_orderpriority: r.n_late_orders
        for r in order_priority_check(orders, li).collect()
    }
    assert got == {"1-URGENT": 1, "5-LOW": 1}


@pytest.mark.spark
def test_promo_revenue_share_math(spark):
    """One month, two lineitems: promo 100.00, non-promo 300.00 ->
    25% share, cents-exact revenues."""
    from lasdb_spark.operators.relational import promo_revenue_share

    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, "1997-03-05"),
            (2, 300.0, 0.0, "1997-03-09"),
        ],
        "l_partkey long, l_extendedprice double, l_discount double, d string",
    ).selectExpr(
        "l_partkey", "l_extendedprice", "l_discount",
        "CAST(d AS TIMESTAMP) AS l_shipdate",
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    rows = promo_revenue_share(li, part).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.month == 3
    assert r.promo_revenue == 100.0
    assert r.total_revenue == 400.0
    assert r.promo_pct == 25.0


@pytest.mark.spark
def test_snapshot_diff_statuses_and_changed_cols(spark):
    """added / removed / changed(+which columns) / identical-dropped."""
    from lasdb_spark.operators.relational import snapshot_diff

    schema = "user_id long, last_type string, last_value double, last_ms long"
    old = spark.createDataFrame(
        [
            (1, "view", 1.0, 100),   # unchanged -> dropped
            (2, "view", 2.0, 100),   # value+ms change
            (3, "view", 3.0, 100),   # removed
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "view", 1.0, 100),
            (2, "click", 2.0, 200),  # type+ms differ
            (4, "view", 4.0, 400),   # added
        ],
        schema,
    )
    got = {r.user_id: r for r in snapshot_diff(old, new).collect()}
    assert set(got) == {2, 3, 4}
    assert got[4].status == "added" and got[4].changed_cols == ""
    assert got[3].status == "removed" and got[3].changed_cols == ""
    assert got[2].status == "changed"
    assert got[2].changed_cols == "last_type,last_ms"
