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


@pytest.mark.spark
def test_customer_order_distribution_includes_zero(spark):
    """A customer with only excluded-priority orders lands in the
    c_count=0 bucket; counts census exactly."""
    from lasdb_spark.operators.relational import customer_order_distribution

    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [
            (1, "5-LOW"), (1, "5-LOW"),     # cust 1: 2 qualifying
            (2, "1-URGENT"),                # cust 2: excluded -> 0
            # cust 3: no orders at all -> 0
        ],
        "o_custkey long, o_orderpriority string",
    )
    got = {
        r.c_count: r.custdist
        for r in customer_order_distribution(customer, orders).collect()
    }
    assert got == {0: 2, 2: 1}


@pytest.mark.spark
def test_top_supplier_revenue_tie_and_window(spark):
    """Two suppliers tie on exact cents inside the window; a bigger
    out-of-window shipment doesn't count."""
    from lasdb_spark.operators.relational import top_supplier_revenue

    li = spark.createDataFrame(
        [
            (10, 100.10, 0.0, "1996-02-01"),
            (20, 50.05, 0.0, "1996-02-10"),
            (20, 50.05, 0.0, "1996-03-01"),  # ties supplier 10
            (30, 999.0, 0.0, "1995-12-31"),  # outside window
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, d string",
    ).selectExpr(
        "l_suppkey", "l_extendedprice", "l_discount",
        "CAST(d AS TIMESTAMP) AS l_shipdate",
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (20, "S20"), (30, "S30")],
        "s_suppkey long, s_name string",
    )
    rows = sorted(
        (r.s_suppkey, r.total_revenue)
        for r in top_supplier_revenue(li, supplier).collect()
    )
    assert rows == [(10, 100.10), (20, 100.10)]


@pytest.mark.spark
def test_small_quantity_revenue_integer_cut(spark):
    """qty < 0.2*avg must be strict and integer-exact: avg qty = 10
    -> threshold 2; a qty-1 line counts, qty-2 does not."""
    from lasdb_spark.operators.relational import small_quantity_revenue

    part = spark.createDataFrame(
        [(1, "Brand#3", 5), (2, "Brand#9", 5)],
        "p_partkey long, p_brand string, p_size long",
    )
    li = spark.createDataFrame(
        [
            (1, 1.0, 70.0),    # below threshold -> counted
            (1, 2.0, 700.0),   # exactly 0.2*avg -> NOT counted
            (1, 27.0, 700.0),  # bulk line shaping the average
            (2, 1.0, 999.0),   # wrong brand -> pruned
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    # avg qty part1 = (1+2+27)/3 = 10 -> cut is qty < 2
    got = small_quantity_revenue(li, part).collect()[0].avg_yearly
    assert got == pytest.approx(70.0 / 7.0)


@pytest.mark.spark
def test_dormant_customer_balance_semantics(spark):
    """Only above-average positive balances with no order AFTER the
    cutoff count; an old order doesn't disqualify."""
    from lasdb_spark.operators.relational import dormant_customer_balance

    customer = spark.createDataFrame(
        [
            (1, "Customer#000000011", 500.0),   # dormant, above avg
            (2, "Customer#000000111", 100.0),   # dormant, below avg
            (3, "Customer#000000211", 400.0),   # recent order -> excluded
            (4, "Customer#000000999", 9999.0),  # code 99 -> filtered out
        ],
        "c_custkey long, c_name string, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            (1, "1995-06-01"),  # old order: still dormant
            (3, "2000-06-01"),  # recent
        ],
        "o_custkey long, d string",
    ).selectExpr("o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate")
    rows = dormant_customer_balance(
        customer, orders, codes=("11",), cutoff="2000-01-01"
    ).collect()
    # avg positive balance of code-11 custs = (500+100+400)/3 = 333.33
    assert len(rows) == 1
    assert rows[0].cntrycode == "11"
    assert rows[0].numcust == 1
    assert rows[0].totacctbal == pytest.approx(500.0)


@pytest.mark.spark
def test_national_market_share_fraction(spark):
    """Share = target-nation revenue / all revenue within the
    region+type slice, per year."""
    from lasdb_spark.operators.relational import national_market_share

    nation = spark.createDataFrame(
        [(0, "N_A", 0), (1, "N_B", 0), (2, "N_C", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(0, "R_IN"), (1, "R_OUT")], "r_regionkey long, r_name string"
    )
    customer = spark.createDataFrame(
        [(100, 0), (200, 2)], "c_custkey long, c_nationkey long"
    )
    supplier = spark.createDataFrame(
        [(7, 0), (8, 1)], "s_suppkey long, s_nationkey long"
    )
    part = spark.createDataFrame(
        [(1, "ECONOMY"), (2, "LARGE")], "p_partkey long, p_type string"
    )
    orders = spark.createDataFrame(
        [(1000, 100, "1996-05-01"), (2000, 200, "1996-06-01")],
        "o_orderkey long, o_custkey long, d string",
    ).selectExpr("o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate")
    li = spark.createDataFrame(
        [
            (1000, 1, 7, 100.0, 0.0),  # target nation N_A, in region
            (1000, 1, 8, 300.0, 0.0),  # other nation, in region
            (1000, 2, 7, 999.0, 0.0),  # wrong part type
            (2000, 1, 7, 555.0, 0.0),  # customer outside region
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    )
    rows = national_market_share(
        li, orders, customer, supplier, part, nation, region,
        p_type="ECONOMY", r_name="R_IN", supp_nation="N_A",
    ).collect()
    assert len(rows) == 1
    assert rows[0].o_year == 1996
    assert rows[0].mkt_share == pytest.approx(0.25)


@pytest.mark.spark
def test_forecast_revenue_band_boundaries(spark):
    """Q6 band semantics: discount endpoints inclusive in basis
    points, quantity strictly below, window half-open; the widened
    raw hulls must never exclude an exact-band row."""
    from lasdb_spark.operators.relational import forecast_revenue_change

    li = spark.createDataFrame(
        [
            (100.0, 0.05, 23.0, "1996-06-01"),  # lo edge: in
            (100.0, 0.07, 23.0, "1996-06-01"),  # hi edge: in
            (100.0, 0.04, 23.0, "1996-06-01"),  # below band: out
            (100.0, 0.08, 23.0, "1996-06-01"),  # above band: out
            (100.0, 0.06, 24.0, "1996-06-01"),  # qty == 24: out
            (100.0, 0.06, 23.0, "1997-01-01"),  # window end: out
        ],
        "l_extendedprice double, l_discount double, l_quantity double, "
        "d string",
    ).selectExpr(
        "l_extendedprice", "l_discount", "l_quantity",
        "CAST(d AS TIMESTAMP) AS l_shipdate",
    )
    got = forecast_revenue_change(li).collect()[0].revenue
    assert got == pytest.approx(100.0 * 0.05 + 100.0 * 0.07)
