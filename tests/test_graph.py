"""event_type_pagerank: hand-checkable centrality + invariants."""

import pytest


@pytest.mark.spark
def test_pagerank_hub_wins_and_sums_to_one(spark):
    """Every user funnels through 'checkout' from distinct sources:
    the hub must out-rank its feeders; ranks stay a distribution."""
    from lasdb_spark.operators.graph import event_type_pagerank

    rows = []
    eid = 0
    for u, src in enumerate(["a", "b", "c", "d"]):
        for rep in range(3):
            rows.append((eid, u, src, float(eid)))
            eid += 1
            rows.append((eid, u, "checkout", float(eid)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, tsd double"
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "timestamp_micros(CAST(tsd * 1000000 AS LONG)) AS ts",
    )
    got = event_type_pagerank(ev).collect()
    ranks = {r.node: r.rank for r in got}
    assert set(ranks) == {"a", "b", "c", "d", "checkout"}
    assert all(ranks["checkout"] > ranks[s] for s in "abcd")
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
    # output is rank-descending with the hub first
    assert got[0].node == "checkout"


@pytest.mark.spark
def test_pagerank_dangling_mass_conserved(spark):
    """A sink type with no outgoing transitions (last event of every
    user) must not leak rank mass: the distribution still sums to 1."""
    from lasdb_spark.operators.graph import event_type_pagerank

    rows = [
        (0, 1, "x", 0.0), (1, 1, "end", 1.0),
        (2, 2, "y", 0.0), (3, 2, "end", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, tsd double"
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "timestamp_micros(CAST(tsd * 1000000 AS LONG)) AS ts",
    )
    ranks = {r.node: r.rank for r in event_type_pagerank(ev).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
    assert ranks["end"] > max(ranks["x"], ranks["y"])
