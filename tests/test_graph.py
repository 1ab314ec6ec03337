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


@pytest.mark.spark
def test_copurchase_triangles_hand_graph(spark):
    """Orders {1,2,3}, {3,4}, {1,2} (dup edge), {5,6,7,8}: one
    triangle on 1-2-3, K4 on 5-8 (4 triangles, every vertex in 3),
    part 4 in none."""
    from lasdb_spark.operators.graph import copurchase_triangles

    rows = []
    for okey, parts in [
        (1, [1, 2, 3]),
        (2, [3, 4]),
        (3, [1, 2]),
        (4, [5, 6, 7, 8]),
    ]:
        for ln, p in enumerate(parts):
            rows.append((okey, p, ln))
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    )
    got = {r.part_id: r.n_triangles for r in copurchase_triangles(li).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 3, 6: 3, 7: 3, 8: 3}


@pytest.mark.spark
def test_copurchase_triangles_duplicate_lines_ignored(spark):
    """The same part appearing twice in one order (two lineitems) must
    not create self-edges or double-counted triangles."""
    from lasdb_spark.operators.graph import copurchase_triangles

    rows = [
        (1, 10, 0), (1, 10, 1), (1, 11, 2), (1, 12, 3),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    )
    got = {r.part_id: r.n_triangles for r in copurchase_triangles(li).collect()}
    assert got == {10: 1, 11: 1, 12: 1}


@pytest.mark.spark
def test_kcore_fixpoint_and_invariants(spark, sf_dir):
    """The round budget exceeds the true peel depth (one more round
    changes nothing), and the result is a genuine k-core: every
    surviving node has core_degree >= k."""
    from lasdb_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        copurchase_kcore,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = sorted(
        (r.part_id, r.core_degree) for r in copurchase_kcore(li).collect()
    )
    more = sorted(
        (r.part_id, r.core_degree)
        for r in copurchase_kcore(li, rounds=KCORE_ROUNDS + 1).collect()
    )
    assert got == more, "round budget must reach the peel fixpoint"
    assert all(d >= KCORE_K for _, d in got)


@pytest.mark.spark
def test_kcore_hand_graph(spark):
    """Hand graph: a triangle with weight-2 edges survives k=2; a
    pendant chain peels away; single-order pairs never form edges."""
    from lasdb_spark.operators.graph import copurchase_kcore

    rows = []
    # orders 1,2 both contain parts 1,2,3 -> triangle edges weight 2
    for o in (1, 2):
        for p in (1, 2, 3):
            rows.append((o, p))
    # part 4 hangs off part 1 via orders 3,4 (weight-2 pendant edge)
    for o in (3, 4):
        rows.append((o, 1)), rows.append((o, 4))
    # parts 5,6 share only order 5 -> below min_weight, no edge
    rows.append((5, 5)), rows.append((5, 6))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        r.part_id: r.core_degree
        for r in copurchase_kcore(li, k=2, min_weight=2, rounds=6).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
