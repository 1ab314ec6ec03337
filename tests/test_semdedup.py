"""Semantic dedup (SemDeDup-style): recall vs the exact sweep, keeper
algebra, and the no-cartesian plan gate.

Value-exact oracle parity for both queries runs in
tests/test_entry_oracle.py like every other queries() entry.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_pairs_subset_of_exact_sweep(embs):
    """Intra-cell pairs must be a strict SUBSET of the exact N² sweep
    at the same tau — clustering can only lose pairs, never invent
    them, and the cosines must agree where both report a pair."""
    from lasdb_spark.operators.dedup import embedding_neardup_pairs
    from lasdb_spark.operators.semdedup import semantic_pairs

    sem = {
        (r.vec_a, r.vec_b): r.cos
        for r in semantic_pairs(embs).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.cos
        for r in embedding_neardup_pairs(embs).collect()
    }
    assert sem, "semantic pairs empty — threshold or clustering broken"
    assert set(sem) <= set(exact)
    for k, v in sem.items():
        assert abs(v - exact[k]) < 1e-9


def test_keepers_complement_dropped(embs):
    from lasdb_spark.operators.semdedup import (
        semantic_keepers,
        semantic_pairs,
    )

    n = embs.count()
    dropped = (
        semantic_pairs(embs).select("vec_b").distinct().count()
    )
    keepers = semantic_keepers(embs)
    assert keepers.count() == n - dropped
    # every vector appears exactly once across keep/drop
    assert keepers.select("vec_id").distinct().count() == keepers.count()


def test_pairs_plan_never_cartesian(embs):
    """The intra-cell scan must plan as an equi-join on cell — a
    cartesian/broadcast-nested-loop plan is the N² shape the operator
    exists to avoid."""
    from lasdb_spark.operators.semdedup import semantic_pairs

    plan = (
        semantic_pairs(embs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the broadcast of the tiny
    # centroid table during assignment, which joins with no condition;
    # the PAIR join itself must key on cell
    assert "cell" in plan
