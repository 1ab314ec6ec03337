"""r12 optimization-round pins.

The round rewrote several operator INTERNALS without changing any
output (OPTIMIZATION_r12.md): argmin/argmax windows became min/max-of-
struct hash aggregations, and multi-referenced lineage (edge lists,
trained centroids) was materialized. These tests pin the two claims
the rewrites rest on:

1. the aggregation form picks the IDENTICAL winner as the old rk=1
   window (same distance/cosine rounding, same id tie-break);
2. the triangle census plan stays materialized — the pre-r12 lazy
   form re-evaluated the per-order self-join combinatorially
   (measured: 154 Exchange nodes for a 3-join algorithm).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.mark.spark
def test_assign_cells_equals_nearest_rk1(spark, embs):
    """_assign_cells (max-of-struct aggregation) must reproduce
    _nearest_cells' rk=1 row exactly — vec set, cell choice, carried
    embedding/norm — on the real corpus."""
    from lasdb_spark.operators.similarity import (
        _assign_cells,
        _nearest_cells,
        embs_with_norm,
        seed_centroids,
    )

    wn = embs_with_norm(embs)
    cents = seed_centroids(embs, 8).localCheckpoint()
    via_agg = {
        r["vec_id"]: (r["cell"], tuple(r["embedding"]), r["nrm"])
        for r in _assign_cells(wn, cents).collect()
    }
    via_win = {
        r["vec_id"]: (r["cid"], tuple(r["embedding"]), r["nrm"])
        for r in _nearest_cells(wn, cents)
        .filter(F.col("rk") == 1)
        .collect()
    }
    assert via_agg == via_win


@pytest.mark.spark
def test_pq_encode_argmin_equals_window_form(spark, embs):
    """pq_encode's min-of-struct argmin must equal the old
    row_number-window argmin code-for-code on the real corpus."""
    from lasdb_spark.functions.hashing import fold_l2_col
    from lasdb_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        EMB_DIM,
        _pq_books,
        _pq_subspace_ids,
        pq_encode,
    )

    m, dim = PQ_M, EMB_DIM
    sub_dim = dim // m
    books = _pq_books(embs, m, PQ_K, dim).localCheckpoint()
    got = sorted(
        tuple(r) for r in pq_encode(embs, books=books).collect()
    )
    # the pre-r12 window formulation, inlined as the reference
    vecs = embs.select("vec_id", _pq_subspace_ids(m), "embedding").select(
        "vec_id",
        "m",
        F.slice("embedding", F.col("m") * sub_dim + 1, sub_dim).alias(
            "svec"
        ),
    )
    d2 = F.round(fold_l2_col(F.col("svec"), F.col("cvec")), 6)
    rk = F.row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(d2.asc(), F.col("code"))
    )
    ref = sorted(
        tuple(r)
        for r in (
            vecs.join(F.broadcast(books), "m")
            .select("vec_id", "m", "code", rk.alias("rk"))
            .where(F.col("rk") == 1)
            .drop("rk")
        ).collect()
    )
    assert got == ref


@pytest.mark.spark
def test_triangles_plan_stays_materialized(spark, sf_dir):
    """The triangle census must read its edge list / adjacency from
    materialized checkpoints: the executed plan may contain only a
    handful of Exchanges (the lazy pre-r12 form planned 154 — the
    per-order self-join re-evaluated once per downstream reference)."""
    from lasdb_spark.operators.graph import copurchase_triangles

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (
        copurchase_triangles(li)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 30, (
        f"{n_exchanges} Exchanges — the edge-list/adjacency "
        "materialization regressed (pre-r12 lazy form planned 154)"
    )
