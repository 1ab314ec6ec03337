"""Product-quantization ANN (similarity.py: pq_encode / topk_pq) —
reconstruction semantics on a codebook-exact corpus, ADC ranking vs a
numpy reference, and the TakeOrdered/broadcast plan shape."""

import numpy as np
import pytest

DIM = 64
M = 8
K = 16


def _mk_vec(rng):
    return [round(float(v), 3) for v in rng.uniform(-1, 1, DIM)]


def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


@pytest.mark.spark
def test_codebook_exact_corpus_reconstructs_exact_l2(spark):
    """When every corpus vector IS a codebook seed, PQ encoding is
    lossless, so the ADC distance equals the exact squared L2 and the
    ranking matches brute force."""
    from lasdb_spark.operators.similarity import topk_pq

    rng = np.random.default_rng(7)
    vecs = [_mk_vec(rng) for _ in range(K)]  # all 16 become seeds
    embs = _embs(spark, vecs)
    got = {r.vec_id: r for r in topk_pq(embs, query_vec_id=0, k=K).collect()}

    q = np.array(vecs[0], dtype=np.float32).astype(np.float64)
    exact = {}
    for i in range(1, K):
        v = np.array(vecs[i], dtype=np.float32).astype(np.float64)
        exact[i] = ((q - v) ** 2).sum()
    assert set(got) == set(exact)
    for i, r in got.items():
        # per-subspace 1e-6 rounding accumulates over M=8 terms
        assert abs(r.approx_d2 - exact[i]) < 1e-4
    want_order = sorted(exact, key=lambda i: (exact[i], i))
    got_order = [i for i, _ in sorted(
        ((r.vec_id, r.rank) for r in got.values()), key=lambda t: t[1]
    )]
    assert got_order == want_order


@pytest.mark.spark
def test_duplicate_of_query_ranks_first(spark):
    from lasdb_spark.operators.similarity import topk_pq

    rng = np.random.default_rng(11)
    vecs = [_mk_vec(rng) for _ in range(40)]
    vecs.append(list(vecs[0]))  # vec_id 40 duplicates the query
    out = topk_pq(_embs(spark, vecs), query_vec_id=0, k=5).collect()
    first = min(out, key=lambda r: r.rank)
    assert first.vec_id == 40 and first.approx_d2 == 0.0


@pytest.mark.spark
def test_pq_encode_one_code_per_subspace(spark):
    from lasdb_spark.operators.similarity import pq_encode

    rng = np.random.default_rng(3)
    embs = _embs(spark, [_mk_vec(rng) for _ in range(30)])
    codes = pq_encode(embs).collect()
    assert len(codes) == 30 * M
    assert {(r.vec_id, r.m) for r in codes} == {
        (i, m) for i in range(30) for m in range(M)
    }
    assert all(1 <= r.code <= K for r in codes)


@pytest.mark.spark
def test_pq_plan_take_ordered_and_broadcasts(spark, sf_dir):
    """ADC scoring must broadcast the codebook/distance tables and end
    in TakeOrdered — no full sort, no shuffle of the encoded corpus
    for the join."""
    from lasdb_spark.operators.similarity import topk_pq

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = topk_pq(embs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_trained_books_improve_quantization_error(spark):
    """Lloyd rounds can only lower the summed assignment distortion;
    on a clustered corpus the trained codebooks must beat the seed
    stubs. (The oracle-exactness of the full trained top-k is proven
    per-run by test_entry_oracle's ann_pq_trained row.)"""
    from pyspark.sql import functions as F

    from lasdb_spark.functions.hashing import fold_l2_col
    from lasdb_spark.operators.similarity import (
        _pq_books,
        _pq_subspace_ids,
        pq_train_books,
    )

    rng = np.random.default_rng(11)
    # 4 tight clusters; the first-K seeds all land in cluster 0, so
    # untrained books quantize the other clusters terribly
    centers = rng.uniform(-1, 1, (4, DIM))
    vecs = [
        [round(float(v), 3) for v in centers[i // 50] + rng.normal(0, 0.01, DIM)]
        for i in range(200)
    ]
    embs = _embs(spark, vecs)

    def distortion(books):
        sub = DIM // M
        svecs = embs.select(
            "vec_id", _pq_subspace_ids(M), "embedding"
        ).select(
            "vec_id", "m",
            F.slice("embedding", F.col("m") * sub + 1, sub).alias("svec"),
        )
        d2 = fold_l2_col(F.col("svec"), F.col("cvec"))
        return (
            svecs.join(F.broadcast(books), "m")
            .groupBy("vec_id", "m")
            .agg(F.min(d2).alias("best"))
            .agg(F.sum("best"))
            .collect()[0][0]
        )

    seed_err = distortion(_pq_books(embs, M, K, DIM))
    trained_err = distortion(pq_train_books(embs, M, K, DIM, n_iters=2))
    assert trained_err < seed_err * 0.5, (seed_err, trained_err)


@pytest.mark.spark
def test_trained_books_empty_code_dropout(spark):
    """A codeword no subvector selects disappears from the trained
    book (both engines agree by construction); survivors keep their
    original code ids."""
    from lasdb_spark.operators.similarity import pq_train_books

    rng = np.random.default_rng(5)
    # 20 IDENTICAL vectors: every distance ties, the argmin tie-break
    # picks code 1 everywhere, so 15 of the 16 seed codes drop out of
    # every subspace after round 1
    base = [round(float(v), 3) for v in rng.uniform(-1, 1, DIM)]
    vecs = [list(base) for _ in range(20)]
    books = pq_train_books(_embs(spark, vecs), M, K, DIM, n_iters=2)
    per_sub = books.groupBy("m").count().collect()
    assert all(r["count"] == 1 for r in per_sub), per_sub
    codes = {r["code"] for r in books.select("code").distinct().collect()}
    assert codes <= set(range(1, K + 1))


@pytest.mark.spark
def test_ivfpq_prunes_to_probed_cells_and_finds_duplicate(spark):
    """IVF-PQ: candidates come only from the nprobe probed cells (the
    (cell, m, code) inner join IS the pruning), and an exact duplicate
    of the query scores the minimum achievable ADC distance in the
    query's own cell, ranking first on a clustered corpus."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.similarity import topk_ivfpq

    rng = np.random.default_rng(23)
    centers = rng.uniform(-1, 1, (4, DIM)) * 5
    vecs = []
    for i in range(120):
        vecs.append(
            [round(float(v), 3)
             for v in centers[i % 4] + rng.normal(0, 0.05, DIM)]
        )
    vecs.append(list(vecs[0]))  # vec_id 120 = exact duplicate of 0
    embs = _embs(spark, vecs)
    got = topk_ivfpq(
        embs, query_vec_id=0, k=10, n_cells=8, nprobe=2
    ).collect()
    assert 0 < len(got) <= 10
    d2s = [r["approx_d2"] for r in got]
    assert d2s == sorted(d2s)
    assert got[0]["vec_id"] == 120 and got[0]["rank"] == 1
    # pruning: every candidate's true nearest cell (or the query's
    # second probe) — reconstruct coarse assignment brute force
    cents = np.array(vecs[:8], dtype=np.float32).astype(np.float64)
    V = np.array(vecs, dtype=np.float32).astype(np.float64)
    d = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).round(6)
    cell = d.argmin(axis=1)
    probed = set(np.argsort(d[0], kind="stable")[:2])
    for r in got:
        assert cell[r["vec_id"]] in probed, (r["vec_id"], cell[r["vec_id"]])
