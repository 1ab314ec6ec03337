"""r11 operators: sampled recall audit (query-side hash sample of the
quadratic truth arm — r10 VERDICT #3) and the kNN-join index
rebuild-decision helper (r10 VERDICT #5)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.spark
def test_sampled_exact_equals_filtered_full(spark, embs):
    """The sampling identity the recall audit rests on: a vector's
    true top-k is independent of the other QUERY vectors, so
    knn_join_exact(query_mod=4) is bit-identical to the full run
    filtered to the same sample."""
    from lasdb_spark.operators.similarity import knn_join_exact

    sampled = _rows(knn_join_exact(embs, 5, query_mod=4))
    full = _rows(
        knn_join_exact(embs, 5).filter(F.col("vec_id") % 4 == 0)
    )
    assert sampled == full and sampled


@pytest.mark.spark
def test_recall_report_sampled_consistency(spark, embs):
    """n_pairs = |sample|·k; hits ≤ n_pairs; every method row present;
    and the sampled report's hits equal a hand-computed intersection
    of the sampled truth with the sampled ivf arm."""
    from lasdb_spark.operators.similarity import (
        KNN_JOIN_RECALL_QUERY_MOD,
        knn_join_exact,
        knn_join_ivf,
        knn_join_recall_report,
    )

    mod = KNN_JOIN_RECALL_QUERY_MOD
    rows = {r.method: r for r in knn_join_recall_report(embs).collect()}
    assert set(rows) == {"ivf_tr", "lsh", "lsh_mp"}
    n_sample = embs.filter(F.col("vec_id") % mod == 0).count()
    truth = {
        (r.vec_id, r.nbr_id)
        for r in knn_join_exact(embs, 5, query_mod=mod).collect()
    }
    ivf = {
        (r.vec_id, r.nbr_id)
        for r in knn_join_ivf(embs, 5)
        .filter(F.col("vec_id") % mod == 0)
        .collect()
    }
    for r in rows.values():
        assert r.n_pairs == n_sample * 5
        assert 0 <= r.hits <= r.n_pairs
        assert r.recall_ppm == r.hits * 1_000_000 // r.n_pairs
    assert rows["ivf_tr"].hits == len(truth & ivf)


@pytest.mark.spark
def test_index_rebuild_restores_balance(spark, embs):
    """The observability→action loop end-to-end (r10 VERDICT #5):
    plant a topic-burst increment (shared dominant component +
    per-vector variety) that runs one cell away, observe the
    documented skew threshold breach, rebuild with stratified
    reseeding, and prove balance restored — skew back under
    threshold AND strictly below the planted level — while the
    stored join keeps answering with the full contract."""
    import tempfile

    from lasdb_spark.operators.ann_index import (
        KNN_JOIN_REBUILD_SKEW_PPM,
        append_knn_join_index,
        build_knn_join_index,
        knn_join_index_needs_rebuild,
        knn_join_ivf_stored,
        rebuild_knn_join_index,
    )

    path = tempfile.mkdtemp(prefix="lasdb_rebuild_") + "/idx"
    build_knn_join_index(embs, path)
    before = knn_join_index_needs_rebuild(spark, path)
    assert before["rebuild"] is False
    base = embs.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("be")
    )
    inc = embs.crossJoin(F.broadcast(base)).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "cast(zip_with(be, embedding, (x, y) -> 2.0*x + y)"
            " as array<float>)"
        ).alias("embedding"),
    )
    append_knn_join_index(inc, path)
    planted = knn_join_index_needs_rebuild(spark, path)
    assert planted["rebuild"] is True
    assert planted["max_skew_ppm"] > KNN_JOIN_REBUILD_SKEW_PPM
    rebuild_knn_join_index(spark, path)
    after = knn_join_index_needs_rebuild(spark, path)
    assert after["rebuild"] is False
    assert after["max_skew_ppm"] < planted["max_skew_ppm"]
    n = embs.count() * 2
    assert knn_join_ivf_stored(spark, path).count() == n * 5


@pytest.mark.spark
def test_append_rejects_type_mismatch(spark, embs):
    """A double-typed increment into a float-typed index must fail at
    ingest (Parquet appends don't unify element types — a silent
    append poisons every later scan)."""
    import tempfile

    from lasdb_spark.operators.ann_index import (
        append_knn_join_index,
        build_knn_join_index,
    )

    path = tempfile.mkdtemp(prefix="lasdb_apptype_") + "/idx"
    build_knn_join_index(embs, path)
    bad = embs.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, v -> cast(v as double) + 0.1)")
        .alias("embedding"),
    )
    with pytest.raises(ValueError, match="element type|embedding type"):
        append_knn_join_index(bad, path)


@pytest.mark.spark
def test_stored_reads_recover_interrupted_root_swap(spark, embs):
    """r11 ADVICE: a crash between rebuild_knn_join_index's two root
    renames strands the whole index at path_old. Every stored read
    entry point runs read-only recovery via ann_index_meta, so the
    next read renames it back instead of throwing path-not-found —
    and never deletes a side dir (an in-flight rebuild's
    *_compacting survives a concurrent-looking read)."""
    import os
    import tempfile

    from lasdb_spark.operators.ann_index import (
        build_knn_join_index,
        knn_join_index_stats,
        knn_join_ivf_stored,
    )

    path = tempfile.mkdtemp(prefix="lasdb_rootrec_") + "/idx"
    build_knn_join_index(embs, path)
    want = sorted(
        tuple(r) for r in knn_join_ivf_stored(spark, path).collect()
    )
    # simulate the crash window: first root rename done, second never
    # ran; plus a stale side dir a crashed rebuild would leave behind
    os.rename(path, path + "_old")
    os.makedirs(path + "_compacting")
    got = sorted(
        tuple(r) for r in knn_join_ivf_stored(spark, path).collect()
    )
    assert got == want
    assert os.path.isdir(path)
    assert not os.path.exists(path + "_old")
    # read-only recovery must NOT have deleted the side dir
    assert os.path.isdir(path + "_compacting")
    assert knn_join_index_stats(spark, path).count() > 0
