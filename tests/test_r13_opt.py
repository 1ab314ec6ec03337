"""r13 optimization-round pins.

Each test pins one r13 optimization's OBSERVABLE contract (file
layout, plan shape, or bit-identical results) so a later round cannot
silently regress it.
"""

import os
import tempfile

import pytest


@pytest.mark.spark
def test_ingest_partition_hint_is_data_capped(spark, sf_dir, tmp_path):
    """A core-count parallelism hint must not shatter a small table
    into near-empty range partitions (r12 VERDICT item 1: the bench's
    ``target_partitions=cpus`` wrote 32 ~600 KB files at sf0.1, and
    every downstream query paid 32 footers + 32-way scheduling).
    The hint is now capped at one partition per ~300k points (floor 2
    so multi-file layout QA stays meaningful)."""
    from lasdb_spark.operators.ingest import ingest_points
    from lasdb_spark.sources.points import points_df

    pts = points_df(spark, sf_dir)
    n = pts.count()
    base = str(tmp_path / "store")
    ingest_points(pts, "cap", base, target_partitions=32)
    out = os.path.join(base, "pc_record_cap")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    expected = max(1, min(32, max(2, n // 300_000 + 1)))
    assert len(files) == expected
    # a hint below the cap is honored exactly (caller knows best)
    ingest_points(pts, "cap2", base, target_partitions=2)
    out2 = os.path.join(base, "pc_record_cap2")
    files2 = [f for f in os.listdir(out2) if f.endswith(".parquet")]
    assert len(files2) == 2


@pytest.mark.spark
def test_map_side_cell_ranking_matches_window_form(spark, sf_dir):
    """r13: _nearest_cells / _assign_cells rank cells as a PURE MAP
    (sort_array / array_max over per-row scoring structs). Pin (a) the
    bit-identical winner/ranking against the pre-r13 window reference
    form, and (b) the plan shape: no Window node and no
    hashpartitioning Exchange of the corpus in the ranking itself."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from lasdb_spark.functions.hashing import fold_dot_col
    from lasdb_spark.operators.similarity import (
        _assign_cells,
        _nearest_cells,
        embs_with_norm,
        seed_centroids,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wn = embs_with_norm(embs)
    cents = seed_centroids(embs, 8).localCheckpoint()

    # reference: the original window-ranked form
    ccos = F.round(
        fold_dot_col(F.col("embedding"), F.col("ce"))
        / (F.col("nrm") * F.col("cnrm")),
        6,
    )
    ref = wn.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.row_number()
        .over(
            Window.partitionBy("vec_id").orderBy(ccos.desc(), F.col("cid"))
        )
        .alias("rk"),
    )
    got = _nearest_cells(wn, cents).select("vec_id", "cid", "rk")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    got1 = _assign_cells(wn, cents).select("vec_id", "cell")
    ref1 = ref.filter(F.col("rk") == 1).select(
        "vec_id", F.col("cid").alias("cell")
    )
    assert sorted(map(tuple, got1.collect())) == sorted(
        map(tuple, ref1.collect())
    )
    plan = (
        _nearest_cells(wn, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan


@pytest.mark.spark
def test_probe_stored_prunes_to_probed_cells(spark, sf_dir, tmp_path):
    """r13: knn_join_probe_stored pushes the increment's probed-cell
    set as a partition filter on the stored assign scan — a 1-vector
    increment (nprobe cells) must not read the other cell
    directories, and results must match the unpruned join."""
    from pyspark.sql import functions as F

    from lasdb_spark.operators.ann_index import (
        build_knn_join_index,
        knn_join_probe_stored,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "idx")
    build_knn_join_index(embs.where(F.col("vec_id") % 2 == 0), path)
    inc = embs.where(F.col("vec_id") == 1)
    out = knn_join_probe_stored(inc, spark, path, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and " IN (" in plan
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)", plan)
    assert m is not None, plan
    assert len(m.group(1).split(",")) == 2  # nprobe=2 cells, not all 8
    rows = out.collect()
    assert len(rows) == 3 and all(r.vec_id == 1 for r in rows)


@pytest.mark.spark
def test_semdedup_hot_cell_salting_keeps_pair_set(spark, sf_dir):
    """r13 skew guard: with a runaway cell (> SEM_SKEW_FACTOR x mean)
    the pair scan splits the hot cell SEM_SALT ways; the emitted pair
    set must be IDENTICAL to the unsalted intra-cell join, and the
    salted arm must actually be planned (union of two joins)."""
    from pyspark.sql import functions as F

    from lasdb_spark.functions.hashing import fold_dot_col
    from lasdb_spark.operators.semdedup import SEM_TAU, semantic_pairs

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    # synthetic skew: ~95% of vectors in cell 0, the rest spread
    skewed = embs.select(
        "vec_id",
        "embedding",
        F.sqrt(fold_dot_col(F.col("embedding"), F.col("embedding"))).alias(
            "nrm"
        ),
        F.when(
            F.col("vec_id") % 20 == 0,
            (F.col("vec_id") / 20).cast("long") % 5 + 1,
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cell"),
    ).localCheckpoint()
    out = semantic_pairs(embs, assign=skewed)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan and "xxhash64" in plan  # salted arm planned
    # unsalted reference over the same assignment
    a = skewed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        "cell",
    )
    b = skewed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("cell").alias("cell_b"),
    )
    cos = F.round(
        fold_dot_col(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
        6,
    )
    ref = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "cell", cos.alias("cos"))
        .filter(F.col("cos") >= SEM_TAU)
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, ref.collect())
    )
