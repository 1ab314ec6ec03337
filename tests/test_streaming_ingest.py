"""Streaming ingest + compaction must converge to the batch layout."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lasdb_spark.operators.ingest import (
    compact_dataset,
    compute_metadata,
    ingest_points,
    load_dataset,
    save_metadata,
)
from lasdb_spark.operators.window_query import WindowQuerier
from lasdb_spark.sources.points import points_df
from lasdb_spark.streaming.ingest import read_point_stream, stream_ingest_points

BBOX = [85200.0, 85400.0, 446300.0, 446800.0]


@pytest.mark.spark
def test_stream_ingest_matches_batch(spark, sf_dir):
    pts = points_df(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lasdb_sing_")
    src = os.path.join(work, "incoming")
    base = os.path.join(work, "store")
    os.makedirs(base)

    # land the points as several files (several micro-batches)
    pts.repartition(4).write.parquet(src)
    meta = compute_metadata(pts, "s")
    save_metadata(meta, base, layout="flat")

    q = stream_ingest_points(
        read_point_stream(spark, src),
        meta,
        base,
        checkpoint=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()

    df, meta2, layout = load_dataset(spark, base, "s")
    assert df.count() == pts.count()

    streamed = WindowQuerier(df, meta2, layout).bbox(BBOX)
    expected = pts.filter(
        F.col("x").between(BBOX[0], BBOX[1]) & F.col("y").between(BBOX[2], BBOX[3])
    )
    assert streamed.count() == expected.count()

    # compaction keeps the same rows, restores global range order
    compact_dataset(spark, base, "s", target_partitions=2)
    df3, meta3, layout3 = load_dataset(spark, base, "s")
    assert df3.count() == pts.count()
    assert WindowQuerier(df3, meta3, layout3).bbox(BBOX).count() == expected.count()
    # after compaction files must be key-disjoint: check global sort by
    # comparing per-partition min/max ranges don't overlap
    parts = (
        df3.select("sfc_key", F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.min("sfc_key").alias("lo"), F.max("sfc_key").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo


@pytest.mark.spark
def test_append_beyond_extent_refreshes_metadata(spark, sf_dir):
    """Streaming appends OUTSIDE the original extent must become fully
    queryable after compaction: the metadata refresh regrows the bbox
    and the planning grid, so window decomposition no longer clamps the
    new territory away and kNN's coverage-exit test uses the true
    extent."""
    pts = points_df(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lasdb_grow_")
    src = os.path.join(work, "incoming")
    base = os.path.join(work, "store")
    os.makedirs(base)
    pts.repartition(2).write.parquet(src)
    meta = compute_metadata(pts, "g")
    save_metadata(meta, base, layout="flat")
    stream_ingest_points(
        read_point_stream(spark, src), meta, base,
        checkpoint=os.path.join(work, "ckpt"),
    ).awaitTermination()

    # second wave: the same cloud shifted far outside the original bbox
    # lands as NEW FILES in the same watched directory; the resumed
    # stream (same checkpoint) picks up exactly the new offsets. (A
    # separate query with a fresh checkpoint would be deduplicated by
    # the file sink's _spark_metadata batch log — one continuous
    # query per dataset is the contract.)
    shifted = pts.select(
        (F.col("x") + 4000.0).alias("x"),
        (F.col("y") + 4000.0).alias("y"),
        "z",
    )
    shifted.repartition(2).write.mode("append").parquet(src)
    stream_ingest_points(
        read_point_stream(spark, src), meta, base,
        checkpoint=os.path.join(work, "ckpt"),
    ).awaitTermination()

    compact_dataset(spark, base, "g", target_partitions=2)
    df, meta2, layout = load_dataset(spark, base, "g")
    assert meta2.point_count == 2 * pts.count()
    assert meta2.bbox[1] > meta.bbox[1] + 3000  # bbox grew with the data

    # a window entirely inside the NEW territory must find its points
    nbb = [BBOX[0] + 4000.0, BBOX[1] + 4000.0, BBOX[2] + 4000.0, BBOX[3] + 4000.0]
    got = WindowQuerier(df, meta2, layout).bbox(nbb).count()
    want = shifted.filter(
        F.col("x").between(nbb[0], nbb[1]) & F.col("y").between(nbb[2], nbb[3])
    ).count()
    assert got == want > 0
