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
