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
