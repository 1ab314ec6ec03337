"""Storage-parameter sweep: pick the head/tail split ratio empirically.

The reference ships three hand-written configs sweeping ratio/scales/
offsets (scripts/import_20m_s1.json:10-57, _s2, _s3) and leaves the
choice to the operator reading the printed timings. This harness runs
the sweep end-to-end: ingest the same points at each ratio, record the
layout shape (block count, points per block) and the wall time of a
probe window query, and return one row per ratio so the choice is a
table lookup instead of folklore.

What the knob trades: a LONGER head (higher ratio) means more, smaller
blocks — finer pruning granularity for small windows but more groups
to aggregate at ingest; a SHORTER head means fat blocks — cheap ingest,
coarse pruning (every touched block decodes fully). At 100 TB the same
sweep runs on a representative tile sample, not the full corpus.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ingest import (
    attach_sfc,
    block_histogram,
    ingest_points,
    load_dataset,
)
from ..operators.window_query import WindowQuerier

DEFAULT_RATIOS = (0.5, 0.6, 0.7, 0.8)


def sweep_storage_params(
    points: DataFrame,
    base_path: str | None = None,
    ratios=DEFAULT_RATIOS,
    probe_bbox=None,
    scales=(1.0, 1.0, 1.0),
    offsets=(0.0, 0.0, 0.0),
    layout: str = "flat",
) -> list[dict]:
    """Ingest ``points`` once per ratio; return per-ratio layout + probe
    stats: head/tail lengths, block count, avg/max points per block,
    probe query seconds and row count."""
    own_tmp = base_path is None
    if own_tmp:
        base_path = tempfile.mkdtemp(prefix="lasdb_sweep_")
    spark = points.sparkSession
    results: list[dict] = []
    try:
        for ratio in ratios:
            name = f"sweep_r{int(round(ratio * 100))}"
            meta = ingest_points(
                points, name, base_path,
                scales=scales, offsets=offsets, ratio=ratio, layout=layout,
            )
            hist = block_histogram(attach_sfc(points, meta))
            h = hist.agg(
                F.count(F.lit(1)).alias("blocks"),
                F.avg("num_tail").alias("avg_pts"),
                F.max("num_tail").alias("max_pts"),
            ).first()
            row = {
                "ratio": ratio,
                "head_length": meta.head_length,
                "tail_length": meta.tail_length,
                "blocks": int(h.blocks),
                "avg_points_per_block": round(float(h.avg_pts), 2),
                "max_points_per_block": int(h.max_pts),
            }
            if probe_bbox is not None:
                df, m, ly = load_dataset(spark, base_path, name)
                q = WindowQuerier(df, m, ly)
                t0 = time.perf_counter()
                row["probe_rows"] = q.bbox(probe_bbox).count()
                row["probe_sec"] = round(time.perf_counter() - t0, 4)
            results.append(row)
    finally:
        if own_tmp:
            shutil.rmtree(base_path, ignore_errors=True)
    return results


def main(argv=None) -> None:
    """CLI: sweep the derived test cloud. Usage:
    python -m lasdb_spark.cli.sweep [sf_dir] [ratio ratio ...]"""
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    ratios = tuple(float(r) for r in argv[1:]) or DEFAULT_RATIOS

    from ..sources.points import points_df

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("lasdb_sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = sweep_storage_params(
        points_df(spark, sf_dir),
        ratios=ratios,
        probe_bbox=[85200.0, 85400.0, 446300.0, 446800.0],
    )
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
