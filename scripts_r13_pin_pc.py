#!/usr/bin/env python
"""r13 item-1 adjudication: n=5 solo pins of the four regressed driver
rows (ingest, bbox_small, bbox_large, knn_1000) at local[32] AND
local[8] on HEAD (identical code to r11 for these paths — verified
`git diff 1086395..HEAD` touches none of ingest/window_query/pcsfc/
sources). Bench methodology (_timed: median after one warm-up), fresh
session per core count."""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["LASDB_BENCH_RUNS"] = "5"

import bench  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

out = {}
for cpus in (32, 8):
    base = tempfile.mkdtemp(prefix="lasdb_pin_pc_")
    spark = bench._session(cpus)
    try:
        from lasdb_spark.operators.ingest import ingest_points, load_dataset
        from lasdb_spark.operators.window_query import WindowQuerier
        from lasdb_spark.sources.points import points_df

        pts = points_df(spark, SF_DIR)
        pts.count()
        t = {}
        t["ingest"] = bench._timed(
            spark,
            lambda: ingest_points(pts, "bench", base, target_partitions=cpus),
        )
        df, meta, layout = load_dataset(spark, base, "bench")
        df.limit(1).count()
        q = WindowQuerier(df, meta, layout)
        q.bbox([85150.0, 85160.0, 446200.0, 446210.0]).count()
        suite = {
            "bbox_small": lambda: q.bbox([85200.0, 85250.0, 446300.0, 446400.0]),
            "bbox_large": lambda: q.bbox([85100.0, 85900.0, 446100.0, 447400.0]),
            "knn_1000": lambda: q.knn([85500.0, 446700.0], 1000),
        }
        for name, fn in suite.items():
            t[name] = bench._timed(spark, lambda fn=fn: fn().count())
        out[f"local[{cpus}]"] = t
        print(json.dumps({f"local[{cpus}]": t}), flush=True)
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)

print("FINAL " + json.dumps(out), flush=True)
