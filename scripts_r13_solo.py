#!/usr/bin/env python
"""r13 solo A/B harness: time the given entries with the bench's
_timed methodology (median of N after one warm-up) in ONE fresh
session at local[32]/sf0.1, fixtures cleared first. Run once per code
side (pristine vs optimized) for before/after evidence."""
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# deterministic fixture dirs built by stored-index entries
for p in glob.glob("/tmp/lasdb_ann_index_*") + glob.glob(
    "/tmp/lasdb_dedup_index_*"
) + glob.glob("/tmp/lasdb_text_index_*") + glob.glob(
    "/tmp/lasdb_quality_weights_*"
):
    shutil.rmtree(p, ignore_errors=True)

names = sys.argv[1:]
spark = bench._session(32)
try:
    import __spark_entry__ as _entry

    _eq = _entry.queries()
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embs.count()
    out = {}
    for name in names:
        fn = _eq[name]
        out[name] = bench._timed(
            spark, lambda fn=fn: fn(spark, SF_DIR).count()
        )
        print(json.dumps({name: out[name]}), flush=True)
        from lasdb_spark.operators.similarity import release_knn_join_cache

        release_knn_join_cache()
    print("SOLO " + json.dumps(out), flush=True)
finally:
    spark.stop()
