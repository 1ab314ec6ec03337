"""r12 operators: segment-commit appends for the ANN indexes (the
crash-idempotent discipline shared with the text and dedup indexes),
and the stored-ANN dense arm's recall/cos_rank contract."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.spark
def test_ann_append_crash_invisible_and_retry_heals(spark, embs):
    """A crashed IVF-PQ codes append (segment staged, commit rename
    never ran) is invisible — the stored query equals the pre-append
    index — and retrying the same increment heals to the committed
    state, equal to the single-shot trained index."""
    from lasdb_spark.operators.ann_index import (
        append_ann_index,
        build_ann_index,
        topk_ivfpq_stored,
    )
    from lasdb_spark.operators.text_index import (
        SEGMENT_DIR,
        _committed_segments,
    )

    path = tempfile.mkdtemp(prefix="lasdb_annseg_") + "/idx"
    build_ann_index(embs, path)
    want = _rows(topk_ivfpq_stored(spark, path, embs))
    # rebuild the codes from two increments, crashing the second
    import shutil

    shutil.rmtree(os.path.join(path, "codes"))
    append_ann_index(embs.where(F.col("vec_id") % 2 == 0), path)
    append_ann_index(embs.where(F.col("vec_id") % 2 == 1), path)
    segs = _committed_segments(path)
    assert len(segs) == 2
    # reconstruct crash-before-commit for the second increment
    seg = segs[1]
    fp = os.path.basename(seg)[len("seg-"):]
    tmp = os.path.join(path, SEGMENT_DIR, f".tmp-{fp}")
    os.rename(seg, tmp)
    assert len(_committed_segments(path)) == 1  # invisible
    # retry heals (overwrites the orphaned tmp), re-run no-ops
    append_ann_index(embs.where(F.col("vec_id") % 2 == 1), path)
    append_ann_index(embs.where(F.col("vec_id") % 2 == 1), path)
    assert len(_committed_segments(path)) == 2
    assert not os.path.exists(tmp)
    assert _rows(topk_ivfpq_stored(spark, path, embs)) == want


@pytest.mark.spark
def test_knn_join_append_rerun_is_idempotent(spark, embs):
    """Re-running a kNN-join assignment append commits exactly one
    segment — the old mode('append') path would have duplicated every
    probe and build row of the increment, duplicating its join
    pairs."""
    from lasdb_spark.operators.ann_index import (
        append_knn_join_index,
        build_knn_join_index,
        knn_join_ivf_stored,
    )
    from lasdb_spark.operators.text_index import _committed_segments

    path = tempfile.mkdtemp(prefix="lasdb_knnseg_") + "/idx"
    build_knn_join_index(embs.where(F.col("vec_id") % 2 == 0), path)
    inc = embs.where(F.col("vec_id") % 2 == 1)
    append_knn_join_index(inc, path)
    n_once = knn_join_ivf_stored(spark, path).count()
    append_knn_join_index(inc, path)  # retry must no-op
    assert len(_committed_segments(path)) == 1
    assert knn_join_ivf_stored(spark, path).count() == n_once


@pytest.mark.spark
def test_ann_compact_folds_segments_root_swap(spark, embs):
    """compact_ann_index folds the committed segments into the base
    through the whole-root swap: segments gone, meta preserved,
    stored answers unchanged."""
    import shutil

    from lasdb_spark.operators.ann_index import (
        ann_index_meta,
        append_ann_index,
        build_ann_index,
        compact_ann_index,
        topk_ivfpq_stored,
    )
    from lasdb_spark.operators.text_index import _committed_segments

    path = tempfile.mkdtemp(prefix="lasdb_anncmp_") + "/idx"
    build_ann_index(embs, path)
    want = _rows(topk_ivfpq_stored(spark, path, embs))
    shutil.rmtree(os.path.join(path, "codes"))
    for m in range(3):
        append_ann_index(embs.where(F.col("vec_id") % 3 == m), path)
    assert len(_committed_segments(path)) == 3
    meta_before = ann_index_meta(path)
    compact_ann_index(spark, path)
    assert _committed_segments(path) == []
    assert ann_index_meta(path) == meta_before
    assert os.path.isdir(os.path.join(path, "codes"))
    assert _rows(topk_ivfpq_stored(spark, path, embs)) == want


@pytest.mark.spark
def test_append_with_caller_segment_id(spark, embs):
    """segment_id is used verbatim as the idempotency key (the crawl
    batch-id path): no fingerprint job, same-id retry no-ops, and a
    different id commits a second segment."""
    from lasdb_spark.operators.ann_index import (
        append_knn_join_index,
        build_knn_join_index,
    )
    from lasdb_spark.operators.text_index import _committed_segments

    path = tempfile.mkdtemp(prefix="lasdb_segid_") + "/idx"
    build_knn_join_index(embs.where(F.col("vec_id") % 2 == 0), path)
    inc = embs.where(F.col("vec_id") % 2 == 1)
    append_knn_join_index(inc, path, segment_id="batch-2026-08-17")
    append_knn_join_index(inc, path, segment_id="batch-2026-08-17")
    assert [os.path.basename(s) for s in _committed_segments(path)] == [
        "seg-batch-2026-08-17"
    ]
