"""Persisted MinHash dedup index (r8) — build/probe/append contracts."""

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.mark.spark
def test_probe_matches_inplan_crosscorpus(spark, docs):
    """The stored-index probe must equal the in-plan cross-corpus
    banded pipeline pair-for-pair (same candidates, same verify)."""
    from lasdb_spark.operators.dedup import crosscorpus_neardup_pairs
    from lasdb_spark.operators.dedup_index import (
        build_dedup_index,
        probe_dedup_index,
    )

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    inc = docs.where(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="lasdb_dedupidx_")
    build_dedup_index(corpus, path)
    got = sorted(
        tuple(r) for r in probe_dedup_index(inc, spark, path).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.jac)
        for r in crosscorpus_neardup_pairs(inc, corpus).collect()
    )
    assert got == want


@pytest.mark.spark
def test_append_equals_single_shot(spark, docs):
    """Indexing in two increments equals a single-shot build
    row-for-row in all three tables, and probes answer identically."""
    from lasdb_spark.operators.dedup_index import (
        append_dedup_index,
        build_dedup_index,
        probe_dedup_index,
    )

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    inc = docs.where(F.col("doc_id") % 2 == 1)
    single = tempfile.mkdtemp(prefix="lasdb_dedupidx_a_")
    split = tempfile.mkdtemp(prefix="lasdb_dedupidx_b_")
    from lasdb_spark.operators.dedup_index import _read_table

    build_dedup_index(corpus, single)
    build_dedup_index(corpus.where(F.col("doc_id") % 4 == 0), split)
    append_dedup_index(corpus.where(F.col("doc_id") % 4 == 2), split)
    # r12: the appended rows live in a committed segment; logical
    # content (base ∪ segments) must equal the single-shot build
    for tbl in ("buckets", "shingles", "sizes"):
        a = sorted(
            tuple(r) for r in _read_table(spark, single, tbl).collect()
        )
        b = sorted(
            tuple(r) for r in _read_table(spark, split, tbl).collect()
        )
        assert a == b and a, tbl
    pa = sorted(tuple(r) for r in probe_dedup_index(inc, spark, single).collect())
    pb = sorted(tuple(r) for r in probe_dedup_index(inc, spark, split).collect())
    assert pa == pb


@pytest.mark.spark
def test_append_crash_invisible_and_retry_heals(spark, docs):
    """The r12 crash contract, shared with the text index: an append
    that dies before its one-rename commit is invisible (probe
    results equal the pre-append index), and retrying the same
    increment heals to exactly the committed state."""
    import os

    from lasdb_spark.operators.dedup import crosscorpus_neardup_pairs
    from lasdb_spark.operators.dedup_index import (
        append_dedup_index,
        build_dedup_index,
        probe_dedup_index,
    )
    from lasdb_spark.operators.text_index import (
        SEGMENT_DIR,
        _committed_segments,
    )

    corpus_a = docs.where(F.col("doc_id") % 4 == 0)
    corpus_b = docs.where(F.col("doc_id") % 4 == 2)
    inc = docs.where(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="lasdb_dedupidx_crash_")
    build_dedup_index(corpus_a, path)
    base_probe = sorted(
        tuple(r) for r in probe_dedup_index(inc, spark, path).collect()
    )
    append_dedup_index(corpus_b, path)
    (seg,) = _committed_segments(path)
    fp = seg.rsplit("seg-", 1)[1]
    tmp = os.path.join(path, SEGMENT_DIR, f".tmp-{fp}")
    os.rename(seg, tmp)  # reconstruct crash-before-commit
    got = sorted(
        tuple(r) for r in probe_dedup_index(inc, spark, path).collect()
    )
    assert got == base_probe  # crashed append is invisible
    append_dedup_index(corpus_b, path)  # retry heals
    append_dedup_index(corpus_b, path)  # and re-running no-ops
    assert len(_committed_segments(path)) == 1
    assert not os.path.exists(tmp)
    got = sorted(
        tuple(r) for r in probe_dedup_index(inc, spark, path).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.jac)
        for r in crosscorpus_neardup_pairs(
            inc, docs.where(F.col("doc_id") % 2 == 0)
        ).collect()
    )
    assert got == want
