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
    build_dedup_index(corpus, single)
    build_dedup_index(corpus.where(F.col("doc_id") % 4 == 0), split)
    append_dedup_index(corpus.where(F.col("doc_id") % 4 == 2), split)
    for tbl in ("buckets", "shingles", "sizes"):
        a = sorted(
            tuple(r) for r in spark.read.parquet(f"{single}/{tbl}").collect()
        )
        b = sorted(
            tuple(r) for r in spark.read.parquet(f"{split}/{tbl}").collect()
        )
        assert a == b and a, tbl
    pa = sorted(tuple(r) for r in probe_dedup_index(inc, spark, single).collect())
    pb = sorted(tuple(r) for r in probe_dedup_index(inc, spark, split).collect())
    assert pa == pb
