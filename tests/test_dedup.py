"""Dedup operator edge cases the oracle corpus doesn't exercise."""

import pytest


@pytest.mark.spark
def test_shingles_short_docs(spark):
    """Docs with fewer than n tokens yield NO shingles (matching the
    DuckDB twin's empty range()) instead of crashing on the descending
    sequence(1, 0) → element_at out-of-bounds path."""
    from lasdb_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [
            (1, "one two"),
            (2, "solo"),
            (3, ""),
            (4, "alpha beta gamma delta"),
        ],
        "doc_id int, text string",
    )
    by_doc = {}
    for r in shingles(docs).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    assert set(by_doc) == {4}
    assert by_doc[4] == {"alpha beta gamma", "beta gamma delta"}


@pytest.mark.spark
def test_lsh_pipeline_survives_short_docs(spark):
    """The full MinHash-LSH + clustering path must tolerate sub-n-token
    docs: they carry no shingles, join into no pairs, and come back as
    singleton clusters."""
    from lasdb_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, body) for i in range(4)]
        + [(10, "tiny"), (11, "two words"), (12, "")],
        "doc_id int, text string",
    )
    pairs = minhash_lsh_pairs(docs).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {
        (a, b) for a in range(4) for b in range(4) if a < b
    }
    clusters = {r.doc_id: r.cluster_id for r in dedup_clusters(docs).collect()}
    assert clusters == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 11, 12: 12}
