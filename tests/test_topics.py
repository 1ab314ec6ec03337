"""Topic clustering + cluster-balanced sampling invariants."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_corpus_topics_labels_are_distinctive(spark, sf_dir):
    from lasdb_spark.operators.topics import TOPIC_TERMS, corpus_topics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = corpus_topics(docs, embs).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    n_docs_total = docs.count()
    for cell, terms in by_cell.items():
        assert len(terms) <= TOPIC_TERMS
        assert [t.rank for t in sorted(terms, key=lambda t: t.rank)] == list(
            range(1, len(terms) + 1)
        )
        # idf = ln(k/df) >= 0, and ranks follow score descending
        ordered = sorted(terms, key=lambda t: t.rank)
        assert all(t.score >= 0 for t in ordered)
        assert all(
            a.score >= b.score for a, b in zip(ordered, ordered[1:])
        )
        assert 0 < terms[0].n_docs <= n_docs_total
    # cluster sizes partition the corpus
    assert sum(t[0].n_docs for t in by_cell.values()) == n_docs_total


@pytest.mark.spark
def test_cluster_balanced_sample_quota(spark, sf_dir):
    from lasdb_spark.operators.topics import cluster_balanced_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    quota = 7
    out = cluster_balanced_sample(docs, embs, quota=quota)
    per = out.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r.n <= quota for r in per)
    # deterministic: same call, same sample
    a = sorted((r.doc_id, r.cell) for r in out.collect())
    b = sorted(
        (r.doc_id, r.cell)
        for r in cluster_balanced_sample(docs, embs, quota=quota).collect()
    )
    assert a == b


@pytest.mark.spark
def test_assignment_reuse_across_consumers(spark, sf_dir):
    """Train once, feed both consumers: identical results to the
    self-training path."""
    from lasdb_spark.operators.topics import (
        cluster_balanced_sample,
        corpus_topics,
        doc_clusters,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = doc_clusters(embs).cache()
    a = sorted(map(tuple, corpus_topics(docs, embs, assign=assign).collect()))
    b = sorted(map(tuple, corpus_topics(docs, embs).collect()))
    assert a == b
    c = sorted(
        map(tuple, cluster_balanced_sample(docs, embs, assign=assign).collect())
    )
    d = sorted(map(tuple, cluster_balanced_sample(docs, embs).collect()))
    assert c == d
