"""Decontamination + repetition-scoring edge cases (the oracle mirror
covers full-corpus parity; these pin the operator semantics)."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_decontaminate_removes_overlapping_docs(spark):
    from lasdb_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the capital of france is paris indeed"),
            (2, "completely unrelated text about gardening tools"),
            (3, "question: the capital of france is what city"),
            (4, "to be"),  # < n tokens: no shingles, never contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france")], "doc_id long, text string"
    )
    rep = {r.doc_id: r.n_hits for r in contamination_report(docs, bench).collect()}
    # docs 1 and 3 share the 'capital of france' / 'the capital of'
    # shingles with the benchmark; 2 and 4 do not
    assert set(rep) == {1, 3} and all(v >= 1 for v in rep.values())

    clean = {r.doc_id for r in decontaminate(docs, bench).collect()}
    assert clean == {2, 4}

    # a higher min_hits threshold spares low-overlap docs
    strict = {
        r.doc_id
        for r in contamination_report(docs, bench, min_hits=99).collect()
    }
    assert strict == set()


@pytest.mark.spark
def test_repetition_stats_signals(spark):
    from lasdb_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one token, one bigram
            (2, "all words here are fully distinct"),
            (3, "solo"),  # no bigram
            (4, ""),  # no tokens at all
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[1].dup_token_ratio == 0.8  # 1 distinct of 5
    assert rows[1].top_bigram_frac == 1.0  # every bigram is 'spam spam'
    assert rows[2].dup_token_ratio == 0.0
    assert rows[2].top_bigram_frac == pytest.approx(1 / 5, abs=1e-6)
    assert rows[3].n_tokens == 1 and rows[3].top_bigram_frac == 0.0
    assert rows[4].n_tokens == 0
    assert rows[4].dup_token_ratio == 0.0 and rows[4].top_bigram_frac == 0.0
