"""JSONL / CSV document ingestion: schema normalization, defaults,
deterministic content ids, and compatibility with the text operators."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_src")
    jl = d / "corpus.jsonl"
    rows = [
        {"doc_id": 1, "lang": "en", "text": "the fast hash join"},
        {"doc_id": 2, "text": "zweiter text ohne sprache"},  # no lang
        {"text": "no id at all, content-hashed"},  # no doc_id
        {"doc_id": 4, "lang": "en", "text": ""},  # empty -> dropped
        {"doc_id": 5, "lang": "en", "text": None},  # null -> dropped
    ]
    jl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    cs = d / "corpus.csv"
    cs.write_text(
        'doc_id,lang,text\n'
        '10,en,"first, quoted text"\n'
        '11,,"missing lang"\n'
        '12,de,"multi\nline text"\n'
    )
    return str(jl), str(cs)


def test_jsonl_normalization(spark, corpus_files):
    from lasdb_spark.sources.docs import documents_from_jsonl

    jl, _ = corpus_files
    df = documents_from_jsonl(spark, jl)
    assert df.columns == ["doc_id", "lang", "source", "text"]
    rows = {r.text: r for r in df.collect()}
    assert len(rows) == 3  # empty + null dropped
    assert rows["the fast hash join"].doc_id == 1
    assert rows["zweiter text ohne sprache"].lang == "und"
    hashed = rows["no id at all, content-hashed"]
    assert hashed.doc_id is not None
    # content id is reproducible across reads
    again = {
        r.text: r.doc_id for r in documents_from_jsonl(spark, jl).collect()
    }
    assert again["no id at all, content-hashed"] == hashed.doc_id
    assert all(r.source.endswith("corpus.jsonl") for r in rows.values())


def test_csv_normalization_and_operator_compat(spark, corpus_files):
    from lasdb_spark.operators.text import token_stats
    from lasdb_spark.sources.docs import documents_from_csv

    _, cs = corpus_files
    df = documents_from_csv(spark, cs)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[11].lang == "und"
    assert rows[12].text == "multi\nline text"
    # the canonical schema feeds the text operators directly
    stats = {r.doc_id: r.n_tokens for r in token_stats(df).collect()}
    assert stats[10] == 3 and stats[12] == 3


def test_missing_text_column_raises(spark):
    from lasdb_spark.sources.docs import _normalize

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="text"):
        _normalize(df)
