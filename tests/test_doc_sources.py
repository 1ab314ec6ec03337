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


def test_jsonl_stream_converges_to_batch(spark, tmp_path):
    """Streaming JSONL ingestion (files arriving as micro-batches)
    must end at the same normalized corpus and the same exact-dedup
    keeper table as one batch read of the full directory."""
    import json

    from lasdb_spark.sources.docs import (
        documents_from_jsonl,
        documents_stream_from_jsonl,
    )
    from lasdb_spark.streaming.dedup import stream_exact_dedup
    from lasdb_spark.streaming.events import run_to_memory

    d = tmp_path / "arrivals"
    d.mkdir()
    batches = [
        [{"doc_id": 1, "lang": "en", "text": "alpha beta gamma"},
         {"text": "shared duplicate body"}],
        [{"doc_id": 3, "lang": "de", "text": "vier funf sechs"},
         {"doc_id": 9, "text": "shared duplicate body"}],
    ]
    for i, rows in enumerate(batches):
        (d / f"part{i}.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
    stream = documents_stream_from_jsonl(spark, str(d))
    run_to_memory(stream.select("doc_id", "lang", "text"), "docs_stream",
                  output_mode="append")
    got = {
        (r.doc_id, r.lang, r.text)
        for r in spark.sql("SELECT * FROM docs_stream").collect()
    }
    want = {
        (r.doc_id, r.lang, r.text)
        for r in documents_from_jsonl(spark, str(d) + "/*.jsonl").collect()
    }
    assert got == want and len(got) == 4

    from pyspark.sql import functions as F

    dedup_stream = stream_exact_dedup(
        documents_stream_from_jsonl(spark, str(d)).withColumn(
            "n_chars", F.length("text")
        )
    )
    run_to_memory(dedup_stream, "docs_dedup_stream")
    table = {
        r.text_hash: (r.keeper_doc_id, r.n_docs)
        for r in spark.sql(
            "SELECT * FROM docs_dedup_stream"
        ).collect()
    }
    # the duplicated body collapses to ONE keeper (min content id wins
    # over the explicit 9 or vice versa — deterministic either way)
    from lasdb_spark.operators.dedup import exact_dedup

    batch = {
        r.text_hash: (r.keeper_doc_id, r.n_docs)
        for r in exact_dedup(
            documents_from_jsonl(spark, str(d) + "/*.jsonl")
        ).collect()
    }
    assert table == batch
