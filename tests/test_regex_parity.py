"""Cross-engine regex parity fuzz.

Every text operator's oracle parity rests on Spark (Java regex) and
DuckDB (RE2) agreeing on the same pattern. That holds for the corpus;
this test pins it for a generated corpus of corpus-realistic strings
(ASCII text, punctuation runs, quotes, digits, CJK from the langid
range, odd whitespace) so a future pattern edit that drifts between
dialects fails here instead of in production."""

import random

import duckdb
import pytest

from lasdb_spark.operators.dedup import SHINGLE_N
from lasdb_spark.operators.text import BPE_RE, PII_PATTERNS, PUNCT_RE, TOKEN_RE

WORDS = ["the", "value", "spark", "merge", "a", "Straße?", "don't", "x1",
         "bob@host.org", "a.b-c@mail.example.co", "415-555-0199",
         "123.456.7890", "10.0.0.7", "999.999.999.999", "123-45-6789",
         "not@an@email", "1.2.3", "@tag", "v1.2.3.4beta",
         "42", "3.14", "--", "...", "(key)", "über", "数据", "一鿿中",
         "it's", "O'Neil", "a,b;c", "#tag", "[1]", "{j}", "'quoted'"]
SPACES = [" ", "  ", "\t", "\n", " \n ", "\r\n"]


def _corpus(n=200, seed=11):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        s = ""
        for i in range(k):
            s += rng.choice(WORDS) + rng.choice(SPACES)
        out.append(s)
    out += ["", " ", "one", "one two", "'", "''", "a" * 500]
    return out


@pytest.mark.spark
@pytest.mark.parametrize(
    "pattern",
    [TOKEN_RE, PUNCT_RE, BPE_RE] + [p for _, p, _ in PII_PATTERNS],
)
def test_regexp_extract_all_counts_agree(spark, pattern):
    rows = [(i, s) for i, s in enumerate(_corpus())]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    from pyspark.sql import functions as F

    got = {
        r.doc_id: r.n
        for r in sdf.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0))
            ).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pat = pattern.replace("'", "''")
    want = dict(
        con.sql(
            f"SELECT doc_id, len(regexp_extract_all(text, '{pat}')) FROM t"
        ).fetchall()
    )
    assert got == want


@pytest.mark.spark
def test_shingle_parity_on_fuzz_corpus(spark):
    """The shingle builder (sequence/element_at vs lateral range) must
    agree on the fuzz corpus too, including sub-n-token docs."""
    from lasdb_spark.operators.dedup import shingles

    rows = [(i, s) for i, s in enumerate(_corpus(100, seed=23))]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r.doc_id, r.shingle) for r in shingles(sdf).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    from lasdb_spark.operators.dedup import shingles_sql

    want = set(map(tuple, con.sql(shingles_sql(SHINGLE_N)).fetchall()))
    assert got == want
