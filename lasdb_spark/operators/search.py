"""Full-text relevance search over the documents table: BM25 ranking
(Robertson/Sparck Jones probabilistic model — the default scorer of
every production search engine, public domain).

The reference engine has no text surface; this rounds out the corpus
toolkit (tokens → TF-IDF keywords → BM25 retrieval) so a training-data
pipeline can rank documents against a textual query without leaving
the engine.

Spark shape (the 100 TB design): the query is a CONSTANT — its terms
are tokenized driver-side into literals, so the scan only explodes the
document tokens it needs (`term IN (...)` filters the exploded stream
map-side before any shuffle). Per-doc term counts aggregate with
map-side partials on (doc_id, term) — doc-scoped keys, no hot token.
Document frequency aggregates that already-collapsed table (≤ |query
terms| rows — broadcast). Corpus stats (N, total length) are a one-row
agg broadcast into the scoring join. Doc length rides the explode as a
grouping key, so no extra join against a doc-length table. Top-k is
orderBy().limit() — TakeOrderedAndProject, per-partition heaps, never
a global window.

Determinism: ln over exact integer counts, one double division per
factor, round 6 — the DuckDB twin computes the identical expression
tree, so scores hash-match.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WORD_RE

BM25_K1 = 1.2
BM25_B = 0.75
SEARCH_TOPK = 15


def _query_terms(query: str) -> list[str]:
    terms = sorted(set(re.findall(WORD_RE, query.lower())))
    if not terms:
        raise ValueError(f"query has no word tokens: {query!r}")
    return terms


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = SEARCH_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score, rank) — the ``k`` most relevant documents for
    ``query`` under BM25 (idf = ln(1 + (N−df+0.5)/(df+0.5)); tf
    saturation k1, length normalization b). Ties broken by doc_id."""
    terms = _query_terms(query)
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)
    )
    # doc length rides the explode as a grouping key — no doc join
    exploded = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(terms))
    tf = exploded.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_len"),
    )
    idf = F.log(
        1.0
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    part = (
        idf
        * (tfd * (k1 + 1.0))
        / (tfd + k1 * (1.0 - b + b * dld / avgdl))
    )
    # one conditional aggregate per query term, added in literal order:
    # a float SUM over the term rows would accumulate in partition
    # order and could differ from the oracle in the last ulp — a fixed
    # addition chain is engine-independent
    per_term = [
        F.max(F.when(F.col("term") == t, part)).alias(f"_s{i}")
        for i, t in enumerate(terms)
    ]
    pivoted = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(*per_term)
    )
    total = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    scored = pivoted.select(
        "doc_id", F.round(total, 6).alias("score")
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
    from pyspark.sql.window import Window

    w = F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    )
    return top.withColumn("rank", w.cast("int"))


def bm25_search_sql(
    query: str,
    k: int = SEARCH_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """Oracle twin of :func:`bm25_search` — same literals, same tree."""
    terms = _query_terms(query)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    idf = (
        "ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        " / (CAST(df AS DOUBLE) + 0.5))"
    )
    avgdl = "(CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    part = (
        f"{idf} * (CAST(tf AS DOUBLE) * ({k1!r} + 1.0))"
        f" / (CAST(tf AS DOUBLE) + {k1!r} * (1.0 - {b!r}"
        f" + {b!r} * CAST(dl AS DOUBLE) / {avgdl}))"
    )
    pivot_cols = ",\n".join(
        f"    max(CASE WHEN term = '{t.replace(chr(39), chr(39) * 2)}' "
        f"THEN {part} END) AS _s{i}"
        for i, t in enumerate(terms)
    )
    total_expr = " + ".join(
        f"coalesce(_s{i}, 0.0)" for i in range(len(terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE.replace("'", "''")}') AS t
  FROM documents),
exploded AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM exploded
  WHERE term IN ({in_list}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, sum(len(t)) AS total_len FROM toks),
pivoted AS (
  SELECT t.doc_id,
{pivot_cols}
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats
  GROUP BY 1),
scored AS (
  SELECT doc_id, round({total_expr}, 6) AS score FROM pivoted)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored) WHERE rank <= {k}
""".strip()
