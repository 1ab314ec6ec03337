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


def hybrid_search(
    docs: DataFrame,
    embs: DataFrame,
    query: str,
    query_vec_id: int = 0,
    k: int = SEARCH_TOPK,
    k_cand: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """(doc_id, bm25_rank, cos_rank, rrf, rank) — hybrid retrieval by
    RECIPROCAL RANK FUSION (Cormack/Clarke/Buettcher SIGIR'09, the
    standard lexical+dense fusion): the top ``k_cand`` BM25 documents
    for ``query`` and the top ``k_cand`` cosine neighbours of
    ``query_vec_id`` (docs ↔ embeddings join on doc_id = vec_id) are
    fused by rrf = Σ_arms 1/(rrf_k + rank); a doc missing from one
    arm contributes nothing for that arm and reports rank 0 there
    (ranks are 1-based, so 0 is unambiguous and keeps the report
    NULL-free for order-insensitive row comparison). Ties break by
    doc_id.

    Spark shape: each arm is already a k_cand-row TakeOrdered result,
    so the fusion join is a broadcast-sized full outer join on two
    k_cand-row inputs — corpus-scale work happens only inside the two
    arm plans (BM25's map-side term filter; at billion-doc scale the
    dense arm swaps to the stored IVF-PQ index, same contract).
    Determinism: ranks are exact integers, rrf is a two-term fixed
    addition chain of double reciprocals, round 6."""
    from .similarity import topk_bruteforce

    bm = bm25_search(docs, query, k_cand).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    dn = topk_bruteforce(embs, query_vec_id, k_cand).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("cos_rank")
    )
    fused = bm.join(dn, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).cast("int").alias("bm25_rank"),
        F.coalesce("cos_rank", F.lit(0)).cast("int").alias("cos_rank"),
        F.round(
            F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col("bm25_rank")), F.lit(0.0)
            )
            + F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col("cos_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(k)
    from pyspark.sql.window import Window

    w = F.row_number().over(
        Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    )
    return top.withColumn("rank", w.cast("int"))


def hybrid_search_sql(
    query: str,
    query_vec_id: int = 0,
    k: int = SEARCH_TOPK,
    k_cand: int = 50,
    rrf_k: int = 60,
) -> str:
    """Oracle twin of :func:`hybrid_search` — fuses the two arms'
    existing twins with the identical reciprocal expression tree."""
    from .similarity import topk_bruteforce_sql

    return f"""
WITH bm AS (
  SELECT doc_id, rank AS bm25_rank
  FROM ({bm25_search_sql(query, k_cand)})),
dn AS (
  SELECT vec_id AS doc_id, rank AS cos_rank
  FROM ({topk_bruteforce_sql(query_vec_id, k_cand)})),
fused AS (
  SELECT coalesce(bm.doc_id, dn.doc_id) AS doc_id,
         CAST(coalesce(bm.bm25_rank, 0) AS INT) AS bm25_rank,
         CAST(coalesce(dn.cos_rank, 0) AS INT) AS cos_rank,
         round(coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + bm.bm25_rank), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + dn.cos_rank), 0.0),
               6) AS rrf
  FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id)
SELECT doc_id, bm25_rank, cos_rank, rrf, rank FROM (
  SELECT doc_id, bm25_rank, cos_rank, rrf,
         CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
  FROM fused) WHERE rank <= {k}
""".strip()


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


# ---------------------------------------------------------------------------
# batched hybrid retrieval (r10) — the serving shape: a REQUEST SET of
# (query_id, text, query_vec_id) triples answered in one plan.
# ---------------------------------------------------------------------------
HYBRID_MULTI_QUERIES = (
    (0, "fast hash join vector", 0),
    (1, "stream window agg sort", 7),
    (2, "scan filter column batch", 42),
)


def hybrid_search_multi(
    docs: DataFrame,
    embs: DataFrame,
    queries=HYBRID_MULTI_QUERIES,
    k: int = SEARCH_TOPK,
    k_cand: int = 50,
    rrf_k: int = 60,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, doc_id, bm25_rank, cos_rank, rrf, rank) —
    :func:`hybrid_search` batched over a query SET in ONE plan: every
    query's BM25 arm, dense arm and RRF fusion, ranked per query.

    Spark shape (the serving batch): the corpus token explode +
    (doc_id, term) tf table computes ONCE for the UNION of all query
    terms (map-side ``term IN`` filter before any shuffle), then a
    broadcast (query_id, term) literal table fans the scored terms
    out to their queries — corpus work is independent of the query
    count; per-query work is candidate-bounded. The dense arm scores
    all query vectors in one broadcast pass (the
    :func:`~.similarity.mmr_topk_multi` pattern). All ranks are
    per-query row_number windows; the fusion joins two
    |queries|·k_cand-row inputs.

    Determinism: per-(query, doc) BM25 totals are SUMS of round-6
    micro-unit BIGINT term parts — associative under any partitioning
    and engine-exact, unlike a float sum (the single-query entry uses
    a fixed per-term addition chain instead; same contract, different
    mechanism because the term set here varies per query). rrf is the
    same two-term double chain, round 6."""
    from functools import reduce

    from pyspark.sql.window import Window

    from .similarity import _cosine

    qlist = [(int(qid), _query_terms(qtext), int(qvid))
             for qid, qtext, qvid in queries]
    all_terms = sorted({t for _, terms, _ in qlist for t in terms})
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)
    )
    exploded = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(all_terms))
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
    parts = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(part * 1e6).cast("long").alias("pm"),
        )
    )
    qt = reduce(
        lambda x, y: x.unionAll(y),
        [
            docs.sparkSession.range(1).select(
                F.lit(qid).alias("query_id"), F.lit(t).alias("term")
            )
            for qid, terms, _ in qlist
            for t in terms
        ],
    )
    bm_scores = (
        parts.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("pm").alias("bm_micro"))
    )
    wq = Window.partitionBy("query_id")
    bm = (
        bm_scores.withColumn(
            "bm25_rank",
            F.row_number()
            .over(wq.orderBy(F.col("bm_micro").desc(), F.col("doc_id")))
            .cast("int"),
        )
        .filter(F.col("bm25_rank") <= k_cand)
        .select("query_id", "doc_id", "bm25_rank")
    )
    # (query_id, qvid) as a literal table joined to embs — NOT a
    # filter+CASE chain: two queries may legally share a query_vec_id,
    # and a CASE maps the shared vector to only its first query,
    # silently dropping the other query's dense arm (r10 ADVICE). The
    # join yields one row per (query_id, vector) pair, mirroring the
    # SQL twin's VALUES join exactly.
    qvm = reduce(
        lambda x, y: x.unionAll(y),
        [
            docs.sparkSession.range(1).select(
                F.lit(qid).alias("query_id"), F.lit(qvid).alias("qvid")
            )
            for qid, _, qvid in qlist
        ],
    )
    qsel = F.broadcast(qvm).join(
        embs.select(
            F.col("vec_id").alias("qvid"),
            F.col("embedding").alias("qv"),
        ),
        "qvid",
    )
    dcos = (
        embs.crossJoin(F.broadcast(qsel))
        .filter(F.col("vec_id") != F.col("qvid"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            _cosine(F.col("qv"), F.col("embedding")).alias("cos"),
        )
    )
    dn = (
        dcos.withColumn(
            "cos_rank",
            F.row_number()
            .over(wq.orderBy(F.col("cos").desc(), F.col("doc_id")))
            .cast("int"),
        )
        .filter(F.col("cos_rank") <= k_cand)
        .select("query_id", "doc_id", "cos_rank")
    )
    fused = bm.join(dn, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).cast("int").alias("bm25_rank"),
        F.coalesce("cos_rank", F.lit(0)).cast("int").alias("cos_rank"),
        F.round(
            F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col("bm25_rank")), F.lit(0.0)
            )
            + F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col("cos_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    ranked = fused.withColumn(
        "rank",
        F.row_number()
        .over(wq.orderBy(F.col("rrf").desc(), F.col("doc_id")))
        .cast("int"),
    ).filter(F.col("rank") <= k)
    return ranked.orderBy("query_id", "rank")


def hybrid_search_multi_sql(
    queries=HYBRID_MULTI_QUERIES,
    k: int = SEARCH_TOPK,
    k_cand: int = 50,
    rrf_k: int = 60,
    k1: float = BM25_K1,
    b: float = BM25_B,
    dim: int = 64,
) -> str:
    """Oracle twin of :func:`hybrid_search_multi` — literal
    (query_id, term) / (query_id, qvid) VALUES tables, the identical
    micro-unit BM25 parts and cosine/RRF trees."""
    from .similarity import fold_product_sql

    qlist = [(int(qid), _query_terms(qtext), int(qvid))
             for qid, qtext, qvid in queries]
    all_terms = sorted({t for _, terms, _ in qlist for t in terms})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in all_terms)
    qt_vals = ", ".join(
        f"({qid}, '{t.replace(chr(39), chr(39) * 2)}')"
        for qid, terms, _ in qlist
        for t in terms
    )
    qv_vals = ", ".join(f"({qid}, {qvid})" for qid, _, qvid in qlist)
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
    qdot = fold_product_sql("q.qv", "e.embedding", dim)
    nq = fold_product_sql("q.qv", "q.qv", dim)
    ne = fold_product_sql("e.embedding", "e.embedding", dim)
    cos = f"round({qdot} / (sqrt({nq}) * sqrt({ne})), 6)"
    word_re = WORD_RE.replace("'", "''")
    return f"""
WITH qt(query_id, term) AS (VALUES {qt_vals}),
qvm(query_id, qvid) AS (VALUES {qv_vals}),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{word_re}') AS t
  FROM documents),
exploded AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM exploded
  WHERE term IN ({in_list}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, sum(len(t)) AS total_len FROM toks),
parts AS (
  SELECT t.doc_id, t.term,
         CAST(round(({part}) * 1000000.0) AS BIGINT) AS pm
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats),
bm_scores AS (
  SELECT q.query_id, p.doc_id, sum(p.pm) AS bm_micro
  FROM parts p JOIN qt q USING (term) GROUP BY 1, 2),
bm AS (
  SELECT query_id, doc_id, bm25_rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY bm_micro DESC, doc_id) AS INT) AS bm25_rank
    FROM bm_scores) WHERE bm25_rank <= {int(k_cand)}),
qe AS (
  SELECT m.query_id, m.qvid, e.embedding AS qv
  FROM qvm m JOIN embeddings e ON e.vec_id = m.qvid),
dcos AS (
  SELECT q.query_id, e.vec_id AS doc_id, {cos} AS cos
  FROM embeddings e CROSS JOIN qe q WHERE e.vec_id != q.qvid),
dn AS (
  SELECT query_id, doc_id, cos_rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, doc_id) AS INT) AS cos_rank
    FROM dcos) WHERE cos_rank <= {int(k_cand)}),
fused AS (
  SELECT coalesce(bm.query_id, dn.query_id) AS query_id,
         coalesce(bm.doc_id, dn.doc_id) AS doc_id,
         CAST(coalesce(bm.bm25_rank, 0) AS INT) AS bm25_rank,
         CAST(coalesce(dn.cos_rank, 0) AS INT) AS cos_rank,
         round(coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + bm.bm25_rank), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + dn.cos_rank), 0.0),
               6) AS rrf
  FROM bm FULL OUTER JOIN dn
    ON bm.query_id = dn.query_id AND bm.doc_id = dn.doc_id)
SELECT query_id, doc_id, bm25_rank, cos_rank, rrf, rank FROM (
  SELECT query_id, doc_id, bm25_rank, cos_rank, rrf,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS INT) AS rank
  FROM fused) WHERE rank <= {int(k)}
""".strip()
