"""Topic clustering for corpus curation: k-means cells over the
embedding space, labeled by their member documents' distinctive
terms, plus cluster-balanced sampling.

The cluster-then-balance recipe (cf. cluster-based data-mixing
curation in open pretraining pipelines): embed → cluster → inspect
clusters by their distinctive vocabulary → cap each cluster's
contribution so one dominant slice (boilerplate, one domain) cannot
swamp the mixture.

Reuses the trained k-means assignment from the semantic-dedup stack
(semdedup._trained_assign / similarity.ivf_train_ctes — identical
integer-exact Lloyd rounds on both engines), so cluster ids here,
in SemDeDup and in IVF search all agree.

Determinism: term scores are single products of integer counts and
one log (no order-dependent float sums); ranking ties break on the
term; the balanced sample orders by md5(doc_id) — the same
hash-order idiom as text.stratified_sample.

Scale: one token shuffle to (cell, term) counts (map-side partials);
the labeling agg runs on the collapsed table; the sample is one
row_number window partitioned by cell. The k-means assignment's cost
dominates and is shared/documented in semdedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import EMB_DIM, IVF_CELLS, IVF_ITERS, ivf_train_ctes
from .text import WORD_RE

TOPIC_TERMS = 5
CLUSTER_QUOTA = 40


def doc_clusters(
    embs: DataFrame, n_cells: int = IVF_CELLS, n_iters: int = IVF_ITERS
) -> DataFrame:
    """(doc_id, cell) — the trained k-means assignment, exposed so a
    pipeline trains ONCE and feeds every consumer (topics, balanced
    sample, SemDeDup) the same cells via their ``assign=``
    parameter — mirrors the ``clusters=`` reuse contract of
    dedup.dedup_keepers."""
    from .semdedup import _trained_assign

    return _trained_assign(embs, n_cells, n_iters).select(
        F.col("vec_id").alias("doc_id"), "cell"
    )


def corpus_topics(
    docs: DataFrame,
    embs: DataFrame,
    k_terms: int = TOPIC_TERMS,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    assign: DataFrame | None = None,
) -> DataFrame:
    """(cell, n_docs, rank, term, score) — each cluster labeled by its
    ``k_terms`` most DISTINCTIVE terms: count within the cluster ×
    ln(n_clusters / n_clusters containing the term) — TF-IDF at
    cluster granularity, so corpus-wide stopwords score ~0 and the
    cluster's own vocabulary surfaces."""
    if assign is None:
        # materialize: the assignment feeds three consumers below
        # (membership join, cluster count, sizes) — lazy lineage would
        # re-run the Lloyd chain per consumer (see
        # semdedup._trained_assign)
        assign = doc_clusters(embs, n_cells, n_iters).localCheckpoint()
    member = docs.join(assign, "doc_id")
    terms = member.select(
        "cell",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)
            )
        ).alias("term"),
    )
    # materialize the (cell, term) counts once: ct feeds both the
    # term-DF aggregate and the scoring join, and unmaterialized
    # lineage re-ran the corpus tokenize+explode+shuffle per consumer
    # (r12, guide §5); vocab×cells-bounded rows, never corpus-sized
    ct = (
        terms.groupBy("cell", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    df_t = ct.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_clusters = assign.select("cell").distinct().agg(
        F.count(F.lit(1)).alias("k")
    )
    sizes = member.groupBy("cell").agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("c").cast("double")
        * F.log(F.col("k").cast("double") / F.col("df").cast("double")),
        6,
    )
    scored = (
        ct.join(df_t, "term")
        .crossJoin(F.broadcast(n_clusters))
        .select("cell", "term", score.alias("score"))
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("score").desc(), F.col("term")
    )
    top = scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k_terms
    )
    return top.join(sizes, "cell").select(
        "cell", "n_docs", "rank", "term", "score"
    )


def corpus_topics_sql(
    k_terms: int = TOPIC_TERMS,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    dim: int = EMB_DIM,
) -> str:
    pat = WORD_RE.replace("'", "''")
    ctes = ivf_train_ctes(n_cells, dim, n_iters)
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
member AS (
  SELECT d.doc_id, d.text, a.cell
  FROM documents d JOIN af a ON d.doc_id = a.vec_id),
terms AS (
  SELECT cell, unnest(regexp_extract_all(lower(text), '{pat}')) AS term
  FROM member),
ct AS (SELECT cell, term, count(*) AS c FROM terms GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM ct GROUP BY 1),
nk AS (SELECT count(DISTINCT cell) AS k FROM af),
sizes AS (SELECT cell, count(*) AS n_docs FROM member GROUP BY 1),
scored AS (
  SELECT cell, term,
         round(CAST(c AS DOUBLE)
               * ln(CAST(k AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
  FROM ct JOIN dft USING (term) CROSS JOIN nk),
ranked AS (
  SELECT cell, term, score,
         CAST(row_number() OVER (PARTITION BY cell
              ORDER BY score DESC, term) AS INT) AS rank
  FROM scored)
SELECT r.cell, s.n_docs, r.rank, r.term, r.score
FROM ranked r JOIN sizes s ON r.cell = s.cell
WHERE r.rank <= {k_terms}
""".strip()


def cluster_balanced_sample(
    docs: DataFrame,
    embs: DataFrame,
    quota: int = CLUSTER_QUOTA,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    assign: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cell) — at most ``quota`` documents per cluster,
    chosen by deterministic hash order, so a dominant cluster cannot
    swamp the curated mixture while small clusters keep everything."""
    if assign is None:
        assign = doc_clusters(embs, n_cells, n_iters)
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.join(assign, "doc_id")
        .select("doc_id", "cell")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select("doc_id", "cell")
    )


def cluster_balanced_sample_sql(
    quota: int = CLUSTER_QUOTA,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    dim: int = EMB_DIM,
) -> str:
    ctes = ivf_train_ctes(n_cells, dim, n_iters)
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
member AS (
  SELECT d.doc_id, a.cell
  FROM documents d JOIN af a ON d.doc_id = a.vec_id),
ranked AS (
  SELECT doc_id, cell,
         row_number() OVER (PARTITION BY cell
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM member)
SELECT doc_id, cell FROM ranked WHERE rn <= {quota}
""".strip()
