"""End-to-end corpus curation: the composed training-data prep flow.

One lazy plan chains the pipeline a real pretraining corpus goes
through — quality gate, near-dup removal, language rebalancing — so a
user gets the curated corpus in a single call instead of wiring the
stages by hand (and the oracle checks the COMPOSITION, not just the
parts: stage outputs must agree after the joins, which catches subtle
key/type drift between operators that per-stage oracles cannot).

Scale shape: quality scoring and sampling are map-side filters that
fuse into the scan; the only shuffles in the whole flow are the ones
the dedup pipeline already owns (band join + clustering) plus two
semi-joins on doc_id at the end. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import JACCARD_TAU, dedup_clusters, dedup_clusters_sql
from .text import (
    quality_scores,
    quality_scores_sql,
    stratified_sample,
    stratified_sample_sql,
)

MIN_QUALITY = 0.35


def curate_corpus(
    docs: DataFrame,
    min_quality: float = MIN_QUALITY,
    tau: float = JACCARD_TAU,
    rates: dict | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, lang, source, quality) — docs that pass the quality
    gate, survive near-dup dedup (cluster keeper), and fall in the
    deterministic stratified sample.

    ``clusters``: optionally reuse a precomputed
    :func:`~lasdb_spark.operators.dedup.dedup_clusters` result so a
    pipeline that also calls ``dedup_keepers`` computes connected
    components once (the LSH pipeline is the expensive stage)."""
    quality = (
        quality_scores(docs)
        .filter(F.col("quality") >= min_quality)
        .select("doc_id", "quality")
    )
    if clusters is None:
        clusters = dedup_clusters(docs, tau)
    keepers = clusters.filter(
        F.col("doc_id") == F.col("cluster_id")
    ).select("doc_id")
    sampled = stratified_sample(docs, rates)
    return (
        sampled.join(keepers, "doc_id", "leftsemi")
        .join(quality, "doc_id")
        .select("doc_id", "lang", "source", "quality")
    )


def pretraining_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality: float = MIN_QUALITY,
    tau: float = JACCARD_TAU,
    rates: dict | None = None,
    budgets: dict[str, int] | None = None,
    default_budget: int = 0,
    seq_len: int = 512,
    n_buckets: int = 32,
    materialize: bool = False,
) -> DataFrame:
    """(doc_id, lang, n_tokens, quality, bucket, seq_id, offset) — the
    COMPLETE pretraining-data prep flow as one lazy plan:

      decontaminate (eval-set n-gram overlap, broadcast probe)
      → curate (quality gate ∧ near-dup keeper ∧ stratified sample)
      → token-budget mix (per-language best-first cut)
      → sequence packing (concat-then-chunk stream metadata)

    Each stage is the already-oracle-checked operator; this composes
    them the way a real corpus build runs, and its own oracle checks
    the COMPOSITION end-to-end (stage handoffs are semi-joins on
    doc_id, so key/type drift between stages cannot hide).

    Scale: the expensive stage is the dedup pipeline inside
    :func:`curate_corpus` (band join + components); decontamination
    adds a broadcast probe fused into the scan, the budget cut one
    lang-partitioned window, packing one bucket-partitioned window.
    The fully-lazy default re-derives the ``clean``/``surv`` survivor
    sets for each consumer (7 corpus scans in the physical plan, with
    Catalyst reusing 6 of the 10 exchanges — fine while scans are
    cheap relative to the dedup shuffles). At corpus scale pass
    ``materialize=True`` to ``localCheckpoint`` the two survivor
    tables, cutting the plan to one scan per stage — the same
    persist-stage-outputs shape a production corpus build uses.
    ``benchmark`` defaults to the driver-contract slice
    (:func:`~lasdb_spark.operators.decontaminate.driver_benchmark`)."""
    from .decontaminate import decontaminate, driver_benchmark
    from .text import pack_sequences, token_budget_sample

    if benchmark is None:
        benchmark = driver_benchmark(docs)
    clean = decontaminate(docs, benchmark)
    if materialize:
        clean = clean.localCheckpoint()
    curated = curate_corpus(clean, min_quality, tau, rates)
    surv = clean.join(curated.select("doc_id"), "doc_id", "leftsemi")
    if materialize:
        surv = surv.localCheckpoint()
    budgeted = token_budget_sample(surv, budgets or {}, default_budget)
    kept = surv.join(budgeted.select("doc_id"), "doc_id", "leftsemi")
    packed = pack_sequences(kept, seq_len, n_buckets)
    return budgeted.select("doc_id", "lang", "n_tokens", "quality").join(
        packed.select("doc_id", "bucket", "seq_id", "offset"), "doc_id"
    )


def pretraining_corpus_sql(
    min_quality: float = MIN_QUALITY,
    tau: float = JACCARD_TAU,
    rates: dict | None = None,
    budgets: dict[str, int] | None = None,
    default_budget: int = 0,
    seq_len: int = 512,
    n_buckets: int = 32,
) -> str:
    """Oracle twin of :func:`pretraining_corpus` — each stage's SQL
    generator takes a ``src`` table parameter, so the composition
    points every stage at the previous stage's survivor CTE instead
    of the raw table (CTE shadowing would be cleaner but DuckDB's
    binder reports a same-name CTE whose lineage reaches the shadowed
    table as a circular reference)."""
    from .decontaminate import contamination_report_sql
    from .text import pack_sequences_sql, token_budget_sample_sql

    curated_sql = curate_corpus_sql(min_quality, tau, rates, src="clean")
    budget_sql = token_budget_sample_sql(
        budgets or {}, default_budget, src="surv"
    )
    packed_sql = pack_sequences_sql(seq_len, n_buckets, src="kept")
    return f"""
WITH contam AS ({contamination_report_sql()}),
clean AS (
  SELECT * FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
curated AS ({curated_sql}),
surv AS (
  SELECT * FROM clean WHERE doc_id IN (SELECT doc_id FROM curated)),
budgeted AS ({budget_sql}),
kept AS (
  SELECT * FROM surv WHERE doc_id IN (SELECT doc_id FROM budgeted)),
packed AS ({packed_sql})
SELECT b.doc_id, b.lang, b.n_tokens, b.quality,
       p.bucket, p.seq_id, p.offset
FROM budgeted b JOIN packed p USING (doc_id)
""".strip()


def curate_corpus_sql(
    min_quality: float = MIN_QUALITY,
    tau: float = JACCARD_TAU,
    rates: dict | None = None,
    src: str = "documents",
) -> str:
    return f"""
WITH q AS (
  SELECT doc_id, quality FROM ({quality_scores_sql(src=src)})
  WHERE quality >= {min_quality}),
clusters AS ({dedup_clusters_sql(tau, src=src)}),
keepers AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
sampled AS ({stratified_sample_sql(rates, src=src)})
SELECT s.doc_id, s.lang, s.source, q.quality
FROM sampled s
JOIN keepers k ON k.doc_id = s.doc_id
JOIN q ON q.doc_id = s.doc_id
""".strip()
