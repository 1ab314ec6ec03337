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


def curate_corpus_sql(
    min_quality: float = MIN_QUALITY,
    tau: float = JACCARD_TAU,
    rates: dict | None = None,
) -> str:
    return f"""
WITH q AS (
  SELECT doc_id, quality FROM ({quality_scores_sql()})
  WHERE quality >= {min_quality}),
clusters AS ({dedup_clusters_sql(tau)}),
keepers AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
sampled AS ({stratified_sample_sql(rates)})
SELECT s.doc_id, s.lang, s.source, q.quality
FROM sampled s
JOIN keepers k ON k.doc_id = s.doc_id
JOIN q ON q.doc_id = s.doc_id
""".strip()
