"""Streaming corpus deduplication.

A training-data firehose dedups AS documents arrive, not in a nightly
batch: each micro-batch folds into per-fingerprint state and the sink
always holds the current keeper per distinct text. Built on
``applyInPandasWithState`` keyed by the content hash — the same
md5-fingerprint the batch :func:`lasdb_spark.operators.dedup.exact_dedup`
groups on, so on a finite input the streaming answer converges to the
batch one exactly (the convergence test's assertion).

Scale/state notes: state is one row per DISTINCT text (hash + min
doc_id + count). That is the inherent floor for global exact dedup —
any engine that dedups a corpus holds a fingerprint set. For horizons
where "duplicate" only matters within a recency window, swap the
no-timeout state for watermark-scoped state (or Spark's
``dropDuplicatesWithinWatermark``) and the state becomes bounded by
the window instead of the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
DEDUP_SCHEMA = "text_hash string, keeper_doc_id long, n_docs long"
_STATE_SCHEMA = "keeper long, n long"


def read_document_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (one file = one batch).

    The file source wants a DIRECTORY; a glob filter selects the table
    file within it (same pattern as the events stream source)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _dedup_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-fingerprint fold: keep the minimum doc_id, count occurrences.

    min() (not first-seen) keeps the output independent of micro-batch
    arrival order — the determinism the batch oracle needs."""
    keeper, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:  # the iterator contract permits empty chunks
            continue
        n += len(pdf)
        batch_min = int(pdf["doc_id"].min())
        keeper = batch_min if keeper is None else min(keeper, batch_min)
    state.update((keeper, n))
    yield pd.DataFrame(
        {"text_hash": [key[0]], "keeper_doc_id": [keeper], "n_docs": [n]}
    )


def stream_curate(
    doc_stream: DataFrame,
    min_quality: float | None = None,
    rates: dict | None = None,
) -> DataFrame:
    """Continuously-curated corpus state: stateless quality +
    stratified-sample gates (the IDENTICAL Column expressions the batch
    pipeline uses), then the stateful exact-dedup keeper — the
    streaming half of ``operators.curate.curate_corpus``.

    Near-dup (MinHash) dedup stays a batch/compaction-time pass by
    design: banded candidate generation needs corpus-wide band state,
    which is exactly what periodic compaction is for. This split —
    cheap gates + exact dedup inline, heavy near-dup offline — is how
    production ingestion pipelines layer the problem."""
    from ..operators.curate import MIN_QUALITY
    from ..operators.text import quality_col, sample_keep_pred

    min_quality = MIN_QUALITY if min_quality is None else min_quality
    gated = doc_stream.filter(
        (quality_col() >= min_quality) & sample_keep_pred(rates)
    )
    return stream_exact_dedup(gated)


def stream_exact_dedup(doc_stream: DataFrame) -> DataFrame:
    """Continuously-maintained exact-dedup table
    (text_hash, keeper_doc_id, n_docs) — streaming twin of
    ``operators.dedup.exact_dedup``.

    The shuffle is on the content hash (same key as the batch groupBy);
    each micro-batch touches only the fingerprints it contains."""
    hashed = doc_stream.select(
        F.md5(F.col("text")).alias("text_hash"), "doc_id"
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_state,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
