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

import os
import shutil
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
    which is exactly what periodic compaction is for — run
    :func:`compact_document_store` (or :func:`compact_near_dups` on a
    DataFrame) over the accumulated store between streaming windows.
    This split — cheap gates + exact dedup inline, heavy near-dup
    offline — is how production ingestion pipelines layer the
    problem."""
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


def stream_curate_sql() -> str:
    """Oracle of the DRAINED curation state: the identical batch gates
    (quality ∧ stratified sample — the same shared expressions) then
    the exact-dedup groupBy; the drained update-mode sink's max-count
    row per fingerprint equals this bit-for-bit."""
    from ..functions.hashing import md5_int60_sql
    from ..operators.curate import MIN_QUALITY
    from ..operators.text import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        STOPWORDS_EN,
        TOKEN_RE,
    )

    n_tok = f"len(regexp_extract_all(text, '{TOKEN_RE}'))"
    n_stop = f"len(regexp_extract_all(text, '\\b({STOPWORDS_EN})\\b'))"
    stop_ratio = f"({n_stop} / CAST(greatest({n_tok}, 1) AS DOUBLE))"
    quality = (
        f"round(least({n_tok}, 100) / 100.0 * 0.6 + {stop_ratio} * 0.4, 6)"
    )
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}"
        for lang, r in sorted(SAMPLE_RATES.items())
    )
    bucket = f"{md5_int60_sql('CAST(doc_id AS VARCHAR)')} % 100"
    return f"""
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE {quality} >= {MIN_QUALITY!r}
    AND {bucket} < (CASE {whens} ELSE {SAMPLE_DEFAULT_RATE} END))
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM gated GROUP BY 1
""".strip()


def compact_near_dups(docs: DataFrame, tau: float | None = None) -> DataFrame:
    """The compaction-time half of :func:`stream_curate`: batch MinHash
    near-dup dedup over the ACCUMULATED curated store, returning the
    keeper docs with every input column intact (the store rewrite needs
    the text for future passes).

    Uses ``candidates='adjacent'`` banding — candidate volume linear in
    bucket size, the mode built for huge accumulated corpora — with
    path-halving connected components, so chain-shaped near-dup
    clusters close correctly. One pass between streaming windows keeps
    the stored corpus near-dup-free without the stream ever holding
    corpus-wide band state."""
    from ..operators.dedup import JACCARD_TAU, dedup_clusters

    tau = JACCARD_TAU if tau is None else tau
    clusters = dedup_clusters(docs, tau, candidates="adjacent")
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    return docs.join(keep, "doc_id", "leftsemi")


def compact_document_store(
    spark: SparkSession, store_path: str, tau: float | None = None
) -> None:
    """Rewrite a parquet document store with near-dups removed — the
    corpus twin of ``operators.ingest.compact_dataset`` (side-dir write
    + rename swap, so a crash mid-compaction leaves the store intact).

    Contract: stop the streaming query writing ``store_path`` first
    (compaction is a maintenance-window op). A streaming sink's
    ``_spark_metadata`` commit log is honored on read and does NOT
    carry over to the rewritten store: after compaction the directory
    is a plain batch-managed parquet table, and further streaming
    appends need a fresh directory + checkpoint (file sinks dedup by
    batchId against their own log, so resuming the old query over a
    rewritten dir would silently drop batches)."""
    docs = spark.read.parquet(store_path)
    kept = compact_near_dups(docs, tau)
    tmp = store_path + "_compacting"
    kept.write.mode("overwrite").parquet(tmp)
    old = store_path + "_old"
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old, ignore_errors=True)


def documents_stream_multibatch(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Documents as a MULTI-micro-batch stream (split into ``n_files``
    staged parquet files, replayed ``files_per_trigger`` per trigger)
    — the documents twin of ``sources.events.events_stream_multibatch``,
    so stateful dedup crosses real batch boundaries in tests and
    driver entries."""
    import tempfile

    staging = tempfile.mkdtemp(prefix="lasdb_doc_stream_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(n_files, "doc_id").write.mode("overwrite").parquet(
        staging
    )
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staging)
    )


def stream_probe_dedup_index(
    doc_stream: DataFrame,
    index_path: str,
    out_dir: str,
    tau: float | None = None,
) -> None:
    """Drain ``doc_stream`` through the persisted MinHash dedup index
    (:mod:`lasdb_spark.operators.dedup_index`): every micro-batch is
    probed for near-duplicates of the INDEXED corpus via
    ``foreachBatch`` and the verdicts (new_id, corpus_id, jac) append
    to ``out_dir`` as parquet — the ONLINE ingestion gate (each
    arriving document is screened against the historical corpus
    before admission), the streaming twin of the batch
    ``probe_dedup_index`` entry.

    Correctness across batch boundaries: the probe is PER-DOC PURE
    (shingles/signature depend only on the document's text; the index
    side is frozen), so batch-partitioned probing equals the one-shot
    batch probe row-for-row regardless of how the replay splits —
    the same argument that makes index appends order-independent.

    Scale: foreachBatch reuses the full batch plan (band-key hash
    join into the stored buckets, exact-Jaccard verify against the
    stored shingle tables) per micro-batch; state lives in the INDEX,
    not the stream, so there is no state store to size — the
    watermarkless shape for monotone per-record screens."""
    from lasdb_spark.operators.dedup import JACCARD_TAU
    from lasdb_spark.operators.dedup_index import probe_dedup_index

    t = JACCARD_TAU if tau is None else tau

    def _probe(bdf: DataFrame, _bid: int) -> None:
        probe_dedup_index(
            bdf, bdf.sparkSession, index_path, t
        ).write.mode("append").parquet(out_dir)

    q = (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(_probe)
        .option(
            "checkpointLocation", os.path.join(out_dir, "_checkpoint")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
