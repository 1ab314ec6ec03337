"""Streaming drift monitoring — the online twin of the batch PSI
audit (:func:`lasdb_spark.operators.similarity.embedding_drift_psi`).

Production shape: an embedding feed (new ingest passing through the
encoder) is binned against a FROZEN reference spec (the per-dimension
integer ranges of the corpus the ANN index / semantic-dedup centroids
were built on — KB-sized, broadcast) and per-(dimension, bin) counts
accumulate as bounded streaming state (dim × bins keys, independent of
feed volume). The PSI report assembles from the drained counts plus a
batch pass over the reference half only — so watching a feed never
rescans the reference corpus.

Exactness: the bin expression is the SHARED
:func:`~lasdb_spark.operators.similarity.psi_bin_col` (clamp +
explicit floor), and counting is a commutative fold, so the drained
counts equal the batch scan's counts row-for-row regardless of
micro-batch boundaries — the drained == batch contract every streaming
entry here carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def embeddings_stream_multibatch(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Embeddings as a MULTI-micro-batch stream (hash-split staged
    parquet, replayed ``files_per_trigger`` files per trigger) — the
    embeddings twin of ``documents_stream_multibatch``."""
    import tempfile

    staging = tempfile.mkdtemp(prefix="lasdb_emb_stream_")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.repartition(n_files, "vec_id").write.mode("overwrite").parquet(
        staging
    )
    return (
        spark.readStream.schema(embs.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staging)
    )


def stream_psi_cells(
    emb_stream: DataFrame, rng: DataFrame, bins: int | None = None
) -> DataFrame:
    """(pos, bin, c_cur) — running per-(dimension, bin) counts of the
    streamed embeddings under the frozen reference spec ``rng``
    ((pos, mn, mx) from :func:`psi_reference_ranges`, broadcast into
    the stream-static join). c_cur grows monotonically per key, so
    the drained update-mode sink's max-counter row is the final count
    (the ``drained_final`` contract). State: dim × bins keys."""
    from lasdb_spark.operators.similarity import PSI_BINS, psi_bin_col

    nb = PSI_BINS if bins is None else int(bins)
    q = F.round(F.col("v").cast("double") * 1e6).cast("long")
    parts = emb_stream.select(
        F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select("pos", q.alias("q"))
    binned = parts.join(F.broadcast(rng), "pos").select(
        "pos",
        psi_bin_col(F.col("q"), F.col("mn"), F.col("mx"), nb).alias("bin"),
    )
    return binned.groupBy("pos", "bin").agg(
        F.count(F.lit(1)).alias("c_cur")
    )
