"""Document-corpus sources: JSONL / CSV ingestion normalized to the
engine's canonical documents schema (doc_id, lang, source, text).

Real corpora arrive as JSONL dumps (Common-Crawl-style) or CSV
exports, not pre-blessed parquet; every text operator in this engine
keys on the same four columns, so ingestion is schema normalization:

- ``text`` is required (rows with NULL/empty text are dropped — they
  carry no signal and would crash shingle/token operators downstream);
- ``lang`` defaults to ``'und'`` (BCP-47 undetermined) when absent —
  run :func:`lasdb_spark.operators.text.lang_id` to backfill;
- ``source`` defaults to the input file name (per-row, from
  ``input_file_name()`` — no driver-side listing);
- ``doc_id`` is taken from the file when present; otherwise a
  DETERMINISTIC 60-bit content id (md5 of the text) is synthesized.
  Content-hash ids mean byte-identical texts collapse to one id —
  the right default for a dedup-oriented pipeline, and reproducible
  under any partitioning or re-read, unlike
  ``monotonically_increasing_id`` whose values depend on the physical
  layout. Corpora needing to KEEP exact duplicates distinct must ship
  their own doc_id column.

Scale: both readers are plain distributed file scans (splittable for
CSV; JSONL splits per line); normalization is map-side column work,
no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60_col

#: canonical documents schema every text operator consumes
DOC_COLUMNS = ("doc_id", "lang", "source", "text")


def _normalize(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    if "text" not in cols:
        raise ValueError(
            f"document source needs a 'text' column, found {sorted(cols)}"
        )
    out = df.filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    if "doc_id" in cols:
        # per-ROW fallback: a mixed corpus where only some lines carry
        # ids still gets a deterministic id everywhere
        out = out.withColumn(
            "doc_id",
            F.coalesce(
                F.col("doc_id").cast("long"), md5_int60_col(F.col("text"))
            ),
        )
    else:
        out = out.withColumn("doc_id", md5_int60_col(F.col("text")))
    if "lang" in cols:
        out = out.withColumn(
            "lang", F.coalesce(F.col("lang").cast("string"), F.lit("und"))
        )
    else:
        out = out.withColumn("lang", F.lit("und"))
    if "source" in cols:
        out = out.withColumn(
            "source",
            F.coalesce(F.col("source").cast("string"), F.input_file_name()),
        )
    else:
        out = out.withColumn("source", F.input_file_name())
    return out.select(*DOC_COLUMNS)


def documents_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL corpus (one JSON object per line) into the
    canonical documents schema."""
    return _normalize(spark.read.json(path))


#: explicit schema for the streaming reader (readStream cannot infer);
#: lines missing a field read as NULL and the normalizer fills them
_JSONL_STREAM_SCHEMA = "doc_id long, lang string, source string, text string"


def documents_stream_from_jsonl(
    spark: SparkSession, dir_path: str
) -> DataFrame:
    """Streaming twin of :func:`documents_from_jsonl`: watch a
    directory for new JSONL files (one file = one micro-batch locally;
    swap for Kafka in production) and emit canonically-normalized
    documents. Feeds :func:`lasdb_spark.streaming.dedup.stream_curate`
    directly — continuous corpus ingestion with the same gates and the
    same deterministic content ids as the batch path."""
    raw = (
        spark.readStream.schema(_JSONL_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.jsonl")
        .json(dir_path)
    )
    return _normalize(raw)


def documents_from_csv(
    spark: SparkSession, path: str, sep: str = ","
) -> DataFrame:
    """Read a headered CSV corpus into the canonical documents schema.
    Quoted multi-line text fields are handled by the standard csv
    source options."""
    df = spark.read.options(
        header=True, sep=sep, quote='"', escape='"', multiLine=True
    ).csv(path)
    return _normalize(df)
