"""Events-table source.

The driver testdata has shipped ``ts`` in two encodings across rounds:
Parquet ``TIMESTAMP(NANOS)`` (which Spark's vectorized reader rejects —
[PARQUET_TYPE_ILLEGAL] — unless read through the legacy ``nanosAsLong``
path) and plain ``TIMESTAMP(MICROS)``.  The loader handles both: it
always enables the legacy conf, then converts whatever the scan
produced to a microsecond ``timestamp_ntz`` — integer ``div`` for a
nanos-as-long column, a no-op cast when the file is already µs.  The
DuckDB oracle applies the same µs truncation (``epoch_us``), so every
engine sees bit-identical values either way.

At 100 TB the same loader works unchanged: the conf is a session-level
read option, the conversion is whole-stage-codegen integer math, and
column pruning/pushdown still reach the scan (the converted column is a
projection, not a UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _with_ts(df: DataFrame) -> DataFrame:
    if dict(df.dtypes)["ts"] == "bigint":
        # nanos-as-long: integer div = floor for positive epochs —
        # matches DuckDB epoch_us()
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # µs timestamp (read as TIMESTAMP_NTZ): produce the same TIMESTAMP
    # type the nanos path yields.  NOTE: the implicit NTZ->TIMESTAMP
    # cast inside to_utc_timestamp interprets the wall clock in
    # spark.sql.session.timeZone, so this expression is only correct
    # under a UTC session — which events_df/events_stream pin (and
    # which downstream consumers need anyway: hour()/date_trunc() over
    # the resulting TIMESTAMP also read the session zone).
    return df.withColumn("ts", F.expr("to_utc_timestamp(ts, 'UTC')"))


def _pin_utc(spark: SparkSession) -> None:
    # The DuckDB oracle compares epochs assuming UTC wall clocks; an
    # uncontrolled (driver) session in another zone would skew both the
    # NTZ cast above and every hour()/date_trunc() over ts.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events table with ``ts`` as a proper µs TIMESTAMP."""
    spark.conf.set(_NANOS_CONF, "true")
    _pin_utc(spark)
    return _with_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the same table (one file = one
    micro-batch locally; swap for Kafka in production).

    readStream needs an explicit schema; probe it from the batch reader
    (one driver-side footer read) so the stream tracks whichever ``ts``
    encoding the files carry."""
    spark.conf.set(_NANOS_CONF, "true")
    _pin_utc(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source wants a directory; glob-filter to the table
    return _with_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def events_stream_multibatch(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Events as a MULTI-micro-batch stream: the table is split into
    ``n_files`` parquet files in a temp staging dir and replayed
    ``files_per_trigger`` files per trigger — so stateful operators
    are exercised across real micro-batch boundaries (the single-file
    ``events_stream`` delivers everything in one batch, which hides
    cross-batch bugs like missing tombstones). The split is by
    event_id hash — arbitrary, as a real ingest's file boundaries
    would be; the state folds are commutative so results must not
    depend on it."""
    import tempfile

    _pin_utc(spark)
    staging = tempfile.mkdtemp(prefix="lasdb_ev_stream_")
    ev = events_df(spark, sf_dir)
    ev.repartition(n_files, "event_id").write.mode("overwrite").parquet(
        staging
    )
    schema = ev.schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staging)
    )


#: Sentinel user for the watermark-flush event (filtered everywhere).
FLUSH_USER = -1


def events_stream_multibatch_flushed(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    files_per_trigger: int = 1,
    delay_hours: int = 800,
    margin_hours: int = 48,
) -> DataFrame:
    """:func:`events_stream_multibatch` plus a trailing WATERMARK-FLUSH
    file: one sentinel event (``user_id = FLUSH_USER``) timestamped
    ``max(ts) + delay_hours + margin_hours`` and written with a
    strictly later modification time, so the file source replays it
    LAST and the watermark then passes every real window/session end.
    This is how a finite replay drains APPEND-mode stateful operators
    (session windows forbid update mode, so they finalize only when
    the watermark crosses them; Spark's no-data micro-batch then
    emits the state). Consumers must use ``withWatermark(...,
    f"{{delay_hours}} hours")`` — the delay covers the replay's
    full-span disorder (hash-split files ⇒ any file can carry any
    timestamp), and the sentinel's own session stays unemitted (the
    watermark never passes it), so sinks never see FLUSH_USER.

    In production nothing flushes an infinite feed — sessions emit
    continuously as the true watermark advances; the sentinel is the
    finite-replay stand-in for "time keeps moving"."""
    import os as _os
    import tempfile

    _pin_utc(spark)
    staging = tempfile.mkdtemp(prefix="lasdb_ev_stream_fl_")
    ev = events_df(spark, sf_dir)
    ev.repartition(n_files, "event_id").write.mode("overwrite").parquet(
        staging
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    flush_dir = tempfile.mkdtemp(prefix="lasdb_ev_flush_")
    flush = (
        ev.limit(1)
        .select(
            F.lit(-1).cast(dict(ev.dtypes)["event_id"]).alias("event_id"),
            (
                F.lit(max_ts)
                + F.expr(f"INTERVAL {delay_hours + margin_hours} HOURS")
            ).alias("ts"),
            F.lit(FLUSH_USER).cast(dict(ev.dtypes)["user_id"]).alias(
                "user_id"
            ),
            F.lit("flush").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast(dict(ev.dtypes)["props"]).alias("props"),
        )
    )
    flush.coalesce(1).write.mode("overwrite").parquet(flush_dir)
    # the file source replays oldest-mtime first: stamp the flush file
    # strictly after every staged file so it is the final micro-batch
    now = max(
        _os.path.getmtime(_os.path.join(staging, f))
        for f in _os.listdir(staging)
    )
    for f in _os.listdir(flush_dir):
        if f.endswith(".parquet"):
            _os.rename(
                _os.path.join(flush_dir, f),
                _os.path.join(staging, "zz_flush.parquet"),
            )
    _os.utime(_os.path.join(staging, "zz_flush.parquet"), (now + 60, now + 60))
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staging)
    )


# DuckDB-side view of the same µs truncation: every oracle query over
# events selects FROM this CTE (named ev) instead of the raw view.
EV_CTE = (
    "WITH ev AS (SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, "
    "user_id, event_type, value, props FROM events)"
)
