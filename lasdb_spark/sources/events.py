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


# DuckDB-side view of the same µs truncation: every oracle query over
# events selects FROM this CTE (named ev) instead of the raw view.
EV_CTE = (
    "WITH ev AS (SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, "
    "user_id, event_type, value, props FROM events)"
)
