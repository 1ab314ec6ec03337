"""Events-table source.

The driver testdata writes ``ts`` as Parquet ``TIMESTAMP(NANOS)``, which
Spark's vectorized Parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).  We
read it through the legacy ``nanosAsLong`` path and convert to a
microsecond TIMESTAMP with pure integer arithmetic
(``timestamp_micros(ns div 1000)``), so every engine that consumes the
column (Spark, DuckDB oracle via ``make_timestamp(epoch_us(ts))``) sees
bit-identical µs values.

At 100 TB the same loader works unchanged: the conf is a session-level
read option, the conversion is whole-stage-codegen integer math, and
column pruning/pushdown still reach the scan (the converted column is a
projection, not a UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# readStream needs an explicit schema; ts arrives as long (nanos).
RAW_EVENT_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _with_ts(df: DataFrame) -> DataFrame:
    # integer div: floor for positive epochs — matches DuckDB epoch_us()
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events table with ``ts`` as a proper µs TIMESTAMP."""
    spark.conf.set(_NANOS_CONF, "true")
    return _with_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the same table (one file = one
    micro-batch locally; swap for Kafka in production)."""
    spark.conf.set(_NANOS_CONF, "true")
    # the file stream source wants a directory; glob-filter to the table
    return _with_ts(
        spark.readStream.schema(RAW_EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


# DuckDB-side view of the same µs truncation: every oracle query over
# events selects FROM this CTE (named ev) instead of the raw view.
EV_CTE = (
    "WITH ev AS (SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, "
    "user_id, event_type, value, props FROM events)"
)
