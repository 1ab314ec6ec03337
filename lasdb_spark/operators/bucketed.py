"""Bucketed table layout — co-located joins without a shuffle.

The lakehouse answer to "this join runs every hour on the same key":
pay the shuffle ONCE at write time (bucketBy splits rows into a fixed
number of hash buckets per table, recorded in the catalog), then every
subsequent equi-join or aggregation on the bucket key plans with ZERO
Exchange — at 100 TB the difference between an hourly 100 TB shuffle
and none. Spark's native analog of the reference's sorted-key layout
(`/root/reference/db/__init__.py:118-126` persists a B-tree for the
same reason: pre-organize once, query many).

Design notes for scale:
- bucket count is a LAYOUT constant (both join sides must match);
  pick ~ (table size / target partition size) at the expected SF.
- ``sortBy`` within buckets additionally removes the SMJ's Sort.
- tables register as EXTERNAL (explicit LOCATION): the parquet files
  plus catalog bucketing spec are the complete persisted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Persist ``df`` as an external bucketed+sorted parquet table.

    One repartition-by-key write; the catalog records the bucketing
    spec so later scans expose ``Bucketed: true`` and joins on ``key``
    skip the Exchange entirely."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        # repartition(n, key) uses the same Murmur3 hash as bucketBy,
        # so each task holds exactly one bucket -> ONE file per bucket,
        # the layout Spark requires to trust sortBy and skip the SMJ's
        # Sort at read time (multi-file buckets re-sort defensively)
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_event_user_tables(
    spark: SparkSession,
    events: DataFrame,
    base_path: str,
    tag: str = "t",
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Build the demo pair: a FACT table (event rows, cents-exact
    value) and a user DIM (lifetime stats), BOTH bucketed on user_id.
    Returns (fact, dim) as catalog-backed DataFrames whose join on
    user_id is co-located."""
    fact = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    dim = fact.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("lifetime_events"),
        F.sum("value_c").alias("lifetime_value_c"),
    )
    ft, dt = f"bkt_fact_{tag}", f"bkt_dim_{tag}"
    write_bucketed(fact, f"{base_path}/fact", ft, "user_id", n_buckets)
    write_bucketed(dim, f"{base_path}/dim", dt, "user_id", n_buckets)
    return spark.table(ft), spark.table(dt)


def bucketed_enrich_join(fact: DataFrame, dim: DataFrame) -> DataFrame:
    """Row-level fact⋈dim enrichment on the bucket key — the join this
    layout exists for. On bucketed inputs the plan is two bucketed
    FileScans + SortMergeJoin with NO Exchange (gate in
    tests/test_plans.py). A defensive within-partition Sort remains:
    Spark ≥3 ignores bucket sort order by default
    (``spark.sql.legacy.bucketedTableScan.outputOrdering`` restores
    it); sorting already-sorted runs is cheap and shuffle-free, so the
    100 TB win — no Exchange — is unaffected."""
    return fact.join(dim, "user_id")


def bucketed_join_rollup(fact: DataFrame, dim: DataFrame) -> DataFrame:
    """(event_type, n_events, sum_value_c, sum_lifetime_c) — the
    enriched rollup over the co-located join: per event type, exact
    event value cents and the summed lifetime spend of the emitting
    users (one row per EVENT, so hot users weigh by activity)."""
    return (
        bucketed_enrich_join(fact, dim)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_c").alias("sum_value_c"),
            F.sum("lifetime_value_c").alias("sum_lifetime_c"),
        )
        .orderBy("event_type")
    )


def bucketed_join_rollup_sql() -> str:
    """Oracle twin of :func:`bucketed_join_rollup` over raw events
    (the bucketed layout is a pure re-organization, so the twin
    recomputes fact/dim inline)."""
    return """
WITH fact AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events),
dim AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS lifetime_events,
         CAST(SUM(value_c) AS BIGINT) AS lifetime_value_c
  FROM fact GROUP BY 1)
SELECT f.event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(f.value_c) AS BIGINT) AS sum_value_c,
       CAST(SUM(d.lifetime_value_c) AS BIGINT) AS sum_lifetime_c
FROM fact f JOIN dim d USING (user_id)
GROUP BY 1 ORDER BY f.event_type
""".strip()
