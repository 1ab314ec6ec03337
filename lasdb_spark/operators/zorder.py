"""Z-order (Morton) clustering for GENERAL relational tables.

The engine's spatial core — Morton keys + sorted Parquet + driver-side
range decomposition (reference: `pcsfc/encoder.py`, `pcsfc/
range_search.py`, B-tree analog `db/__init__.py:118-126`) — applied to
a non-spatial table: events clustered on (user_id, hour). This is the
lakehouse Z-ORDER BY primitive: a query constraining BOTH dimensions
(one user's events in a time window) prunes row groups by a handful of
1-D key ranges instead of scanning either full dimension.

Pipeline identical in shape to the point-cloud ingest/query path:

- layout: zkey = Morton(user_id, hour_index) → repartitionByRange +
  sortWithinPartitions → Parquet whose row-group min/max stats on zkey
  are selective (the poor-man's B-tree, SURVEY Q13);
- query: driver-side ``decompose_bbox`` turns the (user range × hour
  range) rectangle into ≤ max_ranges Morton key ranges pushed to the
  scan, then the exact per-dimension refine runs on the survivors.

At 100 TB this is the difference between touching the few files
holding one user-week and scanning a month of everything; the same
partitioning serves every mixed (who, when) predicate without a second
copy of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pcsfc.columns import morton_encode_col
from ..pcsfc.range_search import apply_key_ranges, decompose_bbox
from ..pcsfc.sqlgen import morton_encode_sql

HOUR_MS = 3_600_000
#: hour index base: hours since epoch at 2024-01-01T00:00Z — keeps the
#: hour dimension small and non-negative for the testdata's span while
#: remaining a static planning constant (no data-dependent action)
BASE_HOUR = 1_704_067_200_000 // HOUR_MS
Z_BITS = 10  # planning grid: 2^10 per dimension covers users × hours here


def zorder_events(events: DataFrame, base_hour: int = BASE_HOUR) -> DataFrame:
    """(event_id, user_id, hour_idx, zkey) — the clustered projection.

    ``hour_idx`` = hours since ``base_hour`` (non-negative precondition
    of the bit-interleave, same as the spatial quantizer's); the key is
    built by the identical codegen'd bit-expand chain the point cloud
    uses — no UDFs."""
    hour = F.expr(f"unix_millis(ts) div {HOUR_MS}") - F.lit(base_hour)
    return events.select(
        "event_id",
        "user_id",
        hour.alias("hour_idx"),
        morton_encode_col(F.col("user_id"), hour).alias("zkey"),
    )


def zorder_events_sql(base_hour: int = BASE_HOUR) -> str:
    """Oracle twin of :func:`zorder_events` (same key arithmetic via
    the shared SQL generators, over the µs-truncated events CTE)."""
    from ..sources.events import EV_CTE

    hour = f"(epoch_ms(ts) // {HOUR_MS} - {base_hour})"
    return f"""
{EV_CTE},
base AS (SELECT event_id, user_id, {hour} AS hour_idx FROM ev)
SELECT event_id, user_id, hour_idx,
       {morton_encode_sql('user_id', 'hour_idx')} AS zkey
FROM base
""".strip()


def write_zordered(
    events: DataFrame,
    path: str,
    n_files: int = 8,
    base_hour: int = BASE_HOUR,
) -> None:
    """Materialize the Z-ordered layout: range-partitioned and sorted
    by zkey so Parquet row-group stats give tight key intervals (the
    exact recipe `ingest_points` uses for sfc_key)."""
    (
        zorder_events(events, base_hour)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_query(
    spark: SparkSession,
    path: str,
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
    bits: int = Z_BITS,
    base_hour: int = BASE_HOUR,
) -> DataFrame:
    """Events of users in ``user_range`` within the absolute-hour
    ``hour_range`` — key-range pushdown + exact refine over the
    Z-ordered store. (event_id, user_id, hour_idx), hour_idx relative
    to ``base_hour``."""
    ulo, uhi = user_range
    hlo, hhi = hour_range[0] - base_hour, hour_range[1] - base_hour
    ranges = decompose_bbox(ulo, max(uhi, 0), max(hlo, 0), max(hhi, 0), bits)
    df = spark.read.parquet(path)
    pruned = apply_key_ranges(df, "zkey", ranges)
    return pruned.filter(
        F.col("user_id").between(ulo, uhi)
        & F.col("hour_idx").between(hlo, hhi)
    ).select("event_id", "user_id", "hour_idx")


def zorder_query_sql(
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
    base_hour: int = BASE_HOUR,
) -> str:
    """Oracle: the plain two-dimensional predicate — identical result,
    no clustering (which is exactly the semantics-vs-plan claim)."""
    from ..sources.events import EV_CTE

    ulo, uhi = user_range
    hlo, hhi = hour_range[0] - base_hour, hour_range[1] - base_hour
    hour = f"(epoch_ms(ts) // {HOUR_MS} - {base_hour})"
    return f"""
{EV_CTE},
base AS (SELECT event_id, user_id, {hour} AS hour_idx FROM ev)
SELECT event_id, user_id, hour_idx FROM base
WHERE user_id BETWEEN {ulo} AND {uhi}
  AND hour_idx BETWEEN {hlo} AND {hhi}
""".strip()
