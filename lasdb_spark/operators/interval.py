"""Interval (range) join — the non-equi join Spark has no native
operator for, expressed as an equi-join on time bins.

A naive ``t BETWEEN t_start AND t_end`` join has no equi key, so
Catalyst plans BroadcastNestedLoopJoin (or a cartesian product): every
(row, interval) pair is tested — quadratic, the classic 100 TB
killer. The standard fix (cf. range-join bin optimizations in other
engines): explode each interval to the fixed-width bins it covers,
bucket each left row to its single bin, equi-join on the bin (plus any
partition keys), then apply the exact containment predicate to the
surviving candidates. Candidates per row = intervals overlapping its
bin — local density, not table size.

Bin-width tradeoff: wide bins → more false candidates per bin; narrow
bins → more replicated interval rows (an interval emits
len/bin_width rows). Set ``bin_width`` near the TYPICAL interval
length; a pathological interval spanning the whole timeline replicates
into every bin — cap interval length upstream or partition such
outliers into a broadcast side channel.

The oracle twin deliberately stays the naive BETWEEN join: identical
semantics, different physical plan — which is exactly the claim the
plan gate (tests/test_plans.py) checks from the other side (no
BroadcastNestedLoopJoin, no CartesianProduct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.events import EV_CTE

#: ±window around an error event that defines its incident interval
INCIDENT_HALF_WIN_MS = 300_000
#: bin width for the bucketed join — matches the incident length scale
INCIDENT_BIN_MS = 600_000


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str,
    start: str,
    end: str,
    keys: tuple[str, ...] = (),
    bin_width: int = INCIDENT_BIN_MS,
) -> DataFrame:
    """Rows of ``left`` joined to every interval containing their
    timestamp (inclusive bounds), via the bucketed equi-join plan.
    Column names must not collide across the two inputs (alias
    first); ``keys`` adds equality predicates (e.g. user_id)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    b_int = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bin_width),
                F.floor(F.col(end) / bin_width),
            )
        ),
    )
    b_left = left.withColumn("_bin", F.floor(F.col(left_ts) / bin_width))
    joined = b_left.join(b_int, [*keys, "_bin"]).filter(
        (F.col(left_ts) >= F.col(start)) & (F.col(left_ts) <= F.col(end))
    )
    return joined.drop("_bin")


def incident_impact(
    events: DataFrame,
    half_win_ms: int = INCIDENT_HALF_WIN_MS,
    bin_width: int = INCIDENT_BIN_MS,
) -> DataFrame:
    """(incident_id, n_events, n_users) — for every error event, how
    much traffic (any user) fell inside ±half_win_ms around it. The
    flagship interval-join use: incidents and events share NO equi
    key, so the naive plan is quadratic; the bucketed join keeps it
    linear in events × local incident density."""
    ms = F.unix_millis(F.col("ts"))
    ev = events.select(
        F.col("event_id"), F.col("user_id"), ms.alias("ms"),
        F.col("event_type"),
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        (F.col("ms") - half_win_ms).alias("t0"),
        (F.col("ms") + half_win_ms).alias("t1"),
    )
    matched = interval_join(
        ev.select("event_id", "user_id", "ms"),
        incidents,
        left_ts="ms",
        start="t0",
        end="t1",
        bin_width=bin_width,
    )
    return (
        matched.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def incident_impact_sql(half_win_ms: int = INCIDENT_HALF_WIN_MS) -> str:
    """Oracle: the naive BETWEEN join — same semantics, quadratic
    plan (fine at oracle scale, the point of the bucketed engine)."""
    return f"""
{EV_CTE},
e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type FROM ev),
inc AS (
  SELECT event_id AS incident_id, ms - {half_win_ms} AS t0,
         ms + {half_win_ms} AS t1
  FROM e WHERE event_type = 'error')
SELECT incident_id, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM inc JOIN e ON e.ms BETWEEN inc.t0 AND inc.t1
GROUP BY 1
""".strip()
