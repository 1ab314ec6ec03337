"""Z-order (Morton) clustering for GENERAL relational tables.

The engine's spatial core — Morton keys + sorted Parquet + driver-side
range decomposition (reference: `pcsfc/encoder.py`, `pcsfc/
range_search.py`, B-tree analog `db/__init__.py:118-126`) — applied to
a non-spatial table: events clustered on (user_id, hour) or any n
columns. This is the lakehouse Z-ORDER BY primitive: a query
constraining SEVERAL dimensions (one user's events in a time window)
prunes row groups by a handful of 1-D key ranges instead of scanning
any full dimension.

Pipeline identical in shape to the point-cloud ingest/query path:

- layout: zkey = Morton(d0, d1, ..., dn-1) → repartitionByRange +
  sortWithinPartitions → Parquet whose row-group min/max stats on zkey
  are selective (the poor-man's B-tree, SURVEY Q13);
- query: driver-side ``decompose_box_nd`` turns the n-dim query box
  into ≤ max_ranges Morton key ranges pushed to the scan, then the
  exact per-dimension refine runs on the survivors.

Grid sizing is derived FROM THE DATA at write time (one tiny agg —
a driver-side planning stat, same family as ingest's metadata pass)
and persisted in a ``_zorder_meta.json`` sidecar the query planner
reads back, so out-of-grid values can never be silently dropped:
write raises on negatives, and the stored ``bits`` always covers the
observed maxima.

At 100 TB this is the difference between touching the few files
holding one user-week and scanning a month of everything; the same
partitioning serves every mixed (who, when) predicate without a second
copy of the data.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pcsfc.columns import _balanced_bitor, morton_encode_col
from ..pcsfc.range_search import (
    DEFAULT_MAX_RANGES,
    _merge_ranges,
    apply_key_ranges,
    decompose_bbox,
)
from ..pcsfc.sqlgen import morton_encode_sql

HOUR_MS = 3_600_000
#: hour index base: hours since epoch at 2024-01-01T00:00Z — keeps the
#: hour dimension small and non-negative for the testdata's span while
#: remaining a static planning constant (no data-dependent action)
BASE_HOUR = 1_704_067_200_000 // HOUR_MS
Z_BITS = 10  # minimum planning grid: 2^10 per dimension
ZORDER_META_FILE = "_zorder_meta.json"


# --------------------------------------------------------------------
# n-dimensional Morton machinery (bit-interleave of n columns)
# --------------------------------------------------------------------

def morton_encode_nd_col(cols: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each column into one BIGINT key.

    Dimension d contributes bit b to key position ``b*n + d`` — the
    exact generalization of the 2-D byte-LUT encoder (which is used
    when n == 2: fewer codegen ops). All shifts/ANDs are built-in
    column expressions under one balanced BITOR tree — JVM-side, no
    UDFs, whole-stage-codegen friendly.
    """
    n = len(cols)
    if n == 2:
        return morton_encode_col(cols[0], cols[1])
    if n < 1:
        raise ValueError("need at least one dimension")
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    terms = []
    for d, c in enumerate(cols):
        cl = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(cl, b).bitwiseAND(1), b * n + d)
            )
    return _balanced_bitor(terms)


def morton_encode_nd_sql(exprs: Sequence[str], bits: int) -> str:
    """DuckDB twin of :func:`morton_encode_nd_col` (same bit layout)."""
    n = len(exprs)
    if n == 2:
        return morton_encode_sql(exprs[0], exprs[1])
    terms = []
    for d, e in enumerate(exprs):
        ce = f"CAST(({e}) AS BIGINT)"
        for b in range(bits):
            terms.append(f"((({ce} >> {b}) & 1) << {b * n + d})")
    return "(" + " | ".join(terms) + ")"


def encode_morton_nd(coords: Sequence[int], bits: int) -> int:
    """Driver-side n-dim Morton encode (planning only)."""
    n = len(coords)
    key = 0
    for d, v in enumerate(coords):
        for b in range(bits):
            key |= ((v >> b) & 1) << (b * n + d)
    return key


def decompose_box_nd(
    mins: Sequence[int],
    maxs: Sequence[int],
    bits: int,
    max_ranges: int = DEFAULT_MAX_RANGES,
) -> list[tuple[int, int]]:
    """Decompose an n-dim box into ≤ ``max_ranges`` Morton key ranges.

    The 2^n-ary generalization of :func:`...range_search.decompose_bbox`
    (which handles n == 2 with the same BFS/budget discipline): a cell
    fully inside emits its contiguous key range, a disjoint cell is
    pruned, an overlap cell splits until the budget would blow, then
    remaining overlap cells are emitted conservatively. Soundness:
    every grid cell inside the box is covered by some range.
    """
    n = len(mins)
    if n == 2:
        return decompose_bbox(
            mins[0], maxs[0], mins[1], maxs[1], bits, max_ranges
        )
    if bits < 1 or n * bits > 62:
        raise ValueError(f"bad grid: {n} dims x {bits} bits")
    grid_max = (1 << bits) - 1
    mins = [max(v, 0) for v in mins]
    maxs = [min(v, grid_max) for v in maxs]
    if any(lo > hi for lo, hi in zip(mins, maxs)):
        return []

    ranges: list[tuple[int, int]] = []
    cells: list[tuple[int, ...]] = [tuple([0] * n)]
    size = 1 << bits
    corners = [
        tuple((j >> d) & 1 for d in range(n)) for j in range(1 << n)
    ]
    while cells and size > 1:
        half = size >> 1
        nxt: list[tuple[int, ...]] = []
        for cell in cells:
            for corner in corners:
                c = tuple(cell[d] + corner[d] * half for d in range(n))
                if any(
                    c[d] > maxs[d] or c[d] + half - 1 < mins[d]
                    for d in range(n)
                ):
                    continue  # disjoint
                if all(
                    c[d] >= mins[d] and c[d] + half - 1 <= maxs[d]
                    for d in range(n)
                ):
                    base = encode_morton_nd(c, bits)
                    ranges.append((base, base + half ** n - 1))
                else:
                    nxt.append(c)
        size = half
        # each overlap cell may yield ≤ 2^n - 1 new ranges per level
        if len(ranges) + ((1 << n) - 1) * len(nxt) > max_ranges:
            for c in nxt:
                base = encode_morton_nd(c, bits)
                ranges.append((base, base + size ** n - 1))
            cells = []
        else:
            cells = nxt
    for c in cells:
        k = encode_morton_nd(c, bits)
        ranges.append((k, k))
    ranges.sort()
    return _merge_ranges(ranges)


# --------------------------------------------------------------------
# generic n-column Z-ordered layout (write + query)
# --------------------------------------------------------------------

def _required_bits(maxima: Sequence[int], floor_bits: int = Z_BITS) -> int:
    """Shared per-dimension bit width covering every observed maximum."""
    need = max(
        [floor_bits] + [int(v).bit_length() for v in maxima if v is not None]
    )
    return need


def write_zordered_nd(
    df: DataFrame,
    path: str,
    dim_cols: Sequence[str],
    n_files: int = 8,
    bits: int | None = None,
) -> dict:
    """Materialize a Z-ordered layout over ``dim_cols`` (all must be
    non-negative integers). Range-partitioned and sorted by zkey so
    Parquet row-group stats give tight key intervals (the exact recipe
    ``ingest_points`` uses for sfc_key).

    Grid sizing: one tiny agg derives per-dimension maxima; ``bits``
    (shared across dims) is raised to cover them, and an explicit
    ``bits`` too small for the data raises instead of silently
    dropping out-of-grid rows at query time (round-4 ADVICE fix). The
    chosen grid is persisted to a ``_zorder_meta.json`` sidecar that
    ``zorder_query_nd`` reads back, so writer and planner can never
    disagree. Returns the sidecar dict.
    """
    n = len(dim_cols)
    aggs = []
    for c in dim_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    stats = df.agg(*aggs).collect()[0]  # driver-side planning stat
    for c in dim_cols:
        mn = stats[f"min_{c}"]
        if mn is None:
            raise ValueError(f"zorder dim {c!r}: no rows / all-null")
        if mn < 0:
            raise ValueError(
                f"zorder dim {c!r} has negative values (min={mn}); "
                "shift it to a non-negative index first"
            )
    need = _required_bits([stats[f"max_{c}"] for c in dim_cols])
    if bits is None:
        bits = need
    elif bits < need:
        raise ValueError(
            f"bits={bits} cannot hold data maxima "
            f"{[int(stats['max_' + c]) for c in dim_cols]} "
            f"(need {need})"
        )
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    zkey = morton_encode_nd_col([F.col(c) for c in dim_cols], bits)
    (
        df.withColumn("zkey", zkey)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    meta = {"dim_cols": list(dim_cols), "bits": bits}
    with open(os.path.join(path, ZORDER_META_FILE), "w") as fh:
        json.dump(meta, fh)
    return meta


def read_zorder_meta(path: str) -> dict | None:
    """Sidecar written by the Z-order writers (None if absent)."""
    p = os.path.join(path, ZORDER_META_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def zorder_query_nd(
    spark: SparkSession,
    path: str,
    boxes: dict[str, tuple[int, int]],
    max_ranges: int = DEFAULT_MAX_RANGES,
) -> DataFrame:
    """Rows whose dims fall inside ``boxes`` (inclusive per-dim ranges)
    — key-range pushdown + exact refine over a ``write_zordered_nd``
    layout. Dims omitted from ``boxes`` are unconstrained. The planning
    grid comes from the layout's sidecar, so every stored row is inside
    the grid and clamping the query box to it is lossless.
    """
    meta = read_zorder_meta(path)
    if meta is None:
        raise ValueError(f"no {ZORDER_META_FILE} under {path}")
    dim_cols, bits = meta["dim_cols"], meta["bits"]
    unknown = set(boxes) - set(dim_cols)
    if unknown:
        raise ValueError(f"unknown zorder dims {sorted(unknown)}")
    grid_max = (1 << bits) - 1
    mins = [boxes.get(c, (0, grid_max))[0] for c in dim_cols]
    maxs = [boxes.get(c, (0, grid_max))[1] for c in dim_cols]
    ranges = decompose_box_nd(mins, maxs, bits, max_ranges)
    df = spark.read.parquet(path)
    pruned = apply_key_ranges(df, "zkey", ranges)
    pred = F.lit(True)
    for c, (lo, hi) in boxes.items():
        pred = pred & F.col(c).between(lo, hi)
    return pruned.filter(pred).drop("zkey")


# --------------------------------------------------------------------
# the events (user_id, hour) instantiation — 2-D fast path
# --------------------------------------------------------------------

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
) -> dict:
    """Materialize the (user_id, hour_idx) Z-ordered events layout via
    the generic n-dim writer — data-derived grid, validation, sidecar
    (so sf0.1's user_id 1499 widens the grid instead of silently
    falling outside the round-4 fixed 2^10 one). Returns the sidecar.
    """
    projected = zorder_events(events, base_hour).drop("zkey")
    return write_zordered_nd(
        projected, path, ["user_id", "hour_idx"], n_files=n_files
    )


def zorder_query(
    spark: SparkSession,
    path: str,
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
    bits: int | None = None,
    base_hour: int = BASE_HOUR,
) -> DataFrame:
    """Events of users in ``user_range`` within the absolute-hour
    ``hour_range`` — key-range pushdown + exact refine over the
    Z-ordered store. (event_id, user_id, hour_idx), hour_idx relative
    to ``base_hour``. The planning grid is read from the layout's
    sidecar; passing ``bits`` explicitly merely asserts it matches.
    """
    meta = read_zorder_meta(path)
    if meta is None:
        raise ValueError(f"no {ZORDER_META_FILE} under {path}")
    if bits is not None and bits != meta["bits"]:
        raise ValueError(
            f"bits={bits} does not match the layout's grid "
            f"(sidecar bits={meta['bits']})"
        )
    ulo, uhi = user_range
    hlo, hhi = hour_range[0] - base_hour, hour_range[1] - base_hour
    return zorder_query_nd(
        spark,
        path,
        {"user_id": (ulo, uhi), "hour_idx": (hlo, hhi)},
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


# --------------------------------------------------------------------
# 3-D instantiation: (user_id, hour_idx, event type code)
# --------------------------------------------------------------------

#: deterministic event_type -> small code mapping shared by the Spark
#: layout and the DuckDB oracle (alphabetical, stable)
EVENT_TYPE_CODES = {
    "click": 0,
    "error": 1,
    "purchase": 2,
    "signup": 3,
    "view": 4,
    # anything else -> 5 (open-world guard; still inside any grid)
}
_TYPE_CASE_SQL = (
    "CASE event_type "
    + " ".join(
        f"WHEN '{t}' THEN {c}" for t, c in sorted(EVENT_TYPE_CODES.items())
    )
    + " ELSE 5 END"
)


def _type_code_col() -> Column:
    expr = F.lit(5)
    for t, c in sorted(EVENT_TYPE_CODES.items(), reverse=True):
        expr = F.when(F.col("event_type") == t, c).otherwise(expr)
    return expr


def write_zordered_3d(
    events: DataFrame,
    path: str,
    n_files: int = 8,
    base_hour: int = BASE_HOUR,
) -> dict:
    """events Z-ordered on (user_id, hour_idx, type_code) — the
    lakehouse ``Z-ORDER BY (a, b, c)`` shape. Returns the sidecar."""
    hour = F.expr(f"unix_millis(ts) div {HOUR_MS}") - F.lit(base_hour)
    projected = events.select(
        "event_id",
        "user_id",
        hour.alias("hour_idx"),
        _type_code_col().alias("type_code"),
    )
    return write_zordered_nd(
        projected, path, ["user_id", "hour_idx", "type_code"],
        n_files=n_files,
    )


def zorder_query_3d(
    spark: SparkSession,
    path: str,
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
    types: Sequence[str],
    base_hour: int = BASE_HOUR,
) -> DataFrame:
    """Events matching user × absolute-hour × type — three-dimension
    pruning over one key column."""
    codes = sorted(EVENT_TYPE_CODES[t] for t in types)
    if codes != list(range(codes[0], codes[-1] + 1)):
        raise ValueError("types must map to a contiguous code range")
    hlo, hhi = hour_range[0] - base_hour, hour_range[1] - base_hour
    return zorder_query_nd(
        spark,
        path,
        {
            "user_id": user_range,
            "hour_idx": (hlo, hhi),
            "type_code": (codes[0], codes[-1]),
        },
    ).select("event_id", "user_id", "hour_idx", "type_code")


def zorder_query_3d_sql(
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
    types: Sequence[str],
    base_hour: int = BASE_HOUR,
) -> str:
    """Oracle: plain 3-predicate filter, same projection."""
    from ..sources.events import EV_CTE

    ulo, uhi = user_range
    hlo, hhi = hour_range[0] - base_hour, hour_range[1] - base_hour
    hour = f"(epoch_ms(ts) // {HOUR_MS} - {base_hour})"
    codes = sorted(EVENT_TYPE_CODES[t] for t in types)
    return f"""
{EV_CTE},
base AS (SELECT event_id, user_id, {hour} AS hour_idx,
                {_TYPE_CASE_SQL} AS type_code
         FROM ev)
SELECT event_id, user_id, hour_idx, type_code FROM base
WHERE user_id BETWEEN {ulo} AND {uhi}
  AND hour_idx BETWEEN {hlo} AND {hhi}
  AND type_code BETWEEN {codes[0]} AND {codes[-1]}
""".strip()
