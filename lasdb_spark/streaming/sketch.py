"""Streaming mergeable state: HLL and KMV sketches + CDC snapshots.

Each operator here is a batch operator's streaming twin whose state
fold is COMMUTATIVE and IDEMPOTENT (HLL register max-merge, KMV
k-smallest min-merge, CDC latest-wins max-by-(ms, seq)) — so the
continuously-maintained answer equals the batch computation over
everything seen so far, regardless of micro-batch boundaries or
arrival order, and the converge-to-batch tests assert EXACT equality.

The HLL below: per event type, a fixed 2^b-register sketch folds every
micro-batch into ``applyInPandasWithState`` state and emits the
refreshed estimate.

Why this is THE streaming cardinality design: register folding is a
max-merge — commutative, associative, idempotent — so the continuously
maintained state equals the batch sketch over everything seen so far
REGARDLESS of micro-batch boundaries or arrival order (the
converge-to-batch test asserts exact equality, estimate included).
State per group is 2^b small ints (1 KB at b=10), the inherent floor
for cardinality tracking; there is no per-item state, unlike streaming
exact dedup.

Hashing matches the batch/oracle 60-bit MD5 exactly (same hex-prefix
integer), so a stream fold and a batch scan of the same rows yield the
identical registers and the identical IEEE-754 estimate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import _hll_alpha

HLL_B = 10
_OUT_SCHEMA = (
    "event_type string, hll_estimate double, "
    "present long, zero_registers long, n_seen long"
)
_STATE_SCHEMA = "regs array<int>, n long"


def _md5_int60(s: str) -> int:
    """Python twin of functions.hashing.md5_int60_col (15 hex = 60 bits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hll_fold(b: int):
    m = 1 << b
    rest_bits = 60 - b
    w_max = rest_bits + 1
    mask = (1 << rest_bits) - 1
    numer = float(_hll_alpha(m) * m * m * (1 << w_max))

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs, n = list(state.get[0]), state.get[1]
        else:
            regs, n = [0] * m, 0
        for pdf in pdfs:
            n += len(pdf)
            for uid in pdf["user_id"]:
                h = _md5_int60(str(uid))
                idx = h >> rest_bits
                rest = h & mask
                rho = w_max if rest == 0 else rest_bits - rest.bit_length() + 1
                if rho > regs[idx]:
                    regs[idx] = rho
        state.update((regs, n))
        # identical integer-scaled harmonic mean as the batch op:
        # S = Σ 2^(W - r) with absent registers contributing 2^W
        s_total = sum(1 << (w_max - r) for r in regs)
        present = sum(1 for r in regs if r > 0)
        # n_seen (rows folded so far) strictly grows per emission, so a
        # sink can identify each key's LATEST emission without relying
        # on row order — the drained-final contract
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "hll_estimate": [numer / s_total],
                "present": [present],
                "zero_registers": [m - present],
                "n_seen": [n],
            }
        )

    return fold


def stream_hll_distinct(event_stream: DataFrame, b: int = HLL_B) -> DataFrame:
    """Continuously-maintained distinct-user estimate per event type.

    One stateful shuffle on event_type; per-batch work is the rows in
    the batch (register fold is O(1) per row). The per-row Python loop
    lives inside the Arrow-batched state fold — the documented pattern
    for custom streaming state (same as the streaming dedup keeper),
    not a hot-path scalar UDF."""
    return event_stream.select("event_type", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _hll_fold(b),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming CDC: continuously-maintained latest-wins profile table
# ---------------------------------------------------------------------------

_CDC_OUT_SCHEMA = (
    "user_id long, op string, last_type string, last_value double, "
    "last_ms long, last_seq long, n_changes long"
)
#: (ms, seq, op, type, value, n) of the current winner per key
_CDC_STATE_SCHEMA = (
    "ms long, seq long, op string, last_type string, "
    "last_value double, n long"
)


def _cdc_fold(
    key: tuple, pdfs, state: GroupState
):
    import pandas as pd  # local: executors import lazily

    if state.exists:
        ms, seq, op, ltype, lval, n = state.get
    else:
        ms = seq = None
        op = ltype = None
        lval = None
        n = 0
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            n += 1
            cand = (int(row.ms), int(row.seq))
            if ms is None or cand > (ms, seq):
                ms, seq = cand
                op = row.op
                ltype = row.last_type
                lval = float(row.last_value)
    state.update((ms, seq, op, ltype, lval, n))
    # a winning delete emits a TOMBSTONE (op='D', null payload) so an
    # update-mode sink can retract a row this key emitted in an earlier
    # micro-batch — without it the sink keeps the stale update forever
    # (round-4 ADVICE fix)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "op": [op],
            "last_type": [ltype if op == "U" else None],
            "last_value": [lval if op == "U" else None],
            "last_ms": [ms],
            "last_seq": [seq],
            "n_changes": [n],
        }
    )


def stream_cdc_snapshot(event_stream: DataFrame) -> DataFrame:
    """Continuously-maintained latest-wins profile table — the
    streaming twin of ``operators.relational.cdc_snapshot``: each
    micro-batch folds into one (winner, count) state row per key, so
    state is O(keys) regardless of stream length, and because
    max-by-(ms, seq) is a commutative idempotent merge the drained
    stream equals the batch snapshot EXACTLY (converge tests, single-
    AND multi-micro-batch), like the streaming HLL above.

    Every touched key emits each batch: ``op='U'`` rows carry the
    winner (batch-snapshot shaped, incl. last_seq), ``op='D'`` rows
    are tombstones instructing the sink to retract the key."""
    from ..operators.relational import _cdc_changes

    return _cdc_changes(event_stream).groupBy("key").applyInPandasWithState(
        _cdc_fold,
        outputStructType=_CDC_OUT_SCHEMA,
        stateStructType=_CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming KMV: continuously-maintained k-minimum-values sketch
# ---------------------------------------------------------------------------

_KMV_OUT_SCHEMA = (
    "event_type string, exact_floor long, kmv_estimate double, n_seen long"
)
_KMV_STATE_SCHEMA = "hashes array<long>, n long"
KMV_K = 64


def _kmv_fold(k: int):
    pow2_60 = 1 << 60
    scale = float(k - 1) * pow2_60

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            kept, n = sorted(state.get[0]), state.get[1]
        else:
            kept, n = [], 0
        seen = set(kept)
        for pdf in pdfs:
            n += len(pdf)
            for uid in pdf["user_id"]:
                h = _md5_int60(str(uid))
                if h in seen:
                    continue
                if len(kept) < k:
                    kept.append(h)
                    kept.sort()
                    seen.add(h)
                elif h < kept[-1]:
                    seen.discard(kept[-1])
                    kept[-1] = h
                    kept.sort()
                    seen.add(h)
        state.update((kept, n))
        est = float(len(kept)) if len(kept) < k else scale / kept[-1]
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "exact_floor": [len(kept)],
                "kmv_estimate": [est],
                "n_seen": [n],
            }
        )

    return fold


def stream_kmv_distinct(
    event_stream: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Continuously-maintained KMV distinct-count sketch per event
    type — state is the k smallest distinct hashes (k longs), folded
    with a min-merge that is commutative and idempotent, so the
    drained stream's estimate equals the batch
    ``operators.sketch.kmv_distinct`` EXACTLY (same k-set, same one
    IEEE division — converge test). ``exact_floor`` is the sketch
    size (= the exact count while below k)."""
    return event_stream.select("event_type", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _kmv_fold(k),
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# drained-stream final state + oracle twins (driver-checkable entries)
# ---------------------------------------------------------------------------


def drained_final(spark, table: str, key_cols, counter: str = "n_seen"):
    """Per key, the LATEST emission in a drained update-mode memory
    sink. ``counter`` strictly grows per key per micro-batch (n_seen /
    n_docs / n_changes), so the max-counter row IS the final state —
    no reliance on sink row order. This is exactly how a real
    update-mode consumer (e.g. a key-value store) ends up holding the
    last write per key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(F.col(counter).desc())
    return (
        spark.table(table)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_hll_sql(b: int = HLL_B) -> str:
    """Oracle of the DRAINED streaming HLL: identical registers and
    estimate as a batch scan of the same rows (the fold is a
    commutative idempotent register max-merge), plus n_seen =
    rows-per-group."""
    from ..functions.hashing import md5_int60_sql
    from ..operators.sketch import _hll_alpha

    m = 1 << b
    rest_bits = 60 - b
    w_max = rest_bits + 1
    mask = (1 << rest_bits) - 1
    numer = float(_hll_alpha(m) * m * m * (1 << w_max))
    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH rows_rho AS (
  SELECT event_type, h >> {rest_bits} AS idx,
         CASE WHEN (h & {mask}) = 0 THEN {w_max}
              ELSE {rest_bits} - length(bin(h & {mask})) + 1 END AS rho
  FROM (SELECT event_type, {h} AS h FROM events)),
regs AS (
  SELECT event_type, idx, max(rho) AS r FROM rows_rho GROUP BY 1, 2),
pg AS (
  SELECT event_type, count(*) AS present,
         sum(CAST(1 AS BIGINT) << ({w_max} - r)) AS s_present
  FROM regs GROUP BY 1),
cnt AS (SELECT event_type, count(*) AS n_seen FROM events GROUP BY 1)
SELECT p.event_type,
       {numer!r} / (p.s_present
         + ({m} - p.present) * CAST({1 << w_max} AS BIGINT))
         AS hll_estimate,
       CAST(p.present AS BIGINT) AS present,
       CAST({m} - p.present AS BIGINT) AS zero_registers,
       CAST(c.n_seen AS BIGINT) AS n_seen
FROM pg p JOIN cnt c USING (event_type)
ORDER BY p.event_type
""".strip()


def stream_kmv_sql(k: int = KMV_K) -> str:
    """Oracle of the DRAINED streaming KMV: the k-smallest distinct
    hashes are order-independent, so the drained sketch equals the
    batch ranked-scan exactly (same k-set, same one IEEE division)."""
    from ..functions.hashing import md5_int60_sql

    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    scale = float(k - 1) * (1 << 60)
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {h} AS h FROM events),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed),
agg AS (
  SELECT event_type, count(*) AS n_kept, max(h) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY event_type),
cnt AS (SELECT event_type, count(*) AS n_seen FROM events GROUP BY 1)
SELECT a.event_type, CAST(a.n_kept AS BIGINT) AS exact_floor,
       CASE WHEN a.n_kept < {k} THEN CAST(a.n_kept AS DOUBLE)
            ELSE {scale!r} / a.kth END AS kmv_estimate,
       CAST(c.n_seen AS BIGINT) AS n_seen
FROM agg a JOIN cnt c USING (event_type)
ORDER BY a.event_type
""".strip()


# ---------------------------------------------------------------------------
# streaming quantiles: fixed-grid value histogram (r6)
# ---------------------------------------------------------------------------

QGRID = 1.0  # value-domain bucket width

_Q_OUT_SCHEMA = (
    "event_type string, p50_est double, p95_est double, "
    "n_buckets long, n_seen long"
)
_Q_STATE_SCHEMA = "buckets array<long>, counts array<long>, n long"


def _quantile_fold(grid: float):
    import math

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hist = dict(zip(state.get[0], state.get[1]))
            n = state.get[2]
        else:
            hist, n = {}, 0
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["value"]:
                b = math.floor(float(v) / grid)
                hist[b] = hist.get(b, 0) + 1
        items = sorted(hist.items())
        state.update(
            ([b for b, _ in items], [c for _, c in items], n)
        )
        # exact rank selection on the quantized grid — the same
        # ceil(p*n)-th-smallest contract as the batch quantile sketch
        k50 = math.ceil(0.5 * n)
        k95 = math.ceil(0.95 * n)
        cum = 0
        b50 = b95 = None
        for b, c in items:
            cum += c
            if b50 is None and cum >= k50:
                b50 = b
            if b95 is None and cum >= k95:
                b95 = b
                break
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "p50_est": [(b50 + 0.5) * grid],
                "p95_est": [(b95 + 0.5) * grid],
                "n_buckets": [len(items)],
                "n_seen": [n],
            }
        )

    return fold


def stream_value_quantiles(
    event_stream: DataFrame, grid: float = QGRID
) -> DataFrame:
    """Continuously-maintained p50/p95 of ``value`` per event type on
    a FIXED bucket grid (bucket = floor(value / grid), estimate = the
    midpoint of the ceil(p·n)-th-smallest bucket).

    Why fixed-grid: bucket counts are a plain additive merge —
    commutative and micro-batch-boundary-independent — so the drained
    answer equals the batch computation over the same rows EXACTLY
    (the converge-to-batch bar every operator in this module meets).
    An equi-width histogram keyed on evolving (min, max) — the batch
    sketch's shape — could not converge: early batches would bin on a
    different grid than late ones. State per group is bounded by the
    VALUE DOMAIN (distinct occupied buckets), not the stream volume —
    the monitoring-percentile design for an unbounded event feed."""
    return event_stream.select("event_type", "value").groupBy(
        "event_type"
    ).applyInPandasWithState(
        _quantile_fold(grid),
        outputStructType=_Q_OUT_SCHEMA,
        stateStructType=_Q_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_quantiles_sql(grid: float = QGRID) -> str:
    """Oracle of the DRAINED streaming quantiles: identical fixed-grid
    histogram + rank selection over the batch table."""
    return f"""
WITH hist AS (
  SELECT event_type, CAST(floor(value / {grid!r}) AS BIGINT) AS bk,
         count(*) AS c
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, bk, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY bk) AS cm
  FROM hist),
cnt AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
sel AS (
  SELECT h.event_type, max(c.n) AS n, count(*) AS n_buckets,
         min(CASE WHEN h.cm >= CAST(ceil(0.5 * CAST(c.n AS DOUBLE)) AS BIGINT)
             THEN h.bk END) AS b50,
         min(CASE WHEN h.cm >= CAST(ceil(0.95 * CAST(c.n AS DOUBLE)) AS BIGINT)
             THEN h.bk END) AS b95
  FROM cum h JOIN cnt c USING (event_type) GROUP BY 1)
SELECT event_type,
       (CAST(b50 AS DOUBLE) + 0.5) * {grid!r} AS p50_est,
       (CAST(b95 AS DOUBLE) + 0.5) * {grid!r} AS p95_est,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(n AS BIGINT) AS n_seen
FROM sel ORDER BY event_type
""".strip()


# ---------------------------------------------------------------------------
# streaming Count-Min sketch + heavy-hitter probe report (r7)
# ---------------------------------------------------------------------------

CMS_WIDTH = 256
CMS_DEPTH = 3

_CM_OUT_SCHEMA = "d integer, counters array<long>, n_seen long"
_CM_STATE_SCHEMA = "counters array<long>, n long"


def _cm_fold(width: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counters, n = list(state.get[0]), state.get[1]
        else:
            counters, n = [0] * width, 0
        for pdf in pdfs:
            n += len(pdf)
            for b in pdf["bucket"]:
                counters[int(b)] += 1
        state.update((counters, n))
        yield pd.DataFrame(
            {"d": [key[0]], "counters": [counters], "n_seen": [n]}
        )

    return fold


def stream_cm_counts(
    event_stream: DataFrame, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """Continuously-maintained Count-Min sketch of event-type
    frequencies: one stateful group per sketch ROW (depth groups),
    each holding ``width`` BIGINT counters. Counter increments are
    additive — commutative AND associative — so the drained sketch
    equals the batch sketch built from the same rows EXACTLY,
    regardless of micro-batch boundaries.

    Scale: state is depth x width longs TOTAL (a few KB, independent
    of stream volume); the per-row hash + bucket computation happens
    NATIVELY before the stateful shuffle, so the Python fold only
    increments counters inside Arrow batches (the sanctioned custom-
    state surface). The depth-way fan-out multiplies stream volume by
    depth (3) on the map side only."""
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_int60_col

    seeds = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("d")
    rows = event_stream.select(F.col("event_type"), seeds).select(
        F.col("d").cast("int").alias("d"),
        (
            md5_int60_col(
                F.concat(F.col("event_type"), F.lit("#"), F.col("d"))
            )
            % width
        ).cast("long").alias("bucket"),
    )
    return rows.groupBy("d").applyInPandasWithState(
        _cm_fold(width),
        outputStructType=_CM_OUT_SCHEMA,
        stateStructType=_CM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cm_probe_report(
    drained: DataFrame,
    events: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """(event_type, exact_cnt, cm_estimate) — probe the drained
    streaming sketch for every observed key and audit against exact
    counts (estimate >= truth always; equality when no bucket
    collisions). The sketch rows are 3 tiny array rows — broadcast;
    the exact side is one partial-agg groupBy."""
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_int60_col

    exact = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    seeds = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("d")
    probes = exact.select("event_type", "exact_cnt", seeds).select(
        "event_type",
        "exact_cnt",
        F.col("d").cast("int").alias("d"),
        (
            (
                md5_int60_col(
                    F.concat(F.col("event_type"), F.lit("#"), F.col("d"))
                )
                % width
            )
            + 1
        ).cast("int").alias("idx"),
    )
    j = probes.join(
        F.broadcast(drained.select("d", "counters")), "d"
    ).select(
        "event_type",
        "exact_cnt",
        F.element_at(F.col("counters"), F.col("idx")).alias("c"),
    )
    return (
        j.groupBy("event_type", "exact_cnt")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "event_type",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("cm_estimate").cast("long").alias("cm_estimate"),
        )
    )


def stream_cm_sql(width: int = CMS_WIDTH, depth: int = CMS_DEPTH) -> str:
    """Oracle of the DRAINED streaming Count-Min probe report: the
    fold is additive, so the drained counters equal one batch
    bucket-count pass over the same rows."""
    from ..functions.hashing import md5_int60_sql

    h = md5_int60_sql("event_type || '#' || CAST(d AS VARCHAR)")
    return f"""
WITH seeds AS (
  SELECT unnest(generate_series(0, {depth - 1})) AS d),
rows AS (
  SELECT d, {h} % {width} AS bucket
  FROM events CROSS JOIN seeds),
sketch AS (
  SELECT d, bucket, count(*) AS c FROM rows GROUP BY 1, 2),
exact AS (
  SELECT event_type, count(*) AS exact_cnt FROM events GROUP BY 1),
probes AS (
  SELECT event_type, exact_cnt, d, {h} % {width} AS bucket
  FROM exact CROSS JOIN seeds)
SELECT event_type, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(min(c) AS BIGINT) AS cm_estimate
FROM probes JOIN sketch USING (d, bucket)
GROUP BY 1, 2
""".strip()
