"""Distributed sketch aggregations: KMV, HyperLogLog, Count-Min.

The reference has no approximate aggregation at all (SURVEY.md §2.5);
at 100 TB these sketches are how an analytics engine answers
distinct-count and heavy-hitter questions in one pass with bounded
state. Every sketch here is DETERMINISTIC and engine-independent:

- item hashing is the repo-standard 60-bit MD5 integer
  (``functions.hashing``), identical in Spark and DuckDB, so the
  oracle reproduces the *sketch state itself*, not just the answer;
- register/counter math stays in exact BIGINT arithmetic (power-of-two
  scaling instead of ``pow(2.0, -r)`` floats), so sums are
  order-independent and shuffle-safe;
- the only floating-point step is one final literal-times-integer
  division, which IEEE rounds identically everywhere.

Scale notes (local[32] now, 1000 executors later):

- KMV: the candidate set is pre-shrunk map-side by a partial
  ``min``-style aggregation (a distinct on (group, h)), then one
  per-group sort bounded by the group's distinct cardinality. k is
  tiny (64-1024); the whole reduced state is k longs per group.
- HLL: fixed 2^b registers per group — ONE partial-agg shuffle of at
  most groups x 2^b rows regardless of input size; this is the
  linear-scan/constant-state sketch you'd run on the full crawl.
- Count-Min: depth x width counters per group of interest; partial
  aggregation compresses each map task to at most depth x width rows.

Exact counterparts ride along in the same result row so the queries
are self-auditing (estimate vs truth) — at production scale you would
drop the exact column and keep the identical sketch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60_col, md5_int60_sql

POW2_60 = 1 << 60  # hash space size of the 60-bit MD5 integer


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct-count sketch
# ---------------------------------------------------------------------------


def kmv_distinct(
    events: DataFrame, k: int = 64, group: str = "event_type"
) -> DataFrame:
    """(group, exact_distinct, kmv_estimate) — distinct ``user_id``
    per group, estimated from the k smallest distinct hash values.
    ``exact_distinct`` counts the distinct hashes (collisions in the
    60-bit space are negligible and identical in both engines), so
    the row is a self-audit: estimate vs truth from one shared scan.

    Beyer et al. (SIGMOD'07) KMV estimator: with U the k-th smallest
    of n uniform hashes in [0, 2^60), E[n] ~= (k-1) * 2^60 / U. When a
    group has fewer than k distinct values the sketch degenerates to
    the exact count (every hash is kept).

    Plan: one distinct pre-aggregation on (group, h) — partial
    map-side combine shrinks each task to its local distinct set —
    then a per-group rank bounded by k. The rank sort is over the
    group's distinct hashes only; for extreme single-group
    cardinalities, a coarse prefilter ``h < t`` with t sized from any
    cardinality lower bound keeps the sorted set near k (not needed at
    bench scale, documented for the 100 TB path).
    """
    hashed = events.select(
        F.col(group),
        md5_int60_col(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy(group).orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    exact = hashed.groupBy(group).agg(
        F.count("*").alias("exact_distinct")
    )
    sk = kept.groupBy(group).agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth")
    )
    return (
        sk.join(exact, group)
        .select(
            F.col(group),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float(k - 1) * POW2_60) / F.col("kth"))
            .alias("kmv_estimate"),
        )
        .orderBy(group)
    )


def kmv_distinct_sql(k: int = 64, group: str = "event_type") -> str:
    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group}, {h} AS h FROM events),
ranked AS (
  SELECT {group}, h,
         row_number() OVER (PARTITION BY {group} ORDER BY h) AS rn
  FROM hashed),
agg AS (
  SELECT {group}, count(*) AS n_kept, max(h) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY {group}),
exact AS (
  SELECT {group}, count(*) AS exact_distinct FROM hashed GROUP BY {group})
SELECT a.{group}, CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       CASE WHEN a.n_kept < {k} THEN CAST(a.n_kept AS DOUBLE)
            ELSE {float(k - 1) * POW2_60!r} / a.kth END AS kmv_estimate
FROM agg a JOIN exact e USING ({group})
ORDER BY {group}
""".strip()


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    events: DataFrame, b: int = 10, group: str = "event_type"
) -> DataFrame:
    """(group, exact_distinct, hll_estimate, zero_registers) —
    HyperLogLog distinct ``user_id`` per group with m = 2^b registers.

    Register math is exact-integer: rho (1 + leading zeros of the
    low 60-b hash bits) is derived from bit length via ``bin()``
    (identical in Spark and DuckDB), and the harmonic-mean denominator
    sums 2^(W - rho) as BIGINT (W = 61-b, the max rho), so the only
    float op is the final literal/BIGINT division — bit-identical
    across engines. The small-range ``m ln(m/V)`` correction is
    deliberately omitted (ln is libm-dependent); ``zero_registers``
    is emitted so a client can apply it.

    Plan (ONE scan, r6): partial-dedup shuffle to distinct
    (group, user_id) pairs — needed for the exact audit anyway — then
    derive (idx, rho) per distinct user and fold to at most
    groups x m register rows carrying BOTH max(rho) and the
    per-register distinct-user count, whose per-group sum IS
    ``exact_distinct`` (registers partition the distinct users), so
    the exact audit costs no second scan and no join. Duplicate
    user_ids hash identically, so registers over distinct users equal
    registers over raw events. r4 shape (two full scans + join)
    retired after the r5->r6 bench adjudication.
    """
    m = 1 << b
    rest_bits = 60 - b
    w_max = rest_bits + 1  # rho when the low bits are all zero
    pairs = events.select(F.col(group), "user_id").distinct()
    h = md5_int60_col(F.col("user_id").cast("string"))
    idx = F.shiftright(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = F.when(rest == 0, F.lit(w_max)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    regs = (
        pairs.select(F.col(group), idx.alias("idx"), rho.alias("rho"))
        .groupBy(group, "idx")
        .agg(
            F.max("rho").alias("r"),
            F.count(F.lit(1)).cast("long").alias("users"),
        )
    )
    # exact 2^(W - r) in BIGINT: W = w_max, r in [1, w_max].
    # F.shiftleft only takes a python-int shift, so the column-shift
    # form goes through the SQL expression (still codegen'd).
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_max} - r)")
    per_group = regs.groupBy(group).agg(
        F.count("*").alias("present"),
        F.sum(scaled).alias("s_present"),
        F.sum("users").alias("exact_distinct"),
    )
    alpha = _hll_alpha(m)
    numer = float(alpha * m * m * (1 << w_max))
    zero = F.lit(m) - F.col("present")
    s_total = F.col("s_present") + zero.cast("long") * F.lit(1 << w_max)
    return per_group.select(
        F.col(group),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (F.lit(numer) / s_total).alias("hll_estimate"),
        zero.cast("long").alias("zero_registers"),
    ).orderBy(group)


def hll_distinct_sql(b: int = 10, group: str = "event_type") -> str:
    m = 1 << b
    rest_bits = 60 - b
    w_max = rest_bits + 1
    alpha = _hll_alpha(m)
    numer = float(alpha * m * m * (1 << w_max))
    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT {group}, {h} AS h, user_id FROM events),
rows_rho AS (
  SELECT {group}, h >> {rest_bits} AS idx,
         CASE WHEN (h & {(1 << rest_bits) - 1}) = 0 THEN {w_max}
              ELSE {rest_bits} - length(bin(h & {(1 << rest_bits) - 1})) + 1
         END AS rho
  FROM hashed),
regs AS (
  SELECT {group}, idx, max(rho) AS r FROM rows_rho GROUP BY {group}, idx),
per_group AS (
  SELECT {group}, count(*) AS present,
         sum(CAST(1 AS BIGINT) << ({w_max} - r)) AS s_present
  FROM regs GROUP BY {group}),
exact AS (
  SELECT {group}, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY {group})
SELECT g.{group}, CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       {numer!r} / (s_present + ({m} - present) * CAST({1 << w_max} AS BIGINT))
         AS hll_estimate,
       CAST({m} - present AS BIGINT) AS zero_registers
FROM per_group g JOIN exact e USING ({group})
ORDER BY {group}
""".strip()


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

CM_WIDTH = 256
CM_DEPTH = 3
CM_TOPN = 20


def cm_heavy_hitters(
    docs: DataFrame,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    top_n: int = CM_TOPN,
) -> DataFrame:
    """(token, exact_cnt, cm_estimate) — corpus-wide token counts of
    the top-``top_n`` tokens, alongside their Count-Min estimate from
    a depth x width sketch (Cormode & Muthukrishnan 2005).

    The sketch state is depth x width BIGINT counters built in ONE
    partial-agg pass over the exploded tokens (each map task emits at
    most depth x width partials); estimates are the min over depth
    rows — always >= the true count, integer-exact, order-independent.
    Candidate selection (the exact top-n, ties broken by token) uses a
    second agg on the same exploded scan; at 100 TB you would feed the
    sketch's own candidates or a prior vocabulary instead.
    """
    toks = docs.select(
        F.explode(
            F.split(F.trim(F.col("text")), "\\s+")
        ).alias("token")
    ).filter(F.col("token") != "")
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "token").limit(top_n)
    seeds = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("d")
    rows = toks.select("token", seeds).select(
        "d",
        (
            md5_int60_col(
                F.concat(F.col("token"), F.lit("#"), F.col("d"))
            )
            % width
        ).alias("bucket"),
    )
    sketch = rows.groupBy("d", "bucket").agg(F.count("*").alias("c"))
    probes = top.select("token", "exact_cnt", seeds).select(
        "token",
        "exact_cnt",
        "d",
        (
            md5_int60_col(
                F.concat(F.col("token"), F.lit("#"), F.col("d"))
            )
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "token",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("cm_estimate").cast("long").alias("cm_estimate"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


def cm_heavy_hitters_sql(
    width: int = CM_WIDTH, depth: int = CM_DEPTH, top_n: int = CM_TOPN
) -> str:
    h = md5_int60_sql("token || '#' || CAST(d AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
toks_f AS (SELECT token FROM toks WHERE token <> ''),
exact AS (
  SELECT token, count(*) AS exact_cnt FROM toks_f GROUP BY token),
top AS (
  SELECT token, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, token LIMIT {top_n}),
seeds AS (SELECT unnest(range({depth})) AS d),
rows_b AS (
  SELECT d, {h} % {width} AS bucket
  FROM toks_f CROSS JOIN seeds),
sketch AS (
  SELECT d, bucket, count(*) AS c FROM rows_b GROUP BY d, bucket),
probes AS (
  SELECT token, exact_cnt, d, {h} % {width} AS bucket
  FROM top CROSS JOIN seeds)
SELECT p.token, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(min(s.c) AS BIGINT) AS cm_estimate
FROM probes p JOIN sketch s USING (d, bucket)
GROUP BY p.token, p.exact_cnt
ORDER BY exact_cnt DESC, token
""".strip()


# ---------------------------------------------------------------------------
# Bloom-filter membership probe (approximate decontamination)
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # filter bits
BLOOM_K = 4  # hash functions per item


def bloom_probe_report(
    docs: DataFrame,
    m_bits: int = BLOOM_M,
    k_hashes: int = BLOOM_K,
) -> DataFrame:
    """(doc_id, n_shingles, n_bloom_hits, n_true_hits) — probe every
    corpus document's shingles against a Bloom filter built from the
    benchmark slice's shingles (same deterministic every-97th-doc
    benchmark as the exact decontamination pass).

    The approximate-membership counterpart to ``decontaminate``: the
    filter is ``m_bits`` of state TOTAL (vs the full benchmark
    shingle set), the price is false positives — ``n_bloom_hits >=
    n_true_hits`` always, and reporting both makes the false-positive
    rate auditable per document. Deterministic across engines: bit
    positions are md5-60bit(shingle + '#' + j) % m.

    Plan: the filter's occupied positions are a <= m_bits row set
    built once and BROADCAST; the corpus side fans each shingle to k
    position probes map-side, then one doc_id agg. The true-hit count
    rides on the same shuffle via the broadcast exact set (tiny by
    the eval-set-is-small contract)."""
    from .decontaminate import driver_benchmark
    from .dedup import shingles

    bench_sh = shingles(driver_benchmark(docs)).select("shingle").distinct()
    jidx = F.explode(
        F.array(*[F.lit(j) for j in range(k_hashes)])
    ).alias("j")
    positions = (
        bench_sh.select("shingle", jidx)
        .select(
            (
                md5_int60_col(
                    F.concat(F.col("shingle"), F.lit("#"), F.col("j"))
                )
                % m_bits
            ).alias("pos")
        )
        .distinct()
        .withColumn("set_bit", F.lit(1))
    )
    probes = (
        shingles(docs)
        .select("doc_id", "shingle", jidx)
        .select(
            "doc_id",
            "shingle",
            (
                md5_int60_col(
                    F.concat(F.col("shingle"), F.lit("#"), F.col("j"))
                )
                % m_bits
            ).alias("pos"),
        )
    )
    per_shingle = (
        probes.join(F.broadcast(positions), "pos", "left")
        .groupBy("doc_id", "shingle")
        .agg(
            (F.sum(F.coalesce(F.col("set_bit"), F.lit(0))) == k_hashes)
            .cast("int")
            .alias("bloom_hit")
        )
    )
    truth = bench_sh.withColumn("true_hit", F.lit(1))
    return (
        per_shingle.join(F.broadcast(truth), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("bloom_hit").cast("long").alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("true_hit"), F.lit(0)))
            .cast("long")
            .alias("n_true_hits"),
        )
        .filter(F.col("n_bloom_hits") > 0)
    )


def bloom_probe_report_sql(
    m_bits: int = BLOOM_M, k_hashes: int = BLOOM_K
) -> str:
    from .decontaminate import BENCH_MOD
    from .dedup import shingles_sql

    h = md5_int60_sql("shingle || '#' || CAST(j AS VARCHAR)")
    return f"""
WITH sh AS ({shingles_sql()}),
bench_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0),
seeds AS (SELECT unnest(range({k_hashes})) AS j),
positions AS (
  SELECT DISTINCT {h} % {m_bits} AS pos, 1 AS set_bit
  FROM bench_sh CROSS JOIN seeds),
probes AS (
  SELECT s.doc_id, s.shingle, {h} % {m_bits} AS pos
  FROM sh s CROSS JOIN seeds),
per_shingle AS (
  SELECT p.doc_id, p.shingle,
         CAST(sum(coalesce(f.set_bit, 0)) = {k_hashes} AS INT) AS bloom_hit
  FROM probes p LEFT JOIN positions f ON p.pos = f.pos
  GROUP BY p.doc_id, p.shingle),
truth AS (SELECT shingle, 1 AS true_hit FROM bench_sh)
SELECT ps.doc_id,
       count(*) AS n_shingles,
       CAST(sum(ps.bloom_hit) AS BIGINT) AS n_bloom_hits,
       CAST(sum(coalesce(t.true_hit, 0)) AS BIGINT) AS n_true_hits
FROM per_shingle ps LEFT JOIN truth t ON ps.shingle = t.shingle
GROUP BY ps.doc_id
HAVING sum(ps.bloom_hit) > 0
""".strip()


# ---------------------------------------------------------------------------
# equi-width histogram quantile sketch
# ---------------------------------------------------------------------------

HIST_BINS = 256


def quantile_sketch(
    events: DataFrame,
    bins: int = HIST_BINS,
    group: str = "event_type",
) -> DataFrame:
    """(group, n, p50_est, p50_exact, p95_est, p95_exact) — median and
    p95 of ``value`` per group, estimated from a ``bins``-bucket
    equi-width histogram next to the exact order statistics.

    The fixed-state quantile sketch (the poor man's t-digest: one
    (min, max) pre-pass + ``bins`` BIGINT counters per group, both
    single-pass partial aggs — at 100 TB the histogram costs two scans
    and O(groups x bins) state, while the exact audit costs a sort of
    ONLY the two target bins; shipping both makes the estimate's error
    visible). Estimates are bucket midpoints; exact order statistics
    use the ceil(p*n)-th smallest (value, event_id) — deterministic
    under ties. All estimator arithmetic is one fixed-shape double
    expression, so DuckDB hash-matches exactly.

    Plan (r6): the exact ranks use distributed two-phase selection:
    the cumulated histogram names the bin holding rank k and the count
    before it, and ONLY rows of the two target bins are ranked
    (row_number within (group, bin)), turning the former full
    per-group sort into a ~n/bins-row sort — the classic selection
    shape a 100 TB audit needs. The group stats ride through the
    histogram as grouping keys, so the plan holds exactly one
    broadcast of the tiny stats agg and one of the groups x bins
    histogram — no stats re-joins downstream.
    """
    from pyspark.sql import Window

    v = F.col("value").cast("double")

    def kq(p):
        return F.ceil(F.lit(p) * F.col("n").cast("double")).cast("long")

    stats = (
        events.groupBy(group)
        .agg(
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            group, "mn", "mx", "n",
            kq(0.5).alias("k50"), kq(0.95).alias("k95"),
        )
    )
    width = (F.col("mx") - F.col("mn")) / float(bins)
    bin_expr = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(bins - 1),
                F.greatest(F.lit(0), F.floor((v - F.col("mn")) / width)),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    keys = [group, "mn", "mx", "n", "k50", "k95"]
    binned = (
        events.join(F.broadcast(stats), group)
        .select(*keys, bin_expr.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy(group)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group)
    # target bin per rank + the cumulated count BEFORE it (histogram
    # rows are groups x bins — window passes over KB-scale data)
    targets = (
        binned.withColumn("cum", F.sum("c").over(wcum))
        .withColumn(
            "t50",
            F.min(F.when(F.col("cum") >= F.col("k50"), F.col("bin"))).over(
                wall
            ),
        )
        .withColumn(
            "t95",
            F.min(F.when(F.col("cum") >= F.col("k95"), F.col("bin"))).over(
                wall
            ),
        )
        .groupBy(*keys, "t50", "t95")
        .agg(
            F.max(
                F.when(F.col("bin") == F.col("t50"), F.col("cum") - F.col("c"))
            ).alias("cb50"),
            F.max(
                F.when(F.col("bin") == F.col("t95"), F.col("cum") - F.col("c"))
            ).alias("cb95"),
        )
    )
    # rank ONLY inside the two target bins; bin is monotone in value,
    # so the global ceil(p*n)-th (value, event_id) is the
    # (k - cum_before)-th within its bin under the same order
    wbin = Window.partitionBy(group, "bin").orderBy(
        F.col("val").asc(), F.col("event_id")
    )
    cand = (
        events.join(F.broadcast(targets), group)
        .select(
            *keys, "t50", "t95", "cb50", "cb95",
            v.alias("val"), F.col("event_id"), bin_expr.alias("bin"),
        )
        .filter(
            (F.col("bin") == F.col("t50")) | (F.col("bin") == F.col("t95"))
        )
        .withColumn("rn", F.row_number().over(wbin))
    )
    hit50 = (F.col("bin") == F.col("t50")) & (
        F.col("rn") == F.col("k50") - F.col("cb50")
    )
    hit95 = (F.col("bin") == F.col("t95")) & (
        F.col("rn") == F.col("k95") - F.col("cb95")
    )

    def est(b):
        return F.col("mn") + (F.col(b).cast("double") + 0.5) * (
            (F.col("mx") - F.col("mn")) / float(bins)
        )

    return (
        cand.groupBy(*keys, "t50", "t95")
        .agg(
            F.max(F.when(hit50, F.col("val"))).alias("p50_exact"),
            F.max(F.when(hit95, F.col("val"))).alias("p95_exact"),
        )
        .select(
            F.col(group),
            F.col("n"),
            est("t50").alias("p50_est"),
            "p50_exact",
            est("t95").alias("p95_est"),
            "p95_exact",
        )
        .orderBy(group)
    )


def quantile_sketch_sql(
    bins: int = HIST_BINS, group: str = "event_type"
) -> str:
    width = f"((mx - mn) / CAST({float(bins)!r} AS DOUBLE))"
    return f"""
WITH stats AS (
  SELECT {group}, min(CAST(value AS DOUBLE)) AS mn,
         max(CAST(value AS DOUBLE)) AS mx,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY {group}),
binned AS (
  SELECT e.{group},
         CAST(CASE WHEN s.mx > s.mn THEN
           least({bins - 1}, greatest(0,
             floor((CAST(e.value AS DOUBLE) - s.mn) / {width})))
         ELSE 0 END AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS c
  FROM events e JOIN stats s ON e.{group} = s.{group}
  GROUP BY 1, 2),
cum AS (
  SELECT {group}, bin, c,
         sum(c) OVER (PARTITION BY {group} ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM binned),
ks AS (
  SELECT {group}, mn, mx, n,
         CAST(ceil(CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT) AS k50,
         CAST(ceil(CAST(0.95 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT) AS k95
  FROM stats),
sel AS (
  SELECT c.{group}, k.mn, k.mx, k.n, k.k50, k.k95,
         min(CASE WHEN c.cum >= k.k50 THEN c.bin END) AS b50,
         min(CASE WHEN c.cum >= k.k95 THEN c.bin END) AS b95
  FROM cum c JOIN ks k ON c.{group} = k.{group}
  GROUP BY 1, 2, 3, 4, 5, 6),
ranked AS (
  SELECT {group}, CAST(value AS DOUBLE) AS val,
         row_number() OVER (PARTITION BY {group}
                            ORDER BY CAST(value AS DOUBLE), event_id) AS rn
  FROM events),
exact AS (
  SELECT r.{group},
         max(CASE WHEN r.rn = k.k50 THEN r.val END) AS p50_exact,
         max(CASE WHEN r.rn = k.k95 THEN r.val END) AS p95_exact
  FROM ranked r JOIN ks k ON r.{group} = k.{group}
  GROUP BY r.{group})
SELECT s.{group}, s.n,
       s.mn + (CAST(s.b50 AS DOUBLE) + 0.5) * {width} AS p50_est,
       e.p50_exact,
       s.mn + (CAST(s.b95 AS DOUBLE) + 0.5) * {width} AS p95_est,
       e.p95_exact
FROM sel s JOIN exact e ON s.{group} = e.{group}
ORDER BY s.{group}
""".strip()


# ---------------------------------------------------------------------------
# KMV set algebra: union / intersection estimates across groups
# ---------------------------------------------------------------------------


def kmv_set_ops(events: DataFrame, k: int = 64) -> DataFrame:
    """(type_a, type_b, union_exact, union_est, inter_exact, inter_est)
    for every event-type pair — distinct-user cardinalities of unions
    and intersections estimated purely FROM THE SKETCHES.

    This is the property that makes KMV the warehouse workhorse:
    sketches are MERGEABLE. |A∪B| is the KMV estimate of the k
    smallest hashes of S_A ∪ S_B, and |A∩B| follows from the Jaccard
    estimator (matches within the union's k-set) x the union estimate
    (Beyer et al., SIGMOD'07) — no second pass over the data. The
    exact counterparts ride along for self-audit; at 100 TB you'd
    keep only the sketch path, whose input is groups x k longs.

    Plan: ONE distinct pre-agg over (type, hash) builds every
    per-type sketch; everything after operates on <= types x k rows
    (broadcast-sized), so pair expansion is quadratic only in the
    NUMBER OF GROUPS, never in users.
    """
    from pyspark.sql import Window

    hashed = events.select(
        F.col("event_type").alias("t"),
        md5_int60_col(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    wt = Window.partitionBy("t").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= k)
        .select("t", "h")
    )
    # per-pair union of sketch slots, tagged by which side holds each
    ta = sk.select(F.col("t").alias("type_a"), F.col("h"))
    tb = sk.select(F.col("t").alias("type_b"), F.col("h"))
    types = sk.select("t").distinct()
    tpairs = (
        types.select(F.col("t").alias("type_a"))
        .crossJoin(types.select(F.col("t").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    slots = tpairs.join(ta, "type_a").select(
        "type_a", "type_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionByName(
        tpairs.join(tb, "type_b").select(
            "type_a", "type_b", "h",
            F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
        )
    )
    merged = slots.groupBy("type_a", "type_b", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    union_k = merged.withColumn("rn", F.row_number().over(wu)).filter(
        F.col("rn") <= k
    )
    est = union_k.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1) * POW2_60) / F.col("kth"))
    # exact side: distinct (type, user) membership
    mem = events.select("event_type", "user_id").distinct()
    ma = mem.select(
        F.col("event_type").alias("type_a"), F.col("user_id").alias("u")
    )
    mb = mem.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("u")
    )
    inter_exact = (
        ma.join(mb, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("inter_exact"))
    )
    sizes = mem.groupBy("event_type").agg(F.count("*").alias("sz"))
    union_exact = (
        tpairs.join(
            sizes.select(F.col("event_type").alias("type_a"), F.col("sz").alias("sa")),
            "type_a",
        )
        .join(
            sizes.select(F.col("event_type").alias("type_b"), F.col("sz").alias("sb")),
            "type_b",
        )
    )
    return (
        est.join(union_exact, ["type_a", "type_b"])
        .join(inter_exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            (
                F.col("sa") + F.col("sb")
                - F.coalesce(F.col("inter_exact"), F.lit(0))
            )
            .cast("long")
            .alias("union_exact"),
            union_est.alias("union_est"),
            F.coalesce(F.col("inter_exact"), F.lit(0))
            .cast("long")
            .alias("inter_exact"),
            (
                (F.col("n_both").cast("double") / F.col("n_kept").cast("double"))
                * union_est
            ).alias("inter_est"),
        )
        .orderBy("type_a", "type_b")
    )


def kmv_set_ops_sql(k: int = 64) -> str:
    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    lim = f"{float(k - 1) * POW2_60!r}"
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS t, {h} AS h FROM events),
sk AS (
  SELECT t, h FROM (
    SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
    FROM hashed) WHERE rn <= {k}),
types AS (SELECT DISTINCT t FROM sk),
tpairs AS (
  SELECT x.t AS type_a, y.t AS type_b
  FROM types x JOIN types y ON x.t < y.t),
slots AS (
  SELECT p.type_a, p.type_b, s.h, 1 AS in_a, 0 AS in_b
  FROM tpairs p JOIN sk s ON s.t = p.type_a
  UNION ALL
  SELECT p.type_a, p.type_b, s.h, 0 AS in_a, 1 AS in_b
  FROM tpairs p JOIN sk s ON s.t = p.type_b),
merged AS (
  SELECT type_a, type_b, h, max(in_a) AS in_a, max(in_b) AS in_b
  FROM slots GROUP BY 1, 2, 3),
union_k AS (
  SELECT * FROM (
    SELECT type_a, type_b, h, in_a, in_b,
           row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
    FROM merged) WHERE rn <= {k}),
est AS (
  SELECT type_a, type_b, count(*) AS n_kept, max(h) AS kth,
         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
  FROM union_k GROUP BY 1, 2),
mem AS (SELECT DISTINCT event_type, user_id FROM events),
inter_e AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS inter_exact
  FROM mem a JOIN mem b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
sizes AS (SELECT event_type, count(*) AS sz FROM mem GROUP BY 1)
SELECT e.type_a, e.type_b,
       CAST(sa.sz + sb.sz - coalesce(i.inter_exact, 0) AS BIGINT)
         AS union_exact,
       CASE WHEN e.n_kept < {k} THEN CAST(e.n_kept AS DOUBLE)
            ELSE {lim} / e.kth END AS union_est,
       CAST(coalesce(i.inter_exact, 0) AS BIGINT) AS inter_exact,
       (CAST(e.n_both AS DOUBLE) / CAST(e.n_kept AS DOUBLE))
         * (CASE WHEN e.n_kept < {k} THEN CAST(e.n_kept AS DOUBLE)
                 ELSE {lim} / e.kth END) AS inter_est
FROM est e
JOIN sizes sa ON sa.event_type = e.type_a
JOIN sizes sb ON sb.event_type = e.type_b
LEFT JOIN inter_e i ON i.type_a = e.type_a AND i.type_b = e.type_b
ORDER BY e.type_a, e.type_b
""".strip()


# ---------------------------------------------------------------------------
# windowed HLL: distinct-count sketch per (group, time window)
# ---------------------------------------------------------------------------

HLL_WINDOW_MS = 6 * 3_600_000


def hll_distinct_windowed(
    events: DataFrame,
    b: int = 10,
    window_ms: int = HLL_WINDOW_MS,
    group: str = "event_type",
) -> DataFrame:
    """(group, window_start_ms, exact_distinct, hll_estimate) — the
    HLL distinct-user sketch per tumbling time window: the shape every
    metrics pipeline materializes ("unique users per type per 6h").

    Same exact-integer register math as :func:`hll_distinct`, keyed by
    (group, window); state is groups x windows x 2^b register rows —
    the window dimension grows with TIME, not event volume, so a year
    of 100 TB events still reduces to a small rollup table. Windows
    are derived by integer division (engine-identical, no timezone
    arithmetic)."""
    m = 1 << b
    rest_bits = 60 - b
    w_max = rest_bits + 1
    h = md5_int60_col(F.col("user_id").cast("string"))
    idx = F.shiftright(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = F.when(rest == 0, F.lit(w_max)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    win = F.expr(f"unix_millis(ts) div {window_ms}") * F.lit(window_ms)
    base = events.select(
        F.col(group),
        win.alias("window_start_ms"),
        idx.alias("idx"),
        rho.alias("rho"),
        F.col("user_id"),
    )
    regs = base.groupBy(group, "window_start_ms", "idx").agg(
        F.max("rho").alias("r")
    )
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_max} - r)")
    per_win = regs.groupBy(group, "window_start_ms").agg(
        F.count("*").alias("present"), F.sum(scaled).alias("s_present")
    )
    numer = float(_hll_alpha(m) * m * m * (1 << w_max))
    zero = F.lit(m) - F.col("present")
    s_total = F.col("s_present") + zero.cast("long") * F.lit(1 << w_max)
    exact = base.groupBy(group, "window_start_ms").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        per_win.join(exact, [group, "window_start_ms"])
        .select(
            F.col(group),
            "window_start_ms",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (F.lit(numer) / s_total).alias("hll_estimate"),
        )
        .orderBy(group, "window_start_ms")
    )


def hll_distinct_windowed_sql(
    b: int = 10, window_ms: int = HLL_WINDOW_MS, group: str = "event_type"
) -> str:
    m = 1 << b
    rest_bits = 60 - b
    w_max = rest_bits + 1
    numer = float(_hll_alpha(m) * m * m * (1 << w_max))
    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH ev0 AS (
  SELECT {group}, user_id,
         (epoch_ms(ts) // {window_ms}) * {window_ms} AS window_start_ms,
         {h} AS h
  FROM events),
rows_rho AS (
  SELECT {group}, window_start_ms, user_id, h >> {rest_bits} AS idx,
         CASE WHEN (h & {(1 << rest_bits) - 1}) = 0 THEN {w_max}
              ELSE {rest_bits} - length(bin(h & {(1 << rest_bits) - 1})) + 1
         END AS rho
  FROM ev0),
regs AS (
  SELECT {group}, window_start_ms, idx, max(rho) AS r
  FROM rows_rho GROUP BY 1, 2, 3),
per_win AS (
  SELECT {group}, window_start_ms, count(*) AS present,
         sum(CAST(1 AS BIGINT) << ({w_max} - r)) AS s_present
  FROM regs GROUP BY 1, 2),
exact AS (
  SELECT {group}, window_start_ms,
         count(DISTINCT user_id) AS exact_distinct
  FROM rows_rho GROUP BY 1, 2)
SELECT p.{group}, p.window_start_ms,
       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       {numer!r} / (p.s_present
         + ({m} - p.present) * CAST({1 << w_max} AS BIGINT)) AS hll_estimate
FROM per_win p JOIN exact e
  ON p.{group} = e.{group} AND p.window_start_ms = e.window_start_ms
ORDER BY p.{group}, p.window_start_ms
""".strip()


def kmv_distinct_windowed(
    events: DataFrame,
    k: int = 64,
    window_ms: int = HLL_WINDOW_MS,
    group: str = "event_type",
) -> DataFrame:
    """(group, window_start_ms, exact_floor, kmv_estimate) — the KMV
    distinct-user sketch per tumbling time window (the windowed HLL's
    order-statistics sibling; pick KMV when set algebra over windows
    is next).

    Same estimator as :func:`kmv_distinct`, keyed by (group, window):
    one distinct pre-aggregation on (group, window, h) — map-side
    combine shrinks each task to its local distinct set — then the
    per-key rank bounded by k. State is groups x windows x k longs;
    the window dimension grows with time, not event volume."""
    win = F.expr(f"unix_millis(ts) div {window_ms}") * F.lit(window_ms)
    hashed = events.select(
        F.col(group),
        win.alias("window_start_ms"),
        md5_int60_col(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy(group, "window_start_ms").orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    sk = kept.groupBy(group, "window_start_ms").agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth")
    )
    return sk.select(
        F.col(group),
        "window_start_ms",
        F.col("n_kept").cast("long").alias("exact_floor"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1) * POW2_60) / F.col("kth"))
        .alias("kmv_estimate"),
    ).orderBy(group, "window_start_ms")


def kmv_distinct_windowed_sql(
    k: int = 64,
    window_ms: int = HLL_WINDOW_MS,
    group: str = "event_type",
) -> str:
    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group},
         (epoch_ms(ts) // {window_ms}) * {window_ms} AS window_start_ms,
         {h} AS h
  FROM events),
ranked AS (
  SELECT {group}, window_start_ms, h,
         row_number() OVER (PARTITION BY {group}, window_start_ms
                            ORDER BY h) AS rn
  FROM hashed),
agg AS (
  SELECT {group}, window_start_ms,
         count(*) AS n_kept, max(h) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY 1, 2)
SELECT {group}, window_start_ms,
       CAST(n_kept AS BIGINT) AS exact_floor,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(k - 1) * POW2_60!r} / kth END AS kmv_estimate
FROM agg
ORDER BY {group}, window_start_ms
""".strip()
