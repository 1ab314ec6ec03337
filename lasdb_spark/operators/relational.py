"""General relational/analytical operators (Spark-free extras).

The reference has no general relational algebra (SURVEY §2.5) — Spark
SQL provides it natively. These operators exercise the surfaces a
production engine needs (agg, joins, windows, sessionization, as-of
join, JSON extraction) with DuckDB-oracle parity, and document the
scale pattern for each.

Float-determinism: double sums depend on partition order in Spark, so
money-like aggregates are summed as DECIMAL (exact, order-independent)
and cast back to DOUBLE only at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lasdb_spark.sources.events import EV_CTE

SESSION_GAP_MIN = 30


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q1-shaped aggregation: exact decimal sums per flag/status.

    Scale: classic partial-agg + one shuffle on the 6-group key."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem GROUP BY 1, 2
""".strip()


def revenue_by_nation(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """3-way join + agg: revenue per nation.

    Scale: nation (25 rows, constant) is broadcast unconditionally;
    customer GROWS with SF (150k rows/SF), so its join strategy is left
    to AQE — at small SF it broadcasts anyway, at 100 TB a forced hint
    would OOM the executors."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def revenue_by_nation_sql() -> str:
    return """
SELECT n_name,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
""".strip()


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via ranking window (no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def top_orders_per_customer_sql(k: int = 3) -> str:
    return f"""
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
  FROM orders) WHERE rk <= {k}
""".strip()


def sessionize_events(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Sessionization: per-user sessions split on >gap_min idle gaps.

    lag + cumulative-sum-of-gap-flags — one shuffle on user_id; the
    same logic streams via session_window/applyInPandasWithState
    (lasdb_spark.streaming). Timestamps exported as epoch millis for
    cross-engine comparison."""
    gap_ms = gap_min * 60 * 1000
    ms = F.unix_millis(F.col("ts"))
    # order by the SAME (ms, event_id) key both engines use — ordering
    # by full-precision ts here but truncated ms in the oracle could
    # disagree within a millisecond
    w = Window.partitionBy("user_id").orderBy(ms, "event_id")
    new_sess = F.when(
        ms - F.lag(ms).over(w) > gap_ms, 1
    ).otherwise(0)
    with_sess = events.withColumn(
        "session_id", F.sum(new_sess).over(w).cast("int")
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ms).alias("t_start_ms"),
        F.max(ms).alias("t_end_ms"),
    )


def sessionize_events_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    gap_ms = gap_min * 60 * 1000
    return f"""
{EV_CTE},
g AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
         (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > {gap_ms}
         THEN 1 ELSE 0 END AS new_sess
  FROM ev),
s AS (
  SELECT user_id, event_id, ms,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
         ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
  FROM g)
SELECT user_id, session_id, count(*) AS n_events,
       min(ms) AS t_start_ms, max(ms) AS t_end_ms
FROM s GROUP BY 1, 2
""".strip()


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling-hour rollup (batch twin of the streaming windowed agg).

    Exact decimal sum for determinism; hour bucket as epoch millis."""
    hour_ms = F.unix_millis(F.date_trunc("hour", F.col("ts")))
    return events.groupBy(
        hour_ms.alias("hour_ms"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


def hourly_event_rollup_sql() -> str:
    return f"""
{EV_CTE}
SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM ev GROUP BY 1, 2
""".strip()


def user_retention(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_users) — classic cohort-retention
    triangle: users grouped by their first active day (epoch days),
    counted on each later active day.

    Spark-first shape: ONE shuffle on user_id builds the per-user
    distinct-day set (collect_set combines map-side, and the set is
    bounded by the retention window — days, not events); the cohort
    day is array_min of that set, offsets explode from the same array,
    so no second shuffle and no self-join against a cohort table. The
    final (cohort, offset) agg is a second small shuffle over
    triangle-sized data. Pure integer day arithmetic — deterministic
    and timezone-independent (epoch-millis div)."""
    day = F.expr("unix_millis(ts) div 86400000")
    per_user = (
        events.select("user_id", day.alias("day_num"))
        .groupBy("user_id")
        .agg(F.collect_set("day_num").alias("days"))
    )
    ret = per_user.select(
        F.array_min("days").alias("cohort_day"),
        F.explode("days").alias("day_num"),
    )
    return ret.groupBy(
        "cohort_day",
        (F.col("day_num") - F.col("cohort_day")).cast("int").alias(
            "day_offset"
        ),
    ).agg(F.count(F.lit(1)).alias("n_users"))


def user_retention_sql() -> str:
    """Oracle twin — the relational (distinct + self-join) phrasing;
    values are exact integers so the shapes agree bit-for-bit."""
    return f"""
{EV_CTE},
evd AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day_num FROM ev),
cohort AS (SELECT user_id, min(day_num) AS cohort_day FROM evd GROUP BY 1)
SELECT cohort.cohort_day,
       CAST(evd.day_num - cohort.cohort_day AS INT) AS day_offset,
       count(*) AS n_users
FROM evd JOIN cohort USING (user_id) GROUP BY 1, 2
""".strip()


def asof_error_to_click(events: DataFrame) -> DataFrame:
    """As-of join (Spark has no native one): for each 'error' event,
    the most recent preceding 'click' by the same user.

    Spark-first implementation: union both sides, one window pass with
    last(..., ignorenulls) — a single shuffle on user_id, no per-key
    loops, no merge_asof UDF. Scales as a normal windowed shuffle."""
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("ets")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    tagged = errors.select(
        "user_id",
        F.col("ets").alias("ts"),
        F.col("error_id"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("is_err"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("cts").alias("ts"),
            F.lit(None).cast("long").alias("error_id"),
            "click_id",
            F.lit(0).alias("is_err"),
        )
    )
    # clicks sort before errors at identical ts (is_err ASC) so a
    # same-instant click is visible to the error — matches ASOF <=.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_err", "error_id", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = tagged.withColumn(
        "last_click_id", F.last("click_id", ignorenulls=True).over(w)
    )
    return (
        matched.filter(F.col("is_err") == 1)
        .select(
            "user_id",
            "error_id",
            F.unix_millis(F.col("ts")).alias("error_ms"),
            "last_click_id",
        )
    )


def asof_error_to_click_sql() -> str:
    """DuckDB native ASOF JOIN as the oracle."""
    return f"""
{EV_CTE}
SELECT e.user_id, e.event_id AS error_id, epoch_ms(e.ts) AS error_ms,
       c.event_id AS last_click_id
FROM (SELECT * FROM ev WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND c.ts <= e.ts
""".strip()


def json_extract_props(events: DataFrame) -> DataFrame:
    """JSON field extraction from the props column (string JSON)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_val"),
    )


def json_extract_props_sql() -> str:
    return (
        "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val FROM events"
    )


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP aggregation: per (flag, status), per flag, and grand
    total in one pass (the reference has no grouping sets; Spark SQL
    supplies them natively — one shuffle, grouping-set expansion is
    map-side). NULL group keys are coalesced to 'ALL' so every engine
    sorts/hashes the subtotal rows identically."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("status"),
            "sum_qty",
            "n_rows",
        )
    )


def pricing_rollup_sql() -> str:
    return """
SELECT coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip()


def order_priority_sets(orders: DataFrame) -> DataFrame:
    """Set operations: priorities seen in high-value orders MINUS those
    in low-value ones, plus the intersection count — exercised because
    the reference has none (SURVEY §2.5)."""
    hi = orders.filter(F.col("o_totalprice") > 200000).select("o_orderpriority")
    lo = orders.filter(F.col("o_totalprice") < 1000).select("o_orderpriority")
    only_hi = hi.subtract(lo).withColumn("set_op", F.lit("hi_minus_lo"))
    both = hi.intersect(lo).withColumn("set_op", F.lit("both"))
    return only_hi.unionByName(both).select("set_op", "o_orderpriority")


def order_priority_sets_sql() -> str:
    return """
WITH hi AS (SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000),
lo AS (SELECT o_orderpriority FROM orders WHERE o_totalprice < 1000)
SELECT 'hi_minus_lo' AS set_op, o_orderpriority FROM (
  SELECT o_orderpriority FROM hi EXCEPT SELECT o_orderpriority FROM lo)
UNION ALL
SELECT 'both' AS set_op, o_orderpriority FROM (
  SELECT o_orderpriority FROM hi INTERSECT SELECT o_orderpriority FROM lo)
""".strip()


def order_price_percentiles(orders: DataFrame) -> DataFrame:
    """Exact p50/p95 of order value per priority (linear-interpolation
    percentile — bit-identical across engines on doubles).

    Scale: exact percentile sorts within each group; for heavy groups
    switch to percentile_approx (t-digest, mergeable sketch) — same
    call shape, bounded memory."""
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.95).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


def order_price_percentiles_sql() -> str:
    return """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.95) AS p95,
       count(*) AS n
FROM orders GROUP BY 1
""".strip()


def priority_distinct_customers(orders: DataFrame) -> DataFrame:
    """Distinct aggregation: unique ordering customers per priority.

    Scale: Spark rewrites count(DISTINCT) as a two-stage expand +
    partial agg — no driver materialization; for billions of keys swap
    in approx_count_distinct (HLL sketch, mergeable) with the same call
    shape."""
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def priority_distinct_customers_sql() -> str:
    return """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders GROUP BY 1
""".strip()


def monthly_revenue_momentum(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue with lag + running cumulative total —
    the frame-based window surface (lag, unbounded-preceding sum) the
    other rel_* queries don't touch.

    Scale: the windows run AFTER the monthly aggregation, over ~one row
    per month — a single-partition window on an already-tiny frame, not
    on the fact table. Revenue sums in DECIMAL (order-independent),
    cast to DOUBLE at the edge."""
    month = F.substring(F.col("o_orderdate").cast("string"), 1, 7)
    monthly = orders.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
    )
    w = Window.orderBy("month")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return monthly.select(
        "month",
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec") - F.lag("rev_dec").over(w))
        .cast("double")
        .alias("rev_delta"),
        F.sum("rev_dec").over(wcum).cast("double").alias("rev_cum"),
    )


def monthly_revenue_momentum_sql() -> str:
    return """
WITH monthly AS (
  SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month,
         count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1)
SELECT month, n_orders,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec - lag(rev_dec) OVER (ORDER BY month) AS DOUBLE) AS rev_delta,
       CAST(sum(rev_dec) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_cum
FROM monthly
""".strip()


def customers_with_big_orders(customer: DataFrame, orders: DataFrame, threshold: float = 300000.0) -> DataFrame:
    """Correlated-EXISTS shape: customers having at least one order
    above the threshold. Spark decorrelates this to a left-semi join —
    the customer table is scanned once, no per-row subquery."""
    big = orders.filter(F.col("o_totalprice") > threshold).select("o_custkey")
    return customer.join(
        big, customer["c_custkey"] == big["o_custkey"], "leftsemi"
    ).select("c_custkey", "c_name")


def customers_with_big_orders_sql(threshold: float = 300000.0) -> str:
    return f"""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {threshold})
""".strip()


def event_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel: first view → first click → first purchase, in
    causal order (each stage must follow the previous one).

    One shuffle on user_id; conditional min-aggregations, no self-joins
    (a 3-way self-join would shuffle the fact table three times)."""
    ms = F.unix_millis(F.col("ts"))
    t_of = lambda kind: F.min(F.when(F.col("event_type") == kind, ms))
    per_user = events.groupBy("user_id").agg(
        t_of("view").alias("t_view"),
        t_of("click").alias("t_click"),
        t_of("purchase").alias("t_purchase"),
    )
    # stage k counts only if it happened at-or-after stage k-1
    reached_click = (
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_click") >= F.col("t_view"))
    )
    reached_purch = (
        reached_click
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(reached_click, 1)).alias("n_click_after_view"),
        F.count(F.when(reached_purch, 1)).alias("n_purchase_after_click"),
    )


def event_funnel_sql() -> str:
    return f"""
{EV_CTE},
per_user AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS t_view,
    min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS t_click,
    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
  FROM ev GROUP BY 1)
SELECT
  count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
  count(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
             AND t_click >= t_view THEN 1 END) AS n_click_after_view,
  count(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
             AND t_click >= t_view AND t_purchase IS NOT NULL
             AND t_purchase >= t_click THEN 1 END) AS n_purchase_after_click
FROM per_user
""".strip()


def brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand discounted revenue + volume (TPC-H Q14 flavour).

    Scale: `part` grows with SF (200k rows/SF), so no forced broadcast
    hint — AQE broadcasts it while it fits and falls back to a shuffle
    join beyond that; only the fixed-size nation/region dims earn an
    unconditional hint in this module."""
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(disc).cast("double").alias("revenue"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def brand_revenue_sql() -> str:
    return """
SELECT p_brand,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""".strip()


def supplier_nation_volume(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Shipped volume per supplier nation (TPC-H Q5/Q7 flavour).

    Scale: supplier grows with SF (10k rows/SF — AQE picks its join),
    nation is constant 25 rows (unconditional broadcast)."""
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(
            supplier, lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(disc).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def supplier_nation_volume_sql() -> str:
    return """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume,
  count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
""".strip()


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join: customers that never placed an order.

    Scale: left_anti plans as a broadcast/shuffled hash anti-join on
    the key — never a NOT IN scan per row."""
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_without_orders_sql() -> str:
    return (
        "SELECT c_custkey, c_name, c_mktsegment FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    )


def nation_market_share(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Each nation's share of its region's revenue — aggregation
    followed by a window over the 25-row aggregate (the window input
    is dimension-sized, so partitioning by region there is free).

    Scale: nation/region are constant-size (25/5 rows — broadcast
    hints); customer scales with SF so AQE picks its join; one fact
    shuffle for the agg; the share ratio is computed on the tiny
    result."""
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d")
        )
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        F.col("rev_d").cast("double").alias("revenue"),
        F.round(
            (F.col("rev_d") / F.sum("rev_d").over(w)).cast("double"), 6
        ).alias("share"),
    )


def nation_market_share_sql() -> str:
    return """
WITH rev AS (
  SELECT r_name, n_name,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2)
SELECT r_name, n_name, CAST(rev_d AS DOUBLE) AS revenue,
       round(CAST(rev_d / sum(rev_d) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share
FROM rev
""".strip()


SLIDE_WIN_MS = 3_600_000  # 1 hour window
SLIDE_STEP_MS = 900_000  # sliding every 15 minutes


def sliding_event_rates(events: DataFrame) -> DataFrame:
    """(window_start_ms, event_type, n) — OVERLAPPING 1-hour windows
    every 15 minutes (each event lands in 4 windows): the smoothed
    rate curve dashboards want, vs :func:`hourly_event_rollup`'s
    tumbling buckets. Uses the native ``F.window`` slide — the same
    expression runs unchanged under readStream + watermark (the
    streaming mirror in streaming/events.py:windowed_counts is the
    tumbling special case).

    Scale: windowing explodes each row into win/slide = 4 bucket rows
    map-side, then ONE partial-aggregated shuffle on (window, type) —
    identical shape to any rollup; no per-window scans."""
    w = F.window(F.col("ts"), "1 hour", "15 minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


def sliding_event_rates_sql() -> str:
    """Oracle: explicit window-start enumeration — an event at epoch
    ms m belongs to starts floor(m/step)*step - j*step for
    j in 0..win/step-1 (exactly Spark's sliding-window assignment
    with epoch-aligned, UTC-pinned windows)."""
    n_buckets = SLIDE_WIN_MS // SLIDE_STEP_MS
    return f"""
{EV_CTE},
e AS (SELECT epoch_ms(ts) AS ms, event_type FROM ev),
b AS (
  SELECT (ms // {SLIDE_STEP_MS}) * {SLIDE_STEP_MS}
         - CAST(j.j AS BIGINT) * {SLIDE_STEP_MS} AS window_start_ms,
         event_type
  FROM e, LATERAL (SELECT unnest(range(0, {n_buckets}))) AS j(j))
SELECT window_start_ms, event_type, count(*) AS n
FROM b GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# CUBE grouping sets
# ---------------------------------------------------------------------------


def order_cube(orders: DataFrame) -> DataFrame:
    """(status, priority, sum_total, n_orders) — full CUBE over
    (o_orderstatus, o_orderpriority): every combination of subtotals
    including the cross-marginals ROLLUP cannot express.

    Spark expands grouping sets MAP-SIDE into one shuffle (same cost
    shape as a plain groupBy at 4x output keys); money sums stay
    DECIMAL until the final cast, NULL group keys coalesce to 'ALL'
    so both engines hash identical rows."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "priority"
            ),
            "sum_total",
            "n_orders",
        )
    )


def order_cube_sql() -> str:
    return """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       count(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""".strip()


# ---------------------------------------------------------------------------
# sweep-line max concurrency
# ---------------------------------------------------------------------------

DAY_MS = 86_400_000


def max_concurrency(events: DataFrame) -> DataFrame:
    """(event_type, day, max_concurrent, n_intervals) — peak number of
    simultaneously-active intervals per event type per day, where each
    event is active for ``value`` seconds from its timestamp.

    Classic sweep-line as a window: +1 at each start, -1 at each end
    (end-exclusive: at equal times the -1 sorts first), running sum,
    max. Intervals are clipped at the day boundary (documented
    semantics: an event's spill into the next day is not carried —
    intervals here are <=490 s, so at most one midnight is involved).

    Scale: the running sum partitions by (event_type, day) — thousands
    of independent groups on a year of data, no global sort. A group
    is one day of one event type; if that still skews, the standard
    fix is a two-phase sweep (per-bucket sums + prefix offsets)."""
    ms = F.unix_millis(F.col("ts"))
    dur = F.round(F.col("value") * 1000.0).cast("long")
    base = events.select(
        "event_type",
        ms.alias("s"),
        (ms + dur).alias("e"),
        F.expr(f"unix_millis(ts) div {DAY_MS}").alias("day"),
    ).withColumn("day_end", (F.col("day") + 1) * F.lit(DAY_MS))
    starts = base.select(
        "event_type", "day", F.col("s").alias("t"), F.lit(1).alias("delta")
    )
    ends = base.select(
        "event_type",
        "day",
        F.least("e", "day_end").alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.withColumn("c", F.sum("delta").over(w))
    return (
        run.groupBy("event_type", "day")
        .agg(
            F.max("c").cast("long").alias("max_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_intervals"),
        )
        .orderBy("event_type", "day")
    )


def max_concurrency_sql() -> str:
    return f"""
{EV_CTE},
base AS (
  SELECT event_type, epoch_ms(ts) AS s,
         epoch_ms(ts) + CAST(round(value * 1000.0) AS BIGINT) AS e,
         epoch_ms(ts) // {DAY_MS} AS day
  FROM ev),
deltas AS (
  SELECT event_type, day, s AS t, 1 AS delta FROM base
  UNION ALL
  SELECT event_type, day, least(e, (day + 1) * {DAY_MS}) AS t, -1 AS delta
  FROM base),
run AS (
  SELECT event_type, day, delta,
         sum(delta) OVER (PARTITION BY event_type, day ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM deltas)
SELECT event_type, day,
       CAST(max(c) AS BIGINT) AS max_concurrent,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_intervals
FROM run GROUP BY event_type, day
ORDER BY event_type, day
""".strip()


# ---------------------------------------------------------------------------
# time-series gap fill
# ---------------------------------------------------------------------------

HOUR_MS = 3_600_000


def gapfill_hourly(events: DataFrame) -> DataFrame:
    """(event_type, hour_ms, n_events) — hourly event counts on a
    DENSE hour grid: every (type, hour) combination over the table's
    full time span appears, zero-filled where nothing happened.

    The timeseries-hygiene primitive rollups omit: downstream
    windows/forecasts need explicit zeros, not missing rows. The hour
    grid generates from one broadcast (min, max) row via sequence()
    (never a driver loop); the dense frame is |types| x |hours| —
    bounded output independent of event cardinality — left-joined
    against the one-shuffle hourly counts."""
    hdiv = F.expr(f"unix_millis(ts) div {HOUR_MS}")
    hours = events.select(hdiv.alias("h"))
    span = hours.agg(
        F.min("h").alias("h_min"), F.max("h").alias("h_max")
    )
    grid_h = span.select(
        F.explode(F.sequence(F.col("h_min"), F.col("h_max"))).alias("h")
    )
    types = events.select("event_type").distinct()
    counts = (
        events.select("event_type", hdiv.alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return (
        types.crossJoin(grid_h)
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") * HOUR_MS).alias("hour_ms"),
            F.coalesce(F.col("n_events"), F.lit(0))
            .cast("long")
            .alias("n_events"),
        )
        .orderBy("event_type", "hour_ms")
    )


def gapfill_hourly_sql() -> str:
    return f"""
{EV_CTE},
hours AS (SELECT epoch_ms(ts) // {HOUR_MS} AS h FROM ev),
span AS (SELECT min(h) AS h_min, max(h) AS h_max FROM hours),
grid_h AS (
  SELECT unnest(range(h_min, h_max + 1)) AS h FROM span),
types AS (SELECT DISTINCT event_type FROM ev),
counts AS (
  SELECT event_type, epoch_ms(ts) // {HOUR_MS} AS h,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2)
SELECT t.event_type, g.h * {HOUR_MS} AS hour_ms,
       CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
FROM types t CROSS JOIN grid_h g
LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = g.h
ORDER BY t.event_type, hour_ms
""".strip()


# ---------------------------------------------------------------------------
# CDC: latest-wins snapshot + MERGE upsert
# ---------------------------------------------------------------------------

CDC_DELETE_TYPE = "error"


def _cdc_changes(events: DataFrame) -> DataFrame:
    """events as a change stream on a per-user profile: every event is
    an upsert carrying (event_type, value), except ``error`` rows which
    are deletes; (ms, event_id) is the total change order."""
    ms = F.unix_millis(F.col("ts"))
    return events.select(
        F.col("user_id").alias("key"),
        ms.alias("ms"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == CDC_DELETE_TYPE, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def _latest_wins(changes: DataFrame) -> DataFrame:
    """Compact a change set to its final state: per key, the highest
    (ms, seq) change decides; a winning delete removes the key. One
    key-partitioned window — the standard CDC compaction shape (at
    100 TB this is the MERGE job: key-shuffle bounded by change volume,
    never a global sort)."""
    w = Window.partitionBy("key").orderBy(
        F.col("ms").desc(), F.col("seq").desc()
    )
    ranked = changes.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_changes", F.count(F.lit(1)).over(Window.partitionBy("key"))
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            F.col("key").alias("user_id"),
            "last_type",
            "last_value",
            F.col("ms").alias("last_ms"),
            F.col("seq").alias("last_seq"),
            F.col("n_changes").cast("long").alias("n_changes"),
        )
    )


def cdc_snapshot(events: DataFrame) -> DataFrame:
    """(user_id, last_type, last_value, last_ms, n_changes) — the
    profile table after applying the full event change stream."""
    return _latest_wins(_cdc_changes(events))


def merge_upsert(target: DataFrame, changes: DataFrame) -> DataFrame:
    """MERGE INTO: apply a change batch onto an existing snapshot
    (latest-wins by the shared (ms, seq) order; deletes remove keys).

    ``target`` is a :func:`cdc_snapshot`-shaped frame whose rows keep
    their original change coordinates — including ``last_seq``, so a
    batch change with ms equal to the target's last_ms is ordered by
    the TRUE original sequence, and snapshot∘merge == full-snapshot
    holds for ARBITRARY change batches, not just ms-boundary splits
    (round-4 ADVICE fix; pinned by tests). n_changes counts target
    rows as one change each plus the batch's rows (the usual
    compacted-history semantics)."""
    as_changes = target.select(
        F.col("user_id").alias("key"),
        F.col("last_ms").alias("ms"),
        F.col("last_seq").alias("seq"),
        F.lit("U").alias("op"),
        "last_type",
        "last_value",
    )
    return _latest_wins(as_changes.unionByName(_cdc_changes(changes)))


def cdc_snapshot_sql() -> str:
    return f"""
{EV_CTE},
changes AS (
  SELECT user_id AS key, epoch_ms(ts) AS ms, event_id AS seq,
         CASE WHEN event_type = '{CDC_DELETE_TYPE}' THEN 'D'
              ELSE 'U' END AS op,
         event_type AS last_type, value AS last_value
  FROM ev),
ranked AS (
  SELECT key, ms, seq, op, last_type, last_value,
         row_number() OVER (PARTITION BY key ORDER BY ms DESC, seq DESC)
           AS rn,
         count(*) OVER (PARTITION BY key) AS n_changes
  FROM changes)
SELECT key AS user_id, last_type, last_value, ms AS last_ms,
       seq AS last_seq, CAST(n_changes AS BIGINT) AS n_changes
FROM ranked WHERE rn = 1 AND op = 'U'
""".strip()


def merge_upsert_sql(split_ms: int) -> str:
    """Oracle of snapshot(first half) MERGE second half — the same
    two-phase computation, so the driver checks the merge path itself
    (not just the equivalent one-pass snapshot)."""
    return f"""
{EV_CTE},
changes AS (
  SELECT user_id AS key, epoch_ms(ts) AS ms, event_id AS seq,
         CASE WHEN event_type = '{CDC_DELETE_TYPE}' THEN 'D'
              ELSE 'U' END AS op,
         event_type AS last_type, value AS last_value
  FROM ev),
first_half AS (SELECT * FROM changes WHERE ms < {split_ms}),
second_half AS (SELECT * FROM changes WHERE ms >= {split_ms}),
target AS (
  SELECT key, ms, seq, 'U' AS op, last_type, last_value
  FROM (
    SELECT key, ms, seq, op, last_type, last_value,
           row_number() OVER (PARTITION BY key ORDER BY ms DESC, seq DESC)
             AS rn
    FROM first_half)
  WHERE rn = 1 AND op = 'U'),
merged AS (
  SELECT * FROM target
  UNION ALL
  SELECT key, ms, seq, op, last_type, last_value FROM second_half),
ranked AS (
  SELECT key, ms, seq, op, last_type, last_value,
         row_number() OVER (PARTITION BY key ORDER BY ms DESC, seq DESC)
           AS rn,
         count(*) OVER (PARTITION BY key) AS n_changes
  FROM merged)
SELECT key AS user_id, last_type, last_value, ms AS last_ms,
       seq AS last_seq, CAST(n_changes AS BIGINT) AS n_changes
FROM ranked WHERE rn = 1 AND op = 'U'
""".strip()


# ---------------------------------------------------------------------------
# decile distribution profile (NTILE)
# ---------------------------------------------------------------------------


def value_deciles(events: DataFrame, n_tiles: int = 10) -> DataFrame:
    """(event_type, decile, n, min_v, max_v, sum_cents) — the value
    distribution of each event type profiled into NTILE buckets
    (equal-count, standard SQL split semantics; ties broken by
    event_id so the assignment is a total order both engines share).

    Money-style sums are exact integer cents — order-independent, so
    the oracle hash never flaps. One window + one agg, both on the
    event_type shuffle; the usual distribution-profiling shape."""
    v = F.col("value").cast("double")
    w = Window.partitionBy("event_type").orderBy(v.asc(), F.col("event_id"))
    tiled = events.select(
        "event_type",
        v.alias("v"),
        F.round(v * 100).cast("long").alias("cents"),
        F.ntile(n_tiles).over(w).alias("decile"),
    )
    return (
        tiled.groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type", "decile")
    )


def value_deciles_sql(n_tiles: int = 10) -> str:
    return f"""
{EV_CTE},
tiled AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents,
         ntile({n_tiles}) OVER (PARTITION BY event_type
                                ORDER BY CAST(value AS DOUBLE), event_id)
           AS decile
  FROM ev)
SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n,
       min(v) AS min_v, max(v) AS max_v,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM tiled GROUP BY 1, 2
ORDER BY event_type, decile
""".strip()


# ---------------------------------------------------------------------------
# time-bounded conversion (signup -> purchase within a window)
# ---------------------------------------------------------------------------

CONV_WINDOW_MS = 24 * 3_600_000


def conversion_rates(
    events: DataFrame, window_ms: int = CONV_WINDOW_MS
) -> DataFrame:
    """(day, signups, conversions, rate) — per signup-day cohort: how
    many first-signup users made their first subsequent purchase
    within ``window_ms``. The time-bounded conversion metric (the
    funnel with a deadline — ``event_funnel`` counts stepwise reach
    with no time constraint).

    Plan: two per-user firsts from ONE user_id-keyed aggregation
    (min signup ms, then min purchase ms after it via a conditional
    re-aggregation on the same shuffle), then a tiny per-day rollup.
    Exact integer ms arithmetic; rate is one rounded division."""
    ms = F.unix_millis(F.col("ts"))
    per_user = (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", ms.alias("ms"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ms"))
            ).alias("s_ms"),
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ms"))
            ).alias("p_list"),
        )
        .filter(F.col("s_ms").isNotNull())
    )
    first_p = F.array_min(
        F.filter(F.col("p_list"), lambda p: p >= F.col("s_ms"))
    )
    flagged = per_user.select(
        F.expr(f"s_ms div {DAY_MS}").alias("day"),
        F.when(
            first_p.isNotNull()
            & (first_p - F.col("s_ms") <= window_ms),
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("signups"),
            F.sum("converted").cast("long").alias("conversions"),
        )
        .select(
            "day",
            "signups",
            "conversions",
            F.round(
                F.col("conversions").cast("double")
                / F.col("signups").cast("double"),
                6,
            ).alias("rate"),
        )
        .orderBy("day")
    )


def conversion_rates_sql(window_ms: int = CONV_WINDOW_MS) -> str:
    return f"""
{EV_CTE},
sp AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM ev
  WHERE event_type IN ('signup', 'purchase')),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ms END) AS s_ms
  FROM sp GROUP BY user_id),
conv AS (
  SELECT u.user_id, u.s_ms,
         min(CASE WHEN p.event_type = 'purchase' AND p.ms >= u.s_ms
                  THEN p.ms END) AS p_ms
  FROM per_user u LEFT JOIN sp p ON p.user_id = u.user_id
  WHERE u.s_ms IS NOT NULL
  GROUP BY u.user_id, u.s_ms),
flagged AS (
  SELECT s_ms // {DAY_MS} AS day,
         CASE WHEN p_ms IS NOT NULL AND p_ms - s_ms <= {window_ms}
              THEN 1 ELSE 0 END AS converted
  FROM conv)
SELECT day, CAST(count(*) AS BIGINT) AS signups,
       CAST(sum(converted) AS BIGINT) AS conversions,
       round(CAST(sum(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS rate
FROM flagged GROUP BY day ORDER BY day
""".strip()


# ---------------------------------------------------------------------------
# top session paths (behavioral sequence mining)
# ---------------------------------------------------------------------------

PATH_DEPTH = 3
PATH_TOPK = 15


def top_session_paths(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    depth: int = PATH_DEPTH,
    k: int = PATH_TOPK,
) -> DataFrame:
    """(path, n) — the ``k`` most frequent ``depth``-step event-type
    sequences inside user sessions ('click>view>purchase'), the
    classic clickstream path-mining question funnels can't answer
    (funnels fix the steps; this DISCOVERS them).

    Shape: the one user_id shuffle every sessionized query here pays,
    then map-side lead() steps over the (ms, event_id)-ordered
    session, a partial-aggregated path count, TakeOrdered top-k.
    Sequences never cross a session boundary (lead() guarded on the
    same session_id). Ties rank by path text, so the top-k SET is
    deterministic."""
    gap_ms = gap_min * 60 * 1000
    projected = events.select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts")).alias("ms"),
        "event_id",
    )
    ms = F.col("ms")
    w = Window.partitionBy("user_id").orderBy(ms, "event_id")
    new_sess = F.when(ms - F.lag(ms).over(w) > gap_ms, 1).otherwise(0)
    with_sess = projected.withColumn(
        "session_id", F.sum(new_sess).over(w).cast("int")
    )
    sw = Window.partitionBy("user_id", "session_id").orderBy(
        "ms", "event_id"
    )
    steps = [F.col("event_type")] + [
        F.lead("event_type", i).over(sw) for i in range(1, depth)
    ]
    guards = [
        F.lead("session_id", i).over(sw) == F.col("session_id")
        for i in range(1, depth)
    ]
    ok = guards[0]
    for g in guards[1:]:
        ok = ok & g
    path = F.concat_ws(">", *steps)
    counted = (
        with_sess.select(path.alias("path"), ok.alias("ok"))
        .filter(F.col("ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counted.orderBy(F.col("n").desc(), "path").limit(k)


def top_session_paths_sql(
    gap_min: int = SESSION_GAP_MIN,
    depth: int = PATH_DEPTH,
    k: int = PATH_TOPK,
) -> str:
    gap_ms = gap_min * 60 * 1000
    leads = ", ".join(
        f"lead(event_type, {i}) OVER sw AS e{i}, "
        f"lead(session_id, {i}) OVER sw AS s{i}"
        for i in range(1, depth)
    )
    concat = " || '>' || ".join(
        ["event_type"] + [f"e{i}" for i in range(1, depth)]
    )
    guard = " AND ".join(f"s{i} = session_id" for i in range(1, depth))
    return f"""
{EV_CTE},
g AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
         (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > {gap_ms}
         THEN 1 ELSE 0 END AS new_sess
  FROM ev),
s AS (
  SELECT user_id, event_id, event_type, ms,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
         ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
  FROM g),
stepped AS (
  SELECT event_type, session_id, {leads}
  FROM s
  WINDOW sw AS (PARTITION BY user_id, session_id ORDER BY ms, event_id)),
paths AS (
  SELECT {concat} AS path FROM stepped WHERE {guard})
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path
LIMIT {k}
""".strip()


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """(p_partkey, p_brand, s_name, n_name, min_cost) — the cheapest
    supplier per part by observed effective unit cost, the TPC-H Q2
    correlated-subquery shape (min-within-group + tie-break + dim
    hops). The Spark plan is the window-argmin formulation; the oracle
    deliberately uses the textbook two-step correlated MIN — same
    answer, exercising that the engine's argmin equals the subquery
    semantics.

    Exactness: unit cost rounds ONCE to cents
    (extendedprice·(1−discount)/quantity), all mins/ties on BIGINTs,
    one final /100.0. Scale: one lineitem shuffle to (part, supplier)
    offers, a part-partitioned argmin window over the offer table
    (bounded by suppliers-per-part), then broadcast dim hops."""
    cost_c = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        / F.col("l_quantity")
        * 100
    ).cast("long")
    offers = (
        lineitem.select("l_partkey", "l_suppkey", cost_c.alias("cost_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("cost_c").alias("cost_c"))
    )
    best = (
        offers.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("l_partkey").orderBy(
                    F.col("cost_c").asc(), F.col("l_suppkey").asc()
                )
            ),
        )
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    # supplier and part GROW with SF — no forced broadcast hint (the
    # relational-module policy above): AQE broadcasts them while they
    # fit and falls back to a shuffle join when they don't. Only the
    # fixed-cardinality nation keeps the explicit hint.
    return (
        best.join(
            supplier,
            best.l_suppkey == supplier.s_suppkey,
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
        )
        .join(
            part, best.l_partkey == part.p_partkey
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            (F.col("cost_c").cast("double") / 100.0).alias("min_cost"),
        )
        .orderBy("p_partkey")
    )


def min_cost_supplier_sql() -> str:
    """Oracle twin of :func:`min_cost_supplier` — the textbook
    correlated two-step MIN instead of the window argmin."""
    return """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(round(l_extendedprice * (1.0 - l_discount)
             / l_quantity * 100) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2),
m1 AS (SELECT l_partkey, MIN(cost_c) AS cost_c FROM offers GROUP BY 1),
best AS (
  SELECT o.l_partkey, MIN(o.l_suppkey) AS l_suppkey, m1.cost_c
  FROM offers o JOIN m1 ON o.l_partkey = m1.l_partkey
    AND o.cost_c = m1.cost_c
  GROUP BY 1, 3)
SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
       CAST(b.cost_c AS DOUBLE) / 100.0 AS min_cost
FROM best b
JOIN supplier s ON b.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON b.l_partkey = p.p_partkey
ORDER BY p.p_partkey
""".strip()


def rate_anomalies(
    events: DataFrame, trail: int = 24, min_history: int = 12, zcut: float = 3.0
) -> DataFrame:
    """(event_type, hour_ms, n, trail_mean, z, is_anomaly) — per-hour
    event counts scored against the TRAILING ``trail``-hour window
    (exclusive of the current hour): z = (n − mean) / sample-std. The
    monitoring primitive next to :func:`sliding_event_rates` — spikes
    and outages pop as |z| > ``zcut``.

    Caveat: the window is rows-between over the hourly rollup, i.e.
    the trailing ``trail`` OBSERVED hours — identical to trailing
    clock hours on gapless feeds, but on a feed with silent hours the
    window reaches further back in wall time. For strict clock-hour
    semantics on gappy feeds, compose with ``gapfill_hourly`` first.

    Exactness: counts/sums/sum-of-squares stay BIGINT inside the
    window (sample variance as (c·Σn² − (Σn)²) / (c·(c−1)) — integer
    numerator, one double division), mean and z are each ONE fixed
    double expression with round(·, 6), sqrt is deterministic IEEE.
    Hours with under ``min_history`` trailing observations or zero
    variance emit z = NULL (never a division blowup) and are not
    anomalies. Scale: one hour-rollup shuffle, then an
    event_type-partitioned ordered window over the (types × hours)
    rollup — KBs of state at any volume."""
    from pyspark.sql import Window as W

    hour_ms = F.unix_millis(F.date_trunc("hour", F.col("ts")))
    hourly = (
        events.groupBy(
            hour_ms.alias("hour_ms"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_ms")
        .rowsBetween(-trail, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_ms",
        "n",
        F.count(F.lit(1)).over(w).alias("c"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
    )
    ok = (F.col("c") >= min_history) & (
        F.col("c") * F.col("sq") - F.col("s") * F.col("s") > 0
    )
    mean = F.col("s").cast("double") / F.col("c").cast("double")
    var = (
        (F.col("c") * F.col("sq") - F.col("s") * F.col("s")).cast("double")
        / (F.col("c") * (F.col("c") - 1)).cast("double")
    )
    z = F.round((F.col("n").cast("double") - mean) / F.sqrt(var), 6)
    return scored.select(
        "event_type",
        "hour_ms",
        "n",
        F.when(ok, F.round(mean, 6)).alias("trail_mean"),
        F.when(ok, z).alias("z"),
        F.coalesce(F.when(ok, F.abs(z) > zcut), F.lit(False)).alias(
            "is_anomaly"
        ),
    ).orderBy("event_type", "hour_ms")


def rate_anomalies_sql(
    trail: int = 24, min_history: int = 12, zcut: float = 3.0
) -> str:
    """Oracle twin of :func:`rate_anomalies`."""
    return f"""
WITH hourly AS (
  SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT event_type, hour_ms, n,
         COUNT(*) OVER w AS c, SUM(n) OVER w AS s,
         SUM(n * n) OVER w AS sq
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ms
               ROWS BETWEEN {trail} PRECEDING AND 1 PRECEDING))
SELECT event_type, hour_ms, n,
  CASE WHEN c >= {min_history} AND c * sq - s * s > 0
       THEN round(CAST(s AS DOUBLE) / CAST(c AS DOUBLE), 6) END
    AS trail_mean,
  CASE WHEN c >= {min_history} AND c * sq - s * s > 0
       THEN round((CAST(n AS DOUBLE)
            - CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
            / sqrt(CAST(c * sq - s * s AS DOUBLE)
                   / CAST(c * (c - 1) AS DOUBLE)), 6) END AS z,
  COALESCE(CASE WHEN c >= {min_history} AND c * sq - s * s > 0
       THEN abs(round((CAST(n AS DOUBLE)
            - CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
            / sqrt(CAST(c * sq - s * s AS DOUBLE)
                   / CAST(c * (c - 1) AS DOUBLE)), 6)) > {zcut!r} END,
       FALSE) AS is_anomaly
FROM scored ORDER BY event_type, hour_ms
""".strip()


#: TPC-H Q3 cut date adapted to the testdata's 1995-2001 span
Q3_CUT = "1998-06-15"
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = Q3_SEGMENT,
    cut: str = Q3_CUT,
    k: int = Q3_TOPK,
) -> DataFrame:
    """(o_orderkey, revenue, o_orderdate_ms, o_orderpriority) — TPC-H
    Q3 (shipping priority): top unshipped revenue for one market
    segment — orders placed before ``cut`` with lineitems shipped
    after it. The classic selective 3-way join: both dimension sides
    broadcast after their pushed-down date/segment filters, revenue
    aggregates in exact cents (one rounding per lineitem), and the
    top-k is TakeOrdered with (revenue DESC, orderkey) tie-breaks."""
    cust = customer.where(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    # customer grows with SF — no forced hint; AQE size-gates it
    ords = (
        orders.where(F.col("o_orderdate") < F.lit(cut).cast("timestamp"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.where(
        F.col("l_shipdate") > F.lit(cut).cast("timestamp")
    ).select("l_orderkey", rev_c.alias("rev_c"))
    # the filtered-orders side grows with SF too — same policy: let
    # AQE broadcast it while it fits rather than force an OOM at scale
    top = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_c").alias("rev_c"))
        .select(
            "o_orderkey",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
            # o_orderdate is TIMESTAMP_NTZ in the parquet; the UTC
            # session cast makes unix_millis == DuckDB epoch_ms
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_ms"
            ),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(k)
    )
    return top


def shipping_priority_sql(
    segment: str = Q3_SEGMENT, cut: str = Q3_CUT, k: int = Q3_TOPK
) -> str:
    """Oracle twin of :func:`shipping_priority`."""
    return f"""
SELECT l.l_orderkey AS o_orderkey,
       CAST(SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       epoch_ms(o.o_orderdate) AS o_orderdate_ms,
       o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{cut}'
  AND l.l_shipdate > TIMESTAMP '{cut}'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, o_orderkey LIMIT {k}
""".strip()


Q5_REGION = "ASIA"
Q5_START = "1996-01-01"
Q5_END = "1997-01-01"


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = Q5_REGION,
    start: str = Q5_START,
    end: str = Q5_END,
) -> DataFrame:
    """(n_name, revenue) — TPC-H Q5 (local supplier volume): revenue
    from lineitems where the supplier and the ordering customer sit in
    the same nation, for one region and one order-date year. The
    widest classic join in the suite — six tables — and the canonical
    broadcast-chain exercise.

    Join strategy for 100 TB: region (constant) and nation (25 rows)
    are FORCED broadcasts — they never grow with SF. supplier and
    customer grow linearly, so no hint: AQE broadcasts them while the
    region-pruned side fits, else they shuffle on their keys. The
    fact-fact join (lineitem x filtered orders) shuffles on orderkey;
    the same-nation condition (c_nationkey = s_nationkey) rides the
    supplier join as an equi-key, never a post-filter on a wider
    join. Revenue aggregates in exact cents (one rounding per
    lineitem, order-independent BIGINT sums).

    Reference parity: generalizes the reference's single-table
    aggregation surface (pipeline/query.py) to the multi-dim star
    shape its schema implies; same contract as DuckDB's TPC-H Q5."""
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    # supplier keyed by (suppkey) carrying its nation; the region
    # prune lands via the broadcast nat join
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = customer.select("c_custkey", "c_nationkey")
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.select("l_orderkey", "l_suppkey", rev_c.alias("rev_c"))
    joined = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            supp,
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("rev_c").alias("rev_c"))
        .select(
            "n_name",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def local_supplier_volume_sql(
    region_name: str = Q5_REGION, start: str = Q5_START, end: str = Q5_END
) -> str:
    """Oracle twin of :func:`local_supplier_volume`."""
    return f"""
SELECT n.n_name,
       CAST(SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{region_name}'
  AND o.o_orderdate >= TIMESTAMP '{start}'
  AND o.o_orderdate < TIMESTAMP '{end}'
GROUP BY 1 ORDER BY revenue DESC, n_name
""".strip()


def key_skew_report(
    events: DataFrame, key: str = "user_id", top_k: int = 20
) -> DataFrame:
    """(rank, key_val, n, share_ppm, suggested_salt) — the top-k
    heaviest grouping keys with their traffic share (exact parts per
    million) and the salt factor that would flatten each to the mean
    key load. The ops primitive BEFORE a 100 TB join/groupBy on a
    user-chosen key: every skew mitigation in this repo (dedup's
    exact-dup collapse armor, AQE skew-join) starts from knowing which
    keys are hot and by how much; this makes that a queryable report
    rather than a post-mortem.

    Exactness: share_ppm = n·10⁶ div total; suggested_salt =
    ceil(n · n_keys / total) — all BIGINT, zero floats. Plan: ONE
    partial-agg groupBy(key) (map-side combine absorbs the hot keys —
    the report itself cannot be skew-broken), a single-row total/keys
    agg crossed back in (broadcast of 1 row), TakeOrdered top-k."""
    per_key = events.groupBy(F.col(key).alias("key_val")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = per_key.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    from pyspark.sql import Window as W

    top = (
        per_key.crossJoin(F.broadcast(totals))
        .orderBy(F.col("n").desc(), "key_val")
        .limit(top_k)
    )
    rank = F.row_number().over(
        W.orderBy(F.col("n").desc(), "key_val")
    )
    return top.select(
        rank.cast("int").alias("rank"),
        F.col("key_val").cast("long").alias("key_val"),
        "n",
        F.expr("(n * 1000000) div total").alias("share_ppm"),
        F.expr("(n * n_keys + total - 1) div total").alias(
            "suggested_salt"
        ),
    )


def key_skew_report_sql(key: str = "user_id", top_k: int = 20) -> str:
    """Oracle twin of :func:`key_skew_report`."""
    return f"""
WITH per_key AS (
  SELECT {key} AS key_val, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
totals AS (
  SELECT SUM(n) AS total, CAST(count(*) AS BIGINT) AS n_keys
  FROM per_key)
SELECT CAST(row_number() OVER (ORDER BY n DESC, key_val) AS INT) AS rank,
       CAST(key_val AS BIGINT) AS key_val, n,
       CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
       CAST((n * n_keys + total - 1) // total AS BIGINT)
         AS suggested_salt
FROM per_key CROSS JOIN totals
ORDER BY n DESC, key_val LIMIT {top_k}
""".strip()


def scd2_history(events: DataFrame) -> DataFrame:
    """(user_id, event_type, valid_from_ms, valid_to_ms, n_events) —
    slowly-changing-dimension TYPE 2 build: collapse each user's event
    stream into attribute VERSIONS — consecutive runs of the same
    event_type become one row with its validity interval; the current
    version carries valid_to_ms = NULL. The lakehouse dimension-build
    next to :func:`cdc_snapshot` (type 1, latest-wins): type 2 keeps
    the full history queryable by AS-OF time.

    Plan: one user-partitioned ordered window (lag → change flag →
    running version counter), one groupBy(user, version), one more
    user-partitioned lead for valid_to. All state is per-user ordered
    windows — partitioned by the key, never global. Event-id
    tie-breaks make same-timestamp orders deterministic."""
    from pyspark.sql import Window as W

    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(ms, "event_id")
    flagged = events.select(
        "user_id",
        "event_type",
        "event_id",
        ms.alias("ts_ms"),
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    vers = flagged.withColumn(
        "version",
        F.sum("chg").over(
            W.partitionBy("user_id")
            .orderBy("ts_ms", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    hist = vers.groupBy("user_id", "version", "event_type").agg(
        F.min("ts_ms").alias("valid_from_ms"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wv = W.partitionBy("user_id").orderBy("valid_from_ms")
    return hist.select(
        "user_id",
        "event_type",
        "valid_from_ms",
        F.lead("valid_from_ms").over(wv).alias("valid_to_ms"),
        "n_events",
    ).orderBy("user_id", "valid_from_ms")


def scd2_history_sql() -> str:
    """Oracle twin of :func:`scd2_history`."""
    return """
WITH flagged AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
vers AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                           ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged),
hist AS (
  SELECT user_id, version, event_type,
         MIN(ts_ms) AS valid_from_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM vers GROUP BY 1, 2, 3)
SELECT user_id, event_type, valid_from_ms,
       lead(valid_from_ms) OVER (PARTITION BY user_id
                                 ORDER BY valid_from_ms) AS valid_to_ms,
       n_events
FROM hist ORDER BY user_id, valid_from_ms
""".strip()


PROFILE_COLS = (
    "event_id", "ts", "user_id", "event_type", "value", "props",
)


def profile_columns(events: DataFrame, cols=PROFILE_COLS) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_num, max_num) — exact
    per-column data-profiling report: row/null/distinct counts for
    every column, plus numeric min/max (timestamps as epoch-ms;
    strings carry NULL min/max — no cross-engine string-format
    roulette). The quality gate a 100 TB ingest runs FIRST: schema
    drift, null floods, and cardinality explosions all show up here
    before they poison a downstream join.

    Plan: a single pass — one agg computes every column's counters
    side by side (count/isnull/min/max are map-side partials;
    count(DISTINCT a), count(DISTINCT b), … in one agg plans as
    Spark's EXPAND fan-out: |cols|× map-side rows, ONE shuffle, no
    per-column jobs), then an unpivot (stack) to the report shape.
    Nothing is driver-side; fan-out is bounded by the column count."""
    num_t = {"bigint", "int", "double", "float", "smallint", "long"}
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        dt = dict(events.dtypes)[c]
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"{c}__dist"))
        if dt == "timestamp" or dt == "timestamp_ntz":
            val = F.unix_millis(F.col(c).cast("timestamp")).cast("double")
        elif dt in num_t:
            val = F.col(c).cast("double")
        else:
            val = F.lit(None).cast("double")
        aggs.append(F.min(val).alias(f"{c}__min"))
        aggs.append(F.max(val).alias(f"{c}__max"))
    one = events.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__null, {c}__dist, {c}__min, {c}__max" for c in cols
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack}) AS "
                "(column, n_null, n_distinct, min_num, max_num)"
            ),
        )
        .select(
            "column", "n_rows", "n_null", "n_distinct",
            "min_num", "max_num",
        )
        .orderBy("column")
    )


def profile_columns_sql(cols=PROFILE_COLS) -> str:
    """Oracle twin of :func:`profile_columns`."""
    num_t = {"event_id", "user_id", "value"}
    parts = []
    for c in cols:
        if c == "ts":
            mn = "CAST(min(epoch_ms(ts)) AS DOUBLE)"
            mx = "CAST(max(epoch_ms(ts)) AS DOUBLE)"
        elif c in num_t:
            mn, mx = (
                f"CAST(min({c}) AS DOUBLE)",
                f"CAST(max({c}) AS DOUBLE)",
            )
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(f"""
  SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
         {mn} AS min_num, {mx} AS max_num
  FROM events""")
    return (
        "SELECT * FROM ("
        + "\n  UNION ALL".join(parts)
        + ') ORDER BY "column"'
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order priority checking via an EXISTS semi-join
# ---------------------------------------------------------------------------
Q4_START = "1996-07-01"
Q4_END = "1996-10-01"


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = Q4_START,
    end: str = Q4_END,
) -> DataFrame:
    """(o_orderpriority, n_late_orders) — TPC-H Q4 (order priority
    checking), adapted to the testdata schema: the testdata lineitem
    has no commit/receipt dates (ref query surface: SURVEY §2.5), so
    "late" is l_shipdate > o_orderdate — EXISTS at least one lineitem
    shipped strictly after the order date.

    Scale: orders gets its quarter filter pushed to the scan (~1/24 of
    the table survives); the EXISTS is a LEFT SEMI hash join on
    l_orderkey — both sides grow with SF so neither is broadcast
    (AQE size-gates); the non-equi l_shipdate > o_orderdate condition
    rides the semi-join as a residual, so there is exactly ONE
    shuffle pair on the order key, then a 5-group partial-agg count."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > ords.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


def order_priority_check_sql(start: str = Q4_START, end: str = Q4_END) -> str:
    """Oracle twin of :func:`order_priority_check`."""
    return f"""
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{start}'
  AND o_orderdate < TIMESTAMP '{end}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade volume between two nations, per year
# ---------------------------------------------------------------------------
Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_START = "1996-01-01"
Q7_END = "1998-01-01"


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    start: str = Q7_START,
    end: str = Q7_END,
) -> DataFrame:
    """(supp_nation, cust_nation, l_year, revenue) — TPC-H Q7 (volume
    shipping): revenue flowing between two specific nations in both
    directions, per ship year.

    Scale: the two-nation filter lands on the 25-row nation dim FIRST,
    then prunes supplier and customer down to ~2/25 of their rows
    BEFORE their joins (filter-below-join, the Catalyst-friendly
    order); nation is broadcast unconditionally (constant 25 rows),
    the pruned supplier/customer sides are AQE size-gated; lineitem
    keeps its ship-date range filter in the scan. The cross-pair
    condition (A->B or B->A) is applied after both nation columns
    exist, on the already-joined row — no extra shuffle. Revenue sums
    in exact cents (one rounding per lineitem, order-independent)."""
    nat = nation.where(
        F.col("n_name").isin(nation_a, nation_b)
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ords = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "cust_nation")
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        rev_c.alias("rev_c"),
    )
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .where(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum("rev_c").cast("double") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def nation_trade_volume_sql(
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    start: str = Q7_START,
    end: str = Q7_END,
) -> str:
    """Oracle twin of :func:`nation_trade_volume`."""
    return f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
  AND ((sn.n_name = '{nation_a}' AND cn.n_name = '{nation_b}')
    OR (sn.n_name = '{nation_b}' AND cn.n_name = '{nation_a}'))
GROUP BY 1, 2, 3
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit per supplier nation and year
# ---------------------------------------------------------------------------
Q9_TYPE = "PROMO"


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    p_type: str = Q9_TYPE,
) -> DataFrame:
    """(n_name, o_year, profit) — TPC-H Q9 (product type profit),
    adapted: the testdata has no partsupp/ps_supplycost, so cost is
    p_retailprice * l_quantity (the schema's only unit cost); profit
    per lineitem = extendedprice*(1-discount) - retailprice*quantity,
    rounded ONCE to exact cents so the grouped sums are
    order-independent.

    Scale: the p_type filter prunes part (~1/6) before its join;
    nation broadcasts (25 rows); part/supplier/orders all grow with SF
    so AQE size-gates each — at 100 TB the partkey and orderkey joins
    are shuffle hash joins on their natural keys and the agg output is
    |nations|x|years| (tiny)."""
    pt = part.where(F.col("p_type") == p_type).select(
        "p_partkey", "p_retailprice"
    )
    profit_c = F.round(
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("long")
    li = (
        lineitem.join(pt, lineitem.l_partkey == pt.p_partkey)
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("l_orderkey", "n_name", profit_c.alias("profit_c"))
    )
    ords = orders.select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(
            (F.sum("profit_c").cast("double") / 100.0).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def product_type_profit_sql(p_type: str = Q9_TYPE) -> str:
    """Oracle twin of :func:`product_type_profit`."""
    return f"""
SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(round((l_extendedprice * (1.0 - l_discount)
                 - p_retailprice * l_quantity) * 100) AS BIGINT))
            AS DOUBLE) / 100.0 AS profit,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = '{p_type}'
GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue report (top-k customers)
# ---------------------------------------------------------------------------
Q10_START = "1997-01-01"
Q10_END = "1997-04-01"
Q10_TOPK = 20


def returned_item_report(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    start: str = Q10_START,
    end: str = Q10_END,
    k: int = Q10_TOPK,
) -> DataFrame:
    """(c_custkey, c_name, revenue, c_acctbal, n_name) — TPC-H Q10
    (returned item reporting): the top-k customers by revenue lost to
    returns (l_returnflag = 'R') on orders placed in one quarter.

    Scale: the quarter filter pushes to the orders scan and the
    returnflag filter to the lineitem scan; the orderkey join then the
    custkey join are the only fact shuffles; nation broadcasts.
    Revenue in exact cents; the top-k is TakeOrdered with
    (revenue DESC, c_custkey) tie-break — never a global sort."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev_c.alias("rev_c")
    )
    per_cust = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(k)
    )


def returned_item_report_sql(
    start: str = Q10_START, end: str = Q10_END, k: int = Q10_TOPK
) -> str:
    """Oracle twin of :func:`returned_item_report`."""
    return f"""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{start}'
  AND o_orderdate < TIMESTAMP '{end}'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, c_custkey LIMIT {k}
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promotion revenue share per month
# ---------------------------------------------------------------------------
Q14_YEAR = 1997


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame, year: int = Q14_YEAR
) -> DataFrame:
    """(month, promo_revenue, total_revenue, promo_pct) — TPC-H Q14
    (promotion effect) widened to all 12 months of one ship year: the
    share of revenue coming from PROMO-type parts.

    Scale: the ship-year range filter pushes to the lineitem scan; ONE
    partkey shuffle join against the 2-column part projection (AQE
    size-gates it; part grows with SF so no forced hint); promo and
    total sum as exact cents in the same partial agg (conditional
    sum, not two passes); the final share is one double division on
    the 12-row result — both engines divide identical exact inputs,
    and IEEE division is exactly rounded, so the twin matches."""
    start = f"{year}-01-01"
    end = f"{year + 1}-01-01"
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select(
        "l_partkey",
        F.month("l_shipdate").alias("month"),
        rev_c.alias("rev_c"),
    )
    joined = li.join(
        part.select("p_partkey", "p_type"),
        li.l_partkey == F.col("p_partkey"),
    )
    agg = joined.groupBy("month").agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(
                F.lit(0)
            )
        ).alias("promo_c"),
        F.sum("rev_c").alias("total_c"),
    )
    return agg.select(
        "month",
        (F.col("promo_c").cast("double") / 100.0).alias("promo_revenue"),
        (F.col("total_c").cast("double") / 100.0).alias("total_revenue"),
        F.round(
            F.lit(100.0)
            * F.col("promo_c").cast("double")
            / F.col("total_c").cast("double"),
            6,
        ).alias("promo_pct"),
    )


def promo_revenue_share_sql(year: int = Q14_YEAR) -> str:
    """Oracle twin of :func:`promo_revenue_share`."""
    return f"""
WITH agg AS (
  SELECT CAST(month(l_shipdate) AS INTEGER) AS month,
         SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                  AS BIGINT) ELSE 0 END) AS promo_c,
         SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
             AS BIGINT)) AS total_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
    AND l_shipdate < TIMESTAMP '{year + 1}-01-01'
  GROUP BY 1)
SELECT month, CAST(promo_c AS DOUBLE) / 100.0 AS promo_revenue,
       CAST(total_c AS DOUBLE) / 100.0 AS total_revenue,
       round(100.0 * CAST(promo_c AS DOUBLE) / CAST(total_c AS DOUBLE), 6)
         AS promo_pct
FROM agg
""".strip()


# ---------------------------------------------------------------------------
# snapshot diff: data-versioning delta between two keyed table states
# ---------------------------------------------------------------------------
DIFF_COMPARE_COLS = ("last_type", "last_value", "last_ms")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "user_id",
    compare_cols=DIFF_COMPARE_COLS,
) -> DataFrame:
    """(key, status, changed_cols) — the row-level delta between two
    versions of a keyed table (the lakehouse table-versioning /
    time-travel DIFF): ``added`` keys exist only in ``new``,
    ``removed`` only in ``old``, ``changed`` rows exist in both but
    differ in at least one compared column (null-safe compare);
    identical rows are dropped. ``changed_cols`` is the
    comma-joined list of differing column names, in ``compare_cols``
    order ('' for added/removed — concat_ws skips the NULL markers
    identically in Spark and DuckDB).

    Scale: ONE full-outer shuffle hash join on the key — both sides
    are snapshots so neither broadcasts; every comparison is a
    map-side column expression on the joined row; output is bounded
    by the true change volume, not table size."""
    o = old.select(
        F.col(key).alias("k_old"),
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("k_new"),
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
    )
    j = o.join(n, o.k_old == n.k_new, "full_outer")
    status = (
        F.when(F.col("k_old").isNull(), F.lit("added"))
        .when(F.col("k_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    diffs = [
        F.when(
            ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    both = F.col("k_old").isNotNull() & F.col("k_new").isNotNull()
    out = j.select(
        F.coalesce(F.col("k_old"), F.col("k_new")).alias(key),
        status.alias("status"),
        F.when(both, F.concat_ws(",", *diffs))
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
    return out.where(
        (F.col("status") != "changed") | (F.col("changed_cols") != "")
    )


def snapshot_diff_sql(split_ms: int, compare_cols=DIFF_COMPARE_COLS) -> str:
    """Oracle twin of :func:`snapshot_diff` over the CDC snapshots at
    ``split_ms`` (old) and the full stream (new)."""
    snap = """
  SELECT key AS user_id, last_type, last_value, ms AS last_ms
  FROM (
    SELECT key, ms, seq, op, last_type, last_value,
           row_number() OVER (PARTITION BY key ORDER BY ms DESC, seq DESC)
             AS rn
    FROM {src})
  WHERE rn = 1 AND op = 'U'"""
    diff_markers = ", ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END"
        for c in compare_cols
    )
    return f"""
{EV_CTE},
changes AS (
  SELECT user_id AS key, epoch_ms(ts) AS ms, event_id AS seq,
         CASE WHEN event_type = '{CDC_DELETE_TYPE}' THEN 'D'
              ELSE 'U' END AS op,
         event_type AS last_type, value AS last_value
  FROM ev),
old_changes AS (SELECT * FROM changes WHERE ms < {split_ms}),
old_snap AS ({snap.format(src="old_changes")}),
new_snap AS ({snap.format(src="changes")})
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'added'
            WHEN n.user_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CASE WHEN o.user_id IS NULL OR n.user_id IS NULL THEN ''
            ELSE concat_ws(',', {diff_markers}) END AS changed_cols
FROM old_snap o
FULL OUTER JOIN new_snap n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR concat_ws(',', {diff_markers}) <> ''
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
# ---------------------------------------------------------------------------
Q19_TERMS = (
    ("Brand#1", 1, 5, 1.0, 11.0),
    ("Brand#9", 1, 10, 10.0, 20.0),
    ("Brand#13", 1, 15, 20.0, 30.0),
)


def discounted_brand_revenue(
    lineitem: DataFrame, part: DataFrame, terms=Q19_TERMS
) -> DataFrame:
    """(n_lines, revenue) — TPC-H Q19 (discounted revenue): one
    scalar revenue under a disjunction of brand/size/quantity
    conjunctions — the classic "does the optimizer split an
    OR-of-ANDs across the join?" query.

    Scale: the part-only half of each term (brand + size) and the
    lineitem-only half (quantity) are each pushed BELOW the join as
    union-of-ranges scan filters (Catalyst distributes the
    disjunction: p_size <= max over all terms, quantity within the
    overall hull), then the exact per-term conjunction evaluates on
    the joined row; the join itself is one partkey equi-join, AQE
    size-gated. Revenue sums in exact cents."""
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    # hull prefilters, explicit so the scans prune even when the
    # optimizer stops short of distributing the full disjunction
    q_lo = min(t[3] for t in terms)
    q_hi = max(t[4] for t in terms)
    s_lo = min(t[1] for t in terms)
    s_hi = max(t[2] for t in terms)
    brands = [t[0] for t in terms]
    li = lineitem.where(F.col("l_quantity").between(q_lo, q_hi)).select(
        "l_partkey", "l_quantity", rev_c.alias("rev_c")
    )
    pt = part.where(
        F.col("p_brand").isin(brands)
        & F.col("p_size").between(s_lo, s_hi)
    ).select("p_partkey", "p_brand", "p_size")
    cond = None
    for brand, slo, shi, qlo, qhi in terms:
        term = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        cond = term if cond is None else (cond | term)
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("rev_c").cast("double") / 100.0).alias("revenue"),
        )
    )


def discounted_brand_revenue_sql(terms=Q19_TERMS) -> str:
    """Oracle twin of :func:`discounted_brand_revenue`."""
    disj = "\n   OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in terms
    )
    return f"""
SELECT count(*) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {disj}
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers (HAVING on an aggregate)
# ---------------------------------------------------------------------------
Q18_QTY = 170.0
Q18_TOPK = 100


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    qty_threshold: float = Q18_QTY,
    k: int = Q18_TOPK,
) -> DataFrame:
    """(c_custkey, c_name, o_orderkey, o_orderdate_ms, o_totalprice,
    total_qty) — TPC-H Q18 (large-volume customers): orders whose
    total lineitem quantity exceeds a threshold, with their customer.

    Scale: the HAVING aggregate runs FIRST — one partial-agg groupBy
    on orderkey reduces lineitem to surviving orders (quantity sums
    in exact deci-units) BEFORE any join; the survivors then join
    orders and customer on their keys (survivor side is small → AQE
    broadcasts it; at extreme SF it degrades gracefully to a shuffle
    join, never an OOM'd forced hint). TakeOrdered top-k with
    (o_totalprice DESC, o_orderkey) tie-break."""
    qty_d = F.round(F.col("l_quantity") * 10).cast("long")  # exact deci-units
    big = (
        lineitem.select("l_orderkey", qty_d.alias("qty_d"))
        .groupBy("l_orderkey")
        .agg(F.sum("qty_d").alias("qty_d"))
        .where(F.col("qty_d") > int(qty_threshold * 10))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_ms"
            ),
            "o_totalprice",
            (F.col("qty_d").cast("double") / 10.0).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(k)
    )


def large_volume_customers_sql(
    qty_threshold: float = Q18_QTY, k: int = Q18_TOPK
) -> str:
    """Oracle twin of :func:`large_volume_customers`."""
    return f"""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_quantity * 10) AS BIGINT)) AS qty_d
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(round(l_quantity * 10) AS BIGINT))
         > {int(qty_threshold * 10)})
SELECT c_custkey, c_name, o_orderkey,
       epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice,
       CAST(qty_d AS DOUBLE) / 10.0 AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT {k}
""".strip()


# ---------------------------------------------------------------------------
# JSON schema-drift profiler (r7)
# ---------------------------------------------------------------------------


def make_json_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — a deterministic semi-structured corpus with
    REAL schema drift, built from the documents table with native
    string ops (no UDF): ``score`` flips between int and string every
    7th doc, ``flag`` is present only every 3rd, ``note`` is an
    explicit JSON null every 5th. The fixture a schema-drift profiler
    needs; the oracle regenerates it from the same formula."""
    did = F.col("doc_id")
    score = F.when(
        did % 7 == 0, F.concat(F.lit('"s'), (did % 100).cast("string"), F.lit('"'))
    ).otherwise((did % 100).cast("string"))
    flag = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(', "flag": '),
            F.when(did % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        ),
    ).otherwise(F.lit(""))
    note = F.when(did % 5 == 0, F.lit(', "note": null')).otherwise(F.lit(""))
    payload = F.concat(
        F.lit('{"id": '),
        did.cast("string"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.lit('", "score": '),
        score,
        flag,
        note,
        F.lit("}"),
    )
    return docs.select("doc_id", payload.alias("payload"))


def json_schema_profile(corpus: DataFrame) -> DataFrame:
    """(key, n_present, n_int, n_bool, n_string, n_null) — per-key
    presence and VALUE-TYPE census over a JSON column: the ingest-time
    schema-inference / drift-detection report (which keys exist, how
    often, and with which — possibly conflicting — types).

    Scale: one ``from_json`` map parse + explode per row (JVM-side,
    no Python), one partial-agg groupBy on the key — key cardinality
    is schema-bounded, never row-bounded. Type classification is a
    fixed regex over the stringified scalar, identical to the
    oracle's ``json_type``-based labels on the generated corpus."""
    kv = corpus.select(
        F.explode(
            F.from_json(F.col("payload"), "map<string,string>")
        ).alias("key", "val")
    )
    is_int = F.col("val").rlike("^-?[0-9]+$")
    is_bool = F.col("val").isin("true", "false")
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.when(is_int, 1).otherwise(0)).cast("long").alias("n_int"),
        F.sum(F.when(is_bool, 1).otherwise(0)).cast("long").alias("n_bool"),
        F.sum(
            F.when(
                F.col("val").isNotNull() & ~is_int & ~is_bool, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_string"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
    )


def json_schema_profile_sql(src: str = "documents") -> str:
    """Oracle twin of make_json_corpus ∘ json_schema_profile."""
    return f"""
WITH corpus AS (
  SELECT doc_id,
         '{{"id": ' || CAST(doc_id AS VARCHAR)
         || ', "lang": "' || lang || '"'
         || ', "score": '
         || CASE WHEN doc_id % 7 = 0
                 THEN '"s' || CAST(doc_id % 100 AS VARCHAR) || '"'
                 ELSE CAST(doc_id % 100 AS VARCHAR) END
         || CASE WHEN doc_id % 3 = 0
                 THEN ', "flag": '
                      || CASE WHEN doc_id % 2 = 0 THEN 'true'
                              ELSE 'false' END
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ', "note": null' ELSE '' END
         || '}}' AS payload
  FROM {src}),
kv AS (
  -- this DuckDB build has no json_each table function; json_keys +
  -- dynamic-path json_type covers the same census (a JSON null value
  -- surfaces as SQL NULL from json_type — the key itself exists,
  -- json_keys guarantees that)
  SELECT key, json_type(p, key) AS t
  FROM (SELECT payload::JSON AS p, unnest(json_keys(payload::JSON)) AS key
        FROM corpus))
SELECT key,
       count(*) AS n_present,
       CAST(SUM(CASE WHEN t IN ('BIGINT', 'UBIGINT', 'INTEGER')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
       CAST(SUM(CASE WHEN t = 'BOOLEAN' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bool,
       CAST(SUM(CASE WHEN t = 'VARCHAR' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_string,
       CAST(SUM(CASE WHEN t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null
FROM kv GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share
# ---------------------------------------------------------------------------
Q8_TYPE = "ECONOMY"
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_7"


def national_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    p_type: str = Q8_TYPE,
    r_name: str = Q8_REGION,
    supp_nation: str = Q8_NATION,
) -> DataFrame:
    """(o_year, mkt_share) — TPC-H Q8 (national market share): within
    one region's market for one part type, the share of revenue
    supplied by one nation, per order year. Reference query surface:
    the reference's SQL layer (db/__init__.py) runs arbitrary joins
    over its loaded tables; this is the 7-table exemplar.

    Scale: nation and region are FIXED 25/5-row dims → forced
    broadcast; the region filter prunes customer BEFORE its join to
    orders, and the p_type filter prunes part before lineitem — both
    reach the scans as PushedFilters via the join-side predicates.
    part/supplier/customer/orders grow with SF so their joins are
    AQE-gated (policy at the top of this file). Revenue is summed in
    exact cents for numerator and denominator separately; the share
    is ONE IEEE division of exact integers per year row."""
    cust_region = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == r_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    return (
        lineitem.join(
            part.where(F.col("p_type") == p_type).select("p_partkey"),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == cust_region.c_custkey)
        .join(supp_nat, lineitem.l_suppkey == supp_nat.s_suppkey)
        .select(
            F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
            rev_c.alias("rev_c"),
            F.when(F.col("supp_nation") == supp_nation, rev_c)
            .otherwise(F.lit(0))
            .alias("nat_c"),
        )
        .groupBy("o_year")
        .agg(
            F.sum("nat_c").alias("nat_c"),
            F.sum("rev_c").alias("rev_c"),
        )
        .select(
            "o_year",
            (
                F.col("nat_c").cast("double")
                / F.col("rev_c").cast("double")
            ).alias("mkt_share"),
        )
    )


def national_market_share_sql(
    p_type: str = Q8_TYPE,
    r_name: str = Q8_REGION,
    supp_nation: str = Q8_NATION,
) -> str:
    """Oracle twin of :func:`national_market_share`."""
    return f"""
SELECT year(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = '{supp_nation}' THEN rev_c
                ELSE 0 END) AS DOUBLE)
       / CAST(SUM(rev_c) AS DOUBLE) AS mkt_share
FROM (SELECT l_orderkey, l_partkey, l_suppkey,
             CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                  AS BIGINT) AS rev_c
      FROM lineitem) l
JOIN part ON l_partkey = p_partkey AND p_type = '{p_type}'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = '{r_name}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution
# ---------------------------------------------------------------------------
Q13_EXCLUDE_PRIORITY = "1-URGENT"


def customer_order_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str = Q13_EXCLUDE_PRIORITY,
) -> DataFrame:
    """(c_count, custdist) — TPC-H Q13 (customer distribution): how
    many customers placed exactly N qualifying orders, INCLUDING the
    zero-order customers the inner join would lose. The testdata has
    no o_comment, so the qualifying filter excludes one
    o_orderpriority class instead (same pre-join pruning shape).

    Scale: the orders side is pre-aggregated to (custkey, n) FIRST —
    one partial-agg groupBy on the fact table — and the LEFT join
    against customer is then key-to-key (AQE-gated; neither side is
    force-broadcast since both grow with SF). The final census
    groupBy is on c_count (bounded by max orders/customer)."""
    per_cust = (
        orders.where(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def customer_order_distribution_sql(
    exclude_priority: str = Q13_EXCLUDE_PRIORITY,
) -> str:
    """Oracle twin of :func:`customer_order_distribution`."""
    return f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey,
             COALESCE(n_orders, 0) AS c_count
      FROM customer
      LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
                 FROM orders
                 WHERE o_orderpriority <> '{exclude_priority}'
                 GROUP BY 1) po
        ON c_custkey = o_custkey)
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier by quarterly revenue
# ---------------------------------------------------------------------------
Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = Q15_START,
    end: str = Q15_END,
) -> DataFrame:
    """(s_suppkey, s_name, total_revenue) — TPC-H Q15 (top supplier):
    the supplier(s) whose shipped revenue over one quarter equals the
    global maximum (the original's CREATE VIEW + MAX subquery,
    expressed as one plan).

    Scale: the shipdate window prunes the lineitem scan (pushed);
    ONE partial-agg groupBy on suppkey produces per-supplier cents;
    the global max is a 1-row aggregate broadcast back over the
    per-supplier table (bounded by |supplier|, not |lineitem|).
    Cents-exact, so 'equals the maximum' is an integer equality —
    no float-tie hazard."""
    rev_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start))
            & (F.col("l_shipdate") < F.lit(end))
        )
        .select("l_suppkey", rev_c.alias("rev_c"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    mx = per_supp.agg(F.max("rev_c").alias("max_c"))
    return (
        per_supp.join(
            F.broadcast(mx), per_supp.rev_c == mx.max_c
        )
        .join(supplier, per_supp.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 100.0).alias("total_revenue"),
        )
    )


def top_supplier_revenue_sql(
    start: str = Q15_START, end: str = Q15_END
) -> str:
    """Oracle twin of :func:`top_supplier_revenue`."""
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
             AS BIGINT)) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{start}'
    AND l_shipdate < TIMESTAMP '{end}'
  GROUP BY 1)
SELECT s_suppkey, s_name,
       CAST(rev_c AS DOUBLE) / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT MAX(rev_c) FROM rev)
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity-order revenue
# ---------------------------------------------------------------------------
Q17_BRAND = "Brand#3"
Q17_SIZE = 5


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = Q17_BRAND,
    size: int = Q17_SIZE,
) -> DataFrame:
    """1 row (avg_yearly) — TPC-H Q17 (small-quantity-order revenue):
    yearly-average revenue lost if orders below 20% of a part's mean
    order quantity were no longer taken, over one brand + size slice
    (the testdata has no p_container; p_size stands in).

    Scale: the brand/size filter prunes part first and a broadcast-
    able key list prunes lineitem BEFORE the per-part average — the
    classic correlated subquery becomes one partial-agg groupBy on
    partkey over only the filtered parts' lineitems, rejoined to the
    same pruned rows. The 20% comparison is integer-exact:
    5·qty_d·cnt < sum_qty_d (deci-units both sides) avoids the float
    division entirely."""
    keys = part.where(
        (F.col("p_brand") == brand) & (F.col("p_size") == size)
    ).select("p_partkey")
    li = lineitem.join(
        keys, lineitem.l_partkey == keys.p_partkey
    ).select(
        "l_partkey",
        F.round(F.col("l_quantity") * 10).cast("long").alias("qty_d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    )
    stats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty_d").alias("sum_qty_d"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(stats, li.l_partkey == stats.pk)
        .where(
            F.col("qty_d") * F.col("cnt") * F.lit(5) < F.col("sum_qty_d")
        )
        .agg(
            (F.sum("price_c").cast("double") / F.lit(700.0)).alias(
                "avg_yearly"
            )
        )
    )


def small_quantity_revenue_sql(
    brand: str = Q17_BRAND, size: int = Q17_SIZE
) -> str:
    """Oracle twin of :func:`small_quantity_revenue`."""
    return f"""
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 10) AS BIGINT) AS qty_d,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}' AND p_size = {size}),
stats AS (
  SELECT l_partkey AS pk, SUM(qty_d) AS sum_qty_d,
         CAST(count(*) AS BIGINT) AS cnt
  FROM li GROUP BY 1)
SELECT CAST(SUM(price_c) AS DOUBLE) / 700.0 AS avg_yearly
FROM li JOIN stats ON l_partkey = pk
WHERE qty_d * cnt * 5 < sum_qty_d
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: dormant high-balance customers
# ---------------------------------------------------------------------------
Q22_CODES = ("11", "24", "37", "43", "56", "68", "92")
Q22_CUTOFF = "2000-01-01"


def dormant_customer_balance(
    customer: DataFrame,
    orders: DataFrame,
    codes: tuple = Q22_CODES,
    cutoff: str = Q22_CUTOFF,
) -> DataFrame:
    """(cntrycode, numcust, totacctbal) — TPC-H Q22 (global sales
    opportunity): customers in a set of country codes with
    above-average positive account balance and no orders since
    ``cutoff`` — likely buyers nobody is selling to (the original's
    "no orders in 7 years" dormancy window). The testdata has no
    c_phone, so the country code is the last two digits of c_name
    (the deterministic stand-in; same substring-bucket shape).

    Scale: the positive-balance average is ONE 2-value global agg
    (sum of cents + count) over the code-filtered customers; the
    above-average cut is the integer comparison bal_c·cnt > sum_c
    (no float average materialized). The no-recent-orders test is a
    LEFT ANTI join on custkey — Spark's dedicated null-safe exclusion
    join, which needs only the DISTINCT custkeys of the
    cutoff-filtered orders (the date filter is pushed to the scan and
    map-side combine collapses the fact table before the shuffle)."""
    coded = customer.select(
        "c_custkey",
        F.substring(F.col("c_name"), -2, 2).alias("cntrycode"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    ).where(F.col("cntrycode").isin(list(codes)))
    stats = coded.where(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        coded.join(F.broadcast(stats))
        .where(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
        .join(
            orders.where(F.col("o_orderdate") >= F.lit(cutoff))
            .select("o_custkey")
            .distinct(),
            coded.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c").cast("double") / 100.0).alias("totacctbal"),
        )
    )


def dormant_customer_balance_sql(
    codes: tuple = Q22_CODES, cutoff: str = Q22_CUTOFF
) -> str:
    """Oracle twin of :func:`dormant_customer_balance`."""
    code_list = ", ".join(f"'{c}'" for c in codes)
    return f"""
WITH coded AS (
  SELECT c_custkey,
         substring(c_name, length(c_name) - 1, 2) AS cntrycode,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
  WHERE substring(c_name, length(c_name) - 1, 2) IN ({code_list})),
stats AS (
  SELECT SUM(bal_c) AS sum_c, CAST(count(*) AS BIGINT) AS cnt
  FROM coded WHERE bal_c > 0)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM coded, stats
WHERE bal_c * cnt > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# k-anonymity generalization-ladder audit
# ---------------------------------------------------------------------------
KANON_K = 5


def k_anonymity_ladder(customer: DataFrame, k: int = KANON_K) -> DataFrame:
    """(level, n_classes, min_class, rows_at_risk, risk_ppm,
    k_anonymous) — the privacy-release audit: for each generalization
    level of the quasi-identifier tuple, the equivalence-class census
    that decides whether a dataset can be published k-anonymously.
    Levels (coarsening ladder): 0 = (nation, segment, $100 balance
    bucket); 1 = (nation, segment, $1000 bucket); 2 = (region =
    nation % 5, segment); 3 = (segment). Balance buckets shift by
    +$10000 first so the cents value is non-negative and integer
    division floors identically in every engine (acctbal goes down
    to -$999.85 in the testdata). ``rows_at_risk`` counts rows in classes
    smaller than k; ``risk_ppm`` is the exact integer ppm share.

    Scale: ONE scan — every row expands to its 4 generalized tuples
    map-side (explode of literal structs, the grouping-sets shape),
    one partial-agg groupBy per (level, class), one level groupBy for
    the census. No windows, no joins; class strings are bounded."""
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    levels = F.array(
        F.struct(
            F.lit(0).alias("level"),
            F.concat_ws(
                "|",
                F.col("c_nationkey"),
                F.col("c_mktsegment"),
                ((bal_c + F.lit(1000000)) / F.lit(10000)).cast("long"),
            ).alias("cls"),
        ),
        F.struct(
            F.lit(1).alias("level"),
            F.concat_ws(
                "|",
                F.col("c_nationkey"),
                F.col("c_mktsegment"),
                ((bal_c + F.lit(1000000)) / F.lit(100000)).cast("long"),
            ).alias("cls"),
        ),
        F.struct(
            F.lit(2).alias("level"),
            F.concat_ws(
                "|", F.col("c_nationkey") % F.lit(5), F.col("c_mktsegment")
            ).alias("cls"),
        ),
        F.struct(
            F.lit(3).alias("level"),
            F.col("c_mktsegment").alias("cls"),
        ),
    )
    classes = (
        customer.select(F.explode(levels).alias("g"))
        .select("g.level", "g.cls")
        .groupBy("level", "cls")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        classes.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min("n").alias("min_class"),
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)).alias(
                "rows_at_risk"
            ),
            F.sum("n").alias("total"),
        )
        .select(
            "level",
            "n_classes",
            "min_class",
            "rows_at_risk",
            (F.col("rows_at_risk") * F.lit(1000000) / F.col("total"))
            .cast("long")
            .alias("risk_ppm"),
            (F.col("min_class") >= k).alias("k_anonymous"),
        )
    )


def k_anonymity_ladder_sql(k: int = KANON_K) -> str:
    """Oracle twin of :func:`k_anonymity_ladder`."""
    return f"""
WITH g AS (
  SELECT 0 AS level,
         c_nationkey || '|' || c_mktsegment || '|' ||
         ((CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 10000)
           AS cls
  FROM customer
  UNION ALL
  SELECT 1,
         c_nationkey || '|' || c_mktsegment || '|' ||
         ((CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000)
  FROM customer
  UNION ALL
  SELECT 2, (c_nationkey % 5) || '|' || c_mktsegment FROM customer
  UNION ALL
  SELECT 3, c_mktsegment FROM customer),
classes AS (
  SELECT level, cls, count(*) AS n FROM g GROUP BY 1, 2)
SELECT level,
       CAST(count(*) AS BIGINT) AS n_classes,
       MIN(n) AS min_class,
       CAST(SUM(CASE WHEN n < {k} THEN n ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(SUM(CASE WHEN n < {k} THEN n ELSE 0 END) * 1000000 // SUM(n)
         AS BIGINT) AS risk_ppm,
       MIN(n) >= {k} AS k_anonymous
FROM classes GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change
# ---------------------------------------------------------------------------
Q6_START = "1996-01-01"
Q6_END = "1997-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY = 24.0


def forecast_revenue_change(
    lineitem: DataFrame,
    start: str = Q6_START,
    end: str = Q6_END,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    qty_below: float = Q6_QTY,
) -> DataFrame:
    """1 row (revenue) — TPC-H Q6 (forecast revenue change): the
    revenue that would have been gained by eliminating small-quantity
    discounts in one year. The simplest TPC-H query and the purest
    pushdown test: every predicate is a scan-level range filter, the
    plan is scan → filter → one partial agg — no joins, no shuffle
    beyond the 1-row final merge.

    Exactness: the discount band compares in exact basis points
    (round(discount·10⁴)) and quantity in deci-units, so boundary
    rows land identically in every engine; revenue sums
    extendedprice·discount in exact hundredths-of-cents. The exact
    predicates wrap the column in round() and thus can't reach the
    scan, so slightly-widened RAW hull prefilters ride ahead of them
    (the Q19 pattern): the hulls push into PushedFilters, the exact
    band decides the boundary rows."""
    disc_bp = F.round(F.col("l_discount") * 10000).cast("long")
    qty_d = F.round(F.col("l_quantity") * 10).cast("long")
    rev_hc = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10000
    ).cast("long")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start))
            & (F.col("l_shipdate") < F.lit(end))
            # pushable hulls (widened by one cent / one unit)
            & (F.col("l_discount") >= disc_lo - 0.01)
            & (F.col("l_discount") <= disc_hi + 0.01)
            & (F.col("l_quantity") < qty_below + 1.0)
            # exact residual band
            & disc_bp.between(
                int(disc_lo * 10000), int(disc_hi * 10000)
            )
            & (qty_d < int(qty_below * 10))
        )
        .agg(
            (F.sum(rev_hc).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            )
        )
    )


def forecast_revenue_change_sql(
    start: str = Q6_START,
    end: str = Q6_END,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    qty_below: float = Q6_QTY,
) -> str:
    """Oracle twin of :func:`forecast_revenue_change`."""
    return f"""
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
  AND l_discount >= {disc_lo - 0.01!r} AND l_discount <= {disc_hi + 0.01!r}
  AND l_quantity < {qty_below + 1.0!r}
  AND CAST(round(l_discount * 10000) AS BIGINT)
      BETWEEN {int(disc_lo * 10000)} AND {int(disc_hi * 10000)}
  AND CAST(round(l_quantity * 10) AS BIGINT) < {int(qty_below * 10)}
""".strip()


# ---------------------------------------------------------------------------
# CUSUM change-point detection over hourly event rates
# ---------------------------------------------------------------------------
CUSUM_SLACK_PCT = 10  # slack k = 10% of the per-type hourly mean
CUSUM_H_MULT = 5  # alarm threshold h = 5x the per-type hourly mean


def cusum_alarms(
    events: DataFrame,
    slack_pct: int = CUSUM_SLACK_PCT,
    h_mult: int = CUSUM_H_MULT,
) -> DataFrame:
    """(event_type, hour_ms, n_events, s_centi) — CUSUM (cumulative
    sum control chart) change-point alarms over the gapfilled hourly
    rate of each event type: the sequential-detection complement to
    rate_anomalies' trailing z-scores (CUSUM accumulates small
    sustained shifts a windowed z-score never trips on).

    The recursion s_t = max(0, s_{t-1} + x_t − μ − k) is NOT a plain
    running sum — but it has the classic closed form
    s_t = P_t − min(0, min_{j≤t} P_j) over the drift prefix sums
    P_t = Σ(x_i − μ − k), so it is computed with TWO window
    functions (a running sum and a running min), no fold, no HOF, no
    recursion. Both windows are partitioned by event_type and bounded
    by the TIME DOMAIN (hours in span), not by event volume — the
    same state argument as the fixed-grid streaming quantiles.

    Exactness: μ and k are exact centi-rates (total·100 DIV hours;
    slack = slack_pct% of μ floored), drifts and prefix sums are
    BIGINT centi-units, so alarms are integer comparisons. Emits only
    rows where s_t > h_mult·μ_centi."""
    hdiv = F.expr(f"unix_millis(ts) div {HOUR_MS}")
    hours = events.select(hdiv.alias("h"))
    span = hours.agg(F.min("h").alias("h_min"), F.max("h").alias("h_max"))
    grid_h = span.select(
        F.explode(F.sequence(F.col("h_min"), F.col("h_max"))).alias("h"),
        (F.col("h_max") - F.col("h_min") + 1).alias("n_hours"),
    )
    counts = (
        events.select("event_type", hdiv.alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("total"))
    dense = (
        totals.crossJoin(grid_h)
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.expr("total * 100 div n_hours").alias("mu_c"),
        )
        .withColumn(
            "k_c", F.expr(f"mu_c * {int(slack_pct)} div 100")
        )
        .withColumn("drift_c", F.col("n") * 100 - F.col("mu_c") - F.col("k_c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = F.col("p_c") - F.least(F.min("p_c").over(w), F.lit(0))
    return (
        dense.withColumn("p_c", F.sum("drift_c").over(w))
        .withColumn("s_c", s)
        .where(F.col("s_c") > F.col("mu_c") * h_mult)
        .select(
            "event_type",
            (F.col("h") * HOUR_MS).alias("hour_ms"),
            F.col("n").alias("n_events"),
            F.col("s_c").alias("s_centi"),
        )
    )


def cusum_alarms_sql(
    slack_pct: int = CUSUM_SLACK_PCT, h_mult: int = CUSUM_H_MULT
) -> str:
    """Oracle twin of :func:`cusum_alarms`."""
    return f"""
{EV_CTE},
hours AS (SELECT epoch_ms(ts) // {HOUR_MS} AS h FROM ev),
span AS (SELECT min(h) AS h_min, max(h) AS h_max,
                max(h) - min(h) + 1 AS n_hours FROM hours),
grid_h AS (SELECT unnest(range(h_min, h_max + 1)) AS h, n_hours
           FROM span),
counts AS (
  SELECT event_type, epoch_ms(ts) // {HOUR_MS} AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2),
totals AS (SELECT event_type, SUM(n) AS total FROM counts GROUP BY 1),
dense AS (
  SELECT t.event_type, g.h, coalesce(c.n, 0) AS n,
         t.total * 100 // g.n_hours AS mu_c,
         (t.total * 100 // g.n_hours) * {int(slack_pct)} // 100 AS k_c
  FROM totals t CROSS JOIN grid_h g
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = g.h),
pref AS (
  SELECT event_type, h, n, mu_c,
         SUM(n * 100 - mu_c - k_c) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS UNBOUNDED PRECEDING) AS p_c
  FROM dense),
cusum AS (
  SELECT event_type, h, n, mu_c,
         p_c - least(MIN(p_c) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS UNBOUNDED PRECEDING), 0) AS s_c
  FROM pref)
SELECT event_type, h * {HOUR_MS} AS hour_ms,
       CAST(n AS BIGINT) AS n_events, CAST(s_c AS BIGINT) AS s_centi
FROM cusum WHERE s_c > mu_c * {int(h_mult)}
""".strip()


# ---------------------------------------------------------------------------
# incremental view maintenance: delta-apply a CDC batch onto a rollup
# ---------------------------------------------------------------------------
def snapshot_rollup(snapshot: DataFrame) -> DataFrame:
    """(last_type, n_users, total_value) — the materialized aggregate
    over a :func:`cdc_snapshot`-shaped profile table (cents-exact)."""
    return (
        snapshot.groupBy("last_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.round(F.col("last_value") * 100).cast("long")
            ).alias("cents"),
        )
        .select(
            "last_type",
            "n_users",
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
        )
    )


def rollup_apply_changes(
    snapshot: DataFrame, rollup: DataFrame, changes: DataFrame
) -> DataFrame:
    """(last_type, n_users, total_value) — INCREMENTAL view
    maintenance: apply a CDC change batch to a materialized rollup
    WITHOUT recomputing it from the base table. The lakehouse pattern
    behind streaming-refreshed dashboards: work scales with the
    BATCH, not the base.

    Mechanics: the batch's touched keys are semi-joined out of the
    old snapshot (key-pruned access — the only base read); their old
    contributions are SUBTRACTED from the rollup, the merged new
    per-key states (latest-wins incl. deletes, via
    :func:`merge_upsert` on just the touched slice) are ADDED, and
    groups whose count reaches zero drop — so the result is
    row-identical to a full recompute over the merged stream, which
    is exactly what the oracle computes (the driver comparison proves
    the IVM identity itself, not just the arithmetic).

    Exactness: counts and cents deltas are BIGINT; the ±rollup merge
    is one groupBy over |rollup| + 2·|touched| rows."""
    keys = changes.select(
        F.col("user_id").alias("k")
    ).distinct()
    touched = snapshot.join(
        keys, snapshot.user_id == keys.k, "left_semi"
    )
    cents = F.round(F.col("last_value") * 100).cast("long")
    subs = touched.select(
        "last_type",
        F.lit(-1).cast("long").alias("dn"),
        (-cents).alias("dc"),
    )
    adds = merge_upsert(touched, changes).select(
        "last_type",
        F.lit(1).cast("long").alias("dn"),
        cents.alias("dc"),
    )
    base = rollup.select(
        "last_type",
        F.col("n_users").cast("long").alias("dn"),
        F.round(F.col("total_value") * 100).cast("long").alias("dc"),
    )
    return (
        base.unionByName(subs)
        .unionByName(adds)
        .groupBy("last_type")
        .agg(F.sum("dn").alias("n_users"), F.sum("dc").alias("cents"))
        .where(F.col("n_users") > 0)
        .select(
            "last_type",
            "n_users",
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
        )
    )


def snapshot_rollup_sql() -> str:
    """Oracle of the INCREMENTAL path: the one-pass full recompute
    over the merged stream — equality proves the IVM identity."""
    return f"""
WITH snap AS ({cdc_snapshot_sql()})
SELECT last_type, CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(CAST(round(last_value * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_value
FROM snap GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# Benford first-digit audit (data-quality / fraud screening)
# ---------------------------------------------------------------------------
#: expected Benford shares in exact ppm (floor(log10(1+1/d) * 1e6))
BENFORD_PPM = (301029, 176091, 124938, 96910, 79181, 66946, 57991,
               51152, 45757)


def _first_digit_ladder(col: str) -> str:
    """First significant digit of a positive BIGINT as a fixed CASE
    ladder (no float log10 — a power-of-ten boundary must never land
    on the wrong side); covers the full BIGINT range."""
    branches = "\n".join(
        f"      WHEN {col} >= {10 ** p} THEN {col} DIV {10 ** (p)}"
        for p in range(18, 0, -1)
    )
    return f"CASE\n{branches}\n      ELSE {col} END"


def benford_audit(orders: DataFrame) -> DataFrame:
    """(digit, n_obs, share_ppm, benford_ppm, dev_ppm) — first-digit
    distribution of order totals vs Benford's law: the standard
    data-quality / fraud screen for naturally-occurring amounts
    (fabricated or truncated data drifts from the log-uniform
    first-digit law).

    Exactness: amounts become exact cents; the first digit comes from
    a fixed integer CASE ladder (never float log10 — a power-of-ten
    boundary must not land on the wrong side); observed shares are
    floored integer ppm and the expected shares are embedded
    floor(log10(1+1/d)·1e6) constants, so the deviation column is an
    exact integer in both engines. One scan, one 9-row groupBy."""
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    ladder = _first_digit_ladder("c")
    per_digit = (
        orders.selectExpr(f"{cents} AS c")
        .where(F.col("c") > 0)
        .selectExpr(f"{ladder} AS digit")
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = per_digit.agg(F.sum("n_obs").alias("total"))
    expected = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_PPM]), F.col("digit").cast("int")
    ).cast("long")
    return (
        per_digit.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.expr("n_obs * 1000000 div total").alias("share_ppm"),
            expected.alias("benford_ppm"),
            (
                F.expr("n_obs * 1000000 div total") - expected
            ).alias("dev_ppm"),
        )
    )


def benford_audit_sql() -> str:
    """Oracle twin of :func:`benford_audit`."""
    ladder = _first_digit_ladder("c").replace("DIV", "//")
    ppm = ", ".join(str(p) for p in BENFORD_PPM)
    return f"""
WITH amounts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
digits AS (
  SELECT {ladder} AS digit FROM amounts WHERE c > 0),
per_digit AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
  FROM digits GROUP BY 1),
tot AS (SELECT SUM(n_obs) AS total FROM per_digit)
SELECT digit, n_obs,
       CAST(n_obs * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(([{ppm}])[CAST(digit AS INT)] AS BIGINT) AS benford_ppm,
       CAST(n_obs * 1000000 // total
         - ([{ppm}])[CAST(digit AS INT)] AS BIGINT) AS dev_ppm
FROM per_digit CROSS JOIN tot
""".strip()


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest
# ---------------------------------------------------------------------------
FC_TRAIN_DAYS = 23
FC_HOURS_PER_DAY = 24


def forecast_backtest(
    events: DataFrame, train_days: int = FC_TRAIN_DAYS
) -> DataFrame:
    """(event_type, n_test_hours, mae_milli, naive_mae_milli,
    skill_ppm) — the model-quality loop every rate-forecasting
    pipeline needs: fit a seasonal profile (mean count per hour-of-day
    over the first ``train_days``), forecast the remaining days
    seasonal-naively, and score it against the actuals NEXT to the
    persistence baseline (forecast = same hour yesterday).
    ``skill_ppm`` = 1e6·(1 − mae/naive_mae), floored — positive means
    the profile beats persistence.

    Exactness: profile means are exact milli-counts (sum·1000 DIV
    days); absolute errors are BIGINT milli-units; MAE divisions are
    floored integer milli/ppm — no float enters at all.

    Scale: the gapfilled dense grid is |types|×|hours| (time-domain
    bounded); the profile is one groupBy of the train slice; the
    persistence baseline is one lag window per type; one final
    9-column agg per type."""
    hdiv = F.expr(f"unix_millis(ts) div {HOUR_MS}")
    hours = events.select(hdiv.alias("h"))
    span = hours.agg(F.min("h").alias("h_min"), F.max("h").alias("h_max"))
    grid_h = span.select(
        F.explode(F.sequence(F.col("h_min"), F.col("h_max"))).alias("h"),
        F.col("h_min"),
    )
    types = events.select("event_type").distinct()
    counts = (
        events.select("event_type", hdiv.alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    dense = (
        types.crossJoin(grid_h)
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            ((F.col("h") - F.col("h_min"))
             / F.lit(FC_HOURS_PER_DAY)).cast("long").alias("day"),
            (F.col("h") % F.lit(FC_HOURS_PER_DAY)).alias("hod"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    profile = (
        dense.where(F.col("day") < train_days)
        .groupBy("event_type", "hod")
        .agg(
            F.expr("sum(n) * 1000 div count(*)").alias("pred_milli")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    test = (
        dense.withColumn(
            "prev_day_n", F.lag("n", FC_HOURS_PER_DAY).over(w)
        )
        .where(F.col("day") >= train_days)
        .join(profile, ["event_type", "hod"])
    )
    return (
        test.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test_hours"),
            F.sum(
                F.abs(F.col("n") * 1000 - F.col("pred_milli"))
            ).alias("err_milli"),
            F.sum(
                F.abs(
                    (F.col("n") - F.coalesce(F.col("prev_day_n"), F.lit(0)))
                    * 1000
                )
            ).alias("naive_milli"),
        )
        .select(
            "event_type",
            "n_test_hours",
            F.expr("err_milli div n_test_hours").alias("mae_milli"),
            F.expr("naive_milli div n_test_hours").alias("naive_mae_milli"),
            F.expr(
                "1000000 - err_milli * 1000000 div "
                "greatest(naive_milli, 1)"
            ).alias("skill_ppm"),
        )
    )


def forecast_backtest_sql(train_days: int = FC_TRAIN_DAYS) -> str:
    """Oracle twin of :func:`forecast_backtest`."""
    return f"""
{EV_CTE},
hours AS (SELECT epoch_ms(ts) // {HOUR_MS} AS h FROM ev),
span AS (SELECT min(h) AS h_min, max(h) AS h_max FROM hours),
grid_h AS (SELECT unnest(range(h_min, h_max + 1)) AS h, h_min FROM span),
types AS (SELECT DISTINCT event_type FROM ev),
counts AS (
  SELECT event_type, epoch_ms(ts) // {HOUR_MS} AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2),
dense AS (
  SELECT t.event_type, g.h,
         (g.h - g.h_min) // {FC_HOURS_PER_DAY} AS day,
         g.h % {FC_HOURS_PER_DAY} AS hod,
         coalesce(c.n, 0) AS n
  FROM types t CROSS JOIN grid_h g
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = g.h),
profile AS (
  SELECT event_type, hod, SUM(n) * 1000 // count(*) AS pred_milli
  FROM dense WHERE day < {train_days} GROUP BY 1, 2),
lagged AS (
  -- lag over the FULL dense grid BEFORE the profile join (matching
  -- the Spark plan): lagging after an inner join would silently stop
  -- meaning "same hour yesterday" whenever the join drops rows (e.g.
  -- a train slice that misses some (event_type, hod) cell)
  SELECT event_type, h, day, hod, n,
         lag(n, {FC_HOURS_PER_DAY}) OVER (
           PARTITION BY event_type ORDER BY h) AS prev_day_n
  FROM dense),
test AS (
  SELECT d.event_type, d.n, p.pred_milli, d.prev_day_n, d.day
  FROM lagged d JOIN profile p
    ON d.event_type = p.event_type AND d.hod = p.hod),
scored AS (SELECT * FROM test WHERE day >= {train_days})
SELECT event_type, CAST(count(*) AS BIGINT) AS n_test_hours,
       CAST(SUM(abs(n * 1000 - pred_milli)) // count(*) AS BIGINT)
         AS mae_milli,
       CAST(SUM(abs((n - coalesce(prev_day_n, 0)) * 1000)) // count(*)
         AS BIGINT) AS naive_mae_milli,
       CAST(1000000 - SUM(abs(n * 1000 - pred_milli)) * 1000000
         // greatest(SUM(abs((n - coalesce(prev_day_n, 0)) * 1000)), 1)
         AS BIGINT) AS skill_ppm
FROM scored GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# autocorrelation function over hourly rates (seasonality diagnostics)
# ---------------------------------------------------------------------------
ACF_MAX_LAG = 24


def hourly_acf(events: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """(event_type, lag, n_pairs, acf) — Pearson autocorrelation of
    the gapfilled hourly counts at lags 1..``max_lag``: the
    seasonality diagnostic behind period selection for the forecast
    profile (a daily cycle shows as the lag-24 peak).

    Exactness: every sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²
    per (type, lag)) is an exact BIGINT; the Pearson assembly uses
    products < 2⁵³ (exact in double), one IEEE sqrt (correctly
    rounded by the standard) and one division — identical integer
    inputs therefore give bit-identical doubles in both engines.

    Scale: the dense grid is time-domain bounded; the lag fan-out is
    one explode (×max_lag) joined back on (type, h+lag) — one
    partial-agg groupBy per (type, lag), no windows over raw
    events."""
    hdiv = F.expr(f"unix_millis(ts) div {HOUR_MS}")
    hours = events.select(hdiv.alias("h"))
    span = hours.agg(F.min("h").alias("h_min"), F.max("h").alias("h_max"))
    grid_h = span.select(
        F.explode(F.sequence(F.col("h_min"), F.col("h_max"))).alias("h")
    )
    types = events.select("event_type").distinct()
    counts = (
        events.select("event_type", hdiv.alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    dense = (
        types.crossJoin(grid_h)
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type", "h", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    lagged = dense.select(
        "event_type",
        "h",
        F.col("n").alias("x"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_lag)))
        ).alias("lag"),
    )
    rhs = dense.select(
        F.col("event_type").alias("event_type"),
        F.col("h").alias("h2"),
        F.col("n").alias("y"),
    )
    pairs = lagged.join(
        rhs,
        (lagged.event_type == rhs.event_type)
        & (rhs.h2 == lagged.h + lagged.lag),
    ).select(lagged.event_type, "lag", "x", "y")
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (
        F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return stats.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("np").alias("n_pairs"),
        F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0)).alias(
            "acf"
        ),
    )


def hourly_acf_sql(max_lag: int = ACF_MAX_LAG) -> str:
    """Oracle twin of :func:`hourly_acf` — identical integer
    sufficient statistics, identical Pearson assembly."""
    return f"""
{EV_CTE},
hours AS (SELECT epoch_ms(ts) // {HOUR_MS} AS h FROM ev),
span AS (SELECT min(h) AS h_min, max(h) AS h_max FROM hours),
grid_h AS (SELECT unnest(range(h_min, h_max + 1)) AS h FROM span),
types AS (SELECT DISTINCT event_type FROM ev),
counts AS (
  SELECT event_type, epoch_ms(ts) // {HOUR_MS} AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2),
dense AS (
  SELECT t.event_type, g.h, coalesce(c.n, 0) AS n
  FROM types t CROSS JOIN grid_h g
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = g.h),
pairs AS (
  SELECT a.event_type, l.lag, a.n AS x, b.n AS y
  FROM dense a
  CROSS JOIN (SELECT unnest(range(1, {int(max_lag)} + 1)) AS lag) l
  JOIN dense b ON b.event_type = a.event_type AND b.h = a.h + l.lag),
stats AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS np,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs GROUP BY 1, 2)
SELECT event_type, CAST(lag AS BIGINT) AS lag, np AS n_pairs,
       CASE WHEN sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                      * CAST(np * syy - sy * sy AS DOUBLE)) > 0
            THEN round(CAST(np * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                              * CAST(np * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS acf
FROM stats
""".strip()


# ---------------------------------------------------------------------------
# A/B experiment readout (r8)
# ---------------------------------------------------------------------------


def ab_test_report(events: DataFrame) -> DataFrame:
    """One-row A/B readout: (n_ctrl, n_trt, conv_ctrl, conv_trt,
    cr_ctrl_ppm, cr_trt_ppm, lift_ppm, z_milli_floor) — users are
    assigned to arms by salted id hash (the deterministic holdout
    assignment an event pipeline ships: same user, same arm, across
    engines/runs), conversion = the user logged MORE purchases than
    views (a scale-free per-user flag — the synthetic feed gives
    every user every event type, so mere presence would saturate),
    and the readout carries exact integer counts/rates plus the
    two-proportion z statistic (0 when the pooled variance is 0,
    mirrored in the oracle).

    Exactness: counts and ppm rates are BIGINT; the z-score is the
    only float — assembled from the exact integers in ONE fixed
    expression order (pooled p, variance, sqrt, divide) and FLOORED to
    milli (floor, not round: both engines floor doubles identically,
    while round-at-half conventions differ for negatives).

    Plan: one user_id-keyed aggregation (per-user conversion flag +
    arm tag computed map-side), then a 2-row arm rollup pivoted into
    the single row by conditional aggregation — nothing after the
    first shuffle is corpus-sized."""
    from ..functions.hashing import md5_int60_col

    arm = (
        md5_int60_col(
            F.concat(F.lit("ab:"), F.col("user_id").cast("string"))
        )
        % 2
    ).cast("int")
    per_user = (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                > F.sum(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                ),
                1,
            )
            .otherwise(0)
            .alias("conv")
        )
        .select(arm.alias("arm"), "conv")
    )
    row = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ctrl"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_trt"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_ctrl"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_trt"),
    )
    p0 = F.col("conv_ctrl").cast("double") / F.col("n_ctrl").cast("double")
    p1 = F.col("conv_trt").cast("double") / F.col("n_trt").cast("double")
    pool = (F.col("conv_ctrl") + F.col("conv_trt")).cast("double") / (
        F.col("n_ctrl") + F.col("n_trt")
    ).cast("double")
    conv_tot = F.col("conv_ctrl") + F.col("conv_trt")
    n_tot = F.col("n_ctrl") + F.col("n_trt")
    z = F.when(
        (conv_tot == 0) | (conv_tot == n_tot), F.lit(0.0)
    ).otherwise(
        (p1 - p0)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (
                F.lit(1.0) / F.col("n_ctrl").cast("double")
                + F.lit(1.0) / F.col("n_trt").cast("double")
            )
        )
    )
    return row.select(
        "n_ctrl",
        "n_trt",
        "conv_ctrl",
        "conv_trt",
        F.expr("conv_ctrl * 1000000 div n_ctrl")
        .cast("long")
        .alias("cr_ctrl_ppm"),
        F.expr("conv_trt * 1000000 div n_trt")
        .cast("long")
        .alias("cr_trt_ppm"),
        (
            F.expr("conv_trt * 1000000 div n_trt")
            - F.expr("conv_ctrl * 1000000 div n_ctrl")
        )
        .cast("long")
        .alias("lift_ppm"),
        F.floor(z * 1000).cast("long").alias("z_milli_floor"),
    )


def ab_test_report_sql() -> str:
    """Oracle twin of :func:`ab_test_report`."""
    from ..functions.hashing import md5_int60_sql

    return f"""
{EV_CTE},
keyed AS (
  SELECT user_id, 'ab:' || CAST(user_id AS VARCHAR) AS k,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS v
  FROM ev),
per_user AS (
  SELECT CAST({md5_int60_sql("min(k)")} % 2 AS INT) AS arm,
         CASE WHEN SUM(p) > SUM(v) THEN 1 ELSE 0 END AS conv
  FROM keyed GROUP BY user_id),
row_agg AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ctrl,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_trt,
         CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_ctrl,
         CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_trt
  FROM per_user)
SELECT n_ctrl, n_trt, conv_ctrl, conv_trt,
       CAST(conv_ctrl * 1000000 // n_ctrl AS BIGINT) AS cr_ctrl_ppm,
       CAST(conv_trt * 1000000 // n_trt AS BIGINT) AS cr_trt_ppm,
       CAST(conv_trt * 1000000 // n_trt
            - conv_ctrl * 1000000 // n_ctrl AS BIGINT) AS lift_ppm,
       CAST(CASE WHEN conv_ctrl + conv_trt = 0
                   OR conv_ctrl + conv_trt = n_ctrl + n_trt THEN 0
            ELSE floor((CAST(conv_trt AS DOUBLE) / CAST(n_trt AS DOUBLE)
                   - CAST(conv_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE))
            / sqrt((CAST(conv_ctrl + conv_trt AS DOUBLE)
                    / CAST(n_ctrl + n_trt AS DOUBLE))
                   * (1.0 - CAST(conv_ctrl + conv_trt AS DOUBLE)
                            / CAST(n_ctrl + n_trt AS DOUBLE))
                   * (1.0 / CAST(n_ctrl AS DOUBLE)
                      + 1.0 / CAST(n_trt AS DOUBLE))) * 1000)
            END AS BIGINT) AS z_milli_floor
FROM row_agg
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — shipping-lag vs order-priority two-way audit.
# The testdata lineitem carries no l_shipmode/l_commitdate/l_receiptdate
# (reduced schema, see order_priority_check), so Q12's "mode" dimension
# becomes the SHIP-LAG CLASS (days from order to ship) — the same
# conditional two-way count shape over the same join.
# ---------------------------------------------------------------------------
Q12_START = "1996-01-01"
Q12_END = "1998-01-01"


def ship_lag_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = Q12_START,
    end: str = Q12_END,
) -> DataFrame:
    """(lag_class, high_line_count, low_line_count) — TPC-H Q12
    adapted: lines shipped in the window are classed by ship lag
    (early <0 days, fast 0–89, normal 90–364, slow ≥365 — the
    synthetic dates are independent so negative lags exist) and
    counted into high-priority (1-URGENT/2-HIGH) vs low-priority
    lines per class — the "is expedited freight actually expedited"
    audit.

    Scale: the l_shipdate window filter pushes to the lineitem scan;
    ONE shuffle pair on the order key joins the pruned lineitem to
    orders (both sides scale with SF — no broadcast); the class is a
    map-side CASE on datediff; the final agg is 4 groups with
    map-side partials."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    j = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    lag_class = (
        F.when(lag < 0, "early")
        .when(lag < 90, "fast")
        .when(lag < 365, "normal")
        .otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(lag_class.alias("lag_class"), high.alias("high"))
        .groupBy("lag_class")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("high"), 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("lag_class")
    )


def ship_lag_priority_sql(start: str = Q12_START, end: str = Q12_END) -> str:
    lag = "datediff('day', o_orderdate, l_shipdate)"
    return f"""
SELECT CASE WHEN {lag} < 0 THEN 'early'
            WHEN {lag} < 90 THEN 'fast'
            WHEN {lag} < 365 THEN 'normal'
            ELSE 'slow' END AS lag_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — suppliers who kept waiting multi-supplier orders.
# "Late" is ship lag > LATE_DAYS after the order date (no receipt/
# commit dates in the reduced schema); the distinctive Q21 machinery —
# EXISTS another supplier's line on the same order AND NOT EXISTS
# another supplier's late line — is intact.
# ---------------------------------------------------------------------------
Q21_LATE_DAYS = 60
Q21_TOPK = 20


def late_sole_blockers(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = Q21_LATE_DAYS,
    k: int = Q21_TOPK,
) -> DataFrame:
    """(s_name, numwait, rank) — TPC-H Q21: for finalized orders
    ('F') with lines from ≥2 suppliers, count per supplier the orders
    where THEIR line shipped late (> ``late_days`` after the order
    date) and NO OTHER supplier's line did — the supplier is the sole
    blocker. Top ``k`` by numwait desc, s_name.

    Scale: lineitem joins orders once on the order key (the lateness
    predicate rides as a residual), then ONE self-join pair on
    l_orderkey implements both EXISTS branches as a single
    other-lines aggregate (any_other, any_other_late) instead of two
    correlated passes — Spark's aggregate-then-join form of Q21. The
    supplier dim is broadcast; top-k is TakeOrdered."""
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    ords = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = li.join(
        ords, li.l_orderkey == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
        ).alias("late"),
    )
    # per (order, supplier): did THIS supplier ship late on the order?
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late")).alias("supp_late")
    )
    # per order: supplier count + late-supplier count (one agg
    # replaces both correlated EXISTS probes)
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).alias("n_late"),
    )
    blockers = (
        per_supp.filter(F.col("supp_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    counts = blockers.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    named = counts.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")),
        counts.l_suppkey == F.col("s_suppkey"),
    ).select("s_name", "numwait")
    top = named.orderBy(F.col("numwait").desc(), "s_name").limit(k)
    w = F.row_number().over(
        Window.orderBy(F.col("numwait").desc(), F.col("s_name"))
    )
    return top.withColumn("rank", w.cast("int"))


def late_sole_blockers_sql(
    late_days: int = Q21_LATE_DAYS, k: int = Q21_TOPK
) -> str:
    return f"""
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {int(late_days)} DAYS AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_supp AS (
  SELECT l_orderkey, l_suppkey, max(late) AS supp_late
  FROM lines GROUP BY 1, 2),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp,
         sum(CASE WHEN supp_late THEN 1 ELSE 0 END) AS n_late
  FROM per_supp GROUP BY 1),
counts AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
  FROM per_supp ps JOIN per_order po USING (l_orderkey)
  WHERE ps.supp_late AND po.n_supp >= 2 AND po.n_late = 1
  GROUP BY 1)
SELECT s_name, numwait, rank FROM (
  SELECT s.s_name, c.numwait,
         CAST(row_number() OVER (ORDER BY c.numwait DESC, s.s_name)
              AS INT) AS rank
  FROM counts c JOIN supplier s ON s.s_suppkey = c.l_suppkey)
WHERE rank <= {int(k)}
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — important parts by revenue share. The reduced
# schema has no partsupp (ps_supplycost·ps_availqty), so "value" is
# discounted lineitem revenue per part. TPC-H's own fraction is
# SF-dependent (0.0001/SF); the scale-free equivalent is a MULTIPLE
# OF THE MEAN part revenue — same HAVING-over-global machinery,
# non-degenerate at every SF.
# ---------------------------------------------------------------------------
Q11_MEAN_PERMILLE = 1300  # keep parts with > 1.3x the mean revenue
Q11_TOPK = 25


def important_parts(
    lineitem: DataFrame,
    part: DataFrame,
    mean_permille: int = Q11_MEAN_PERMILLE,
    k: int = Q11_TOPK,
) -> DataFrame:
    """(p_partkey, p_name, revenue, rank) — TPC-H Q11 shape: the top
    ``k`` parts among those whose discounted revenue exceeds
    ``mean_permille``/1000 of the MEAN per-part revenue. Exact:
    per-part and total revenue are decimal sums; membership compares
    integer-scaled decimals — rev·(n_parts·1000) > total·permille —
    with every intermediate BOUNDED to fit decimal(38,4) exactly
    (r9 ADVICE: the unbounded form rev(38,4)·bigint·1000 exceeded
    precision 38, where Spark rounds and DuckDB promotes differently,
    so 'exact' could break near the threshold at large totals). The
    bounds — rev as decimal(23,4) (per-part revenue < 10^19 currency
    units), n_parts·1000 as decimal(14,0) (< 10^11 parts), tot as
    decimal(33,4) (< 10^29 total) — make both products land exactly
    in decimal(38,4) on both engines; any 100 TB corpus sits many
    orders of magnitude inside them. Failure-mode asymmetry if the
    rev bound were ever exceeded (r10 ADVICE, documented): with ANSI
    mode off, Spark turns the overflowing decimal(23,4) cast into
    NULL — the comparison is NULL and that part silently leaves the
    membership — while the DuckDB twin raises on the same overflow.
    At 10^19 currency units per part this is unreachable (the whole
    100 TB corpus's revenue is ~10 orders below it), so we document
    rather than spend a per-row assert; re-derive the bound before
    reusing this shape on wider inputs.

    Scale: ONE shuffle on l_partkey for the per-part agg; the 1-row
    (total, n_parts) agg broadcasts into the filter; the part dim
    joins broadcast; top-k is TakeOrdered."""
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(disc).cast("decimal(23,4)").alias("rev")
    )
    tot = per_part.agg(
        F.sum("rev").cast("decimal(33,4)").alias("tot"),
        (F.count(F.lit(1)) * 1000).cast("decimal(14,0)").alias("np1000"),
    )
    kept = per_part.crossJoin(F.broadcast(tot)).filter(
        F.col("rev") * F.col("np1000")
        > F.col("tot") * F.lit(int(mean_permille)).cast("decimal(4,0)")
    )
    named = kept.join(
        F.broadcast(part.select("p_partkey", "p_name")),
        kept.l_partkey == F.col("p_partkey"),
    ).select(
        "p_partkey", "p_name", F.col("rev").cast("double").alias("revenue")
    )
    top = named.orderBy(F.col("revenue").desc(), "p_partkey").limit(k)
    w = F.row_number().over(
        Window.orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    )
    return top.withColumn("rank", w.cast("int"))


def important_parts_sql(
    mean_permille: int = Q11_MEAN_PERMILLE, k: int = Q11_TOPK
) -> str:
    return f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,4))) AS DECIMAL(23,4)) AS rev
  FROM lineitem GROUP BY 1),
tot AS (
  SELECT CAST(sum(rev) AS DECIMAL(33,4)) AS tot,
         CAST(count(*) * 1000 AS DECIMAL(14,0)) AS np1000
  FROM per_part)
SELECT p_partkey, p_name, revenue, rank FROM (
  SELECT p.p_partkey, p.p_name, CAST(pp.rev AS DOUBLE) AS revenue,
         CAST(row_number() OVER (ORDER BY CAST(pp.rev AS DOUBLE) DESC,
                                 p.p_partkey) AS INT) AS rank
  FROM per_part pp CROSS JOIN tot
  JOIN part p ON p.p_partkey = pp.l_partkey
  WHERE pp.rev * tot.np1000
        > tot.tot * CAST({int(mean_permille)} AS DECIMAL(4,0)))
WHERE rank <= {int(k)}
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — supplier variety per part segment. No partsupp:
# the (brand, type, size) → distinct-supplier count comes from the
# lineitem↔part join; "complaint" suppliers (Q16's NOT IN subquery)
# are proxied by negative account balance.
# ---------------------------------------------------------------------------
Q16_EXCL_BRAND = "Brand#1"
Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 23)
Q16_TOPK = 20


def part_supplier_variety(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = Q16_EXCL_BRAND,
    sizes: tuple = Q16_SIZES,
    k: int = Q16_TOPK,
) -> DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt, rank) — TPC-H Q16:
    how many distinct suppliers actually ship each (brand, type,
    size) segment, excluding one brand and the complaint suppliers
    (s_acctbal < 0 — the reduced schema's stand-in for Q16's
    complaint-comment subquery). Top ``k`` by count desc, then
    brand/type/size.

    Scale: part's brand/size filters push to its scan and the
    SHRUNKEN dim broadcasts into lineitem (the join prunes lineitem
    to the segment subset map-side); the complaint exclusion is a
    broadcast anti-join (tiny by construction); distinct-supplier
    counting shuffles once on the (brand, type, size, suppkey)
    partial-distinct key."""
    p = part.where(
        (F.col("p_brand") != excl_brand)
        & F.col("p_size").isin(*[int(s) for s in sizes])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complainers = supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    li = lineitem.select("l_partkey", "l_suppkey").join(
        F.broadcast(complainers), "l_suppkey", "left_anti"
    )
    seg = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
    counts = seg.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )
    top = counts.orderBy(
        F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
    ).limit(k)
    w = F.row_number().over(
        Window.orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )
    return top.withColumn("rank", w.cast("int"))


def part_supplier_variety_sql(
    excl_brand: str = Q16_EXCL_BRAND,
    sizes: tuple = Q16_SIZES,
    k: int = Q16_TOPK,
) -> str:
    in_list = ", ".join(str(int(s)) for s in sizes)
    return f"""
WITH counts AS (
  SELECT p.p_brand, p.p_type, p.p_size,
         CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand != '{excl_brand}'
    AND p.p_size IN ({in_list})
    AND l.l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
  GROUP BY 1, 2, 3)
SELECT p_brand, p_type, p_size, supplier_cnt, rank FROM (
  SELECT p_brand, p_type, p_size, supplier_cnt,
         CAST(row_number() OVER (ORDER BY supplier_cnt DESC, p_brand,
                                 p_type, p_size) AS INT) AS rank
  FROM counts)
WHERE rank <= {int(k)}
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — suppliers shipping excess volume of a part class.
# No partsupp availqty, so "excess" is a share-of-class threshold:
# suppliers who shipped more than SHARE_PPM of the class's total
# quantity in the year — the same filtered-class → per-supplier-agg →
# threshold-against-global machinery.
# ---------------------------------------------------------------------------
Q20_NAME_PREFIX = "red"
Q20_YEAR_START = "1997-01-01"
Q20_YEAR_END = "1998-01-01"
Q20_SHARE_PPM = 12_000  # > 1.2% of the class volume


def excess_class_shippers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    name_prefix: str = Q20_NAME_PREFIX,
    start: str = Q20_YEAR_START,
    end: str = Q20_YEAR_END,
    share_ppm: int = Q20_SHARE_PPM,
) -> DataFrame:
    """(s_name, qty, share_ppm) — TPC-H Q20 shape: suppliers whose
    shipped quantity of '``name_prefix``…' parts inside the year
    window exceeds ``share_ppm``/1e6 of the class total. Quantities
    sum as DECIMAL(18,2) (integral doubles in the data); membership
    compares integer-scaled decimals; the reported share is floored
    integer ppm.

    Scale: the name-prefix filter shrinks part to the class and
    broadcasts; the shipdate window pushes to the lineitem scan; one
    shuffle on l_suppkey aggregates; the 1-row class total broadcasts
    into the threshold filter; supplier names broadcast-join at the
    end."""
    p = part.where(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    cls = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
    per_supp = cls.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("qty")
    )
    tot = per_supp.agg(F.sum("qty").cast("decimal(38,2)").alias("tot"))
    kept = per_supp.crossJoin(F.broadcast(tot)).filter(
        F.col("qty") * 1_000_000 > F.col("tot") * int(share_ppm)
    )
    share = F.floor(
        F.col("qty").cast("double") * 1e6 / F.col("tot").cast("double")
    ).cast("long")
    return (
        kept.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            kept.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "s_name",
            F.col("qty").cast("double").alias("qty"),
            share.alias("share_ppm"),
        )
        .orderBy(F.col("qty").desc(), "s_name")
    )


def excess_class_shippers_sql(
    name_prefix: str = Q20_NAME_PREFIX,
    start: str = Q20_YEAR_START,
    end: str = Q20_YEAR_END,
    share_ppm: int = Q20_SHARE_PPM,
) -> str:
    return f"""
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '{name_prefix}%'
    AND l_shipdate >= TIMESTAMP '{start}'
    AND l_shipdate < TIMESTAMP '{end}'
  GROUP BY 1),
tot AS (SELECT CAST(sum(qty) AS DECIMAL(38,2)) AS tot FROM per_supp)
SELECT s.s_name, CAST(ps.qty AS DOUBLE) AS qty,
       CAST(floor(CAST(ps.qty AS DOUBLE) * 1e6 / CAST(tot.tot AS DOUBLE))
            AS BIGINT) AS share_ppm
FROM per_supp ps CROSS JOIN tot
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE ps.qty * 1000000 > tot.tot * {int(share_ppm)}
ORDER BY qty DESC, s.s_name
""".strip()


# ---------------------------------------------------------------------------
# first-order Markov transition matrix of event types inside sessions
# — the generative summary behind path mining: path mining ranks
# frequent fixed-depth sequences, the transition matrix gives the
# full conditional next-step distribution (input to next-event
# prediction baselines and to session-anomaly scoring).
# ---------------------------------------------------------------------------


def session_transitions(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """(prev_type, next_type, n, p_ppm) — within-session event-type
    transition counts and floored-ppm conditional probabilities
    (Σ_next p_ppm ≤ 1e6 per prev_type). Transitions never cross a
    session boundary.

    Shape: the standard one user_id shuffle + session numbering, a
    map-side lead() pair, ONE (prev, next) partial-agg count — the
    |types|² result then joins its |types|-row prev totals broadcast;
    p_ppm is exact integer floor math (bigint ``div`` on both
    engines — r9 ADVICE: the earlier floor(n·1e6/tot) was long/long
    → DOUBLE division, exact only below 2^53)."""
    gap_ms = gap_min * 60 * 1000
    projected = events.select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts")).alias("ms"),
        "event_id",
    )
    ms = F.col("ms")
    w = Window.partitionBy("user_id").orderBy(ms, "event_id")
    new_sess = F.when(ms - F.lag(ms).over(w) > gap_ms, 1).otherwise(0)
    with_sess = projected.withColumn(
        "session_id", F.sum(new_sess).over(w).cast("int")
    )
    sw = Window.partitionBy("user_id", "session_id").orderBy(
        "ms", "event_id"
    )
    pairs = with_sess.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type", 1).over(sw).alias("next_type"),
        (
            F.lead("session_id", 1).over(sw) == F.col("session_id")
        ).alias("ok"),
    ).where(F.col("ok"))
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("tot")
    )
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("n * 1000000 div tot").cast("long").alias("p_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


def session_transitions_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    from lasdb_spark.sources.events import EV_CTE

    gap_ms = gap_min * 60 * 1000
    return f"""
{EV_CTE},
g AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
         (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > {gap_ms}
         THEN 1 ELSE 0 END AS new_sess
  FROM ev),
with_sess AS (
  SELECT user_id, event_id, event_type, ms,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
         ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
  FROM g),
pairs AS (
  SELECT event_type AS prev_type,
         lead(event_type, 1) OVER sw AS next_type,
         lead(session_id, 1) OVER sw = session_id AS ok
  FROM with_sess
  WINDOW sw AS (PARTITION BY user_id, session_id ORDER BY ms, event_id)),
counts AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE ok GROUP BY 1, 2),
totals AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM counts
  GROUP BY 1)
SELECT c.prev_type, c.next_type, c.n,
       CAST(c.n * 1000000 // t.tot AS BIGINT) AS p_ppm
FROM counts c JOIN totals t USING (prev_type)
""".strip()


def cohort_ltv(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, day_cents, cum_cents) — the cohort
    LIFETIME-VALUE curve next to :func:`user_retention`'s counts:
    purchase value accumulated per cohort (users grouped by first
    active day) as the cohort ages. The revenue question retention
    triangles can't answer ("day-30 users are retained — but are they
    worth anything?").

    Exactness: purchase values are cent-quantized longs (the events
    table is cent-quantized), summed per (cohort, offset) and then
    cumulated by a COHORT-PARTITIONED ordered window — integer all
    the way.

    Scale: one user_id shuffle computes first-active day; purchases
    join back on the same key (co-partitioned); the (cohort, offset)
    agg is triangle-sized; the cumsum window partitions by cohort —
    never global."""
    day = F.expr("unix_millis(ts) div 86400000")
    cohort = (
        events.select("user_id", day.alias("day_num"))
        .groupBy("user_id")
        .agg(F.min("day_num").alias("cohort_day"))
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        day.alias("day_num"),
        F.round(F.col("value").cast("double") * 100)
        .cast("long")
        .alias("cents"),
    )
    aged = buys.join(cohort, "user_id").groupBy(
        "cohort_day",
        (F.col("day_num") - F.col("cohort_day")).cast("int").alias(
            "day_offset"
        ),
    ).agg(F.sum("cents").cast("long").alias("day_cents"))
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return aged.select(
        "cohort_day",
        "day_offset",
        "day_cents",
        F.sum("day_cents").over(w).cast("long").alias("cum_cents"),
    ).orderBy("cohort_day", "day_offset")


def cohort_ltv_sql() -> str:
    return f"""
{EV_CTE},
evd AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS day_num, event_type,
         value
  FROM ev),
cohort AS (SELECT user_id, min(day_num) AS cohort_day FROM evd
           GROUP BY 1),
aged AS (
  SELECT c.cohort_day,
         CAST(e.day_num - c.cohort_day AS INT) AS day_offset,
         CAST(sum(CAST(round(CAST(e.value AS DOUBLE) * 100) AS BIGINT))
              AS BIGINT) AS day_cents
  FROM evd e JOIN cohort c USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2)
SELECT cohort_day, day_offset, day_cents,
       CAST(sum(day_cents) OVER (PARTITION BY cohort_day
            ORDER BY day_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_cents
FROM aged
""".strip()
