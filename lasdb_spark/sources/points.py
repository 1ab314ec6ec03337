"""Canonical synthetic point cloud derived from the ``lineitem`` table.

The driver's testdata (TESTDATA.md) has no raw x/y/z table, so the
engine's point-cloud surface is exercised on a DETERMINISTIC derivation
from ``lineitem``: pure integer arithmetic followed by one exact double
division, so Spark and the DuckDB oracle compute bit-identical values.

The extent mirrors the reference's AHN-tile shape (FIXTURES.md §1):
x ∈ [85000, 86000), y ∈ [446000, 447500), z ∈ [-5, 40) — all strictly
positive x/y (Morton precondition, reference pcsfc/encoder.py:24-25).

``POINTS_SQL`` is the single source of truth for the oracle-side CTE;
``points_df`` mirrors it with Column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

X_BASE, X_MOD = 85000.0, 100_000  # x = 85000 + (k % 1e5)/100  → [85000, 86000)
Y_BASE, Y_MOD = 446000.0, 150_000  # y = 446000 + (k % 1.5e5)/100 → [446000, 447500)
Z_BASE, Z_MOD = -5.0, 4_500  # z = -5 + (k % 4500)/100 → [-5, 40)

#: DuckDB/ANSI SQL producing exactly the same (x, y, z) doubles.
POINTS_SQL = f"""
SELECT
  {X_BASE} + ((l_orderkey * 131 + l_linenumber * 17) % {X_MOD}) / 100.0  AS x,
  {Y_BASE} + ((l_orderkey * 977 + l_partkey * 31) % {Y_MOD}) / 100.0    AS y,
  {Z_BASE} + ((l_orderkey * 193 + l_suppkey * 7 + l_linenumber) % {Z_MOD}) / 100.0 AS z
FROM lineitem
""".strip()


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load lineitem and derive the point cloud (same math as POINTS_SQL)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    okey = F.col("l_orderkey")
    return li.select(
        (
            F.lit(X_BASE)
            + ((okey * 131 + F.col("l_linenumber").cast("long") * 17) % X_MOD) / 100.0
        ).alias("x"),
        (
            F.lit(Y_BASE) + ((okey * 977 + F.col("l_partkey") * 31) % Y_MOD) / 100.0
        ).alias("y"),
        (
            F.lit(Z_BASE)
            + (
                (okey * 193 + F.col("l_suppkey") * 7 + F.col("l_linenumber").cast("long"))
                % Z_MOD
            )
            / 100.0
        ).alias("z"),
    )


#: Extent of the derived cloud (x_min, x_max, y_min, y_max, z_min, z_max).
EXTENT = (X_BASE, X_BASE + X_MOD / 100.0, Y_BASE, Y_BASE + Y_MOD / 100.0, Z_BASE, Z_BASE + Z_MOD / 100.0)
