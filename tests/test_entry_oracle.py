"""Mimic the driver's correctness gate: every __spark_entry__.queries()
entry must match its oracle_sql() in DuckDB — row count, column names,
and exact (order-insensitive) values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _rows(rows, cols):
    # sort columns by name (driver semantics), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    try:
        res = duck.sql(sql)
        dcols = res.columns
        drows = res.fetchall()
    except duckdb.Error:
        # transient armor: under full-suite memory pressure (24 GB
        # Spark JVM + in-process DuckDB + the megabyte-scale composed
        # twins) DuckDB has flaked exactly once per run on the entries
        # following the largest SQL; a FRESH connection retry separates
        # a real oracle failure (re-raises) from that environment flake
        fresh = duckdb.connect()
        for t in TABLES:
            fresh.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        res = fresh.sql(sql)
        dcols = res.columns
        drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert _rows(srows, scols) == _rows(drows, dcols), f"{name}: values differ"


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["x", "y", "z"]
