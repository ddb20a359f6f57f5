"""Shared fixtures: one SparkSession per test run, DuckDB with the
fixture views registered, and a driver-like result comparator."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from bishe_gpu_database_spark.session import TABLE_NAMES, get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def duck(sf_dir):
    return duck_con(sf_dir)


def _norm_cell(v):
    """Normalize a cell for order-insensitive comparison (mimics the
    driver's value hash: stringify with stable float formatting)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize_rows(columns, rows):
    """Sort columns by name, then rows lexicographically — the driver's
    order-insensitive shape."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def compare_query_to_oracle(spark, sf_dir: str, name: str, fn, sql: str):
    """Run the Spark query and the DuckDB oracle, compare row count,
    column names, and normalized values. Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    _, s_norm = normalize_rows(s_cols, s_rows)
    _, d_norm = normalize_rows(d_cols, d_rows)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
        return False, f"{name}: values differ; first diffs {diffs}"
    return True, f"{name}: OK ({len(s_rows)} rows)"
