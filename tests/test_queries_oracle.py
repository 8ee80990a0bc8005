"""Local mirror of the driver's t2 correctness gate: run every registered
query on Spark AND its DuckDB oracle over the same parquet, compare
row count, column names, and the order-insensitive multiset of values.

Runs at sf0.001 for speed; the driver runs sf0.01 — same shape.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pytest

from manifold_spark.queries import REGISTRY, all_oracles, all_queries

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


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision: the driver's value-hash is exact, so the local
        # mirror must be too (9 sig figs once hid a decimal-cast rounding
        # divergence of 1e-4 on 1e8-scale sums).
        return f"{v:.17g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(repr(tuple(_norm(r[i]) for i in idx)) for r in rows)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _oracle_names():
    return sorted(all_oracles().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    fn = all_queries()[name]
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(all_oracles()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    s = _rowset(spark_cols, spark_rows)
    d = _rowset(duck_cols, duck_rows)
    mism = [(a, b) for a, b in zip(s, d) if a != b][:3]
    assert s == d, f"{name}: value mismatch, first diffs: {mism}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    for name, (fn, sql) in sorted(REGISTRY.items()):
        if sql is None:
            df = fn(spark, sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name
