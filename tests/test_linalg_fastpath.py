"""r14 plan-build fast paths must be invisible to Catalyst: the
single-parse SQL forms of dot/norm/cosine and the one-parse literal
arrays must analyze/optimize to the IDENTICAL tree the per-term Column
builders produced (hence bit-identical results — the oracle gates never
see a difference). These pins are what lets the fast paths claim "same
expression, fewer py4j round trips"."""

from __future__ import annotations

import math
import re
import struct

import pytest
from pyspark.sql import functions as F

import manifold_spark.operators.linalg as L

DIM = 4


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [0.1, -2.5, 3.25, 0.0], [1.5, 2.0, -0.5, 4.0]),
        (2, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),  # zero-norm side
        (3, [1e-8, 2e8, -3.3, 7.7], [-1e-8, 2e-8, 3.14159, 2.71828]),
    ]
    return spark.createDataFrame(rows, ["id", "va", "vb"]).selectExpr(
        "id", "cast(va as array<float>) va", "cast(vb as array<float>) vb"
    )


def _norm_ids(s: str) -> str:
    return re.sub(r"#\d+", "#", s)


def _analyzed(df, col) -> str:
    return _norm_ids(df.select(col.alias("r"))._jdf.queryExecution().analyzed().toString())


def _optimized(df, col) -> str:
    return _norm_ids(
        df.select(col.alias("r"))._jdf.queryExecution().optimizedPlan().toString()
    )


def _bits(df, col):
    vals = [r["r"] for r in df.select(col.alias("r")).orderBy("id").collect()]
    return [None if v is None else struct.pack("<d", v) for v in vals]


def _slow_cosine(a, b):
    denom = F.sqrt(L._dot_expr_columns(a, a, DIM)) * F.sqrt(L._dot_expr_columns(b, b, DIM))
    return F.when(denom > 0, L._dot_expr_columns(a, b, DIM) / denom).otherwise(F.lit(0.0))


def test_dot_fastpath_tree_and_bits_identical(vec_df):
    fast = L.dot_expr("va", "vb", DIM)
    slow = L._dot_expr_columns("va", "vb", DIM)
    assert _analyzed(vec_df, fast) == _analyzed(vec_df, slow)
    assert _bits(vec_df, fast) == _bits(vec_df, slow)


def test_norm_fastpath_tree_identical(vec_df):
    fast = L.norm_expr("va", DIM)
    slow = F.sqrt(L._dot_expr_columns("va", "va", DIM))
    assert _analyzed(vec_df, fast) == _analyzed(vec_df, slow)
    assert _bits(vec_df, fast) == _bits(vec_df, slow)


def test_cosine_fastpath_tree_identical_including_zero_norm_guard(vec_df):
    fast = L.cosine_expr("va", "vb", DIM)
    slow = _slow_cosine("va", "vb")
    assert _analyzed(vec_df, fast) == _analyzed(vec_df, slow)
    assert _bits(vec_df, fast) == _bits(vec_df, slow)


def test_fastpath_handles_keyword_column_names(vec_df):
    kw = vec_df.selectExpr("id", "va as `order`", "vb as `case`")
    fast = L.dot_expr("order", "case", DIM)
    slow = L._dot_expr_columns("order", "case", DIM)
    assert L._sql_safe("order")
    assert _analyzed(kw, fast) == _analyzed(kw, slow)


def test_fastpath_handles_struct_field_names(vec_df):
    st = vec_df.select("id", F.struct(F.col("va").alias("x")).alias("s"), "vb")
    fast = L.dot_expr("s.x", "vb", DIM)
    slow = L._dot_expr_columns("s.x", "vb", DIM)
    assert _analyzed(st, fast) == _analyzed(st, slow)


def test_non_identifier_names_take_the_column_fallback(vec_df):
    weird = vec_df.selectExpr("id", "va as `weird name`", "vb")
    assert not L._sql_safe("weird name")
    assert not L._sql_safe(F.col("va"))
    # must not raise, and must compute the same values as a safe rename
    got = _bits(weird, L.dot_expr("weird name", "vb", DIM))
    want = _bits(vec_df, L.dot_expr("va", "vb", DIM))
    assert got == want


def _lit_loop(vs):
    if any(isinstance(v, (list, tuple)) for v in vs):
        return F.array(*[_lit_loop(v) for v in vs])
    return F.array(*[F.lit(float(v)) for v in vs])


@pytest.mark.parametrize(
    "values",
    [
        [0.1, -2.5, 3.25, 0.0, -0.0, 1e-308, -1.7976931348623157e308, 12345678.9],
        [[1.5, -2.0], [3.0, 4.5e-17]],
        [[[0.5, -0.25]], [[1e16, -1e-16]]],
    ],
    ids=["flat", "nested", "triple-nested"],
)
def test_lit_double_array_folds_to_identical_literal(spark, values):
    # negative literals parse via UnaryMinus, which folds at OPTIMIZE
    # time — so the pin compares optimized plans (both forms fold to one
    # Literal array carrying the exact same doubles).
    one = spark.range(1)
    fast, slow = L.lit_double_array(values), _lit_loop(values)
    assert _optimized(one, fast) == _optimized(one, slow)


def test_lit_double_array_nonfinite_falls_back(spark):
    r = spark.range(1).select(
        L.lit_double_array([1.0, float("nan")]).alias("r")
    ).collect()[0]["r"]
    assert len(r) == 2 and r[0] == 1.0 and math.isnan(r[1])
