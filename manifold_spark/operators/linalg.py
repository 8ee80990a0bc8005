"""Vector expression helpers for embedding columns (`array<float>`).

Cross-engine determinism: both the Spark Column and the generated oracle
SQL expand the dot product as the SAME left-associated chain of double
multiplies/adds (`((a1*b1 + a2*b2) + a3*b3) + …`), so results are
bit-identical — no tolerance needed in the correctness gate. Elements are
cast float→double (exact) before any arithmetic so neither engine does
float math.

Scale note: a 64-term expression tree per pair is whole-stage-codegen'd
into straight-line JVM code — this is the fast path for brute-force
scoring; no UDF, no Arrow transfer.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F


def element(col: Column | str, i: int) -> Column:
    """1-based element access, cast to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(c, i).cast("double")


def dot_expr(a: Column | str, b: Column | str, dim: int) -> Column:
    """Left-associated dot product of two vector columns."""
    return functools.reduce(
        operator.add, (element(a, i) * element(b, i) for i in range(1, dim + 1))
    )


def norm_expr(a: Column | str, dim: int) -> Column:
    return F.sqrt(dot_expr(a, a, dim))


def cosine_expr(a: Column | str, b: Column | str, dim: int) -> Column:
    """Cosine similarity, with zero-norm vectors defined as similarity
    0.0 — NOT left to x/0: under Spark's ANSI mode (default since 4.x) a
    raw division throws `DIVIDE_BY_ZERO` the first time a real corpus
    contains a zero embedding (found by the hypothesis property test in
    `test_lsh_properties.py`). The guard compares the exact product of
    norms, so every nonzero pair divides by the identical value as
    before — bit-identical to the SQL mirror either way."""
    denom = norm_expr(a, dim) * norm_expr(b, dim)
    return F.when(denom > 0, dot_expr(a, b, dim) / denom).otherwise(F.lit(0.0))


def dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB SQL mirroring `dot_expr` term-for-term (1-based list index)."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))" for i in range(1, dim + 1)
    )


def cosine_sql(a: str, b: str, dim: int) -> str:
    """Mirrors `cosine_expr` including its zero-norm guard."""
    denom = f"(sqrt({dot_sql(a, a, dim)}) * sqrt({dot_sql(b, b, dim)}))"
    return f"(CASE WHEN {denom} > 0 THEN ({dot_sql(a, b, dim)}) / {denom} ELSE 0.0 END)"
