"""Numeric expression helpers.

`decimal_sum` exists because summing doubles is order-dependent: with AQE
and shuffle partial-aggregation the add order differs run to run, so a
double SUM is not reproducible (and can't hash-match an oracle). Casting
each addend to DECIMAL makes the aggregation exact and associative —
deterministic under any partitioning — then the final cast back to DOUBLE
is a single well-defined conversion. Per-row double arithmetic (products,
differences) stays IEEE-deterministic and needs no treatment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_sum(col: Column, precision: int = 22, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression via decimal cast;
    result cast back to double."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def decimal_avg(col: Column, precision: int = 22, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in
    double — reproducible across partitionings and engines."""
    total = F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")
    return total / F.count(col)
