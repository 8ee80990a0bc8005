"""Failure paths of the quality gates: the invariants must actually fire."""

import datetime as dt

import pytest

from manifold_spark.quality import (
    QualityError,
    assert_nonempty,
    assert_unique_active,
    duplicate_active_keys,
)


def test_empty_table_raises(spark):
    df = spark.createDataFrame([], "a string")
    with pytest.raises(QualityError, match="empty"):
        assert_nonempty(df, "staging.dim_broker")


def test_nonempty_returns_count(spark):
    df = spark.createDataFrame([("x",), ("y",)], "a string")
    assert assert_nonempty(df, "t") == 2


def test_duplicate_active_detected(spark):
    sentinel = dt.date(9999, 12, 31)
    rows = [
        ("A", dt.date(2024, 1, 1), sentinel),
        ("A", dt.date(2024, 2, 1), sentinel),  # second ACTIVE row for A
        ("B", dt.date(2024, 1, 1), sentinel),
        ("B", dt.date(2023, 1, 1), dt.date(2023, 12, 31)),  # expired: fine
    ]
    df = spark.createDataFrame(
        rows, "broker string, record_start_date date, record_end_date date"
    )
    dups = duplicate_active_keys(df, ["broker"]).collect()
    assert len(dups) == 1 and dups[0]["broker"] == "A" and dups[0]["active_rows"] == 2
    with pytest.raises(QualityError, match="dim_broker"):
        assert_unique_active(df, ["broker"], "dim_broker")


def test_expired_only_key_passes(spark):
    df = spark.createDataFrame(
        [("C", dt.date(2023, 1, 1), dt.date(2023, 6, 1))],
        "broker string, record_start_date date, record_end_date date",
    )
    assert_unique_active(df, ["broker"], "dim_broker")  # no active rows: OK


def test_run_checks_counts_violations(spark):
    """Planted violations must be counted per check in one pass."""
    from pyspark.sql import functions as F

    from manifold_spark.quality import run_checks

    df = spark.createDataFrame(
        [(1, 5.0, "A"), (2, -1.0, "A"), (None, 2.0, "X"), (4, 0.0, "N")],
        "k int, qty double, flag string",
    )
    out = {r["check_name"]: (r["n_violations"], r["passed"]) for r in run_checks(
        df,
        {
            "nn_k": F.col("k").isNotNull(),
            "positive_qty": F.col("qty") > 0,
            "flag_domain": F.col("flag").isin("A", "N", "R"),
        },
    ).collect()}
    assert out == {
        "flag_domain": (1, 0),
        "nn_k": (1, 0),
        "positive_qty": (2, 0),
    }


def test_run_checks_null_predicate_fails(spark):
    """A NULL predicate value is a violation, not a silent pass (ADVICE
    r2): NULL qty must fail `qty > 0` even without a separate null check."""
    from pyspark.sql import functions as F

    from manifold_spark.quality import run_checks

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "k int, qty double"
    )
    out = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in run_checks(df, {"positive_qty": F.col("qty") > 0}).collect()
    }
    assert out == {"positive_qty": (2, 0)}


def test_run_checks_hostile_names(spark):
    """Check names containing quotes/backticks must not break (names are
    literal values, never interpolated into SQL)."""
    from pyspark.sql import functions as F

    from manifold_spark.quality import run_checks

    df = spark.createDataFrame([(1,), (2,)], "k int")
    hostile = "it's a `weird`, name\" -- )"
    out = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in run_checks(df, {hostile: F.col("k") > 0}).collect()
    }
    assert out == {hostile: (0, 1)}
