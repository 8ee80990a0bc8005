"""Shared fixtures: one local SparkSession per test run + synthetic
listing-JSON weeks following FIXTURES.md §1 (seeded, deterministic)."""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manifold_spark.session import get_spark

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("spark-warehouse"))
    spark = get_spark(
        app_name="manifold-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=warehouse,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return f"{TESTDATA_ROOT}/sf0.001"


# Fixture generation lives in the package (also used by bench.py).
from manifold_spark.sources.fixtures import make_listing, write_week  # noqa: E402,F401


@pytest.fixture(scope="session")
def listings_weeks(tmp_path_factory):
    """Two weekly snapshots with FIXTURES.md §1 mutations: ~80% retained,
    ~10% price changes, some new assets."""
    root = str(tmp_path_factory.mktemp("raw"))
    rng = random.Random(42)
    week1_date = dt.date(2024, 1, 1)
    week2_date = dt.date(2024, 1, 8)

    universe = [f"C{100000 + i}" for i in range(200)]
    week1 = [make_listing(rng, c) for c in universe[:160]]
    write_week(root, week1_date, week1)

    # Week 2: retain 80% of week1, change 10% of prices, add 20 new assets.
    retained = [dict(r) for r in week1 if rng.random() < 0.8]
    changed = 0
    for r in retained:
        if rng.random() < 0.1 and r["PriceCurrencyFormated"] is not None:
            r["PriceCurrencyFormated"] = round(r["PriceCurrencyFormated"] * 1.05, 2)
            changed += 1
    new = [make_listing(rng, c) for c in universe[160:180]]
    week2 = retained + new
    write_week(root, week2_date, week2)

    return {
        "root": root,
        "week1": week1_date.isoformat(),
        "week2": week2_date.isoformat(),
        "week1_rows": len(week1),
        "week2_rows": len(week2),
        "changed_prices": changed,
        "new_assets": len(new),
    }
