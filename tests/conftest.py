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


BROKERS = [f"Broker {i}" for i in range(20)]
COUNTRIES = ["Portugal", "Spain", "France"]
COUNTIES = [f"County{i}" for i in range(10)]
PARISHES = [f"Parish{i}" for i in range(30)]
PTYPES = ["Apartment", "House", "Villa", "Studio", "Duplex"]


def make_listing(rng: random.Random, contract: str) -> dict:
    title = f"<b>Nice</b> home {contract} <a href='/x'>link</a>"
    if rng.random() < 0.1:
        title = title + " lorem" * 60  # >250 chars → truncation path
    return {
        "Broker": rng.choice(BROKERS) if rng.random() > 0.02 else None,
        "ContractNumber": contract,
        "Country": rng.choice(COUNTRIES),
        "County": rng.choice(COUNTIES),
        "Parish": rng.choice(PARISHES),
        "Title": title,
        "Description": f"<div>desc {contract}</div> with <a>anchor</a>",
        "PriceCurrencyFormated": round(rng.uniform(10_000, 2_000_000), 2) if rng.random() > 0.02 else None,
        "PropertyType": rng.choice(PTYPES),
        "Bathrooms": float(rng.randint(0, 5)) if rng.random() > 0.05 else None,
        "Bedrooms": float(rng.randint(0, 8)) if rng.random() > 0.05 else None,
        "AreaNet": round(rng.uniform(20, 800), 1) if rng.random() > 0.05 else None,
        "Latitude": round(rng.uniform(36, 42), 6),
        "Longitude": round(rng.uniform(-9.5, -6), 6),
    }


def write_week(root: str, date: dt.date, listings: list[dict]) -> None:
    from manifold_spark.ingest import timestep_path

    folder = timestep_path(root, date)
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "listings.json"), "w") as f:
        for row in listings:
            f.write(json.dumps(row) + "\n")


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
