"""Synthetic listing-JSON generator (FIXTURES.md §1).

Stands in for the reference's scraper sink (S7, `crawler/go/util/utils.go`)
— emits the same week-partitioned JSON-lines layout the ingest reads, with
the adversarial cases the cleaning chain must handle (HTML incl. `<a>`
anchors that must survive, >250-char strings, nulls at the documented
rates). Used by tests AND the pipeline-throughput benchmark.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random

from manifold_spark.ingest import timestep_path

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


def write_week(root: str, date: dt.date | str, listings: list[dict]) -> str:
    """Write one weekly snapshot as JSON-lines under the timestep path."""
    folder = timestep_path(root, date)
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, "listings.json")
    with open(path, "w") as f:
        for row in listings:
            f.write(json.dumps(row) + "\n")
    return folder


def generate_week(root: str, date: dt.date | str, n: int, seed: int = 42) -> int:
    """Generate + write n listings for a week; returns row count."""
    rng = random.Random(seed)
    write_week(root, date, [make_listing(rng, f"C{i:06d}") for i in range(n)])
    return n
