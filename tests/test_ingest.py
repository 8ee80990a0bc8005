"""Ingest robustness: path templating, pinned-schema permissive parsing,
malformed rows, infer-mode fallback."""

import json
import os

from manifold_spark import ingest


def test_timestep_path():
    assert ingest.timestep_path("/data", "2024-01-08") == "/data/2024/1/2"
    assert ingest.timestep_path("s3a://b/raw/", "2024-12-30") == "s3a://b/raw/2024/12/1"  # ISO week 1 of 2025


def _write(tmp_path, lines):
    p = tmp_path / "wk"
    os.makedirs(p, exist_ok=True)
    f = p / "listings.json"
    f.write_text("\n".join(lines))
    return str(p)


def test_permissive_malformed_rows(spark, tmp_path):
    """Pinned schema + PERMISSIVE: a garbage line nulls out instead of
    failing the job (the only sane default for a 100 TB ingest)."""
    good = json.dumps({"Broker": "B", "ContractNumber": "C1", "PriceCurrencyFormated": 5.0})
    bad = '{"Broker": "X", "ContractNumber": '  # truncated JSON
    path = _write(tmp_path, [good, bad])
    df = ingest.load_json_listings(spark, path)
    rows = df.collect()
    assert len(rows) == 2
    brokers = {r["Broker"] for r in rows}
    assert "B" in brokers
    assert df.columns == ingest.ALLOWED_ATTRIBUTES


def test_string_typed_numeric_under_pinned_schema(spark, tmp_path):
    """A string-typed numeric (scraper quirk, FIXTURES §1) does NOT coerce
    under the pinned schema — it nulls out, and the cleaning chain's
    fillna(-1) then applies the reference's missing-value default. Sources
    known to be stringly-typed go through infer mode instead."""
    row = json.dumps({"ContractNumber": "C2", "PriceCurrencyFormated": "123456.5"})
    path = _write(tmp_path, [row])
    df = ingest.load_json_listings(spark, path)
    assert df.collect()[0]["PriceCurrencyFormated"] is None

    from manifold_spark.clean import clean_listings

    cleaned = clean_listings(df)
    assert cleaned.collect()[0]["price"] == -1.0


def test_infer_mode_drops_extra_columns(spark, tmp_path):
    """Infer mode keeps only the 14-attribute contract even when the
    source has extras (reference P1 projection)."""
    row = json.dumps({"ContractNumber": "C3", "Url": "http://x", "IsSold": True})
    path = _write(tmp_path, [row])
    df = ingest.load_json_listings(spark, path, infer_schema=True)
    assert "Url" not in df.columns and "IsSold" not in df.columns
    assert df.collect()[0]["ContractNumber"] == "C3"
