"""Unit tests for the cleaning surface (reference P2-P7)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from manifold_spark import clean
from manifold_spark.schema import LISTING_SCHEMA


def test_snake_case():
    assert clean.snake_case("ContractNumber") == "contract_number"
    assert clean.snake_case("AreaNet") == "area_net"
    assert clean.snake_case("PriceCurrencyFormated") == "price_currency_formated"
    assert clean.snake_case("Broker") == "broker"
    assert clean.snake_case("already_snake") == "already_snake"
    assert clean.snake_case("HTTPServer") == "http_server"


def test_html_strip_keeps_anchors(spark):
    df = spark.createDataFrame(
        [
            Row(s="<div>hello <b>world</b></div>"),
            Row(s='see <a href="/x">this</a> and <span>that</span>'),
            Row(s="plain text"),
        ]
    )
    out = [r[0] for r in df.select(clean.strip_html_col(F.col("s"))).collect()]
    assert out[0] == "hello world"
    assert out[1] == 'see <a href="/x">this</a> and that'
    assert out[2] == "plain text"


def test_truncate(spark):
    long = "x" * 300
    df = spark.createDataFrame([Row(s=long), Row(s="short")])
    out = [r[0] for r in df.select(clean.truncate_col(F.col("s"), 250)).collect()]
    assert len(out[0]) == 250
    assert out[1] == "short"


def test_fill_defaults(spark):
    df = spark.createDataFrame(
        [(None, None, "C1"), ("B", 2.0, "C2")],
        "Broker string, Bathrooms double, ContractNumber string",
    )
    out = clean.fill_defaults(df).orderBy("ContractNumber").collect()
    assert out[0]["Broker"] == "Unknown"
    assert out[0]["Bathrooms"] == -1.0
    assert out[1]["Broker"] == "B"
    assert out[1]["Bathrooms"] == 2.0


def test_clean_listings_end_to_end(spark):
    rows = [
        {
            "Broker": None,
            "ContractNumber": "C1",
            "Country": "PT",
            "County": None,
            "Parish": "P",
            "Title": "<b>T</b>" + "y" * 300,
            "Description": "<a>keep</a><i>drop</i>",
            "PriceCurrencyFormated": None,
            "PropertyType": "House",
            "Bathrooms": 1.0,
            "Bedrooms": None,
            "AreaNet": 100.0,
            "Latitude": 38.7,
            "Longitude": -9.1,
        }
    ]
    df = spark.createDataFrame(rows, LISTING_SCHEMA)
    out = clean.clean_listings(df)
    assert out.columns == [
        "broker",
        "contract_number",
        "country",
        "county",
        "parish",
        "title",
        "description",
        "price",
        "property_type",
        "bathrooms",
        "bedrooms",
        "area_net",
        "latitude",
        "longitude",
    ]
    r = out.collect()[0]
    assert r["broker"] == "Unknown"
    assert r["county"] == "Unknown"
    assert r["price"] == -1.0
    assert r["bedrooms"] == -1.0
    assert len(r["title"]) == 250 and r["title"].startswith("Ty")
    assert r["description"] == "<a>keep</a>drop"


def test_clean_is_single_stage(spark):
    """The whole clean chain must stay one projection over the scan —
    no Exchange in the plan."""
    df = spark.createDataFrame([], LISTING_SCHEMA)
    plan = clean.clean_listings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
