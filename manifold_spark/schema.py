"""Schema contracts.

The reference infers its ingest schema from JSON
(`/root/reference/scripts/el_to_parquet.py:221-222`) and declares types only
at the warehouse layer (`plugins/helpers/sql_queries_staging.py:14-72`).
We pin an explicit 14-column ingest contract (removes inference
nondeterminism, SURVEY §7 risk 5) and keep infer-mode as a fallback.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The 14 allowed ingest attributes (reference P1, `el_to_parquet.py:225-229`).
ALLOWED_ATTRIBUTES = [
    "Broker",
    "ContractNumber",
    "Country",
    "County",
    "Parish",
    "Title",
    "Description",
    "PriceCurrencyFormated",
    "PropertyType",
    "Bathrooms",
    "Bedrooms",
    "AreaNet",
    "Latitude",
    "Longitude",
]

#: Numeric columns defaulted to -1 when null (reference P2, `el_to_parquet.py:53-61`).
NUMERIC_DEFAULT_COLS = [
    "AreaNet",
    "Bathrooms",
    "Bedrooms",
    "PriceCurrencyFormated",
    "Latitude",
    "Longitude",
]

#: Textual columns defaulted to "Unknown" when null (reference P3, :57-64).
TEXT_DEFAULT_COLS = [
    "Broker",
    "Country",
    "County",
    "Description",
    "Parish",
    "PropertyType",
    "Title",
]

#: Columns that get HTML stripped + capped at 250 chars (reference P4/P5, :66-95,329-330).
CLEANED_TEXT_COLS = ["Description", "Title"]
TRUNCATE_LENGTH = 250

#: Pinned ingest StructType: strings for identity/text, doubles for measures
#: (staging DDL uses `float` for all numerics, `sql_queries_staging.py:36-41`).
LISTING_SCHEMA = T.StructType(
    [
        T.StructField("Broker", T.StringType(), True),
        T.StructField("ContractNumber", T.StringType(), True),
        T.StructField("Country", T.StringType(), True),
        T.StructField("County", T.StringType(), True),
        T.StructField("Parish", T.StringType(), True),
        T.StructField("Title", T.StringType(), True),
        T.StructField("Description", T.StringType(), True),
        T.StructField("PriceCurrencyFormated", T.DoubleType(), True),
        T.StructField("PropertyType", T.StringType(), True),
        T.StructField("Bathrooms", T.DoubleType(), True),
        T.StructField("Bedrooms", T.DoubleType(), True),
        T.StructField("AreaNet", T.DoubleType(), True),
        T.StructField("Latitude", T.DoubleType(), True),
        T.StructField("Longitude", T.DoubleType(), True),
    ]
)

#: Dimension business keys (reference dim configs,
#: `plugins/helpers/sql_queries_presentation.py:142-158`).
DIM_KEYS = {
    "dim_broker": ["broker"],
    "dim_asset": ["contract_number"],
    "dim_geography": ["country", "county", "parish"],
}

#: Staging projections (reference A1/P8, `el_to_parquet.py:177-197`), in
#: snake_case (post-P7). Hash is appended over these columns in this order.
STAGING_COLUMNS = {
    "dim_broker": ["broker"],
    "dim_geography": ["country", "county", "parish"],
    "dim_asset": [
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
    ],
    "fact_stock": [
        "broker",
        "contract_number",
        "country",
        "county",
        "parish",
        "price",
    ],
}

#: SCD2 sentinel for the active row. The reference stores `'99991231'`
#: (`dimension_operator.py:30,48`); ours is a real DateType sentinel.
SCD2_SENTINEL = "9999-12-31"
