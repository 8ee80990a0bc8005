"""Staging derivations (reference A1, P8, P9).

From one cleaned listings DataFrame, derive the four staging sets
(`/root/reference/scripts/el_to_parquet.py:167-208`):

- `dim_broker`     distinct (broker) + hash
- `dim_geography`  distinct (country, county, parish) + hash
- `dim_asset`      distinct 13-col listing + hash
- `fact_stock`     projection + quantity=1 + stock_date=execution_date

Scale notes: each distinct is a hash-aggregate with map-side partial
dedup — the shuffle carries only the (already narrow) distinct columns.
The four branches share one scan via `.cache()` in the pipeline (the
reference's one deliberate physical decision, `el_to_parquet.py:324-325`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manifold_spark import schema as S
from manifold_spark.functions import fingerprint


def with_fingerprint(df: DataFrame, cols: list[str] | None = None, out_col: str = "hash") -> DataFrame:
    """Append the sha256 row hash over ``cols`` (default: all current
    columns, in order) — reference P9."""
    cols = df.columns if cols is None else cols
    return df.withColumn(out_col, fingerprint([F.col(c) for c in cols]))


def stage_dimension(
    df: DataFrame, columns: list[str], unique_keys: list[str] | None = None
) -> DataFrame:
    """distinct(select(columns)) + hash — one staging dimension set
    (reference A1+P9, `el_to_parquet.py:177-193`).

    ``unique_keys``: business key of the dimension. The reference dedups
    on the FULL row, so one key appearing twice with different attributes
    (a relisting inside one scrape window) ships two staging rows — which
    the SCD2 merge would turn into two ACTIVE rows, violating the
    documented invariant (`README.md:149-157`). We implement the intent:
    keep one deterministic survivor per key (lowest hash).

    r14 (guide §2.4): the survivor path is ONE map-side-combined
    `min_by(row, hash)` aggregate by key instead of distinct (exchange
    on all columns) + per-key window (second exchange + sort). Values
    are identical: the min-hash row per key is the same whether
    duplicates were pre-collapsed or not (full-row duplicates share the
    hash, and a hash tie IS an identical row), and the hash is a
    function of the row so computing it pre- vs post-distinct agrees.
    Measured on the 100k-listing week: 1.83 → 1.30 s warm."""
    if unique_keys and set(unique_keys) != set(columns):
        hashed = with_fingerprint(df.select(*columns), columns)
        value_cols = [c for c in hashed.columns if c not in unique_keys]
        agg = hashed.groupBy(*unique_keys).agg(
            F.min_by(F.struct(*value_cols), F.col("hash")).alias("__s")
        )
        return agg.select(
            *[F.col(f"__s.{c}").alias(c) if c not in unique_keys else F.col(c) for c in hashed.columns]
        )
    return with_fingerprint(df.select(*columns).distinct(), columns)


def stage_broker(df: DataFrame) -> DataFrame:
    return stage_dimension(df, S.STAGING_COLUMNS["dim_broker"])


def stage_geography(df: DataFrame) -> DataFrame:
    return stage_dimension(df, S.STAGING_COLUMNS["dim_geography"])


def stage_asset(df: DataFrame) -> DataFrame:
    return stage_dimension(
        df, S.STAGING_COLUMNS["dim_asset"], unique_keys=S.DIM_KEYS["dim_asset"]
    )


def stage_stock(df: DataFrame, execution_date: str) -> DataFrame:
    """Stock fact projection with literals quantity=1, stock_date=execution
    date (reference P8, `el_to_parquet.py:196-197`; stock_date is a string
    cast to date at fact-load time, matching the staging DDL's varchar)."""
    return df.select(*S.STAGING_COLUMNS["fact_stock"]).withColumns(
        {
            "quantity": F.lit(1).cast("int"),
            "stock_date": F.lit(execution_date),
        }
    )


def stage_all(df: DataFrame, execution_date: str) -> dict[str, DataFrame]:
    """The 4-way staging fan-out. Caller is responsible for caching ``df``
    first (see `pipeline.run_week`)."""
    return {
        "dim_broker": stage_broker(df),
        "dim_geography": stage_geography(df),
        "dim_asset": stage_asset(df),
        "fact_stock": stage_stock(df, execution_date),
    }
