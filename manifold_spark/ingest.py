"""JSON listing ingest (reference S1/S2).

The reference reads `s3://bucket/{year}/{month}/{week}/*.json` with inferred
schema (`/root/reference/scripts/el_to_parquet.py:210-231,296-315`). We pin
the `LISTING_SCHEMA` contract by default (PERMISSIVE mode: malformed rows
null out instead of failing the 100 TB job) and keep infer as a flag.

Path templating reproduces the reference's backfill-by-timestep layout —
with partitioned Parquet as the preferred at-rest format, where the same
pruning comes from Catalyst partition filters instead of path math.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from manifold_spark.schema import ALLOWED_ATTRIBUTES, LISTING_SCHEMA

#: Default path template (reference `el_to_parquet.py:275`).
PATH_TEMPLATE = "{root}/{year}/{month}/{week}"


def timestep_path(root: str, execution_date: str | dt.date, template: str = PATH_TEMPLATE) -> str:
    """Resolve the `{year}/{month}/{week}` input folder for an execution
    date (reference S2, `el_to_parquet.py:296-315`): week = ISO week.

    Year-boundary caveat (inherited from the reference's scheme): the path
    mixes CALENDAR year/month with the ISO week number, so 2025-12-29
    (ISO week 1 of 2026) lands in `2025/12/1`. Consistent as long as both
    writer and reader use this function — which the pipeline does — but
    don't interpret the trailing component as "week within that month/year".
    """
    if isinstance(execution_date, str):
        execution_date = dt.date.fromisoformat(execution_date)
    return template.format(
        root=root.rstrip("/"),
        year=execution_date.year,
        month=execution_date.month,
        week=execution_date.isocalendar()[1],
    )


def load_json_listings(
    spark: SparkSession,
    path: str,
    infer_schema: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read listing JSON (reference S1). Pinned schema by default; the
    14-column projection is applied either way so source-specific extras
    never propagate (reference P1)."""
    reader = spark.read.option("mode", mode)
    if infer_schema:
        df = reader.json(path)
        present = [c for c in ALLOWED_ATTRIBUTES if c in df.columns]
        return df.select(*present)
    return reader.schema(LISTING_SCHEMA).json(path).select(*ALLOWED_ATTRIBUTES)
