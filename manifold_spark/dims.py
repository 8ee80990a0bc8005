"""Generated date dimension (reference D4 + F1-F9).

The reference builds `v_dim_date` as a Redshift view over
`generate_series(0, 30*365, 1)` rows added to 2018-01-01
(`/root/reference/plugins/helpers/sql_queries_presentation.py:55-89`).
Spark-native: `spark.range` (a parallel, partitioned row generator — no
driver materialization) + date built-ins. ~11k rows; broadcast-sized by
construction.

Column semantics (file:line cites per SURVEY §2.6):
- date_id          int yyyyMMdd key (F2, :59)
- full_date        ISO yyyy-MM-dd string (F3, :60)
- year/week/day/quarter/month numbers (F4/F5, :61-65; week is ISO week)
- month_name/day_name (F6, :66,68)
- weekday_number   1=Sunday … 7=Saturday (F7, :67 — Redshift `D`)
- is_weekday       0 for Sat/Sun (F8, :69-71)
- is_last_of_month (F9, :72-77; the reference's `ekse` typo means `else`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_DIM_START = "2018-01-01"
DATE_DIM_DAYS = 30 * 365  # reference F1: generate_series(0, 30*365, 1)


def date_dimension(
    spark: SparkSession,
    start: str = DATE_DIM_START,
    days: int = DATE_DIM_DAYS,
) -> DataFrame:
    """30-year calendar, one row per day from ``start`` (inclusive)."""
    d = F.date_add(F.to_date(F.lit(start)), F.col("id").cast("int"))
    return (
        spark.range(0, days + 1)
        .select(d.alias("datum"))
        .select(
            F.date_format("datum", "yyyyMMdd").cast("int").alias("date_id"),
            F.date_format("datum", "yyyy-MM-dd").alias("full_date"),
            F.year("datum").alias("year_number"),
            F.weekofyear("datum").alias("week_iso_number"),
            F.dayofyear("datum").alias("day_number"),
            F.quarter("datum").alias("quarter_number"),
            F.month("datum").alias("month_number"),
            F.date_format("datum", "MMMM").alias("month_name"),
            F.dayofweek("datum").alias("weekday_number"),
            F.date_format("datum", "EEEE").alias("day_name"),
            F.when(F.dayofweek("datum").isin(1, 7), F.lit(0)).otherwise(F.lit(1)).alias("is_weekday"),
            F.when(F.last_day("datum") == F.col("datum"), F.lit(1)).otherwise(F.lit(0)).alias("is_last_of_month"),
        )
    )
