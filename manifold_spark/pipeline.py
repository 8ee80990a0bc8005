"""Weekly pipeline driver (reference DAG `manifold_main`, §2.8).

The reference's 6-stage Airflow DAG (scrape → EL → staging DDL → staging
load → SCD2 dims → fact) collapses to one function: every stage is a
DataFrame program against the TableStore. Stage boundaries are preserved
as real writes (staging Parquet exists on disk after the run, like the
reference's `staging.*` tables) so each stage is independently testable
and restartable.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from manifold_spark import clean, ingest, quality, scd2, stage
from manifold_spark.catalog import TableStore
from manifold_spark.dims import date_dimension
from manifold_spark.facts import load_fact_stock
from manifold_spark.schema import DIM_KEYS

#: staging table → (presentation table, surrogate key column)
_DIMS = {
    "dim_broker": "broker_id",
    "dim_asset": "asset_id",
    "dim_geography": "geography_id",
}


def run_week(
    spark: SparkSession,
    store: TableStore,
    raw_root: str,
    execution_date: str | dt.date,
    infer_schema: bool = False,
    idempotent_fact: bool = True,
    bucketed_dims: int | None = None,
    stage_timings: dict | None = None,
) -> dict[str, int]:
    """Run one weekly timestep end-to-end. Returns row counts per table.

    ``bucketed_dims=N`` switches the dimension merges to the bucketed
    backend (`scd2.scd2_merge_bucketed` with N key-hash buckets): only
    buckets containing changed/new keys are rewritten instead of the
    whole dimension — the row-level-merge cost model for dims whose size
    makes rebuild-overwrite expensive. Default (None) keeps the
    rebuild-overwrite path; results are row-identical either way.

    ``stage_timings`` (r13, VERDICT r12 #2): pass a dict and each
    stage's wall seconds are accumulated into it (el_staging,
    staging_quality, scd2_<dim> ×3, date_dim, fact_load — keys sum to
    the call's wall time). Pure observation at the existing stage
    boundaries; the execution path is identical either way. The bench
    publishes this as `pipeline_run_week_stages` so a moving headline
    row names its stage."""
    import time as _time

    _t0 = _time.perf_counter()

    def _mark(key: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        if stage_timings is not None:
            stage_timings[key] = round(
                stage_timings.get(key, 0.0) + (now - _t0), 3
            )
        _t0 = now

    if isinstance(execution_date, dt.date):
        execution_date = execution_date.isoformat()

    # Stage 2 — EL: ingest + clean, one cached scan feeding the 4-way
    # staging fan-out (the reference's deliberate `.cache()`,
    # `el_to_parquet.py:324-325` — without it each sink re-reads the JSON).
    path = ingest.timestep_path(raw_root, execution_date)
    base = clean.clean_listings(ingest.load_json_listings(spark, path, infer_schema))
    base = base.cache()
    try:
        # Stages 3-4 — staging DDL + load ≡ overwrite writes.
        for name, df in stage.stage_all(base, execution_date).items():
            store.overwrite(df, "staging", name)
    finally:
        base.unpersist()
    _mark("el_staging")

    counts: dict[str, int] = {}
    for name in ("dim_broker", "dim_geography", "dim_asset", "fact_stock"):
        counts[f"staging.{name}"] = quality.assert_nonempty(
            store.read(spark, "staging", name), f"staging.{name}"
        )
    _mark("staging_quality")

    # Stage 5 — SCD2 merge per dimension.
    for dim_name, sk_col in _DIMS.items():
        base_df = store.read(spark, "staging", dim_name)
        if bucketed_dims:
            scd2.scd2_merge_bucketed(
                spark, store, "presentation", dim_name, base_df, sk_col,
                DIM_KEYS[dim_name], execution_date, n_buckets=bucketed_dims,
            )
        else:
            target = (
                store.read(spark, "presentation", dim_name)
                if store.exists("presentation", dim_name)
                else None
            )
            merged = scd2.scd2_merge(target, base_df, sk_col, DIM_KEYS[dim_name], execution_date)
            store.overwrite(merged, "presentation", dim_name)
        dim = store.read(spark, "presentation", dim_name)
        quality.assert_unique_active(dim, DIM_KEYS[dim_name], dim_name)
        counts[f"presentation.{dim_name}"] = quality.assert_nonempty(dim, dim_name)
        _mark(f"scd2_{dim_name}")

    # Date dimension (reference: a view; materialized once here).
    if not store.exists("presentation", "dim_date"):
        store.overwrite(date_dimension(spark), "presentation", "dim_date")
    _mark("date_dim")

    # Stage 6 — fact load: write ONLY the week's date_id partition.
    # Idempotent mode (default) uses dynamic partition overwrite, so a
    # re-run replaces the week in place; the id offset comes from the OTHER
    # partitions' max (a driver-side scalar resolved before the write job
    # starts, so there is no read-while-write hazard). Cost per week is
    # O(week), never O(table history); all other partitions' files are
    # untouched. Readers get partition pruning on the time axis (the
    # reference's path-partitioning, now as a Catalyst-visible layout).
    fact_staging = store.read(spark, "staging", "fact_stock")
    existing = (
        store.read(spark, "presentation", "fact_stock")
        if store.exists("presentation", "fact_stock")
        else None
    )
    week_date_id = int(execution_date.replace("-", ""))
    id_offset = 0
    if existing is not None:
        if idempotent_fact:
            existing = existing.filter(F.col("date_id") != week_date_id)
        row = existing.agg(F.max("id")).collect()[0][0]
        id_offset = row or 0

    fact_new = load_fact_stock(
        fact_staging,
        store.read(spark, "presentation", "dim_broker"),
        store.read(spark, "presentation", "dim_asset"),
        store.read(spark, "presentation", "dim_geography"),
        id_offset=id_offset,
    )
    if idempotent_fact:
        store.overwrite_partitions(fact_new, "presentation", "fact_stock", partition_by=["date_id"])
    else:
        store.append(fact_new, "presentation", "fact_stock", partition_by=["date_id"])
    counts["presentation.fact_stock"] = quality.assert_nonempty(
        store.read(spark, "presentation", "fact_stock"), "fact_stock"
    )
    _mark("fact_load")
    return counts
