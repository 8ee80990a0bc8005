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
    staging_quality, scd2_dims, fact_load — keys sum to the call's wall
    time). Pure observation at the existing stage boundaries; the
    execution path is identical either way. The bench publishes this as
    `pipeline_run_week_stages` so a moving headline row names its
    stage. r14 note: the three dimension merges + the date dimension
    now run CONCURRENTLY (guide §2.6 — independent writes back-fill
    each other's stragglers), so the former per-dim keys
    (scd2_dim_* ×3, date_dim) collapse into the one `scd2_dims`
    wall-clock key; per-dim wall times would overlap and no longer sum
    to the row."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

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
    # r14 (guide §2.6): the four staging writes are independent jobs over
    # the shared cache — submitted from a thread pool so each write's
    # straggler tail back-fills with the next write's tasks (cache blocks
    # are computed once under BlockManager per-partition locks).
    from manifold_spark.plans.parallelism import scoped_scan_split_size

    path = ingest.timestep_path(raw_root, execution_date)
    base = clean.clean_listings(ingest.load_json_listings(spark, path, infer_schema))
    base = base.cache()
    try:
        # r14: the weekly snapshot is typically ONE JSON-lines file, so
        # the parse ran as a single task; the scoped split-size shrink
        # fans the scan itself across the cores (no-op on real
        # multi-file inputs).
        with scoped_scan_split_size(spark, path):
            staged = stage.stage_all(base, execution_date)
            with ThreadPoolExecutor(max_workers=len(staged)) as pool:
                list(
                    pool.map(
                        lambda kv: store.overwrite(kv[1], "staging", kv[0]),
                        staged.items(),
                    )
                )
    finally:
        base.unpersist()
    _mark("el_staging")

    counts: dict[str, int] = {}
    staging_tables = ("dim_broker", "dim_geography", "dim_asset", "fact_stock")
    with ThreadPoolExecutor(max_workers=len(staging_tables)) as pool:
        for name, n in zip(
            staging_tables,
            pool.map(
                lambda name: quality.assert_nonempty(
                    store.read(spark, "staging", name), f"staging.{name}"
                ),
                staging_tables,
            ),
        ):
            counts[f"staging.{name}"] = n
    _mark("staging_quality")

    # Stage 5 — SCD2 merge per dimension + the date dimension, run
    # CONCURRENTLY (r14, guide §2.6): the three merges and the date-dim
    # write touch disjoint tables, so their jobs overlap — the phase
    # wall time is max(dim) instead of sum(dims). The post-merge gates
    # (unique-active + non-empty) are ONE aggregate action per dim
    # (`assert_dim_invariants`), not two.
    def _merge_dim(item: tuple[str, str]) -> tuple[str, int]:
        dim_name, sk_col = item
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
        return dim_name, quality.assert_dim_invariants(
            dim, DIM_KEYS[dim_name], dim_name
        )

    def _date_dim() -> None:
        # Date dimension (reference: a view; materialized once here).
        if not store.exists("presentation", "dim_date"):
            store.overwrite(date_dimension(spark), "presentation", "dim_date")

    # r15 (guide §2.6): the fact id-offset scalar (and the retained-row
    # count the final gate needs) depend only on PREVIOUS weeks' fact
    # partitions — disjoint from every dimension table — so that agg job
    # overlaps the dim merges instead of running as a serial action
    # between them and the fact write. One aggregate returns BOTH scalars
    # (max id + retained count) where the old path ran a max-only agg and
    # then re-counted the whole table after the write.
    week_date_id = int(execution_date.replace("-", ""))

    def _fact_prep() -> tuple[int, int]:
        if not store.exists("presentation", "fact_stock"):
            return 0, 0
        existing = store.read(spark, "presentation", "fact_stock")
        if idempotent_fact:
            existing = existing.filter(F.col("date_id") != week_date_id)
        row = existing.agg(
            F.max("id").alias("mx"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return (row["mx"] or 0), row["n"]

    with ThreadPoolExecutor(max_workers=len(_DIMS) + 2) as pool:
        date_future = pool.submit(_date_dim)
        fact_prep_future = pool.submit(_fact_prep)
        for dim_name, n in pool.map(_merge_dim, _DIMS.items()):
            counts[f"presentation.{dim_name}"] = n
        date_future.result()
    _mark("scd2_dims")

    # Stage 6 — fact load: write ONLY the week's date_id partition.
    # Idempotent mode (default) uses dynamic partition overwrite, so a
    # re-run replaces the week in place; the id offset comes from the OTHER
    # partitions' max (a driver-side scalar resolved before the write job
    # starts, so there is no read-while-write hazard). Cost per week is
    # O(week), never O(table history); all other partitions' files are
    # untouched. Readers get partition pruning on the time axis (the
    # reference's path-partitioning, now as a Catalyst-visible layout).
    # r15: the non-empty gate's count comes from an Observation ON the
    # write job (written rows) plus the retained-partition count from
    # `_fact_prep` — the same total the old read-back count() computed,
    # without re-scanning the table after the write (guide §1.4/§2.6;
    # VERDICT r14 #3).
    from pyspark.sql import Observation

    fact_staging = store.read(spark, "staging", "fact_stock")
    id_offset, n_retained = fact_prep_future.result()

    fact_new = load_fact_stock(
        fact_staging,
        store.read(spark, "presentation", "dim_broker"),
        store.read(spark, "presentation", "dim_asset"),
        store.read(spark, "presentation", "dim_geography"),
        id_offset=id_offset,
    )
    obs = Observation("fact_load_rows")
    fact_new = fact_new.observe(obs, F.count(F.lit(1)).alias("n"))
    if idempotent_fact:
        store.overwrite_partitions(fact_new, "presentation", "fact_stock", partition_by=["date_id"])
    else:
        store.append(fact_new, "presentation", "fact_stock", partition_by=["date_id"])
    total_fact = n_retained + int(obs.get["n"])
    if total_fact == 0:
        raise quality.QualityError("table 'fact_stock' is empty")
    counts["presentation.fact_stock"] = total_fact
    _mark("fact_load")
    return counts
