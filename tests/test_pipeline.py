"""End-to-end weekly pipeline over synthetic listing JSON (FIXTURES.md §3
invariants): two weeks, SCD2 evolution, fact resolution."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from manifold_spark.catalog import TableStore
from manifold_spark.pipeline import run_week
from manifold_spark.quality import duplicate_active_keys
from manifold_spark.schema import DIM_KEYS

SENTINEL = dt.date(9999, 12, 31)


@pytest.fixture(scope="module")
def warehouse(spark, listings_weeks, tmp_path_factory):
    store = TableStore(str(tmp_path_factory.mktemp("wh")))
    c1 = run_week(spark, store, listings_weeks["root"], listings_weeks["week1"])
    c2 = run_week(spark, store, listings_weeks["root"], listings_weeks["week2"])
    return {"store": store, "counts1": c1, "counts2": c2, "meta": listings_weeks}


def test_staging_written(spark, warehouse):
    store = warehouse["store"]
    for t in ("dim_broker", "dim_geography", "dim_asset", "fact_stock"):
        df = store.read(spark, "staging", t)
        assert df.count() > 0
        assert "hash" in df.columns or t == "fact_stock"


def test_unique_active_invariant(spark, warehouse):
    store = warehouse["store"]
    for dim, keys in DIM_KEYS.items():
        df = store.read(spark, "presentation", dim)
        assert duplicate_active_keys(df, keys).count() == 0


def test_scd2_price_changes_create_versions(spark, warehouse):
    """Assets whose price changed in week2 must have 2 versions: one
    expired at week2-1, one active starting week2."""
    store = warehouse["store"]
    meta = warehouse["meta"]
    dim = store.read(spark, "presentation", "dim_asset")
    versions = dim.groupBy("contract_number").count().filter("count > 1")
    n_changed = versions.count()
    assert n_changed >= meta["changed_prices"]  # price changes all produce versions
    expired = dim.filter(F.col("record_end_date") == F.lit(meta["week2"]).cast("date") - F.expr("INTERVAL 1 DAY"))
    assert expired.count() == n_changed


def test_fact_resolves_surrogate_keys(spark, warehouse):
    store = warehouse["store"]
    fact = store.read(spark, "presentation", "fact_stock")
    meta = warehouse["meta"]
    assert fact.count() == meta["week1_rows"] + meta["week2_rows"]
    # every fact row resolved its asset and geography (they come from the same rows)
    assert fact.filter(F.col("asset_id").isNull()).count() == 0
    assert fact.filter(F.col("broker_id").isNull()).count() == 0
    # two distinct date keys
    date_ids = {r[0] for r in fact.select("date_id").distinct().collect()}
    assert date_ids == {
        int(meta["week1"].replace("-", "")),
        int(meta["week2"].replace("-", "")),
    }
    # ids are unique
    assert fact.select("id").distinct().count() == fact.count()


def test_fact_idempotent_rerun(spark, warehouse, listings_weeks):
    store = warehouse["store"]
    before = store.read(spark, "presentation", "fact_stock").count()
    run_week(spark, store, listings_weeks["root"], listings_weeks["week2"])
    after = store.read(spark, "presentation", "fact_stock").count()
    assert before == after  # idempotent re-run doesn't double the week


def _partition_snapshot(path):
    """{relpath: (size, mtime_ns)} for every data file under a table dir."""
    import os

    snap = {}
    for dirpath, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(dirpath, f)
                st = os.stat(full)
                snap[os.path.relpath(full, path)] = (st.st_size, st.st_mtime_ns)
    return snap


def test_fact_load_touches_only_its_partition(spark, listings_weeks, tmp_path_factory):
    """The weekly fact write must be partition-scoped: after week 2 runs,
    week 1's date_id partition files are bit-for-bit untouched (same
    paths, sizes, mtimes) — the write cost is O(week), not O(history)."""
    store = TableStore(str(tmp_path_factory.mktemp("wh-partscope")))
    meta = listings_weeks
    run_week(spark, store, meta["root"], meta["week1"])
    fact_path = store.path("presentation", "fact_stock")
    week1_key = f"date_id={int(meta['week1'].replace('-', ''))}"
    before = {
        p: v for p, v in _partition_snapshot(fact_path).items() if p.startswith(week1_key)
    }
    assert before, "week1 partition must exist"

    run_week(spark, store, meta["root"], meta["week2"])
    snap = _partition_snapshot(fact_path)
    after = {p: v for p, v in snap.items() if p.startswith(week1_key)}
    assert after == before  # week1 files untouched by week2's write
    week2_key = f"date_id={int(meta['week2'].replace('-', ''))}"
    assert any(p.startswith(week2_key) for p in snap)


def test_bucketed_dims_pipeline_equivalent(spark, warehouse, listings_weeks, tmp_path_factory):
    """run_week with the bucketed dimension backend must produce tables
    row-identical to the rebuild-overwrite default."""
    store_b = TableStore(str(tmp_path_factory.mktemp("wh-bucketed")))
    meta = listings_weeks
    run_week(spark, store_b, meta["root"], meta["week1"], bucketed_dims=8)
    run_week(spark, store_b, meta["root"], meta["week2"], bucketed_dims=8)
    store = warehouse["store"]
    from manifold_spark.scd2 import BUCKET_COL

    for dim in DIM_KEYS:
        plain = store.read(spark, "presentation", dim)
        bucketed = store_b.read(spark, "presentation", dim).drop(BUCKET_COL)
        assert sorted(plain.collect(), key=str) == sorted(
            bucketed.select(*plain.columns).collect(), key=str
        )
    fact_p = store.read(spark, "presentation", "fact_stock")
    fact_b = store_b.read(spark, "presentation", "fact_stock")
    assert sorted(fact_p.collect(), key=str) == sorted(
        fact_b.select(*fact_p.columns).collect(), key=str
    )


def test_date_dimension(spark, warehouse):
    store = warehouse["store"]
    dd = store.read(spark, "presentation", "dim_date")
    assert dd.count() == 30 * 365 + 1
    jan1 = dd.filter(F.col("date_id") == 20180101).collect()[0]
    assert jan1["full_date"] == "2018-01-01"
    assert jan1["year_number"] == 2018
    assert jan1["month_name"] == "January"
    assert jan1["day_name"] == "Monday"
    assert jan1["is_weekday"] == 1
    assert jan1["week_iso_number"] == 1
    # 2018-12-31 is a Monday in ISO week 1 of 2019
    dec31 = dd.filter(F.col("date_id") == 20181231).collect()[0]
    assert dec31["is_last_of_month"] == 1
    sat = dd.filter(F.col("date_id") == 20180106).collect()[0]
    assert sat["is_weekday"] == 0 and sat["weekday_number"] == 7
