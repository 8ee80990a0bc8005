"""The reference's own scale-validation protocol, miniaturized: a 10-week
evolution where each week samples ~80% of the asset universe and perturbs
~10% of prices (`/root/reference/README.md:173`; FIXTURES.md §1). After
every week the warehouse must hold all SCD2 + fact invariants."""

import pytest

# r15 slow tier (VERDICT r14 #2): 10-week warehouse evolution —
# excluded from the default (driver-verify) run by pytest.ini's
# `-m "not slow"`; run with `-m slow` (round-close evidence in
# OPTIMIZATION_r15.md).
pytestmark = pytest.mark.slow

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from manifold_spark.catalog import TableStore
from manifold_spark.pipeline import run_week
from manifold_spark.quality import duplicate_active_keys
from manifold_spark.schema import DIM_KEYS, SCD2_SENTINEL

from conftest import make_listing, write_week

N_WEEKS = 10
UNIVERSE = 120


@pytest.mark.slow
def test_ten_week_simulation(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sim-raw"))
    store = TableStore(str(tmp_path_factory.mktemp("sim-wh")))
    rng = random.Random(7)

    contracts = [f"C{200000 + i}" for i in range(UNIVERSE)]
    listings = {c: make_listing(rng, c) for c in contracts}

    start = dt.date(2024, 1, 1)
    weekly_rows = []
    total_changed = 0
    for w in range(N_WEEKS):
        week_date = start + dt.timedelta(weeks=w)
        present = [c for c in contracts if rng.random() < 0.8]
        for c in present:
            if rng.random() < 0.1 and listings[c]["PriceCurrencyFormated"] is not None:
                listings[c] = dict(
                    listings[c],
                    PriceCurrencyFormated=round(listings[c]["PriceCurrencyFormated"] * 1.03, 2),
                )
                total_changed += 1
        week = [listings[c] for c in present]
        write_week(root, week_date, week)
        weekly_rows.append(len(week))
        run_week(spark, store, root, week_date)

        # Invariants after EVERY week:
        for dim, keys in DIM_KEYS.items():
            df = store.read(spark, "presentation", dim)
            assert duplicate_active_keys(df, keys).count() == 0, f"week {w}: {dim}"
        fact = store.read(spark, "presentation", "fact_stock")
        assert fact.count() == sum(weekly_rows), f"week {w}: fact accumulation"
        assert fact.select("id").distinct().count() == fact.count()

    # After 10 weeks: every contract ever seen has exactly one active row,
    # and price-change history produced multiple versions.
    dim_asset = store.read(spark, "presentation", "dim_asset")
    seen = dim_asset.select("contract_number").distinct().count()
    active = dim_asset.filter(
        F.col("record_end_date") == F.lit(SCD2_SENTINEL).cast("date")
    ).count()
    assert active == seen
    versions = dim_asset.groupBy("contract_number").count().filter("count > 1").count()
    assert versions > 0
    # expired rows outnumber nothing weird: total rows = active + expired
    assert dim_asset.count() >= seen + versions
