"""The engine through its SQL front door: same plans, same answers."""

from pyspark.sql import functions as F

from manifold_spark.catalog import TableStore
from manifold_spark.pipeline import run_week
from manifold_spark.sql import register_testdata_views, register_warehouse_views


def test_sql_over_testdata(spark, sf_dir):
    register_testdata_views(spark, sf_dir)
    row = spark.sql(
        """
        SELECT r.r_name, count(*) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1 ORDER BY 1 LIMIT 1
        """
    ).collect()[0]
    assert row["n"] > 0
    # events view has the repaired timestamp type
    t = dict(spark.table("events").dtypes)["ts"]
    assert t == "timestamp"


def test_sql_over_warehouse(spark, listings_weeks, tmp_path_factory):
    store = TableStore(str(tmp_path_factory.mktemp("sqlwh")))
    run_week(spark, store, listings_weeks["root"], listings_weeks["week1"])
    views = register_warehouse_views(spark, store)
    assert "presentation_dim_broker" in views and "staging_fact_stock" in views
    active = spark.sql(
        "SELECT count(*) AS n FROM presentation_dim_broker WHERE record_end_date = DATE'9999-12-31'"
    ).collect()[0]["n"]
    assert active > 0
    joined = spark.sql(
        """
        SELECT count(*) AS n
        FROM presentation_fact_stock f
        JOIN presentation_dim_asset a ON f.asset_id = a.asset_id
        """
    ).collect()[0]["n"]
    assert joined == listings_weeks["week1_rows"]
