"""Pure-SQL access to the engine.

Registers the testdata tables and the warehouse (TableStore databases) as
temp views so everything the DataFrame API does is reachable through
`spark.sql(...)` — Catalyst treats both identically, so there is no
performance cliff between the two front doors.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from manifold_spark.catalog import TableStore
from manifold_spark.queries import _t

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose the synthetic tables as temp views (events gets the
    nanos-timestamp repair from `read_events`)."""
    for name in TESTDATA_TABLES:
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return TESTDATA_TABLES


def register_warehouse_views(
    spark: SparkSession, store: TableStore, databases: tuple[str, ...] = ("staging", "presentation")
) -> list[str]:
    """Expose TableStore tables as `{database}_{table}` views (temp views
    have a flat namespace)."""
    import os

    out = []
    for db in databases:
        db_path = f"{store.root}/{db}"
        if not os.path.isdir(db_path):
            continue
        for table in sorted(os.listdir(db_path)):
            # skip crashed-overwrite staging dirs ('{table}.tmp-xxxx') and
            # anything that can't form a legal flat view name
            if "." in table:
                continue
            if store.exists(db, table):
                view = f"{db}_{table}"
                store.read(spark, db, table).createOrReplaceTempView(view)
                out.append(view)
    return out
