"""Path-based warehouse catalog (reference D1-D3, D8, S5).

The reference's `staging` / `presentation` schemas live in Redshift; ours
are directories of Parquet tables. `TRUNCATE` + `COPY` collapses to an
overwrite write (reference S5/D8); DDL collapses to the write's schema.

Rebuild-overwrite safety: Spark cannot overwrite a path that feeds the
running plan, so `overwrite` stages the new data in a sibling tmp dir and
swaps it in — which is exactly what the SCD2 rebuild needs (read dim,
rebuild, replace). The API is MERGE-shaped so a Delta-backed store can
slot in later without touching callers (SURVEY §7 risk 1).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    """A tiny two-level catalog: ``{root}/{database}/{table}`` Parquet dirs."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def path(self, database: str, table: str) -> str:
        return f"{self.root}/{database}/{table}"

    def exists(self, database: str, table: str) -> bool:
        p = self.path(database, table)
        if not os.path.isdir(p):
            return False
        # Partitioned tables nest part-files under key=value subdirs.
        return any(
            f.endswith(".parquet") for _, _, files in os.walk(p) for f in files
        )

    def read(self, spark: SparkSession, database: str, table: str) -> DataFrame:
        return spark.read.parquet(self.path(database, table))

    def overwrite(
        self,
        df: DataFrame,
        database: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> None:
        """Truncate-and-load (reference D8+S5). Stage-to-tmp + swap so the
        source of a rebuild can also be its destination."""
        final = self.path(database, table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    def overwrite_partitions(
        self,
        df: DataFrame,
        database: str,
        table: str,
        partition_by: list[str],
    ) -> None:
        """Dynamic partition overwrite: replace ONLY the partitions present
        in ``df``, leaving every other partition's files untouched. The
        weekly fact load writes one `date_id` partition this way — cost is
        O(week), not O(table history). Safe without the tmp-swap dance
        because the written partitions' data derives from staging, never
        from the table being written."""
        writer = (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
        )
        writer.parquet(self.path(database, table))

    def swap_partitions(
        self,
        df: DataFrame,
        database: str,
        table: str,
        partition_by: list[str],
    ) -> None:
        """Partition-scoped overwrite for plans that READ from the
        destination table (e.g. an SCD2 merge whose output derives from
        the dimension being replaced): stage the written partitions to a
        sibling tmp dir, then swap exactly those `key=value` directories
        into the table — every other partition's files are untouched.
        Single-level partitioning only (all this engine uses)."""
        if len(partition_by) != 1:
            raise ValueError("swap_partitions supports exactly one partition column")
        final = self.path(database, table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
        try:
            for entry in os.listdir(tmp):
                if "=" not in entry:
                    continue  # _SUCCESS and friends
                src, dst = os.path.join(tmp, entry), os.path.join(final, entry)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.replace(src, dst)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def append(
        self,
        df: DataFrame,
        database: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> None:
        """INSERT…SELECT append (reference D6/D9)."""
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(database, table))

    def columns(self, spark: SparkSession, database: str, table: str) -> list[str]:
        """Column introspection (reference D7, `dimension_operator.py:100-137`
        queries information_schema; here the Parquet footer is the schema)."""
        return self.read(spark, database, table).columns
