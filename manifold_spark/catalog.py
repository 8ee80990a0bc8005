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


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` at ``dst`` using hardlinks for files (copy as a
    cross-device fallback) — constant-size metadata work per file, no
    data movement, so staging a full table directory costs O(#files),
    not O(bytes)."""
    if os.path.isdir(src):
        os.makedirs(dst, exist_ok=True)
        for entry in os.listdir(src):
            _link_tree(os.path.join(src, entry), os.path.join(dst, entry))
    else:
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)


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
        sibling tmp dir, assemble a COMPLETE new table directory
        (hardlinks for every untouched partition — no data copy), then
        swap the whole directory in. The table is therefore never
        half-merged (ADVICE r2): before the swap the old state is fully
        intact; after it the new state is fully live. The swap itself is
        two renames — a crash exactly between them leaves the table
        momentarily absent but fully recoverable from the `.old-*` dir it
        just renamed (never a mix of old and new buckets).
        Single-level partitioning only (all this engine uses)."""
        if len(partition_by) != 1:
            raise ValueError("swap_partitions supports exactly one partition column")
        final = self.path(database, table)
        token = uuid.uuid4().hex[:8]
        tmp = f"{final}.tmp-{token}"
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
        if not os.path.isdir(final):
            os.replace(tmp, final)
            return
        stage = f"{final}.stage-{token}"
        old = f"{final}.old-{token}"
        try:
            written = {e for e in os.listdir(tmp) if "=" in e}
            os.makedirs(stage)
            # untouched partitions + marker files: hardlink from the live
            # table (same filesystem — the stage dir is a sibling)
            for entry in os.listdir(final):
                if entry not in written:
                    _link_tree(os.path.join(final, entry), os.path.join(stage, entry))
            # replaced partitions: move in from the staged write
            for entry in written:
                os.replace(os.path.join(tmp, entry), os.path.join(stage, entry))
            os.replace(final, old)
            os.replace(stage, final)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(stage, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)

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
