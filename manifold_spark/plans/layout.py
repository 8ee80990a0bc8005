"""Physical-layout tools: bucketing, partitioned writes, skew salting.

These are the knobs that decide whether a 100 TB join shuffles 100 TB or
nothing:

- **Bucketing** (`write_bucketed`): pre-hash-partition a table on its join
  key at write time. Two tables bucketed the same way join with ZERO
  exchange — the shuffle happened once, at load, instead of per query.
  This is how the fact↔dim co-location of a warehouse should be stored.
- **Partitioned writes** (`TableStore.overwrite(partition_by=…)`): the
  reference's `/{year}/{month}/{week}/` path scheme as a Catalyst-visible
  layout — readers get partition pruning instead of path math.
- **Salting** (`salted_join`): when one join key carries a disproportionate
  share of rows, split it across `n_salt` synthetic sub-keys: the small
  side is replicated n_salt ways, the big side's hot partition splits into
  n_salt tasks. AQE's skew-join handles sort-merge skew automatically;
  salting is the explicit tool for broadcast-ineligible skews and for
  deterministic layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table. Joins and
    aggregations on `bucket_cols` between tables bucketed with the same
    (cols, num_buckets) run shuffle-free."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Skew-resistant equi join: the (big, skewed) left side gets a salt,
    the (smaller) right side is replicated across all salt values. Join
    key becomes (on, salt), so a hot key spreads over `n_salt` tasks.

    The salt must be row-unique, not content-derived: hashing row CONTENT
    would send full-row duplicates (exactly the hot-key pattern salting
    targets) to one salt bucket, spreading nothing. Pass ``salt_from`` —
    the name of a UNIQUE left-side column (row id, event id) — for a
    fully DETERMINISTIC salt (hash of that column): same physical
    assignment every run, reproducible task sizes. Without it the salt
    falls back to `monotonically_increasing_id`, whose physical
    assignment varies run to run; the RESULT SET is identical either way
    (the salt never reaches the output), only the layout determinism
    differs.

    Only inner/left joins are sound: the right side is replicated, so
    right/full-outer would surface n_salt-1 spurious unmatched copies of
    every unmatched right row."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    if salt_from is not None:
        from manifold_spark.functions.hashing import stable_long_hash

        salt = F.pmod(stable_long_hash(F.col(salt_from).cast("string")), F.lit(n_salt))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_salted.join(r_salted, [on, "_salt"], how).drop("_salt")


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
) -> None:
    """Range-partition + sort-within-partitions before writing: each output
    file covers a narrow, non-overlapping range of `cluster_cols`, so the
    parquet min/max column statistics become selective and point/range
    predicates skip whole files (the poor man's Z-order, exactly right for
    one dominant filter column — time, id, tenant)."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
