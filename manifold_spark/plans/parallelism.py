"""Parallelism guards for compute-bound operators.

Spark sizes scan parallelism by BYTES (`spark.sql.files.maxPartitionBytes`),
which is right for IO-bound plans and wrong for compute-bound ones: a 5 MB
parquet file is one split, so a hash-per-shingle operator runs on one core
while the rest of the cluster idles. At 100 TB the same scan has ~10⁶
splits and a blanket `repartition()` would instead inject a full-corpus
shuffle for nothing.

`ensure_parallelism` resolves the tension: it repartitions ONLY when the
current partition count is far below the cluster's parallelism — a no-op
exactly when the data is big enough not to need it, and the shuffled bytes
are small exactly when it fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition to the cluster's default parallelism iff the plan's
    current partitioning is below ``min_fraction`` of it."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
