"""Parallelism guards for compute-bound operators.

Spark sizes scan parallelism by BYTES (`spark.sql.files.maxPartitionBytes`),
which is right for IO-bound plans and wrong for compute-bound ones: a 5 MB
parquet file is one split, so a hash-per-shingle operator runs on one core
while the rest of the cluster idles. At 100 TB the same scan has ~10⁶
splits and a blanket `repartition()` would instead inject a full-corpus
shuffle for nothing.

`ensure_parallelism` resolves the tension: it repartitions ONLY when the
input's estimated split count is far below the cluster's parallelism — a
no-op exactly when the data is big enough not to need it, and the shuffled
bytes are small exactly when it fires. The estimate comes from the plan's
input FILES (count + local sizes vs `maxPartitionBytes`), never from
`df.rdd` — touching `.rdd` forces a physical-plan compile per call.
"""

from __future__ import annotations

import math
import os
import re
from contextlib import contextmanager
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def _max_partition_bytes(df: DataFrame) -> int:
    raw = str(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    digits = re.match(r"\d+", raw.strip())
    return int(digits.group()) if digits else 128 * 1024 * 1024


def estimated_splits(df: DataFrame) -> int | None:
    """Estimate the scan's split count from its input files: each file
    contributes ceil(size / maxPartitionBytes) splits. Returns None when
    the estimate can't be made cheaply (non-file plan, remote filesystem)
    — callers should then leave the plan alone."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    max_bytes = _max_partition_bytes(df)
    total_splits = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            # remote store: listing sizes costs RPCs; Spark's own split
            # sizing is trustworthy there (many objects, 128 MB parts)
            return None
        path = unquote(parsed.path)
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        total_splits += max(1, math.ceil(size / max_bytes))
    return total_splits


@contextmanager
def scoped_scan_split_size(spark, path: str, min_fraction: float = 0.5):
    """Temporarily shrink ``spark.sql.files.maxPartitionBytes`` so a
    compute-bound scan over a SMALL local file set (e.g. one weekly
    JSON-lines snapshot) fans out across the cluster's cores instead of
    parsing on one task (r14: the weekly 100k-listing JSON parsed
    single-threaded — `ensure_parallelism` repartitions AFTER the scan,
    which cannot parallelize the parse itself).

    Scale-adaptive, not a local constant: a no-op whenever the input
    already yields ≥ ``min_fraction × defaultParallelism`` splits (the
    real-cluster case — thousands of files at default split sizing), or
    when sizes can't be read cheaply (remote store). The shrunken split
    is derived from the input size (total / parallelism, floored at
    1 MiB so tiny inputs don't shatter), and the previous value is
    restored on exit — line-delimited JSON splits are record-safe.
    Session-scoped: use only around a driver-sequenced stage whose jobs
    should all see the shrunken value (as `pipeline.run_week` does)."""
    target = spark.sparkContext.defaultParallelism
    sizes: list[int] = []
    for dirpath, _, files in os.walk(path):
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            try:
                sizes.append(os.path.getsize(os.path.join(dirpath, fname)))
            except OSError:
                sizes = []
                break
    key = "spark.sql.files.maxPartitionBytes"
    raw = str(spark.conf.get(key, "134217728"))
    digits = re.match(r"\d+", raw.strip())
    max_bytes = int(digits.group()) if digits else 128 * 1024 * 1024
    splits = sum(max(1, math.ceil(s / max_bytes)) for s in sizes)
    if not sizes or splits >= max(2, int(target * min_fraction)):
        yield
        return
    per = max(sum(sizes) // max(target, 1), 1 << 20)
    spark.conf.set(key, str(per))
    try:
        yield
    finally:
        spark.conf.set(key, raw)


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition to the cluster's default parallelism iff the scan's
    estimated split count is below ``min_fraction`` of it.

    In-memory inputs (``createDataFrame``, ``spark.range``) and remote
    filesystems are a deliberate NO-OP: ``estimated_splits`` returns None
    there, so the plan is left alone. A single-partition in-memory corpus
    fed to a compute-bound operator therefore stays single-core — if that
    matters (notebook experiments), call ``df.repartition(n)`` explicitly;
    the production path is always a file scan, where the guard works.
    Perf-only semantics either way — never affects results."""
    target = df.sparkSession.sparkContext.defaultParallelism
    splits = estimated_splits(df)
    if splits is not None and splits < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
