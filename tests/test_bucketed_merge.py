"""Bucketed SCD2 merge backend: row-level-merge economics on plain
Parquet — only buckets containing changed/new keys may be rewritten, a
no-change snapshot writes nothing, and the merged table is row-identical
to the plain rebuild merge."""

import os

from pyspark.sql import functions as F

from manifold_spark import scd2
from manifold_spark.catalog import TableStore
from manifold_spark.stage import with_fingerprint

N_BUCKETS = 8


def _snap(path):
    """{relpath: (size, mtime_ns)} for every parquet file under path."""
    out = {}
    for dirpath, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(dirpath, f)
                st = os.stat(full)
                out[os.path.relpath(full, path)] = (st.st_size, st.st_mtime_ns)
    return out


def _base(spark, rows):
    df = spark.createDataFrame(rows, "k string, payload string")
    return with_fingerprint(df, ["k", "payload"])


def test_bucketed_merge_rewrites_only_changed_buckets(spark, tmp_path):
    store = TableStore(str(tmp_path / "wh"))
    rows1 = [(f"k{i}", "p") for i in range(40)]
    scd2.scd2_merge_bucketed(
        spark, store, "presentation", "dim_x", _base(spark, rows1),
        "x_id", ["k"], "2024-01-01", n_buckets=N_BUCKETS,
    )
    tbl = store.path("presentation", "dim_x")
    before = _snap(tbl)
    assert before

    kb = (
        spark.createDataFrame([("k5",)], "k string")
        .select(scd2.key_bucket(["k"], N_BUCKETS).alias("kb"))
        .collect()[0]["kb"]
    )
    rows2 = [(f"k{i}", "p2" if i == 5 else "p") for i in range(40)]
    scd2.scd2_merge_bucketed(
        spark, store, "presentation", "dim_x", _base(spark, rows2),
        "x_id", ["k"], "2024-01-08", n_buckets=N_BUCKETS,
    )
    after = _snap(tbl)

    changed = f"{scd2.BUCKET_COL}={kb}"
    untouched_before = {p: v for p, v in before.items() if not p.startswith(changed)}
    untouched_after = {p: v for p, v in after.items() if not p.startswith(changed)}
    assert untouched_after == untouched_before  # byte-identical files
    # the changed bucket WAS rewritten (new files / new mtimes)
    assert {p: v for p, v in after.items() if p.startswith(changed)} != {
        p: v for p, v in before.items() if p.startswith(changed)
    }

    # row-identical to the plain rebuild merge on the same inputs
    dim1 = scd2.scd2_merge(None, _base(spark, rows1), "x_id", ["k"], "2024-01-01")
    plain = scd2.scd2_merge(dim1, _base(spark, rows2), "x_id", ["k"], "2024-01-08")
    got = sorted(
        store.read(spark, "presentation", "dim_x").drop(scd2.BUCKET_COL).collect(),
        key=str,
    )
    exp = sorted(plain.collect(), key=str)
    assert got == exp
    # SCD2 shape: k5 has an expired + an active version with a fresh sk
    versions = [r for r in got if r["k"] == "k5"]
    assert len(versions) == 2
    assert {str(r["record_end_date"]) for r in versions} == {"2024-01-07", "9999-12-31"}


def test_bucketed_merge_noop_snapshot_writes_nothing(spark, tmp_path):
    store = TableStore(str(tmp_path / "wh"))
    rows = [(f"k{i}", "p") for i in range(20)]
    scd2.scd2_merge_bucketed(
        spark, store, "presentation", "dim_y", _base(spark, rows),
        "y_id", ["k"], "2024-01-01", n_buckets=N_BUCKETS,
    )
    tbl = store.path("presentation", "dim_y")
    before = _snap(tbl)
    scd2.scd2_merge_bucketed(
        spark, store, "presentation", "dim_y", _base(spark, rows),
        "y_id", ["k"], "2024-01-08", n_buckets=N_BUCKETS,
    )
    assert _snap(tbl) == before  # zero files touched anywhere


def test_bucketed_merge_null_business_keys(spark, tmp_path):
    """Null keys must bucket deterministically and merge null-safely —
    the same eqNullSafe contract as the plain merge."""
    store = TableStore(str(tmp_path / "wh"))

    def base(rows):
        df = spark.createDataFrame(rows, "k string, payload string")
        return with_fingerprint(df, ["k", "payload"])

    scd2.scd2_merge_bucketed(
        spark, store, "presentation", "dim_n", base([(None, "x"), ("A", "y")]),
        "n_id", ["k"], "2024-01-01", n_buckets=4,
    )
    scd2.scd2_merge_bucketed(
        spark, store, "presentation", "dim_n", base([(None, "x2"), ("A", "y")]),
        "n_id", ["k"], "2024-01-08", n_buckets=4,
    )
    dim = store.read(spark, "presentation", "dim_n").drop(scd2.BUCKET_COL)
    null_rows = dim.filter("k IS NULL").collect()
    assert len(null_rows) == 2  # expired + new version, never duplicated
    from manifold_spark.quality import duplicate_active_keys

    assert duplicate_active_keys(dim, ["k"]).count() == 0
