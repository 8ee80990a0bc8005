"""Physical-layout proofs: bucketed joins must be exchange-free, partition
filters must prune, salted joins must match unsalted results."""

import pytest
from pyspark.sql import functions as F

from manifold_spark.plans.layout import salted_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key sort-merge-join with zero
    shuffle exchange (auto-broadcast disabled so the small side can't
    dodge the question — at real scale neither side broadcasts)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        expect = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partition_pruning(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune at planning time."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    dest = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("order_year").parquet(dest)

    pruned = spark.read.parquet(dest).filter(F.col("order_year") == 1995)
    plan = _plan(pruned)
    assert "PartitionFilters: [" in plan and "order_year" in plan.split("PartitionFilters:")[1][:200]
    assert pruned.count() == orders.filter("order_year = 1995").count()


def test_salted_join_matches_plain(spark, sf_dir):
    """Salting must change the plan, not the result."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    plain = lineitem.join(orders, "o_orderkey")
    salted = salted_join(lineitem, orders, "o_orderkey", n_salt=4)
    assert salted.count() == plain.count()
    ps = sorted(map(repr, plain.collect()))
    ss = sorted(map(repr, salted.select(*plain.columns).collect()))
    assert ps == ss
    # r7: deterministic salt from a unique column — same result set, and
    # the salt assignment is now a pure function of the row (reproducible
    # physical layout, the r6-noted improvement over monotonically_
    # increasing_id's run-varying assignment).
    det = salted_join(
        lineitem.withColumn("_rid", F.monotonically_increasing_id()),
        orders, "o_orderkey", n_salt=4, salt_from="_rid",
    ).drop("_rid")
    ds = sorted(map(repr, det.select(*plain.columns).collect()))
    assert ds == ps


def test_range_clustered_write_skips_files(spark, sf_dir, tmp_path):
    """Files must cover disjoint key ranges (selective min/max stats), and
    a point predicate must read back correctly."""
    import pyarrow.parquet as pq
    import glob

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_clustered")
    from manifold_spark.plans.layout import write_range_clustered

    write_range_clustered(orders, dest, ["o_orderkey"], num_files=8)

    ranges = []
    for f in sorted(glob.glob(f"{dest}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = next(i for i in range(md.num_columns)
                   if md.row_group(0).column(i).path_in_schema == "o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # disjoint, ordered ranges: every file's max < next file's min
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2

    back = spark.read.parquet(dest)
    key = orders.select("o_orderkey").orderBy("o_orderkey").limit(1).collect()[0][0]
    assert back.filter(F.col("o_orderkey") == key).count() == orders.filter(F.col("o_orderkey") == key).count()
