#!/usr/bin/env python
"""Scaling tier (r15, VERDICT r14 #5): one bench row per operator family
at a scale where parallelism is MEASURABLE — the sf0.1 bench is
fixed-cost-bound (every r14 8v32 core ratio ≈ 1), so the §2 shuffle work
could only be validated by plan shape. This tier materializes a
multi-file, key-shifted replication of the sf0.1 tables (~sf5-equivalent
fact tables, 100x documents/embeddings) and times one COLD run of the
scan-heavy family representatives against it.

Usage:
    SPARK_GRAFT_CPUS=32 python plans/r15/scaling_tier.py
    SPARK_GRAFT_CPUS=8  python plans/r15/scaling_tier.py

Prints ONE JSON line per invocation (same contract as bench.py:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}).
The committed artifact BENCH_SCALING_r15.json carries both core counts
plus the 8v32 ratios. Data generation is deterministic (key-shifted
replicas, the bench scale10 construction) and cached under
$SPARK_GRAFT_SCALE_DATA (default /root/scale_data) — delete the dir to
regenerate. Generation happens OUTSIDE the timed region; every timed
query computes from the materialized parquet (32 files per big table, so
`ensure_parallelism` no-ops and the scan parallelism is native).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from manifold_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DATA = os.environ.get("SPARK_GRAFT_SCALE_DATA", "/root/scale_data")

#: replication factors: facts at 50x (sf5-equivalent lineitem ~30M rows),
#: text/sim at 100x (50k marker-fused documents / embeddings) — big enough
#: that 32-way scan+compute parallelism dominates fixed costs, small
#: enough to generate in minutes.
FACT_FACTOR = 50
DOC_FACTOR = 100

#: family representative -> why it is the row
QUERIES = [
    "pricing_summary",      # scan + partial agg (lineitem 50x)
    "star_join_fact",       # broadcast star join (fact 50x, dims base)
    "scd2_merge_full",      # SCD2 merge (customer 50x: 750k-key dim)
    "dedup_exact",          # hash agg over fused docs (100x)
    "dedup_minhash_lsh",    # LSH candidate formation + verify (100x)
    "text_stats",           # tokenize-heavy projection (100x)
    "events_type_stats",    # sort-agg percentiles (events 50x)
    "events_sessionize",    # session windows (events 50x, users shifted)
    "sim_topk_bruteforce",  # dot-product scan (embeddings 100x)
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DATA, exist_ok=True)
    done = os.path.join(DATA, "_GENERATED")
    if os.path.exists(done):
        return
    t0 = time.perf_counter()
    reps_f = spark.range(FACT_FACTOR).select(F.col("id").alias("rep"))
    reps_d = spark.range(DOC_FACTOR).select(F.col("id").alias("rep"))

    def rep_write(df, name, n_files=32):
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{DATA}/{name}.parquet"
        )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rep_write(
        li.crossJoin(F.broadcast(reps_f)).select(
            (F.col("l_orderkey") * FACT_FACTOR + F.col("rep")).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        ),
        "lineitem",
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rep_write(
        od.crossJoin(F.broadcast(reps_f)).select(
            (F.col("o_orderkey") * FACT_FACTOR + F.col("rep")).alias("o_orderkey"),
            *[c for c in od.columns if c != "o_orderkey"],
        ),
        "orders",
    )
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rep_write(
        cu.crossJoin(F.broadcast(reps_f)).select(
            (F.col("c_custkey") * FACT_FACTOR + F.col("rep")).alias("c_custkey"),
            *[c for c in cu.columns if c != "c_custkey"],
        ),
        "customer",
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rep_write(
        ev.crossJoin(F.broadcast(reps_f)).select(
            (F.col("event_id") * FACT_FACTOR + F.col("rep")).alias("event_id"),
            "ts",
            # user shift keeps per-user session structure identical per
            # replica: 50x users, same sessions each
            F.concat(F.col("user_id"), F.lit("#"), F.col("rep").cast("string")).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
        "events",
    )
    # marker-fused document replicas (the bench scale10 construction:
    # `w` -> `wxrN` fuses the replica id into every token so shingle sets
    # are replica-isomorphic with zero cross-replica overlap)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fused = F.regexp_replace(
        F.col("text"), r"(\S+)", F.concat(F.lit(r"$1xr"), F.col("rep").cast("string"))
    )
    rep_write(
        docs.crossJoin(F.broadcast(reps_d)).select(
            (F.col("doc_id") * DOC_FACTOR + F.col("rep")).alias("doc_id"),
            fused.alias("text"),
            "lang",
            "source",
            F.length(fused).alias("n_chars"),
        ),
        "documents",
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rep_write(
        emb.crossJoin(F.broadcast(reps_d)).select(
            (F.col("vec_id") * DOC_FACTOR + F.col("rep")).alias("vec_id"),
            "embedding",
            "label",
        ),
        "embeddings",
    )
    for t in ("region", "nation", "part", "supplier"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{DATA}/{t}.parquet")
    with open(done, "w") as f:
        f.write(f"generated in {time.perf_counter() - t0:.1f}s\n")


def main() -> None:
    spark = get_spark(
        app_name=f"manifold-spark-scaling-c{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            # guide §6: the default 128 MB maxPartitionBytes PACKS this
            # tier's 32 x 2-16 MB files into 1-5 splits, serializing the
            # scans at ANY core count (measured: text_stats 118 s at 32
            # cores ~= 104 s at 8 — both one task). A scan-parallelism
            # floor of 2 x cores makes split count follow the core count,
            # which is the quantity this tier exists to measure.
            "spark.sql.files.minPartitionNum": str(2 * CPUS),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)

    from manifold_spark.operators.dedup import operator_cache_scope
    from manifold_spark.queries import all_queries

    queries = all_queries()
    # warmup on the BASE sf dir so codegen/JIT is out of the timed run
    # (same protocol as bench.py); each timed query then runs ONCE, cold.
    for name in QUERIES:
        try:
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    timings: dict[str, float] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        with operator_cache_scope():
            t0 = time.perf_counter()
            queries[name](spark, DATA).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "metric": "scaling_tier_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 0.1,
                "cpus": CPUS,
                "fact_factor": FACT_FACTOR,
                "doc_factor": DOC_FACTOR,
                "data_dir": DATA,
            }
        )
    )


if __name__ == "__main__":
    main()
