#!/usr/bin/env python
"""Capture .explain('formatted') for every headline query at sf0.1.

Usage: python plans/r15/capture_plans.py [before|after]
Writes plans/r15/<query>_<tag>.txt. Read-only w.r.t. the queries —
no noop execution here (plans only), so it is safe to run while other
work is queued; timings come from bench.py, never from this script.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from manifold_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "pricing_summary", "star_join_fact", "scd2_merge_full", "date_dimension",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "sim_topk_bruteforce", "sim_ann_ivf", "text_stats", "events_type_stats",
    "events_sessionize", "events_json_extract", "events_asof_join",
    "topn_per_group",
]
# extended rows worth a plan trail this round
# r15 touches: scd2_merge_full (single-pass MERGE), the RP-LSH/simhash
# single-parse fingerprints (plan-invariant by design), and the LM/curation
# stage-boundary flag (local default unchanged).
EXTENDED = [
    "dedup_simhash", "sim_rp_lsh_near_dup", "text_lm_score",
]


def main() -> None:
    spark = get_spark(
        app_name="r15-plan-capture",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from manifold_spark.queries import all_queries

    queries = all_queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in HEADLINE + EXTENDED:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars")


if __name__ == "__main__":
    main()
