"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``manifold_spark`` package; this module is
the thin registry adapter. ``tests/test_queries_oracle.py`` mirrors the
driver's gate locally at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-schema fact
    rollup (broadcast dim joins + decimal-exact revenue aggregation)."""
    from manifold_spark.queries import all_queries

    return all_queries()["star_join_fact"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-data-pipeline extensions). Each callable takes (spark, sf_dir)."""
    from manifold_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Every registered key has a full
    oracle — including the banded-LSH pipelines, the unrolled two-round
    Lloyd k-means (full-corpus AND hash-sampled), random-hyperplane LSH
    with literal-embedded hyperplanes, recursive-CTE connected
    components, (r6) the adversarial-skew corpora with the caps
    ENGAGED, the deep-path-graph star-contraction gate, the
    foreachBatch micro-batch dedup, and (r7) the PQ / IVF-PQ ANN
    pipelines (per-subspace Lloyd training, codeword argmin encode,
    ADC lookup tables, exact re-rank, all unrolled in SQL) plus
    span-level ExactSubstr dedup, (r8) Gopher repetition signals
    and corpus-trained char-trigram LM scoring (integer-quantized log
    terms, order-independent sums), and (r9) the END-TO-END curation
    pipeline (the per-stage oracle builders chained through MATERIALIZED
    stage CTEs, emitting packed survivors + per-stage audit counts) plus
    DSIR importance weights and BPE document encoding riding their
    parent gates, and (r12) the two persistent STATE STORES —
    `curation_store_pipeline` (4 triggers through curation_sink +
    CurationState, oracle = a pure-SQL mirror of the incremental
    semantics over the batch union) and `ann_store_cdc` (AnnIndexStore
    CDC lifecycle incl. a pre-compaction delete→re-add upsert, oracle =
    exact IVF over the final live corpus) — so the driver's strongest
    (rows+schema+hash) check applies to 100% of the registry."""
    from manifold_spark.queries import all_oracles

    return all_oracles()
