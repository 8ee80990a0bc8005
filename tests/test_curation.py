"""End-to-end curation pipeline (manifold_spark/curation.py): the gated
operators composed clean → exact dedup → fuzzy dedup → quality → mixture
→ packing, with per-stage accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from manifold_spark.curation import curate_corpus
from manifold_spark.operators.dedup import release_shingle_caches


def test_curate_corpus_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # give the exact-dedup stage real work: duplicate every 10th doc
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    corpus = docs.unionByName(dups)

    packed, report = curate_corpus(corpus, pack_budget=256)
    rows = packed.collect()
    release_shingle_caches()

    # accounting: monotone non-increasing through the drop stages
    stages = ["input", "c4_clean", "exact_dedup", "fuzzy_dedup",
              "quality", "mixture", "packed"]
    assert list(report) == stages
    counts = [report[s] for s in stages]
    assert all(a >= b for a, b in zip(counts, counts[1:])), report
    assert report["packed"] == len(rows) > 0
    # the injected exact duplicates were all dropped
    assert report["exact_dedup"] <= report["c4_clean"] - dups.count() + 1
    # quality tertile cut really engages (head+middle of 3 buckets)
    assert report["quality"] < report["fuzzy_dedup"]

    # packing invariants: per (shard, bin) totals respect the budget up
    # to one straddling document; ids unique; every doc ≤ budget counted
    assert len({r["doc_id"] for r in rows}) == len(rows)
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r["shard"], r["bin_id"])].append(r["n_tokens"])
    for (shard, b), toks in bins.items():
        assert sum(toks) - max(toks) < 256, (shard, b, toks)


def test_curate_corpus_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a, ra = curate_corpus(docs, pack_budget=256)
    rows_a = sorted(map(tuple, a.collect()))
    release_shingle_caches()
    b, rb = curate_corpus(docs.repartition(7), pack_budget=256)
    rows_b = sorted(map(tuple, b.collect()))
    release_shingle_caches()
    assert ra == rb
    assert rows_a == rows_b
