"""Incremental MinHash index (r6): processing a corpus in micro-batches
through `minhash_index_upsert` must emit exactly the one-shot batch
operator's pair set (cap off), each pair exactly once, regardless of how
the corpus is split — the property that makes continuous-ingestion dedup
trustworthy at 100 TB."""


from __future__ import annotations

import pytest

# r15 slow tier (VERDICT r14 #2): multi-batch fingerprint-index replays —
# excluded from the default (driver-verify) run by pytest.ini's
# `-m "not slow"`; run with `-m slow` (round-close evidence in
# OPTIMIZATION_r15.md).
pytestmark = pytest.mark.slow

import pytest
from pyspark.sql import functions as F

from manifold_spark.operators import dedup
from manifold_spark.queries import _t

NO_CAP = 1 << 30


def _fold(docs, n_batches, threshold=0.3, max_bucket=NO_CAP):
    """Run the foreachBatch replay: batch i = doc_id % n_batches == i."""
    index = None
    emitted = []
    for i in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == i)
        pairs, index = dedup.minhash_index_upsert(
            batch, index, "text", "doc_id", threshold=threshold, max_bucket=max_bucket
        )
        emitted.append({(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()})
    return emitted, index


@pytest.mark.parametrize("n_batches", [1, 3])
def test_incremental_equals_batch(spark, sf_dir, n_batches):
    docs = _t(spark, sf_dir, "documents")
    batch_truth = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.3, max_bucket=NO_CAP
        ).collect()
    }
    emitted, _ = _fold(docs, n_batches)
    dedup.release_shingle_caches()

    union: dict = {}
    for batch_pairs in emitted:
        for pair, j in batch_pairs.items():
            assert pair not in union, f"pair {pair} emitted twice"
            union[pair] = j
    assert union == batch_truth
    assert len(batch_truth) > 0


def test_incremental_batches_actually_cross_pair(spark, sf_dir):
    """Sanity that the test corpus exercises the old⋈new path: at least
    one pair must span two different batches (id_a % 3 != id_b % 3)."""
    docs = _t(spark, sf_dir, "documents")
    emitted, index = _fold(docs, 3)
    dedup.release_shingle_caches()
    all_pairs = [p for batch in emitted for p in batch]
    assert any(a % 3 != b % 3 for a, b in all_pairs)
    # the index holds every doc exactly once
    n_docs = docs.count()
    assert index["sizes"].count() == index["sizes"].select("doc_id").distinct().count()


@pytest.mark.parametrize("n_batches", [1, 3])
def test_incremental_rp_lsh_equals_batch(spark, sf_dir, n_batches):
    """Embedding twin: RP-LSH incremental fold over id-disjoint splits
    emits exactly the one-shot operator's pair set, once each."""
    from manifold_spark.operators import DIM, similarity

    emb = _t(spark, sf_dir, "embeddings")
    batch_truth = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.rp_lsh_near_dup(
            emb, DIM, threshold=0.2, max_bucket=NO_CAP
        ).collect()
    }
    index = None
    union: dict = {}
    for i in range(n_batches):
        b = emb.filter(F.col("vec_id") % n_batches == i)
        pairs, index = similarity.rp_lsh_index_upsert(
            b, index, DIM, threshold=0.2, max_bucket=NO_CAP
        )
        for r in pairs.collect():
            pair = (r["id_a"], r["id_b"])
            assert pair not in union, f"pair {pair} emitted twice"
            union[pair] = r["cosine"]
    assert union == batch_truth
    assert len(batch_truth) > 0


@pytest.mark.parametrize("n_batches", [1, 3])
def test_incremental_span_equals_batch(spark, sf_dir, n_batches):
    """r7: the incremental span index must converge to the one-shot
    `span_dedup` stats for EVERY document under a worst-case
    id-interleaved split — the last emission per doc supersedes earlier
    ones (span dedup is retroactive: a later batch can make an earlier
    doc's windows duplicated), and never-emitted docs are exactly the
    docs with zero duplicated windows."""
    docs = _t(spark, sf_dir, "documents")
    truth = {
        r["doc_id"]: (r["n_tokens"], r["n_windows"], r["n_dup_windows"], r["dup_tokens"])
        for r in dedup.span_dedup(docs, "text", "doc_id", n=12).collect()
    }
    dedup.release_shingle_caches()

    index = None
    last: dict = {}
    last_batch: dict = {}
    for i in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == i)
        stats, index = dedup.span_index_upsert(batch, index, "text", "doc_id", n=12)
        for r in stats.collect():
            last[r["doc_id"]] = (
                r["n_tokens"], r["n_windows"], r["n_dup_windows"], r["dup_tokens"]
            )
            last_batch[r["doc_id"]] = i
    dedup.release_shingle_caches()

    assert len(last) > 0
    for doc_id, row in last.items():
        assert row == truth[doc_id], (doc_id, row, truth[doc_id])
    for doc_id, row in truth.items():
        if doc_id not in last:
            assert row[2] == 0, (doc_id, row)  # never emitted ⇒ no dup windows
    if n_batches > 1:
        # retroactivity exercised: at least one doc's FINAL emission came
        # from a later batch than the doc itself arrived in (an earlier
        # doc's windows became duplicated by a later batch)
        assert any(
            b > doc_id % n_batches for doc_id, b in last_batch.items()
        ), "split never exercised the retroactive re-emission path"
