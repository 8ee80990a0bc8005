"""Incremental MinHash index (r6): processing a corpus in micro-batches
through `minhash_index_upsert` must emit exactly the one-shot batch
operator's pair set (cap off), each pair exactly once, regardless of how
the corpus is split — the property that makes continuous-ingestion dedup
trustworthy at 100 TB."""

from __future__ import annotations

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
