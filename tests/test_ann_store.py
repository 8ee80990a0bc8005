"""AnnIndexStore pins: the disk-backed IVF(-PQ) index must be EXACTLY
the in-memory operator over the appended corpus (same quantizer ⇒ same
cells ⇒ same candidates ⇒ bit-identical cosines), its probe reads must
prune to the probed cells, and its versioning (commit markers /
compaction / GC / retry) must follow the CurationState discipline."""


from __future__ import annotations

import pytest

# r15 slow tier (VERDICT r14 #2): disk-backed ANN index store builds/appends/probes —
# excluded from the default (driver-verify) run by pytest.ini's
# `-m "not slow"`; run with `-m slow` (round-close evidence in
# OPTIMIZATION_r15.md).
pytestmark = pytest.mark.slow

import os

import pytest
from pyspark.sql import functions as F

from manifold_spark.operators.ann_store import AnnIndexStore
from manifold_spark.operators.pq import topk_ivf_pq
from manifold_spark.operators.similarity import topk_ivf

DIM = 64
N_CENTROIDS = 16
K = 5
NPROBE = 4
N_QUERIES = 8


@pytest.fixture(autouse=True)
def _release_operator_caches():
    """The in-memory comparison operators persist through the shared
    tracked-cache registry; release after EVERY test — leaked cached
    plans make every later persist() in the shared session canonicalize
    against them (this module once pushed a later suite's big-plan
    analysis into driver-heap OOM)."""
    yield
    from manifold_spark.operators.dedup import release_shingle_caches

    release_shingle_caches()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES)


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in df.collect()
    )


def test_store_topk_matches_in_memory(spark, emb, queries, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "ann")).initialize(
        emb, n_centroids=N_CENTROIDS
    )
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, emb, DIM, k=K, n_centroids=N_CENTROIDS, nprobe=NPROBE)
    )
    assert got == want
    assert len(got) == N_QUERIES * K


def test_append_split_invariance(spark, emb, queries, tmp_path):
    """Appending the corpus in 3 id-ordered batches ≡ one shot: encoding
    under a FROZEN quantizer is a stateless per-vector projection, so
    the composed index — and every search over it — is identical."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)

    one = AnnIndexStore(spark, str(tmp_path / "one")).initialize(
        emb, centroids=cents
    )
    split = AnnIndexStore(spark, str(tmp_path / "split"))
    b0 = emb.filter(F.col("vec_id") < 170)
    split.initialize(b0, centroids=cents)
    split.append(emb.filter((F.col("vec_id") >= 170) & (F.col("vec_id") < 340)))
    split.append(emb.filter(F.col("vec_id") >= 340))

    got = _rows(split.topk(queries, k=K, nprobe=NPROBE))
    assert got == _rows(one.topk(queries, k=K, nprobe=NPROBE))

    # State content equality too, not just search results.
    def idx_rows(store):
        return sorted(
            (r["vec_id"], r["centroid_id"])
            for r in store.read_cells("vecs").select("vec_id", "centroid_id").collect()
        )

    assert idx_rows(split) == idx_rows(one)


def test_store_topk_pq_matches_in_memory(spark, emb, queries, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "pq")).initialize(
        emb, n_centroids=N_CENTROIDS, use_pq=True, residual=True
    )
    got = _rows(store.topk_pq(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf_pq(
            queries, emb, DIM, k=K, nprobe=NPROBE,
            codebooks=store.meta["codebooks"], centroids=store.centroids_df(),
            residual=True,
        )
    )
    assert got == want
    assert len(got) == N_QUERIES * K


def test_probe_reads_only_probed_cells(spark, emb, queries, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "pr")).initialize(
        emb, n_centroids=N_CENTROIDS
    )
    store.collect_read_stats = True
    # nprobe=1 with 8 queries bounds the probe set at 8 of 16 cells, so
    # the "strictly less than the whole state" assertions cannot flake.
    store.topk(queries, k=K, nprobe=1)
    cids = store._cids_for_vecs(
        [[float(v) for v in r["embedding"]] for r in queries.collect()], 1
    )
    # one file per cell per live version (one version here)
    assert 0 < store.read_stats["vecs_files"] <= len(cids)
    assert len(cids) <= N_QUERIES < N_CENTROIDS  # the probe really pruned
    totals = store.state_totals()
    assert store.read_stats["vecs_bytes"] < totals["state_total_bytes"]


def test_compaction_gc_retry_and_empty_batch(spark, emb, queries, tmp_path):
    """Sequenced appends with compact_every=2: compaction folds into
    s{n}, a LATER append GCs superseded dirs (deferred one step), the
    live read glob stays bounded, an EMPTY batch inside a compaction
    window is skipped per-part (the ADVICE-r10 empty-delta crash
    class), and a retried append converges to the same search results."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "c"), compact_every=2)
    slices = [
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 80))
        for lo in range(0, 480, 80)
    ]
    empty = emb.filter(F.lit(False))

    # v0(init) v1 v2 → compacts s2 | v3(EMPTY) v4 — the empty delta sits
    # inside the NEXT compaction window (s5 below folds across it).
    store.initialize(slices[0], centroids=cents)
    store.append(slices[1])  # v1
    store.append(slices[2])  # v2 → s2
    snaps, _deltas = store._scan()
    assert snaps == [2], "compaction never engaged"
    store.append(empty)  # v3 — empty delta
    store.append(slices[3])  # v4
    assert len(store._live_names()) <= store.compact_every + 1

    before = _rows(store.topk(queries, k=K, nprobe=NPROBE))

    # retry: re-append the last batch with the SAME id (redelivery)
    store.append(slices[3], batch_id=4)
    after = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    assert after == before

    # v5 folds {s2, v3(empty), v4, v5} into s5 (empty part SKIPPED, not
    # crashed). GC has a one-append GRACE (VERDICT r11 #6): at v6's
    # append nothing is committed past s5 yet, so the superseded dirs
    # survive one more interval; v7's append (v6 now committed > 5)
    # removes them — disk holds at most one superseded cycle extra.
    store.append(slices[4])  # v5 → s5
    assert store._scan()[0][-1] == 5
    store.append(slices[5])  # v6 — grace: superseded dirs retained
    assert os.path.isdir(os.path.join(store.state_dir, "s2")), (
        "grace period skipped — a pre-compaction search consumed now "
        "would hit FileNotFound"
    )
    store.append(emb.limit(0), batch_id=7)  # v7 — GC of s2/v3/v4/v5
    base = 5
    for name in os.listdir(store.state_dir):
        if name.startswith("v") and name[1:].isdigit():
            assert int(name[1:]) > base or not os.path.exists(
                os.path.join(store.state_dir, name, "_COMMIT")
            ), f"superseded {name} survived GC"
    assert not os.path.isdir(os.path.join(store.state_dir, "s2"))

    # and the fully-appended store still equals the in-memory operator
    corpus = emb.filter(F.col("vec_id") < 480)
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, corpus, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got == want


def test_ann_stream_restart_resumes(spark, emb, queries, tmp_path):
    """`start_ann_index_stream` on a checkpoint, killed mid-corpus and
    restarted as a NEW query instance: batch ids resume (drained files
    are not reprocessed), every stream version lands at its
    deterministic `batch_id + base_version` slot, and the final index
    searches exactly like the one-shot in-memory operator over the full
    corpus."""
    from manifold_spark.operators.ann_store import start_ann_index_stream

    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    state_dir = str(tmp_path / "astream-state")
    ckpt = str(tmp_path / "astream-ckpt")
    src = str(tmp_path / "astream-src")

    # seed: first 100 vectors initialize (and freeze) the quantizer → v0
    seed = emb.filter(F.col("vec_id") < 100)
    AnnIndexStore(spark, state_dir).initialize(seed, centroids=cents)

    bounds = [(100, 200), (200, 300), (300, 400), (400, 1 << 60)]

    def write_slice(i, lo, hi):
        part = f"{src}/b{i}"
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(part)
        for name in os.listdir(part):
            os.utime(os.path.join(part, name), (4_000_000 + i * 100,) * 2)

    def run_available():
        stream = (
            spark.readStream.schema(seed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = start_ann_index_stream(
            stream, state_dir, ckpt, available_now=True
        )
        q.awaitTermination(600)

    # first instance drains two slices → v1, v2
    for i, (lo, hi) in enumerate(bounds[:2]):
        write_slice(i, lo, hi)
    run_available()
    store = AnnIndexStore(spark, state_dir)
    snaps, deltas = store._scan()
    assert set(deltas) | {s for s in snaps} >= {0, 1, 2}

    # rest arrives; a NEW query instance resumes from the checkpoint
    for i, (lo, hi) in enumerate(bounds[2:], start=2):
        write_slice(i, lo, hi)
    run_available()

    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, emb, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got == want


def test_initialize_refuses_live_state(spark, emb, queries, tmp_path):
    """Re-initializing over committed versions must fail loudly (a new
    quantizer invalidates every existing cell, and the version horizon
    would hide the new v0 behind an old snapshot); overwrite=True wipes
    and rebuilds."""
    path = str(tmp_path / "re")
    store = AnnIndexStore(spark, path).initialize(
        emb.filter(F.col("vec_id") < 200), n_centroids=N_CENTROIDS
    )
    with pytest.raises(ValueError, match="already holds committed"):
        store.initialize(emb, n_centroids=N_CENTROIDS)
    store.initialize(emb, n_centroids=N_CENTROIDS, overwrite=True)
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, emb, DIM, k=K, n_centroids=N_CENTROIDS, nprobe=NPROBE)
    )
    assert got == want


def test_empty_query_batch_returns_empty_frame(spark, emb, tmp_path):
    """An empty probe returns an empty frame in the result contract —
    matching the in-memory operator — not a misleading 'empty index'
    error; a store with NO committed versions still raises."""
    store = AnnIndexStore(spark, str(tmp_path / "eq")).initialize(
        emb, n_centroids=N_CENTROIDS
    )
    none = emb.filter(F.lit(False))
    res = store.topk(none, k=K, nprobe=NPROBE)
    assert res.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert res.count() == 0

    virgin = AnnIndexStore(spark, str(tmp_path / "virgin"))
    with pytest.raises(ValueError, match="empty index"):
        virgin.topk(none, k=K, nprobe=NPROBE)


def test_delete_tombstones_and_compaction(spark, emb, queries, tmp_path):
    """Merge-on-read deletes: a tombstoned id disappears from search
    results immediately (both IVF and PQ paths ≡ the in-memory operator
    over the corpus MINUS the deleted ids), the next compaction drops
    the rows PHYSICALLY and absorbs the tombstones, a retried delete is
    idempotent, and re-deleting an absent id is a no-op."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "del"), compact_every=2)
    store.initialize(
        emb, centroids=cents, use_pq=True, residual=True
    )

    # delete the ids that WOULD be top-1 neighbors for two queries
    base = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    victims = sorted({nb for (q, nb, r, c) in base if r == 1})[:3]
    del_id = store.delete(victims)

    survivors = emb.join(
        spark.createDataFrame([(v,) for v in victims], "vec_id long"),
        "vec_id",
        "left_anti",
    )
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, survivors, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got == want
    for v in victims:
        assert all(nb != v for (_q, nb, _r, _c) in got)

    # PQ path excludes them too
    got_pq = _rows(store.topk_pq(queries, k=K, nprobe=NPROBE))
    assert all(nb not in set(victims) for (_q, nb, _r, _c) in got_pq)

    # retried delete (redelivery) converges
    store.delete(victims, batch_id=del_id)
    assert _rows(store.topk(queries, k=K, nprobe=NPROBE)) == got

    # drive a compaction past the tombstone version; rows must be gone
    # PHYSICALLY and the tombstones absorbed (no tombs dir in the live
    # horizon once the fold lands).
    store.append(emb.limit(0), batch_id=del_id + 1)
    store.append(emb.limit(0), batch_id=del_id + 2)
    snaps, _ = store._scan()
    assert snaps and snaps[-1] >= del_id, "compaction never crossed the delete"
    state_ids = {
        r["vec_id"] for r in store.read_cells("vecs").select("vec_id").collect()
    }
    assert not (state_ids & set(victims)), "tombstoned rows survived the fold"
    assert store._tombstones() is None, "tombstones outlived the fold"
    # search unchanged after physical removal
    assert _rows(store.topk(queries, k=K, nprobe=NPROBE)) == got

    # deleting an id that no longer exists is a harmless no-op
    store.delete([victims[0]])
    assert _rows(store.topk(queries, k=K, nprobe=NPROBE)) == got


def test_cdc_sink_adds_and_deletes_atomically(spark, emb, queries, tmp_path):
    """`ann_index_sink(op_col=...)` → `apply_cdc`: a trigger's adds and
    takedowns commit as ONE version. Streamed through the real
    availableNow harness: trigger 1 adds + deletes two earlier ids in
    the same batch; the final index equals the in-memory operator over
    exactly (seed ∪ adds) − deletes, and a retried apply_cdc converges."""
    from manifold_spark.operators.ann_store import start_ann_index_stream

    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    state_dir = str(tmp_path / "cdc-state")
    src = str(tmp_path / "cdc-src")

    seed = emb.filter(F.col("vec_id") < 200)
    AnnIndexStore(spark, state_dir).initialize(seed, centroids=cents)

    victims = [100, 150]
    with_op = lambda df, op: df.withColumn("op", F.lit(op))  # noqa: E731
    # trigger 0's adds carry op=NULL — the optional-column CDC shape
    # (only takedowns populate op); NULL must read as add, not vanish.
    b0 = with_op(
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)),
        None,
    ).withColumn("op", F.col("op").cast("string"))
    b1 = with_op(
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)), "add"
    ).unionByName(
        with_op(emb.filter(F.col("vec_id").isin(victims)), "delete").select(
            "vec_id", "embedding", "op"
        )
    )
    for i, b in enumerate([b0, b1]):
        part = f"{src}/b{i}"
        b.coalesce(1).write.parquet(part)
        for name in os.listdir(part):
            os.utime(os.path.join(part, name), (4_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = start_ann_index_stream(
        stream, state_dir, str(tmp_path / "cdc-ckpt"),
        available_now=True, op_col="op",
    )
    q.awaitTermination(600)

    store = AnnIndexStore(spark, state_dir)
    expected_corpus = emb.filter(
        (F.col("vec_id") < 400) & (~F.col("vec_id").isin(victims))
    )
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(
            queries, expected_corpus, DIM, k=K, nprobe=NPROBE, centroids=cents
        )
    )
    assert got == want

    # retried CDC trigger (redelivery of v2 = stream batch 1) converges
    store.apply_cdc(b1, batch_id=2)
    assert _rows(store.topk(queries, k=K, nprobe=NPROBE)) == got


def test_cdc_upsert_readd_before_compaction(spark, emb, queries, tmp_path):
    """Sequence-numbered tombstones (VERDICT r11 #2): delete id X in
    trigger N, re-add X with a NEW vector in trigger N+1 — X must be
    searchable with the new vector IMMEDIATELY (no compaction between
    the delete and the probe), on BOTH the IVF and the PQ path. Under
    the old whole-horizon tombstones this exact CDC upsert shape
    silently hid the re-added vector until the next compaction."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "ups"), compact_every=100)
    store.initialize(
        emb.filter(F.col("vec_id") < 300), centroids=cents,
        use_pq=True, residual=True,
    )

    x = 42
    new_vec = emb.filter(F.col("vec_id") == 450).select(
        F.lit(x).cast("long").alias("vec_id"), "embedding"
    )
    store.apply_cdc(
        emb.filter(F.col("vec_id") == x).withColumn("op", F.lit("delete"))
    )  # v1: tombstone X
    store.apply_cdc(
        new_vec.withColumn("op", F.lit("add").cast("string"))
    )  # v2: re-add X, new vector

    assert store._scan()[0] == [], "compaction ran — pin would be vacuous"
    assert store._tombstones() is not None, "tombstone gone before compaction"

    expected = emb.filter(
        (F.col("vec_id") < 300) & (F.col("vec_id") != x)
    ).unionByName(new_vec)
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, expected, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got == want
    got_pq = _rows(store.topk_pq(queries, k=K, nprobe=NPROBE))
    want_pq = _rows(
        topk_ivf_pq(
            queries, expected, DIM, k=K, nprobe=NPROBE,
            codebooks=store.meta["codebooks"], centroids=cents, residual=True,
        )
    )
    assert got_pq == want_pq

    # in-place upsert INSIDE one batch: delete + add of the same id
    # commit at the same version; the tombstone shadows only strictly
    # earlier rows, so the add wins.
    newer = emb.filter(F.col("vec_id") == 451).select(
        F.lit(x).cast("long").alias("vec_id"), "embedding"
    )
    store.apply_cdc(
        newer.withColumn("op", F.lit("add").cast("string")).unionByName(
            newer.withColumn("op", F.lit("delete"))
        )
    )  # v3
    expected2 = emb.filter(
        (F.col("vec_id") < 300) & (F.col("vec_id") != x)
    ).unionByName(newer)
    got2 = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want2 = _rows(
        topk_ivf(queries, expected2, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got2 == want2

    # and a compaction AFTER the upserts folds to the same results
    store.compact_every = 2
    store.append(emb.limit(0))  # v4 → snapshot
    assert store._scan()[0], "compaction never engaged"
    assert _rows(store.topk(queries, k=K, nprobe=NPROBE)) == got2


def test_search_survives_next_append_gc_grace(spark, emb, queries, tmp_path):
    """GC grace (VERDICT r11 #6): a search DataFrame issued BEFORE a
    compacting append can still be consumed after the NEXT append —
    previously that append's GC deleted the superseded leaf dirs the
    lazy plan held, giving FileNotFound mid-scan. Disk stays bounded:
    one more append later the superseded cycle is gone."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "gr"), compact_every=2)
    store.initialize(emb.filter(F.col("vec_id") < 160), centroids=cents)
    store.append(emb.filter((F.col("vec_id") >= 160) & (F.col("vec_id") < 320)))

    pending = store.topk(queries, k=K, nprobe=NPROBE)  # reads v0, v1

    store.append(
        emb.filter((F.col("vec_id") >= 320) & (F.col("vec_id") < 480))
    )  # v2 → s2 compaction
    store.append(emb.limit(0), batch_id=3)  # v3 — grace keeps v0/v1/v2

    got = _rows(pending)  # consume AFTER append+compaction+next append
    want = _rows(
        topk_ivf(
            queries, emb.filter(F.col("vec_id") < 320), DIM,
            k=K, nprobe=NPROBE, centroids=cents,
        )
    )
    assert got == want

    store.append(emb.limit(0), batch_id=4)  # v4 — GC fires (v3 > s2)
    assert not os.path.isdir(os.path.join(store.state_dir, "v0"))
    assert not os.path.isdir(os.path.join(store.state_dir, "v1"))
    fresh = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want_all = _rows(
        topk_ivf(
            queries, emb.filter(F.col("vec_id") < 480), DIM,
            k=K, nprobe=NPROBE, centroids=cents,
        )
    )
    assert fresh == want_all


def test_crashed_partial_dirs_swept(spark, emb, tmp_path):
    """A crashed append leaves an uncommitted partial dir. Below the
    committed horizon it can never be retried — GC sweeps it (ADVICE
    r11: previously it leaked disk forever). Above the horizon it is
    left for the caller's retry."""
    store = AnnIndexStore(spark, str(tmp_path / "cr"))
    store.initialize(emb.filter(F.col("vec_id") < 100), n_centroids=N_CENTROIDS)
    store.append(
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200))
    )  # v1

    # fake crash leftovers: s1 (≤ horizon) and v9 (> horizon), no _COMMIT
    for name in ("s1", "v9"):
        os.makedirs(os.path.join(store.state_dir, name, "vecs"))
        with open(
            os.path.join(store.state_dir, name, "vecs", "junk.parquet"), "w"
        ) as f:
            f.write("not parquet")

    store.append(
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300))
    )  # v2 — sweep runs at append start
    assert not os.path.isdir(os.path.join(store.state_dir, "s1")), (
        "crashed dir below the horizon leaked"
    )
    assert os.path.isdir(os.path.join(store.state_dir, "v9")), (
        "pending-retry dir above the horizon must survive"
    )


def test_sink_ownership_blocks_auto_batch_ids(spark, emb, tmp_path):
    """While a streaming sink owns the store (_SINK marker), out-of-band
    writes with AUTO-assigned batch ids are refused — they would land on
    the next trigger's deterministic slot and be silently overwritten
    (ADVICE r11). release_sink() unblocks once the stream is stopped.
    (There is deliberately no "spare high id range" escape hatch:
    version ids are the tombstone sequence numbers and the horizon
    order — see `_next_batch_id`.)"""
    from manifold_spark.operators.ann_store import ann_index_sink

    state_dir = str(tmp_path / "own")
    store = AnnIndexStore(spark, state_dir)
    store.initialize(emb.filter(F.col("vec_id") < 100), n_centroids=N_CENTROIDS)

    ann_index_sink(state_dir)  # creating the sink marks ownership
    with pytest.raises(ValueError, match="sink owns"):
        store.delete([3])
    with pytest.raises(ValueError, match="sink owns"):
        store.append(emb.filter(F.col("vec_id") == 100))
    store.release_sink()
    store.delete([4])  # auto id fine again


def test_distributed_probe_matches_driver_and_in_memory(spark, emb, tmp_path):
    """The distributed probe path (VERDICT r11 #3): a corpus-scale query
    frame searched store-backed WITHOUT collecting the queries — probe
    cells derive as a column, the distinct cell set drives the pruned
    read, scoring shuffle-joins on the cell id. Results are identical to
    (a) the in-memory operator over the same corpus and (b) the driver
    probe path on a small batch."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "dist")).initialize(
        emb, centroids=cents
    )

    got = _rows(store.topk(emb, k=K, nprobe=NPROBE, distributed=True))
    want = _rows(
        topk_ivf(emb, emb, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got == want

    small = emb.filter(F.col("vec_id") < N_QUERIES)
    drv = _rows(store.topk(small, k=K, nprobe=NPROBE, distributed=False))
    dst = _rows(store.topk(small, k=K, nprobe=NPROBE, distributed=True))
    auto = _rows(store.topk(small, k=K, nprobe=NPROBE))
    assert drv == dst == auto


def test_gc_grace_holds_with_preexisting_high_id_delta(spark, emb, queries, tmp_path):
    """GC fence (ADVICE r12): an out-of-band delta with an id ABOVE the
    snapshot committed BEFORE the compaction must not release the GC
    early — the old `top > base` inference held immediately (top=50 >
    s2), so the very next append deleted the superseded dirs and
    re-exposed the FileNotFound-on-pending-search window the r11 grace
    closed. The `_FENCE` recorded at compaction time (max committed id
    = 50) releases GC only once something strictly later commits."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "fence"), compact_every=2)
    store.initialize(emb.filter(F.col("vec_id") < 160), centroids=cents)  # v0
    store.append(
        emb.filter((F.col("vec_id") >= 160) & (F.col("vec_id") < 320)),
        batch_id=50,
    )  # out-of-band high id, BEFORE any compaction
    store.append(
        emb.filter((F.col("vec_id") >= 320) & (F.col("vec_id") < 400)),
        batch_id=1,
    )

    pending = store.topk(queries, k=K, nprobe=NPROBE)  # reads v0, v1, v50

    store.append(
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 480)),
        batch_id=2,
    )  # folds v0..v2 → s2; fence records 50

    store.append(emb.limit(0), batch_id=51)  # top=50 ≤ fence=50: NO GC yet
    assert os.path.isdir(os.path.join(store.state_dir, "v0")), (
        "grace defeated: superseded dir GC'd while a pre-compaction "
        "search could still hold its paths"
    )
    got = _rows(pending)  # consume after append+compaction+next append
    want = _rows(
        topk_ivf(
            queries, emb.filter(F.col("vec_id") < 400), DIM,
            k=K, nprobe=NPROBE, centroids=cents,
        )
    )
    assert got == want

    store.append(emb.limit(0), batch_id=52)  # top=51 > fence=50 → GC fires
    for name in ("v0", "v1", "v2"):
        assert not os.path.isdir(os.path.join(store.state_dir, name))


def test_stream_built_store_serves_distributed_probe(spark, emb, tmp_path):
    """Composition pin (VERDICT r12 #6): the CDC streaming sink and the
    distributed probe, TOGETHER — a store ingested through
    `start_ann_index_stream(op_col=...)` with a mid-stream restart must
    serve a corpus-scale `topk(distributed=True)` identical to a
    batch-built store over the same live set (and to the in-memory
    operator)."""
    from manifold_spark.operators.ann_store import start_ann_index_stream

    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    state_dir = str(tmp_path / "sd-state")
    src = str(tmp_path / "sd-src")
    victims = [30, 250]

    seed = emb.filter(F.col("vec_id") < 200)
    AnnIndexStore(spark, state_dir).initialize(seed, centroids=cents)

    with_op = lambda df, op: df.withColumn(  # noqa: E731
        "op", F.lit(op).cast("string")
    )
    b0 = with_op(
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)), None
    )
    b1 = with_op(
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)), "add"
    ).unionByName(
        with_op(emb.filter(F.col("vec_id").isin(victims)), "delete").select(
            "vec_id", "embedding", "op"
        )
    )

    def write_slice(i, b):
        part = f"{src}/b{i}"
        b.coalesce(1).write.parquet(part)
        for name in os.listdir(part):
            os.utime(os.path.join(part, name), (4_000_000 + i * 100,) * 2)

    def run_available():
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = start_ann_index_stream(
            stream, state_dir, str(tmp_path / "sd-ckpt"),
            available_now=True, op_col="op",
        )
        q.awaitTermination(600)

    write_slice(0, b0)
    run_available()  # first instance drains b0
    write_slice(1, b1)
    run_available()  # restart: new instance resumes the checkpoint

    live = emb.filter(
        (F.col("vec_id") < 400) & (~F.col("vec_id").isin(victims))
    )
    stream_store = AnnIndexStore(spark, state_dir)
    batch_store = AnnIndexStore(spark, str(tmp_path / "sd-batch")).initialize(
        live, centroids=cents
    )

    got = _rows(stream_store.topk(live, k=K, nprobe=NPROBE, distributed=True))
    assert got == _rows(
        batch_store.topk(live, k=K, nprobe=NPROBE, distributed=True)
    )
    assert got == _rows(
        topk_ivf(live, live, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )


def test_distributed_topk_pq_matches_driver_and_in_memory(spark, emb, tmp_path):
    """The corpus-scale ADC probe (VERDICT r12 #1 — the last named scale
    boundary): `topk_pq(distributed=True)` never collects the query
    frame — the per-(query, probed cell) lookup tables compute as
    columns (`pq.adc_probe_tables`) — yet the result is BIT-IDENTICAL
    to the serving path and the in-memory operator: the column-side
    folds replay the driver build's IEEE association order exactly
    (seeded by the first product, not 0.0). Residual store (the
    strictest form: ct/cnorm relation join + column-side qc fold), plus
    tombstones in the horizon so the shadowed-row anti-joins are
    exercised on BOTH the codes and the re-rank vecs side."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "dpq")).initialize(
        emb.filter(F.col("vec_id") < 400), centroids=cents,
        use_pq=True, residual=True,
    )
    # CDC: delete two ids, re-add one (upsert) + fresh adds — leaves a
    # live tombstone that must shadow on codes AND vecs in both paths.
    store.delete([5, 6])
    store.apply_cdc(
        emb.filter((F.col("vec_id") == 5) | (F.col("vec_id") >= 400))
        .withColumn("op", F.lit(None).cast("string")),
    )
    live = emb.filter(F.col("vec_id") != 6)

    got = _rows(store.topk_pq(live, k=K, nprobe=NPROBE, distributed=True))
    want_mem = _rows(
        topk_ivf_pq(
            live, live, DIM, k=K, nprobe=NPROBE,
            codebooks=store.meta["codebooks"], centroids=cents,
            residual=True,
        )
    )
    assert got == want_mem

    small = live.filter(F.col("vec_id") < N_QUERIES)
    drv = _rows(store.topk_pq(small, k=K, nprobe=NPROBE, distributed=False))
    dst = _rows(store.topk_pq(small, k=K, nprobe=NPROBE, distributed=True))
    auto = _rows(store.topk_pq(small, k=K, nprobe=NPROBE))
    assert drv == dst == auto


def test_driver_probe_refuses_oversize_batch(spark, emb, tmp_path):
    """ADVICE r12: an explicitly-routed driver path (distributed=False)
    must refuse a batch past DRIVER_PROBE_MAX with a pointer at
    distributed=True instead of attempting an unbounded collect — for
    `topk_pq` AND `topk` (auto-routing still routes the same batch
    distributed with no error)."""
    store = AnnIndexStore(spark, str(tmp_path / "guard")).initialize(
        emb, n_centroids=N_CENTROIDS, use_pq=True
    )
    store.DRIVER_PROBE_MAX = 16  # instance override: keep the test cheap
    big = emb.filter(F.col("vec_id") < 64)
    with pytest.raises(ValueError, match="distributed=True"):
        store.topk_pq(big, k=K, nprobe=NPROBE, distributed=False)
    with pytest.raises(ValueError, match="distributed=True"):
        store.topk(big, k=K, nprobe=NPROBE, distributed=False)
    assert store.topk_pq(big, k=K, nprobe=NPROBE).count() > 0  # auto-routes


def test_compaction_skips_deltas_above_the_compacting_batch(spark, emb, queries, tmp_path):
    """Fold guard (review r12): a delta with an id ABOVE the compacting
    batch (an out-of-band write from a stale high-id discipline) must
    NOT fold into the snapshot — it would stay in the read horizon too
    (id > snapshot id) and every one of its rows would score twice. It
    stays a live delta until a compaction at or past its own id."""
    cents = emb.orderBy("vec_id").limit(N_CENTROIDS)
    store = AnnIndexStore(spark, str(tmp_path / "hi"), compact_every=3)
    store.initialize(emb.filter(F.col("vec_id") < 120), centroids=cents)
    store.append(
        emb.filter((F.col("vec_id") >= 120) & (F.col("vec_id") < 240))
    )  # v1
    store.append(
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 480)),
        batch_id=50,
    )  # out-of-band high id (3 live ≤ compact_every: no compaction yet)
    store.append(
        emb.filter((F.col("vec_id") >= 240) & (F.col("vec_id") < 300)),
        batch_id=2,
    )  # v2 — fold candidates [0,1,2] ≤ compact_every: guard defers
    store.append(
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 360)),
        batch_id=3,
    )  # v3 → folds {v0..v3} into s3; v50 must survive as a delta

    snaps, deltas = store._scan()
    assert snaps == [3] and 50 in deltas, (snaps, deltas)

    corpus = emb.filter(
        (F.col("vec_id") < 360)
        | ((F.col("vec_id") >= 400) & (F.col("vec_id") < 480))
    )
    got = _rows(store.topk(queries, k=K, nprobe=NPROBE))
    want = _rows(
        topk_ivf(queries, corpus, DIM, k=K, nprobe=NPROBE, centroids=cents)
    )
    assert got == want, "high-id delta rows duplicated or lost through the fold"
