"""Shared primitives for the parquet versioned-state stores
(`curation.CurationState`, `operators.ann_store.AnnIndexStore`) — the
plain-parquet stand-in for a keyed Delta/Iceberg append table that both
stores implement:

    {state_dir}/v{n}/…  delta versions     (overwrite ⇒ retry-idempotent)
    {state_dir}/s{n}/…  compacted snapshots
    …/_COMMIT           empty marker written LAST; readers ignore
                        uncommitted dirs, so a crashed partial write can
                        never corrupt the next reader

These helpers are the crash-safety-critical bits that MUST behave
identically in every store (a fix to stray-dir handling or commit
atomicity in one store and not the other would silently diverge their
crash behavior — the reason they live here once). What stays store-
local, deliberately: the read HORIZON (CurationState reads `< batch_id`
per trigger — the foreachBatch idempotence recipe; AnnIndexStore reads
everything committed — searches are caller-sequenced against appends),
GC timing, and the compaction fold itself (different parts, different
partition-column re-derivations).
"""

from __future__ import annotations

import os
import re


def scan_committed(state_dir: str) -> tuple[list[int], list[int]]:
    """Committed (snapshot_ids, delta_ids) under ``state_dir``,
    ascending. Uncommitted dirs and stray names are invisible (a partial
    version dir left by a crash must not break the next reader)."""
    snaps: list[int] = []
    deltas: list[int] = []
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            m = re.fullmatch(r"([vs])(\d+)", name)
            if m is None:
                continue
            if not os.path.exists(os.path.join(state_dir, name, "_COMMIT")):
                continue
            (snaps if m.group(1) == "s" else deltas).append(int(m.group(2)))
    return sorted(snaps), sorted(deltas)


def write_commit_marker(root: str) -> None:
    """Mark ``root`` committed — ALWAYS the last step of a version
    write; everything before it is invisible to `scan_committed`."""
    with open(os.path.join(root, "_COMMIT"), "w"):
        pass


def has_parquet(path: str) -> bool:
    """True iff the dir holds at least one parquet file. An EMPTY delta
    (e.g. a fully-duplicate micro-batch) writes only _SUCCESS — no
    partition dirs, no parquet — and a schema-less read of such a dir
    throws UNABLE_TO_INFER_SCHEMA (ADVICE r10: killed any compaction
    window spanning one)."""
    for _dirpath, _dirnames, filenames in os.walk(path):
        if any(fn.endswith(".parquet") for fn in filenames):
            return True
    return False


def walk_parquet_stats(dirs: list[str]) -> tuple[int, int]:
    """(files, bytes) of the parquet leaves under ``dirs`` — the pruned-
    read accounting both stores publish as flatness/pruning evidence."""
    files = 0
    size = 0
    for d in dirs:
        for dirpath, _dirnames, filenames in os.walk(d):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    files += 1
                    size += os.path.getsize(os.path.join(dirpath, fn))
    return files, size


def sweep_uncommitted(state_dir: str, below_id: int) -> None:
    """Remove CRASHED partial version dirs: ``v*``/``s*`` names lacking
    a ``_COMMIT`` marker whose id is strictly below ``below_id``. Such a
    dir can never be meaningfully retried (the caller passes the first
    id a retry could still target: the trigger id for CurationState —
    foreachBatch replays only the current trigger — or one past the
    committed horizon for AnnIndexStore), so without the sweep it leaks
    disk forever: invisible to readers, unbounded growth (ADVICE r11).
    Dirs at or above ``below_id`` are left for the owner's retry, which
    overwrites them."""
    import shutil

    if not os.path.isdir(state_dir):
        return
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"[vs](\d+)", name)
        if (
            m
            and int(m.group(1)) < below_id
            and not os.path.exists(os.path.join(state_dir, name, "_COMMIT"))
        ):
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
