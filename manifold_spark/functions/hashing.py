"""Hashing / fingerprint expressions.

Reference P9 (`/root/reference/scripts/el_to_parquet.py:180-181`): the SCD2
change-detection key is `sha2(concat_ws('||', *cols), 256)`. We keep that
exact construction (portable: DuckDB `sha256(concat_ws(…))` matches
byte-for-byte, which is what the oracle gate checks).

For operators that need *numeric* hashes with cross-engine determinism
(minhash permutations, simhash bit sampling) we derive 64-bit integers from
md5 hex — slower than xxhash64 but reproducible in any engine, and still a
JVM-side built-in (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fingerprint(
    cols: list[str | Column], num_bits: int = 256, null_safe: bool = False
) -> Column:
    """`sha2(concat_ws('||', *cols), 256)` — the reference's row hash.

    The reference construction is NOT injective: `concat_ws` skips NULLs,
    so (NULL,'x') and ('x',NULL) collide, as do values containing the
    literal separator. In the reference pipeline this is moot — hashing
    happens after cleaning, which defaults every NULL — and we keep its
    exact bytes by default for oracle parity. Pass ``null_safe=True``
    where raw NULLs can reach the hash: each value gets a presence prefix
    ('v'/lone null marker), making NULL vs empty vs absent distinct.
    """
    if null_safe:
        cols = [
            F.when(_as_col(c).isNull(), F.lit("␀")).otherwise(
                F.concat(F.lit("v"), _as_col(c).cast("string"))
            )
            for c in cols
        ]
    return F.sha2(F.concat_ws("||", *cols), num_bits)


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def stable_long_hash(col: Column, seed: int = 0) -> Column:
    """Deterministic unsigned-ish 63-bit hash of a string column.

    md5(seed || value) → first 15 hex chars → BIGINT. Engine-portable
    (md5 is standardized), unlike Spark's murmur3 `hash`/`xxhash64`.

    NULL input hashes like the EMPTY STRING (concat_ws skips NULLs), and
    the SQL mirror (`operators._stable_hash_sql`) coalesces to '' for the
    same behavior — so null-keyed rows pass sampling/sharding gates
    identically on every engine. If NULL-vs-'' distinctness ever matters
    for a key, coalesce to a sentinel before hashing.
    """
    seeded = F.concat_ws("", F.lit(str(seed)), col)
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")
