"""Shared column-expression helpers (engine scalar-function surface)."""

from manifold_spark.functions.hashing import fingerprint, stable_long_hash
from manifold_spark.functions.numeric import decimal_sum

__all__ = ["fingerprint", "stable_long_hash", "decimal_sum"]
