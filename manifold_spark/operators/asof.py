"""As-of (point-in-time) join — an operator Spark lacks natively.

Matches each left row to the most recent right row with `right.ts <=
left.ts` within the same key, the canonical operation for joining facts
to slowly-drifting reference data (prices, signups, config snapshots).

Spark-first composition (no range-join explosion, no UDF): union the two
sides with a side tag, one window pass per key ordered by (ts, side)
carrying the last-seen right timestamp forward (`last(..., ignorenulls)`),
then keep the left rows. Cost: ONE shuffle by key + an in-partition sort —
same price as any grouped window; contrast with the naive
`l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax, which explodes
quadratically per key.

Ties: a right row at exactly left.ts matches (<= semantics, right sorts
before left at equal ts) — mirrors DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. `on` is the ordering column (timestamp), `by` the
    equi keys. Carried right columns (default: `on` only) appear with
    `suffix`. Left rows with no prior right row get nulls."""
    right_cols = [on] if right_cols is None else right_cols
    carried = [f"{c}{suffix}" for c in right_cols]
    reserved = {"_side", "_r", *carried}
    clashes = reserved & set(left.columns)
    if clashes:
        raise ValueError(f"asof_join output columns collide with left columns: {sorted(clashes)}")
    # A NULL ordering value can never satisfy right.ts <= left.ts (DuckDB
    # ASOF semantics); without this filter NULLs sort first and get carried
    # forward as phantom matches.
    right = right.filter(F.col(on).isNotNull())

    # Carry the matched right row as ONE struct so the fill is atomic: a
    # per-column last(ignorenulls) would mix values from different right
    # rows whenever a later right row holds a legitimate NULL (and could
    # never deliver that NULL at all).
    r_struct = F.struct(*[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)])
    struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType.simpleString()

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_type)
    )
    r_tagged = right.select(*by, on, r_struct.alias("_r")).withColumn("_side", F.lit(0))
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(l_tagged.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "_r", F.last(F.when(F.col("_side") == 0, F.col("_r")), ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1)
    return out.select(
        *[c for c in left.columns], *[F.col(f"_r.{cc}").alias(cc) for cc in carried]
    )
