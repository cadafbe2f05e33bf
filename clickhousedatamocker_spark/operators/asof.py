"""As-of join — an operator Spark lacks natively, built as a composition of
existing DataFrame ops (union + window), per the custom-operator ladder.

For each left row, find the most recent right row with the same key and
``right_ts <= left_ts`` (the DuckDB/kdb ASOF JOIN semantics).

Why union+window instead of a range join: a range-condition join plans as
BroadcastNestedLoopJoin (O(n·m) per key) which dies at scale; the union
approach is ONE shuffle on the key + a sort within partitions —
O((n+m) log(n+m)) per key and fully distributed. Skewed keys are handled by
AQE the same as any windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right values at-or-before
    its timestamp (NULLs when no prior right row exists).

    ``value_cols``: right-side columns to carry over (default: right_ts only).
    """
    value_cols = value_cols if value_cols is not None else [right_ts]

    lhs = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_cols = [F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left")]
    rhs = right.select(*rhs_cols, *[F.col(c).alias(f"__r_{c}") for c in value_cols])
    for c in left.columns:
        if c not in (on,):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in value_cols:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))

    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort BEFORE left rows at equal timestamps (__is_left asc),
    # so an exact-timestamp match is visible to the left row (>= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *unioned.columns,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__filled_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("__is_left") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__filled_{c}"))
    return out.drop(
        "__is_left", "__ts", *[f"__r_{c}" for c in value_cols], *[f"__filled_{c}" for c in value_cols]
    )
