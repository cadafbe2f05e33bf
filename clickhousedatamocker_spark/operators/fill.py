"""Gap filling — ClickHouse ``ORDER BY … WITH FILL [FROM/TO/STEP]`` as an
operator (reference: CH's fill transform; the SQL-clause spelling needs a
plan restructuring — a grid join — so it is an operator here, not a text
rewrite).

A rollup over sparse data has holes (hours with no events); downstream
consumers (charts, window diffs, exports) want the full grid. The grid is
generated engine-side (``sequence`` over a 2-value driver bound — never a
collected data pass), and the fill is ONE left join of grid → data: at any
scale the cost is the join shuffle over grid+data keys, and with a small
grid Catalyst broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_gaps(
    df: DataFrame,
    key_col: str,
    step: int = 1,
    from_val: int | None = None,
    to_val: int | None = None,
    fill_values: dict[str, object] | None = None,
    interpolate: list[str] | None = None,
) -> DataFrame:
    """→ ``df`` plus one row for every missing grid point
    ``from_val, from_val+step, … < to_val`` of the integer/long ``key_col``.

    ClickHouse WITH FILL semantics, exactly:
    - ``TO`` is EXCLUSIVE (the interval is [FROM, TO)); defaulted bounds
      come from the data's min/max (max stays included — a 2-value driver
      fetch), matching CH's fill-from-data behavior.
    - Source rows are NEVER dropped: keys outside the grid or off the step
      survive (full outer join with the grid).
    - ``fill_values`` apply ONLY to synthesized grid rows — a genuine NULL
      in an original row is data, not a gap (CH fills only inserted rows).
    - ``interpolate``: columns that carry the PREVIOUS present row's value
      forward into synthesized rows — CH's ``INTERPOLATE (col)`` default
      (the ``col AS expr`` recurrence form is not modeled). The carry uses
      an unpartitioned window over the result: WITH FILL is a
      result-shaping clause over an already-aggregated, grid-bounded
      stream, the same single-stream pass CH's transform does.
    - Column order is preserved.

    For timestamp grids convert to epoch first (``unix_timestamp``) and
    back after — exactly what CH's DateTime STEP does internally.
    """
    if from_val is None or to_val is None:
        bounds = df.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        if bounds["lo"] is None:
            return df  # empty input: nothing to anchor a grid on
        from_val = int(bounds["lo"]) if from_val is None else from_val
        to_val = int(bounds["hi"]) + 1 if to_val is None else to_val
    spark = df.sparkSession
    grid = spark.range(from_val, to_val, step).select(
        F.col("id").cast(dict(df.dtypes)[key_col]).alias(key_col)
    )
    fills = fill_values or {}
    carried = set(interpolate or [])
    marked = df.withColumn("__present", F.lit(True))
    joined = grid.join(marked, key_col, "full")
    synthesized = F.col("__present").isNull()
    if carried:
        from pyspark.sql import Window as W

        w = W.orderBy(key_col).rowsBetween(W.unboundedPreceding, 0)
    out_cols: list[Column] = []
    for name in df.columns:
        if name == key_col:
            out_cols.append(F.col(key_col))
            continue
        c = F.col(name)
        if name in carried:
            prev = F.last(
                F.when(~synthesized, F.col(name)), ignorenulls=True
            ).over(w)
            c = F.when(synthesized, prev).otherwise(c)
        elif name in fills:
            c = F.when(synthesized, F.lit(fills[name])).otherwise(c)
        out_cols.append(c.alias(name))
    return joined.select(*out_cols)
