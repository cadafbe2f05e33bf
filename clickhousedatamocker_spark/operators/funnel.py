"""windowFunnel — ClickHouse's funnel-analysis aggregate, Spark-first.

``window_funnel(events, steps, window_s)``: per user, the deepest prefix of
``steps`` completed in order, with every step inside ``window_s`` seconds of
the chain's first-step event.

Semantics (documented, deterministic): the chain anchors on the user's
EARLIEST step-1 event; each later step completes at its earliest qualifying
event (greedy earliest-chain, the common windowFunnel mode). Implementation
is one hash aggregation (collect per-user events) + a JVM-side fold over the
sorted array — no Python, state O(#steps). The DuckDB oracle implements the
IDENTICAL fold (queries/llm.py), so results are hash-exact.

Scale: one shuffle on the user key; per-user arrays are bounded by per-user
activity (salt heavy users if a key exceeds memory — operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (user_col, funnel_depth) with depth in 0..len(steps)."""
    k = len(steps)
    evs = (
        events.select(
            F.col(user_col),
            F.struct(
                F.unix_timestamp(F.col(ts_col)).alias("t"), F.col(type_col).alias("y")
            ).alias("e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
    )

    zero = F.struct(*[F.lit(None).cast("long").alias(f"t{i+1}") for i in range(k)])

    def step(acc: Column, e: Column) -> Column:
        fields = []
        for i in range(k):
            prev_done = acc[f"t{i}"].isNotNull() if i else F.lit(True)
            in_window = (e["t"] - acc["t1"] <= window_s) if i else F.lit(True)
            hit = (e["y"] == steps[i]) & prev_done & in_window
            fields.append(F.coalesce(acc[f"t{i+1}"], F.when(hit, e["t"])).alias(f"t{i+1}"))
        return F.struct(*fields)

    final = F.aggregate(F.col("evs"), zero, step)
    depth = F.lit(0)
    for i in range(k):
        depth = F.when(final[f"t{i+1}"].isNotNull(), i + 1).otherwise(depth)
    return evs.select(F.col(user_col), depth.cast("int").alias("funnel_depth"))


def funnel_oracle_sql(
    steps: list[str], window_s: int, table: str = "events"
) -> str:
    """DuckDB SQL implementing the identical greedy earliest-chain fold.

    DuckDB's 2-arg ``list_reduce`` requires accumulator and element types to
    unify, so the fold runs over ONE struct type carrying both the event
    fields (t, y) and the chain state (t1..tk); an all-null seed is
    prepended as the initial accumulator.
    """
    k = len(steps)
    state_nulls = ", ".join(f"t{i+1} := CAST(NULL AS BIGINT)" for i in range(k))
    seed = f"struct_pack(t := CAST(NULL AS BIGINT), y := CAST(NULL AS VARCHAR), {state_nulls})"
    elem = f"struct_pack(t := epoch(ts)::BIGINT, y := event_type, {state_nulls})"
    assigns = ["t := e.t", "y := e.y"]
    for i in range(k):
        prev = f"acc.t{i} IS NOT NULL AND " if i else ""
        win = f"e.t - acc.t1 <= {window_s} AND " if i else ""
        assigns.append(
            f"t{i+1} := COALESCE(acc.t{i+1}, CASE WHEN {prev}{win}e.y = '{steps[i]}' THEN e.t END)"
        )
    fold_fields = ", ".join(assigns)
    depth = "CASE "
    for i in range(k, 0, -1):
        depth += f"WHEN f.t{i} IS NOT NULL THEN {i} "
    depth += "ELSE 0 END"
    return f"""
WITH per_user AS (
  SELECT user_id, list_sort(list({elem})) AS evs
  FROM {table}
  GROUP BY user_id
), folded AS (
  SELECT user_id,
         list_reduce(list_prepend({seed}, evs), (acc, e) -> struct_pack({fold_fields})) AS f
  FROM per_user
)
SELECT user_id, CAST({depth} AS INT) AS funnel_depth
FROM folded
ORDER BY user_id
""".strip()
