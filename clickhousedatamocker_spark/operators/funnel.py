"""windowFunnel — ClickHouse's funnel-analysis aggregate, Spark-first.

``window_funnel(events, steps, window_s)``: per user, the deepest prefix of
``steps`` completed in order, with every step inside ``window_s`` seconds of
the chain's first-step event.

Semantics (ClickHouse parity): a chain may anchor on ANY of the user's
step-1 events — the result is the MAX depth over all candidate anchors
(anchoring only on the earliest step-1 event undercounts, e.g. click@t0,
click@t100, view@t101 with window 10s is depth 2, not 1). For a fixed
anchor the chain is greedy: each later step completes at its earliest
qualifying event after the previous step. Ties in timestamp are ordered by
(t, event_type) — deterministic and mirrored exactly by the oracle.

Implementation is one hash aggregation (collect per-user events) + JVM-side
array HOFs: an aggregate fold per anchor over the events after it, then
array_max over anchors. No Python, state O(#steps) per anchor. The DuckDB
oracle implements the IDENTICAL per-anchor fold (queries/llm.py), so
results are hash-exact.

Scale: one shuffle on the user key; per-user arrays are bounded by per-user
activity. Per-anchor work is O(#anchors x #events) worst-case per user —
the same bound as ClickHouse's implementation. A single HOT user (bot
traffic: 10^6+ events) blows both bounds at once — the collect_list buffer
grows unboundedly in ONE aggregation task and the anchor fold goes
quadratic. ``max_events_per_user`` is the guard: a windowed row_number
pre-filter keeps each user's EARLIEST N events (deterministic (t, y, tie)
order). The window sort is external (UnsafeExternalSorter spills), so the
pre-filter itself is hot-key-safe; after it, every downstream buffer is
<= N structs and the fold is <= N^2. Users under the cap are untouched —
exactness for them is preserved (pinned by the planted-hot-key test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_match_col: str | None = None,
    max_events_per_user: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """→ (user_col, funnel_depth) with depth in 0..len(steps).

    ``seq_match_col``: also emit ClickHouse ``sequenceMatch`` over the same
    sorted per-user events — 1 iff the steps occur as a time-ordered
    subsequence with ANY events in between (the ``(?1).*(?2).*(?3)`` pattern,
    no window constraint). Computed as a regex over the per-event step codes,
    reusing the single per-user aggregation.

    ``max_events_per_user``: skew guard for hot keys (see module docstring).
    ``None`` (default) keeps exact CH semantics for every user; set it (e.g.
    10_000) on corpora where bot users exist — users at or under the cap
    still get exact results.

    ``tiebreak_col``: a unique per-event column (e.g. ``event_id``) breaking
    (ts, type) ties in the cap's keep-earliest-N order. Without it, rows
    tied on both sort keys make row_number's choice of survivors
    run-dependent; the surviving (t, y) MULTISET — hence funnel_depth — is
    still deterministic (tied rows are interchangeable downstream), but the
    physical row choice is not. Defaults to an ``event_id`` column when one
    exists; pass explicitly for other schemas, or None to accept multiset-
    level determinism only.
    """
    k = len(steps)
    src = events
    if max_events_per_user is not None:
        if tiebreak_col is None and "event_id" in events.columns:
            tiebreak_col = "event_id"
        order = [ts_col, type_col] + ([tiebreak_col] if tiebreak_col else [])
        w = W.partitionBy(user_col).orderBy(*order)
        src = (
            events.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_events_per_user)
            .drop("__rn")
        )
    evs = (
        src.select(
            F.col(user_col),
            F.struct(
                F.unix_timestamp(F.col(ts_col)).alias("t"), F.col(type_col).alias("y")
            ).alias("e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
    )

    def fold_step(acc: Column, e: Column) -> Column:
        """Advance the chain state (t1 fixed at the anchor) by one event."""
        fields = [acc["t1"].alias("t1")]
        for i in range(1, k):
            prev_done = acc[f"t{i}"].isNotNull()
            in_window = e["t"] - acc["t1"] <= window_s
            hit = (e["y"] == steps[i]) & prev_done & in_window
            fields.append(F.coalesce(acc[f"t{i+1}"], F.when(hit, e["t"])).alias(f"t{i+1}"))
        return F.struct(*fields)

    def depth_for_anchor(p: Column) -> Column:
        """Greedy chain depth anchored at events[p] (1-based position)."""
        seed = F.struct(
            F.element_at(F.col("evs"), p)["t"].alias("t1"),
            *[F.lit(None).cast("long").alias(f"t{i+1}") for i in range(1, k)],
        )
        rest = F.slice(F.col("evs"), p + 1, F.greatest(F.size("evs") - p, F.lit(0)))
        final = F.aggregate(rest, seed, fold_step)
        depth = F.lit(1)
        for i in range(1, k):
            depth = F.when(final[f"t{i+1}"].isNotNull(), i + 1).otherwise(depth)
        return depth

    anchors = F.filter(
        F.sequence(F.lit(1), F.size("evs")),
        lambda p: F.element_at(F.col("evs"), p)["y"] == steps[0],
    )
    depths = F.transform(anchors, depth_for_anchor)
    depth = F.coalesce(F.array_max(depths), F.lit(0))
    cols = [F.col(user_col), depth.cast("int").alias("funnel_depth")]
    if seq_match_col:
        code = _step_code_column(steps)
        seq = F.array_join(F.transform(F.col("evs"), code), "")
        pat = ".*".join(chr(ord("A") + i) for i in range(k))
        cols.append(seq.rlike(pat).cast("int").alias(seq_match_col))
    return evs.select(*cols)


def _step_code_column(steps: list[str]):
    """Per-event single-char step code: steps[i] -> chr('A'+i), other -> 'z'."""

    def code(e: Column) -> Column:
        c = F.lit("z")
        for i in range(len(steps) - 1, -1, -1):
            c = F.when(e["y"] == steps[i], chr(ord("A") + i)).otherwise(c)
        return c

    return code


def funnel_oracle_sql(
    steps: list[str], window_s: int, table: str = "events", seq_match_col: str | None = None
) -> str:
    """DuckDB SQL implementing the identical any-anchor max-depth fold.

    DuckDB's 2-arg ``list_reduce`` requires accumulator and element types to
    unify, so every event struct carries null chain-state fields (t1..tk)
    and the per-anchor seed sets t1 to the anchor's timestamp; the fold runs
    over the events strictly after the anchor position.
    """
    k = len(steps)
    state_nulls = ", ".join(f"t{i+1} := CAST(NULL AS BIGINT)" for i in range(k))
    elem = f"struct_pack(t := epoch(ts)::BIGINT, y := event_type, {state_nulls})"
    seed_state = ", ".join(
        ["t1 := evs[p].t"] + [f"t{i+1} := CAST(NULL AS BIGINT)" for i in range(1, k)]
    )
    seed = f"struct_pack(t := CAST(NULL AS BIGINT), y := CAST(NULL AS VARCHAR), {seed_state})"
    assigns = ["t := e.t", "y := e.y", "t1 := acc.t1"]
    for i in range(1, k):
        assigns.append(
            f"t{i+1} := COALESCE(acc.t{i+1}, CASE WHEN acc.t{i} IS NOT NULL "
            f"AND e.t - acc.t1 <= {window_s} AND e.y = '{steps[i]}' THEN e.t END)"
        )
    fold_fields = ", ".join(assigns)
    depth = "CASE "
    for i in range(k, 1, -1):
        depth += f"WHEN f.t{i} IS NOT NULL THEN {i} "
    depth += "ELSE 1 END"
    seq_select = ""
    if seq_match_col:
        case = "CASE " + " ".join(
            f"WHEN e.y = '{s}' THEN '{chr(ord('A') + i)}'" for i, s in enumerate(steps)
        ) + " ELSE 'z' END"
        pat = ".*".join(chr(ord("A") + i) for i in range(k))
        seq_select = (
            f",\n       CAST(regexp_matches(array_to_string("
            f"list_transform(evs, e -> {case}), ''), '{pat}') AS INT) AS {seq_match_col}"
        )
    return f"""
WITH per_user AS (
  SELECT user_id, list_sort(list({elem})) AS evs
  FROM {table}
  GROUP BY user_id
), anchored AS (
  SELECT user_id, evs,
    list_transform(
      list_filter(generate_series(1, len(evs)), p -> evs[p].y = '{steps[0]}'),
      p -> list_reduce(
             list_prepend({seed}, array_slice(evs, p + 1, len(evs))),
             (acc, e) -> struct_pack({fold_fields})))
    AS finals
  FROM per_user
)
SELECT user_id,
       CAST(COALESCE(list_max(list_transform(finals, f -> {depth})), 0) AS INT)
         AS funnel_depth{seq_select}
FROM anchored
ORDER BY user_id
""".strip()
