"""Stream-stream and stream-static joins, batch/stream polymorphic.

The reference has no join surface at all (its queries are single-table
monitoring scans — sql/query_parts.sql, sql/query_metrics.sql); this module
is part of the Tier-B extension: the attribution-shaped joins an event
pipeline needs (impression→click, click→purchase) expressed so the same
function runs as

- a watermarked *stream-stream interval join* on streaming inputs — Spark
  buffers each side's rows in the state store only within the watermark
  horizon, the time-interval predicate bounds how long a row can await its
  match, so state is O(rate x horizon), never O(stream); and
- an ordinary range join on batch inputs (watermarks are dropped), which is
  what the oracle-style tests compare against.

Scale: the join key (`user_id`) is the shuffle key on both sides; the
interval predicate is evaluated post-shuffle within each key group. At
100 TB/day the watermark horizon is the knob that bounds state, and skewed
hot keys fall to AQE skew handling exactly as in the batch joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) event flow to a
    STATIC dimension table, broadcast to every task.

    The canonical per-event lookup (user profile, geo table, experiment
    assignment) — on a stream Spark re-plans the static side per micro-batch
    but never holds join state for it (unlike stream-stream joins, no
    watermark is needed); on a batch input it is a plain broadcast hash
    join. Scale: the stream side is NEVER shuffled — the dim broadcast is
    the entire data movement, so throughput is flat in stream volume.
    """
    return events.join(F.broadcast(dim), events[key] == dim[dim_key], how).drop(dim_key)


def attribution_join(
    left_events: DataFrame,
    right_events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    left_type: str = "purchase",
    right_type: str = "click",
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each ``left_type`` event to every ``right_type`` event by
    the same user within the preceding ``lookback`` — clicks that led to a
    purchase. Output: one row per (conversion, attributed event) pair with
    both timestamps and the conversion value."""
    conv = left_events.filter(F.col("event_type") == left_type).select(
        F.col(key), F.col(ts_col).alias("conv_ts"), F.col("value").alias("conv_value")
    )
    src = right_events.filter(F.col("event_type") == right_type).select(
        F.col(key).alias("__rk"), F.col(ts_col).alias("attr_ts")
    )
    if conv.isStreaming:
        conv = conv.withWatermark("conv_ts", watermark)
    if src.isStreaming:
        src = src.withWatermark("attr_ts", watermark)
    cond = (
        (conv[key] == src["__rk"])
        & (src["attr_ts"] >= conv["conv_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (src["attr_ts"] <= conv["conv_ts"])
    )
    return conv.join(src, cond, "inner").select(key, "conv_ts", "conv_value", "attr_ts")
