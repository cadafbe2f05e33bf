"""Batch-mode declarations of the streaming window operators.

Each query calls the SAME helper that runs on streams
(clickhousedatamocker_spark/streaming/windows.py) — applied to the batch
``events`` fixture, which makes them DuckDB-oracle-checkable. The streaming
execution of the identical code path is covered by tests/test_streaming.py
(incremental equivalence: stream-of-batches == one batch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhousedatamocker_spark.queries.base import dsum, o_dsum, register, t
from clickhousedatamocker_spark.streaming.windows import (
    session_agg,
    sliding_counts,
    tumbling_counts,
)


@register(
    "stream_tumbling_1h",
    f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       {o_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start
""",
    description="Tumbling 1h event-time windows (F.window) — identical code "
    "path as the watermarked streaming aggregation; batch mode == epoch-"
    "aligned date_trunc buckets.",
)
def stream_tumbling_1h(spark, sf_dir):
    return tumbling_counts(
        t(spark, sf_dir, "events"),
        ts_col="ts",
        duration="1 hour",
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value")],
    ).orderBy("window_start")


@register(
    "stream_sliding_1h_30m",
    """
WITH grid AS (
  SELECT *, unnest([
    CAST(to_timestamp(floor(epoch(ts)/1800)*1800) AS TIMESTAMP),
    CAST(to_timestamp(floor(epoch(ts)/1800)*1800 - 1800) AS TIMESTAMP)
  ]) AS window_start
  FROM events
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events
FROM grid
WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
GROUP BY 1
ORDER BY window_start
""",
    description="Sliding 1h windows every 30m (each event in 2 windows) — "
    "F.window(duration, slide); oracle enumerates the 30m grid points.",
)
def stream_sliding_1h_30m(spark, sf_dir):
    return sliding_counts(
        t(spark, sf_dir, "events"), ts_col="ts", duration="1 hour", slide="30 minutes"
    ).orderBy("window_start")


@register(
    "stream_session_windows",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 10 MINUTE OR
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
    description="Per-user session windows with a 10-minute inactivity gap "
    "(F.session_window). Oracle: classic lag/gap-flag/cumsum sessionization — "
    "session_end = last event + gap, matching Spark's session_window.end.",
)
def stream_session_windows(spark, sf_dir):
    return session_agg(
        t(spark, sf_dir, "events"), ts_col="ts", gap="10 minutes", key_col="user_id"
    ).orderBy("user_id", "session_start")


@register(
    "stream_user_running_profile",
    f"""
WITH attr AS (
  SELECT c.user_id,
         COUNT(*) AS n_attr_pairs,
         COUNT(DISTINCT c.ts) AS n_attr_convs
  FROM events c JOIN events k ON k.user_id = c.user_id
   AND c.event_type = 'purchase' AND k.event_type = 'click'
   AND k.ts >= c.ts - INTERVAL 30 MINUTE AND k.ts <= c.ts
  GROUP BY c.user_id
)
SELECT e.user_id, COUNT(*) AS n_events, {o_dsum('value', 18, 3)} AS total_value,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       CAST(COALESCE(MAX(attr.n_attr_pairs), 0) AS BIGINT) AS n_attr_pairs,
       CAST(COALESCE(MAX(attr.n_attr_convs), 0) AS BIGINT) AS n_attr_convs
FROM events e LEFT JOIN attr ON attr.user_id = e.user_id
GROUP BY e.user_id
ORDER BY e.user_id
""",
    description="Batch oracle of the applyInPandasWithState running-profile "
    "operator (streaming/stateful.py); stream==batch equivalence is asserted "
    "in tests/test_streaming.py. Also folds in the stream-stream interval "
    "join (streaming/joins.py attribution_join): per-user counts of "
    "(purchase, click-within-30min) attribution pairs and of attributed "
    "conversions — making the interval-join semantics driver-graded; the "
    "stream==batch law for the join itself is "
    "tests/test_streaming.py::test_attribution_join_stream_equals_batch.",
)
def stream_user_running_profile(spark, sf_dir):
    from clickhousedatamocker_spark.streaming.joins import attribution_join
    from clickhousedatamocker_spark.streaming.stateful import user_running_profile_batch

    ev = t(spark, sf_dir, "events")
    out = user_running_profile_batch(ev.select("user_id", "ts", "value"))
    attr = (
        attribution_join(ev, ev, lookback="30 minutes")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attr_pairs"),
            F.countDistinct("conv_ts").alias("n_attr_convs"),
        )
    )
    # decimal-exact sum for cross-engine hash equality (queries/base.py rules)
    return (
        out.drop("total_value")
        .join(
            ev.groupBy("user_id").agg(dsum("value", 18, 3).alias("total_value")),
            "user_id",
        )
        .join(attr, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "total_value",
            "first_ts",
            "last_ts",
            F.coalesce(F.col("n_attr_pairs"), F.lit(0)).cast("long").alias("n_attr_pairs"),
            F.coalesce(F.col("n_attr_convs"), F.lit(0)).cast("long").alias("n_attr_convs"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_attribution_join",
    None,  # grading cap holds 50 oracle-backed entries; SQL form below for reference:
    #   SELECT c.user_id, c.ts AS conv_ts, c.value AS conv_value, k.ts AS attr_ts
    #   FROM events c JOIN events k ON k.user_id = c.user_id
    #    AND k.event_type = 'click' AND c.event_type = 'purchase'
    #    AND k.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
    description="Stream-stream interval join (streaming/joins.py): each "
    "purchase attributed to the user's clicks within the preceding 30 min. "
    "On streams both sides are watermarked and state is bounded by the "
    "horizon; batch form is this plain range join. stream==batch law in "
    "tests/test_streaming.py::test_attribution_join_stream_equals_batch.",
)
def stream_attribution_join(spark, sf_dir):
    from clickhousedatamocker_spark.streaming.joins import attribution_join

    ev = t(spark, sf_dir, "events")
    return attribution_join(ev, ev, lookback="30 minutes").orderBy(
        "user_id", "conv_ts", "attr_ts"
    )
