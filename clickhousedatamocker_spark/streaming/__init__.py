"""Structured-Streaming tier (SURVEY §7 M4, BASELINE north star).

The reference's "streaming" is a driver-side 1 Hz insert loop
(scripts/setup.sh:125-151). This package is the always-on re-expression:

- ingest:   rate source → generated columns → admission-controlled
            foreachBatch append (flow control included) — the engine's
            write path is identical for batch and streaming.
- windows:  watermarked tumbling/sliding/session aggregations; the helpers
            are plain DataFrame transforms, so the exact same code runs on
            a batch DataFrame (oracle-checkable) and on a stream.
- stateful: applyInPandasWithState custom operator (per-user running
            profile) with a batch-equivalent oracle.
"""

from clickhousedatamocker_spark.streaming.ingest import (
    StreamingHarnessResult,
    run_streaming_harness,
)
from clickhousedatamocker_spark.streaming.stateful import user_running_profile
from clickhousedatamocker_spark.streaming.windows import (
    session_agg,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "run_streaming_harness",
    "StreamingHarnessResult",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "user_running_profile",
]
