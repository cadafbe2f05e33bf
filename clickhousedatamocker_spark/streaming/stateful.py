"""Custom stateful streaming operator via ``applyInPandasWithState``.

``user_running_profile`` maintains a per-user running profile across
micro-batches — event count, value sum, first/last event time — the kind
of accumulating state no built-in windowed agg expresses (state persists
forever, outputs the running value each batch).

Arrow-batched per group; state is a tiny tuple per key, so the state store
grows with |keys|, not |events| — the 100 TB discipline. On a batch
DataFrame, the same semantics are one hash aggregation
(``user_running_profile_batch``), which is the oracle for a single-batch
stream run.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", StringType()),
        StructField("last_ts", StringType()),
    ]
)

_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, first_s, last_s = state.get if state.exists else (0, 0.0, None, None)
    first = pd.to_datetime(first_s) if first_s else None
    last = pd.to_datetime(last_s) if last_s else None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first = lo if first is None or lo < first else first
        last = hi if last is None or hi > last else last
    state.update((n, total, first.strftime(_TS_FMT), last.strftime(_TS_FMT)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_ts": [first],
            "last_ts": [last],
        }
    )


def user_running_profile(events: DataFrame) -> DataFrame:
    """Running per-user profile over a stream of (user_id, ts, value) rows.

    Output mode must be ``update``; each micro-batch emits the new running
    totals for every user present in the batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_running_profile_batch(events: DataFrame) -> DataFrame:
    """Batch-mode oracle: the same semantics as one hash aggregation."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
