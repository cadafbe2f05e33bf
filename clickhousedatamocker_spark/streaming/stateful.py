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
    ArrayType,
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


# ---------------------------------------------------------------------------
# streaming GPT-style sequence packing: the stateful tail of the
# select -> dedup -> pack training-data pipeline (the batch form is
# operators/corpus.py pack_token_sequences). Cites the same layout
# contract; this variant runs it continuously.

PACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("seq_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("text", StringType()),
    ]
)

# leftover = the shard's buffered partial tail (< seq_len tokens, space-
# joined); next_seq = running sequence counter across micro-batches
PACK_STATE_SCHEMA = StructType(
    [
        StructField("leftover", StringType()),
        StructField("next_seq", LongType()),
    ]
)


def _mk_packer(seq_len: int, eos: str):
    def pack_shard(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        leftover, next_seq = state.get if state.exists else ("", 0)
        toks: list[str] = leftover.split(" ") if leftover else []
        # sort the WHOLE group, not each Arrow chunk: a shard batch larger
        # than arrow.maxRecordsPerBatch arrives as several pdfs in
        # arbitrary post-shuffle order, and per-chunk sorting would pack
        # documents out of id order (breaking the stream==batch law)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks).sort_values("doc_id")
            for t in whole["text"]:
                toks.extend((t + " " + eos).split(" "))
        out_rows = []
        while len(toks) >= seq_len:
            chunk, toks = toks[:seq_len], toks[seq_len:]
            out_rows.append(
                (int(key[0]), next_seq, seq_len, " ".join(chunk))
            )
            next_seq += 1
        state.update((" ".join(toks), next_seq))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["shard", "seq_id", "n_tokens", "text"]
            )

    return pack_shard


def stream_pack_token_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos: str = "<|endoftext|>",
) -> DataFrame:
    """Continuous GPT-style packing over a document stream: each shard
    buffers its partial tail ACROSS micro-batches (state < ``seq_len``
    tokens per shard — bounded regardless of stream length) and emits only
    exact-``seq_len`` sequences, so a continuously-built corpus wastes
    nothing at batch boundaries where per-batch packing would strand one
    partial sequence per shard per batch.

    Same shard assignment and in-shard doc order (arrival order, id-sorted
    within a batch) as the batch operator, so when batches arrive in id
    order the emitted sequences are IDENTICAL to the batch layout's full
    sequences — the stream==batch law pinned in tests/test_streaming.py.
    Output mode ``append``; state store = n_shards tiny rows."""
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard")
    rows = docs.select(
        shard, F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return rows.groupBy("shard").applyInPandasWithState(
        _mk_packer(seq_len, eos),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming weighted reservoir: A-ES sampling over an unbounded stream (the
# batch form is operators/corpus.py weighted_sample — same ln(u)/w keys, so
# stream and batch agree exactly on the same data)

RESERVOIR_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("weight", DoubleType()),
        StructField("aes_key", DoubleType()),
    ]
)

RESERVOIR_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("ws", ArrayType(DoubleType())),
        StructField("keys", ArrayType(DoubleType())),
    ]
)


def _mk_reservoir(n: int):
    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        ids, ws, keys = state.get if state.exists else ([], [], [])
        cand = list(zip(ids, ws, keys))
        for pdf in pdfs:
            if len(pdf):
                cand.extend(
                    zip(pdf["doc_id"].tolist(), pdf["w"].tolist(), pdf["aes_key"].tolist())
                )
        # keep the shard's top-n by (key desc, id asc) — the A-ES reservoir
        cand.sort(key=lambda t: (-t[2], t[0]))
        cand = cand[:n]
        state.update(
            ([c[0] for c in cand], [c[1] for c in cand], [c[2] for c in cand])
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(cand),
                "doc_id": [c[0] for c in cand],
                "weight": [c[1] for c in cand],
                "aes_key": [c[2] for c in cand],
            }
        )

    return update


def stream_weighted_reservoir(
    docs: DataFrame,
    n: int = 20,
    weight_col: str = "quality",
    id_col: str = "doc_id",
    salt: int = 0,
    n_shards: int = 8,
) -> DataFrame:
    """Weighted reservoir sampling over an UNBOUNDED stream: each of
    ``n_shards`` hash shards keeps its running top-``n`` rows by the same
    deterministic Efraimidis–Spirtes key the batch sampler uses; the
    global top-n is always contained in the union of shard reservoirs
    (any globally-selected row is in its own shard's top-n), so a final
    ``ORDER BY aes_key DESC, doc_id LIMIT n`` over the emitted rows
    reproduces ``weighted_sample`` on the same data EXACTLY — the
    stream==batch law pinned in tests.

    Scale shape: keys are computed JVM-side before the stateful op; state
    per shard is exactly n (id, weight, key) triples — the store grows
    with n_shards * n, never the stream. Rows with NULL or non-positive
    weight are dropped at the gate (same contract as the batch form).
    Output mode ``update``: each micro-batch re-emits the reservoirs of
    the shards it touched.
    """
    from clickhousedatamocker_spark.operators.corpus import _uniform_01_excl0

    w = F.col(weight_col).cast("double")
    keyed = docs.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard"),
        F.col(id_col).alias("doc_id"),
        w.alias("w"),
        (F.log(_uniform_01_excl0(F.col(id_col), salt)) / w).alias("aes_key"),
    ).filter(
        # same gate as the batch sampler, NaN included: a NaN weight
        # passes a bare `w > 0` and its NaN key breaks BOTH the Python
        # reservoir sort and the stream==batch law
        F.col("w").isNotNull() & ~F.isnan(F.col("w")) & (F.col("w") > 0)
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mk_reservoir(n),
        outputStructType=RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# exponentially time-decayed running stats over an unbounded stream (r9) —
# the streaming twin of operators/ema.py exponential_time_decayed. Keep the
# segmented-renormalization arithmetic in LOCKSTEP with the batch scan: the
# only structural difference is that the carry seeds from persisted state
# (the decayed values AT the key's last processed time) instead of zero.

ETD_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("t", DoubleType()),
        StructField("v", DoubleType()),
        StructField("etd_sum", DoubleType()),
        StructField("etd_count", DoubleType()),
        StructField("etd_avg", DoubleType()),
        StructField("etd_max", DoubleType()),
    ]
)

ETD_STATE_SCHEMA = StructType(
    [
        StructField("last_t", DoubleType()),
        StructField("s_sum", DoubleType()),
        StructField("s_cnt", DoubleType()),
        StructField("s_cntv", DoubleType()),
        StructField("s_max", DoubleType()),
        StructField("has_max", LongType()),  # 0/1 (no -inf through the store)
    ]
)

def _mk_decay(x: float):
    import math

    from clickhousedatamocker_spark.operators.ema import _make_decay_kernel

    # built ON THE DRIVER; the nested kernel is captured by value, so the
    # float math has exactly ONE copy (operators/ema.py) and executors
    # need no repo import
    kernel = _make_decay_kernel(x)

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        if state.exists:
            last_t, cs, cc, ccv, cm_raw, has_m = state.get
            cm = cm_raw if has_m else -math.inf
        else:
            last_t, cs, cc, ccv, cm = None, 0.0, 0.0, 0.0, -math.inf
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        t = pd.to_numeric(pdf["t"], errors="coerce").to_numpy("float64")
        v = pd.to_numeric(pdf["v"], errors="coerce").to_numpy("float64")
        order = np.argsort(t, kind="stable")
        t, v = t[order], v[order]
        null_t = np.isnan(t)
        valid = ~null_t
        if last_t is not None:
            # LATE rows (older than the key's processed frontier) are
            # dropped: their true frame excludes contributions the state
            # has already absorbed, so no exact answer exists with O(1)
            # state. Rows AT the frontier are fine (decay factor 1).
            valid &= t >= last_t
        tv, vv = t[valid], v[valid]
        m = len(tv)
        frames = []
        if m:
            carry_sum, carry_cnt, carry_cntv, carry_max = cs, cc, ccv, cm
            if last_t is not None:
                f = math.exp((last_t - tv[0]) / x)
                carry_sum, carry_cnt, carry_cntv = carry_sum * f, carry_cnt * f, carry_cntv * f
                carry_max = carry_max * f if math.isfinite(carry_max) else carry_max
            s_sum, s_cnt, s_cntv, s_max = kernel(
                tv, vv, carry_sum, carry_cnt, carry_cntv, carry_max
            )
            last = np.searchsorted(tv, tv, side="right") - 1
            o_sum, o_cnt, o_cntv, o_max = (
                s_sum[last], s_cnt[last], s_cntv[last], s_max[last],
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                o_avg = np.where(o_cntv > 0.0, o_sum / o_cntv, np.nan)
            state.update(
                (
                    float(tv[-1]),
                    float(s_sum[-1]),
                    float(s_cnt[-1]),
                    float(s_cntv[-1]),
                    float(s_max[-1]) if math.isfinite(s_max[-1]) else 0.0,
                    1 if math.isfinite(s_max[-1]) else 0,
                )
            )
            has_v = ~np.isnan(vv)
            frames.append(
                pd.DataFrame(
                    {
                        "key": [key[0]] * m,
                        "t": tv,
                        "v": [None if not has_v[i] else float(vv[i]) for i in range(m)],
                        "etd_sum": o_sum,
                        "etd_count": o_cnt,
                        "etd_avg": [None if np.isnan(o_avg[i]) else float(o_avg[i]) for i in range(m)],
                        "etd_max": [None if not math.isfinite(o_max[i]) else float(o_max[i]) for i in range(m)],
                    }
                )
            )
        n_null = int(null_t.sum())
        if n_null:
            # NULL-time rows come back with NULL outputs (batch parity —
            # only LATE rows are dropped); they touch no state
            vn = v[null_t]
            frames.append(
                pd.DataFrame(
                    {
                        "key": [key[0]] * n_null,
                        "t": [None] * n_null,
                        "v": [None if np.isnan(x_) else float(x_) for x_ in vn],
                        "etd_sum": [None] * n_null,
                        "etd_count": [None] * n_null,
                        "etd_avg": [None] * n_null,
                        "etd_max": [None] * n_null,
                    }
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return update


def stream_time_decayed(
    events: DataFrame,
    decay: float,
    value_col: str = "value",
    time_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """exponentialTimeDecayedSum/Count/Avg/Max over an UNBOUNDED stream:
    per-key decayed running stats at every event, exactly the batch
    operator's semantics as long as each key's events arrive in
    nondecreasing time order across micro-batches AND a key's time TIES
    land in the same micro-batch (rows inside one batch are sorted; a row
    older than the key's processed frontier is DROPPED — no exact answer
    exists for it with O(1) state, the same trade a watermark makes).
    Ties split across batches satisfy nondecreasing arrival but the
    earlier-arriving peer is emitted WITHOUT the later peer's
    contribution, while the batch operator's RANGE frame gives all
    time-tied peers identical outputs — so the stream==batch law needs
    the one-batch-per-tie condition (round-9 ADVICE).

    Scale shape: state per key is five doubles + a flag (the decayed
    values at the frontier) — the store grows with |keys|, never the
    stream; the per-batch math is the identical segmented-renormalization
    scan the batch operator runs, so unbounded time spans stay exact.
    stream == batch law (same rows, outputs equal to ~1e-12 rel — segment
    boundaries differ so the float association differs) pinned in
    tests/test_streaming.py.
    """
    x = float(decay)
    if not x > 0:
        raise ValueError(f"decay must be > 0, got {decay!r}")
    keyed = events.select(
        F.col(key_col).cast("long").alias("key"),
        F.unix_timestamp(F.col(time_col)).cast("double").alias("t")
        if dict(events.dtypes)[time_col].startswith("timestamp")
        else F.col(time_col).cast("double").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _mk_decay(x),
        outputStructType=ETD_OUTPUT_SCHEMA,
        stateStructType=ETD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
