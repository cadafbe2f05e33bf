"""ClickHouse exponential time-decay vocabulary, Spark-first.

Two public entry points, covering the CH surface the dialect layer used to
refuse (the round-8 verdict's task 4):

- :func:`exponential_moving_average` — CH ``exponentialMovingAverage(x)
  (value, time)`` (an AGGREGATE: base-2 half-life decay anchored at the
  group's latest time, normalized by the limit weight-sum of unit-spaced
  events).  Pure DataFrame two-pass: one window max + one aggregation on
  the same keys — scale-safe (no collected state, no Python).
- :func:`exponential_time_decayed` — CH ``exponentialTimeDecayedSum/
  Count/Avg/Max(x)(value, time) OVER (PARTITION BY k ORDER BY t)``
  (WINDOW functions: base-e decay relative to the CURRENT row's time,
  RANGE-frame semantics so time ties share a frame).  The per-row
  recurrence S_j = v_j + S_{j-1}·e^((t_{j-1}-t_j)/x) has no built-in
  window spelling that survives long time ranges (a global max-shift
  under/overflows once the span exceeds ~700·x), so this is an
  ``applyInPandas`` per-key vectorized scan with SEGMENTED
  renormalization: the sorted series is cut wherever the in-segment
  exponent would exceed ``_LOG_SPAN``, each segment uses its own start
  time as the exp reference (arguments bounded in [0, _LOG_SPAN]), and a
  single decayed carry links segments — exact up to one multiply per
  segment, O(n) work, O(1) extra state.

Reference semantics (public ClickHouse source/docs):

- ``exponentialMovingAverage``: state is Σ v_i·2^((t_i−T)/x) with
  T = max(t); the result divides by the closed-form weight sum of an
  infinite unit-spaced event stream Σ_{k≥0} 2^(−k/x) = 1/(1−2^(−1/x)), so

      EMA = (1 − 2^(−1/x)) · Σ v_i · 2^((t_i − T) / x)

  (CH docs example: value 1 at t=0 then nine 0s at t=1..9, x=1 →
  2^−10 = 0.0009765625 — pinned in tests/test_ema.py).
- ``exponentialTimeDecayed*`` at row j over the frame {i : t_i ≤ t_j}:
  Sum  = Σ v_i·e^((t_i−t_j)/x);  Count = Σ e^((t_i−t_j)/x)  (time-only);
  Avg  = Sum / (decayed count of contributing rows);
  Max  = max v_i·e^((t_i−t_j)/x).

Scale shape (100 TB): EMA is one exchange on the group keys (the window
max and the aggregation share the partitioning).  The decayed scan
shuffles once on the partition keys; per-task state is one key group's
series (the same contract every window function carries), Arrow-batched,
no Python per-row loop — segments are numpy slices and a series spawns a
new segment only every ``_LOG_SPAN·x`` time units.

Reference parity: docs/clickhouse exponentialMovingAverage +
exponentialTimeDecayed* (window-functions doc); no reference repo file —
this graduates the compat-layer gate flagged in round-8 VERDICT task 4.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Max exponent magnitude inside one renormalization segment. e^200 ≈ 7e86:
# cumulative sums stay far from the 1e308 overflow line even for huge
# segments, while contributions older than 200·x half-lives (< e^-200)
# are genuinely zero in double precision — cutting them loses nothing.
_LOG_SPAN = 200.0

_ETD_KINDS = ("sum", "count", "avg", "max")


def exponential_moving_average(
    df: DataFrame,
    half_life: float,
    value_col: str = "value",
    time_col: str = "t",
    group_cols: Sequence[str] = (),
    out_col: str = "ema",
) -> DataFrame:
    """CH ``exponentialMovingAverage(half_life)(value, time)`` per group.

    EMA = (1 − 2^(−1/x)) · Σ v_i·2^((t_i−T)/x), T = max(t) in the group.
    Rows with NULL value or time are skipped (CH aggregate NULL rule).

    Two-pass and scale-safe: grouped inputs take ONE exchange (the
    partition-max window and the aggregation share the hash partitioning
    on ``group_cols``); the global form fetches the scalar max to the
    driver (8 bytes) instead of forcing a single-partition window. The
    weight 2^((t−T)/x) ∈ (0, 1] by construction — underflow of ancient
    points is graceful, overflow impossible.
    """
    x = float(half_life)
    if not x > 0:
        raise ValueError(f"half_life must be > 0, got {half_life!r}")
    v = F.col(value_col).cast("double")
    t = F.col(time_col).cast("double")
    norm = 1.0 - 2.0 ** (-1.0 / x)
    # CH skips a row when ANY aggregate argument is NULL, so the anchor T
    # is the max time over rows that actually contribute (v non-NULL too)
    t_eff = F.when(v.isNotNull(), t)
    if group_cols:
        w = Window.partitionBy(*group_cols)
        with_t = df.withColumn("__ema_T", F.max(t_eff).over(w))
    else:
        t_max = df.agg(F.max(t_eff).alias("m")).first()["m"]  # driver-bounded scalar
        with_t = df.withColumn("__ema_T", F.lit(t_max).cast("double"))
    ema = (
        F.lit(norm)
        * F.sum(v * F.pow(F.lit(2.0), (t - F.col("__ema_T")) / F.lit(x)))
    ).alias(out_col)
    return with_t.groupBy(*[F.col(c) for c in group_cols]).agg(ema)


def ema_oracle_sql(
    half_life: float,
    value_expr: str = "value",
    time_expr: str = "t",
    group_by: str = "",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`exponential_moving_average` — keep in lockstep."""
    x = float(half_life)
    part = f"PARTITION BY {group_by}" if group_by else ""
    sel = f"{group_by}, " if group_by else ""
    grp = f"GROUP BY {group_by}" if group_by else ""
    return f"""
WITH __w AS (
  SELECT {sel}CAST({value_expr} AS DOUBLE) AS v, CAST({time_expr} AS DOUBLE) AS t,
         MAX(CASE WHEN {value_expr} IS NOT NULL
                  THEN CAST({time_expr} AS DOUBLE) END) OVER ({part}) AS tmax
  FROM {table}
)
SELECT {sel}(1 - pow(2, -1.0 / {x!r})) * SUM(v * pow(2, (t - tmax) / {x!r})) AS ema
FROM __w {grp}
""".strip()


def _etd_schema(df: DataFrame, outputs: Sequence[str], prefix: str) -> T.StructType:
    fields = list(df.schema.fields)
    for k in outputs:
        fields.append(T.StructField(f"{prefix}{k}", T.DoubleType(), True))
    return T.StructType(fields)


def _make_time_to_seconds():
    """Column → float64 seconds converter factory. NESTED so cloudpickle
    ships it BY VALUE inside executor closures (no repo import needed on a
    bare session). Timestamp columns arrive in pandas as datetime64[ns]:
    pd.to_numeric would silently yield NANOSECONDS (mis-scaling every
    decay) and map NaT to int64-min (a 'valid' time at -9.2e18) — the
    round-9 review finding. This converts datetimes to epoch SECONDS and
    NaT/unparseable to NaN."""

    def to_seconds(col):
        import numpy as np
        import pandas as pd

        if pd.api.types.is_datetime64_any_dtype(col):
            vals = col.to_numpy(dtype="datetime64[ns]")
            out = vals.view("int64").astype("float64") / 1e9
            out[np.isnat(vals)] = np.nan
            return out
        return pd.to_numeric(col, errors="coerce").to_numpy(dtype="float64")

    return to_seconds


def _make_decay_kernel(x: float):
    """Segmented-renormalization decayed-prefix kernel factory — THE single
    copy of the float math shared by the batch operator below and
    streaming/stateful.py stream_time_decayed (which seeds the carries
    from persisted state). NESTED so cloudpickle ships it by value.

    Input: time-sorted ``tv`` (no NaN), raw values ``vv`` (NaN = NULL),
    and the decayed carries AT ``tv[0]``'s reference. Output: per-row
    decayed (sum, count, value-count, max) arrays plus the same four
    carries at the LAST row's time (for streaming state)."""

    def kernel(tv, vv, carry_sum=0.0, carry_cnt=0.0, carry_cntv=0.0, carry_max=None):
        import math as _m

        import numpy as np

        log_span = 200.0 * x  # _LOG_SPAN — inlined: closure must be self-contained
        m = len(tv)
        has_v = ~np.isnan(vv)
        v0 = np.where(has_v, vv, 0.0)
        cm = -_m.inf if carry_max is None else carry_max
        s_sum = np.empty(m)
        s_cnt = np.empty(m)
        s_cntv = np.empty(m)  # decayed count of value-bearing rows (Avg denominator)
        s_max = np.empty(m)
        start = 0
        while start < m:
            end = int(np.searchsorted(tv, tv[start] + log_span, side="right"))
            a = np.exp((tv[start:end] - tv[start]) / x)
            s_sum[start:end] = (carry_sum + np.cumsum(v0[start:end] * a)) / a
            s_cnt[start:end] = (carry_cnt + np.cumsum(a)) / a
            s_cntv[start:end] = (
                carry_cntv + np.cumsum(np.where(has_v[start:end], a, 0.0))
            ) / a
            rm = np.maximum.accumulate(
                np.where(has_v[start:end], vv[start:end] * a, -_m.inf)
            )
            s_max[start:end] = np.maximum(cm, rm) / a
            if end < m:
                c = _m.exp((tv[end - 1] - tv[end]) / x)  # < 1 by construction
                carry_sum = s_sum[end - 1] * c
                carry_cnt = s_cnt[end - 1] * c
                carry_cntv = s_cntv[end - 1] * c
                cm = s_max[end - 1] * c
            start = end
        return s_sum, s_cnt, s_cntv, s_max

    return kernel


def exponential_time_decayed(
    df: DataFrame,
    decay: float,
    value_col: str = "value",
    time_col: str = "t",
    partition_cols: Sequence[str] = (),
    outputs: Sequence[str] = _ETD_KINDS,
    prefix: str = "etd_",
    key_buckets: int | None = None,
) -> DataFrame:
    """CH ``exponentialTimeDecayedSum/Count/Avg/Max(decay)(value, time)
    OVER (PARTITION BY partition_cols ORDER BY time_col)`` — appends one
    double column per requested kind to every input row.

    Frame semantics match CH's default RANGE UNBOUNDED PRECEDING TO
    CURRENT ROW: all rows with t_i ≤ t_j contribute, so TIME TIES SHARE
    their outputs (peer rows see the frame end).  NULL rules: a NULL time
    row gets NULL outputs and contributes nothing; a NULL value row still
    anchors its own frame (count includes it — CH Count is time-only) but
    adds nothing to sum/avg/max.

    Exactness: within a segment the decayed prefix is cumsum(v·a)/a_j with
    a_i = e^((t_i − s)/x) ∈ [1, e^_LOG_SPAN]; across segments one carry
    C' = S_last·e^((t_last − s')/x) (a factor < 1). Max commutes with the
    positive per-row scale 1/a_j, so the same machinery serves Max via
    maximum.accumulate. No Python-per-row work; one shuffle on
    ``hash(partition_cols) % key_buckets``.

    Dispatch shape (round-9 verdict task: per-GROUP Arrow dispatch over
    many small keys cost ~2.5 ms/key): keys are coalesced into
    ``key_buckets`` hash buckets (default 4× the session's shuffle
    partitions) and ONE ``applyInPandas`` call scans a whole bucket —
    key segments found by factorize+lexsort, the numpy kernel runs per
    segment (microseconds), one pandas frame built per BUCKET, not per
    key. Memory contract: a bucket (not a key) must fit one executor's
    Arrow batch — raise ``key_buckets`` for very fat corpora; a single
    giant key is one group either way (the window-function contract).
    """
    import numpy as np
    import pandas as pd

    x = float(decay)
    if not x > 0:
        raise ValueError(f"decay must be > 0, got {decay!r}")
    bad = [k for k in outputs if k not in _ETD_KINDS]
    if bad:
        raise ValueError(f"unknown outputs {bad}; choose from {_ETD_KINDS}")
    if not partition_cols:
        raise ValueError(
            "partition_cols is required: an unpartitioned decayed scan is a "
            "single-task series — window semantics demand a PARTITION BY at "
            "scale (add a constant column deliberately if you mean it)"
        )
    if "__etd_bucket" in df.columns:
        raise ValueError("column name __etd_bucket is reserved by this operator")
    outputs = tuple(outputs)
    schema = _etd_schema(df, outputs, prefix)
    value_name, time_name = value_col, time_col
    key_names = list(partition_cols)
    kernel = _make_decay_kernel(x)  # nested fn: pickled by value
    to_seconds = _make_time_to_seconds()
    if key_buckets is None:
        try:
            key_buckets = 4 * int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            key_buckets = 128
    nb = max(1, int(key_buckets))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        t_raw = to_seconds(pdf[time_name])
        v_raw = pd.to_numeric(pdf[value_name], errors="coerce").to_numpy(dtype="float64")
        # one integer code per key tuple (NULL keys are a group of their own)
        codes = pdf.groupby(key_names, dropna=False, sort=False).ngroup().to_numpy()
        # stable sort by (key, time); NaN times sort last within their key
        order = np.lexsort((t_raw, codes))
        t = t_raw[order]
        v = v_raw[order]
        c = codes[order]
        res = {k: np.full(n, np.nan) for k in outputs}
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        bounds = np.r_[starts, n]
        for gi in range(len(starts)):
            i0, i1 = int(bounds[gi]), int(bounds[gi + 1])
            tg = t[i0:i1]
            m = int(np.searchsorted(np.isnan(tg), True))  # NaNs are the tail
            if not m:
                continue
            tv, vv = tg[:m], v[i0 : i0 + m]
            s_sum, s_cnt, s_cntv, s_max = kernel(tv, vv)
            # RANGE frame: every time-tie reads the value at its last peer
            last = np.searchsorted(tv, tv, side="right") - 1
            if "sum" in res:
                res["sum"][i0 : i0 + m] = s_sum[last]
            if "count" in res:
                res["count"][i0 : i0 + m] = s_cnt[last]
            if "avg" in res:
                with np.errstate(invalid="ignore", divide="ignore"):
                    res["avg"][i0 : i0 + m] = np.where(
                        s_cntv[last] > 0.0, s_sum[last] / s_cntv[last], np.nan
                    )
            if "max" in res:
                mx = s_max[last]
                res["max"][i0 : i0 + m] = np.where(np.isfinite(mx), mx, np.nan)
        out = pdf.iloc[order].reset_index(drop=True).drop(columns=["__etd_bucket"])
        for k in outputs:
            # nullable Float64 so a NaN (NULL-time row, empty max/avg frame)
            # round-trips to a true SQL NULL, not the double NaN value
            col = pd.array(res[k], dtype="Float64")
            col[np.isnan(res[k])] = pd.NA
            out[f"{prefix}{k}"] = col
        return out

    bucketed = df.withColumn(
        "__etd_bucket",
        F.pmod(F.hash(*[F.col(k) for k in key_names]), F.lit(nb)),
    )
    return bucketed.groupBy("__etd_bucket").applyInPandas(scan, schema)


def etd_oracle_sql(
    decay: float,
    value_expr: str = "value",
    time_expr: str = "t",
    partition_by: str = "user_id",
    table: str = "events",
    prefix: str = "etd_",
) -> str:
    """DuckDB O(n²)-self-join twin of :func:`exponential_time_decayed`
    (test-scale only — the definition, not the algorithm)."""
    x = float(decay)
    return f"""
WITH __e AS (
  SELECT {partition_by} AS pk, CAST({value_expr} AS DOUBLE) AS v,
         CAST({time_expr} AS DOUBLE) AS t,
         ROW_NUMBER() OVER (PARTITION BY {partition_by} ORDER BY {time_expr}) AS rn
  FROM {table} WHERE {time_expr} IS NOT NULL
)
SELECT a.pk, a.rn, a.t, a.v,
  SUM(b.v * exp((b.t - a.t) / {x!r})) AS {prefix}sum,
  SUM(exp((b.t - a.t) / {x!r})) AS {prefix}count,
  SUM(b.v * exp((b.t - a.t) / {x!r}))
    / SUM(CASE WHEN b.v IS NOT NULL THEN exp((b.t - a.t) / {x!r}) END) AS {prefix}avg,
  MAX(b.v * exp((b.t - a.t) / {x!r})) AS {prefix}max
FROM __e a JOIN __e b ON b.pk = a.pk AND b.t <= a.t
GROUP BY a.pk, a.rn, a.t, a.v
""".strip()
