"""STL — Seasonal-Trend decomposition using LOESS (Cleveland, Cleveland,
McRae & Terpenning 1990, "STL: A Seasonal-Trend Decomposition Procedure
Based on Loess", Journal of Official Statistics 6(1)).

A faithful numpy port of the original procedure, built for the
``seriesDecomposeSTL(series, period)`` ClickHouse spelling (CH wraps
ankane/stl-cpp, itself a port of the same Fortran): cycle-subseries LOESS
smoothing → low-pass (two period-MAs + a 3-MA + LOESS) → deseasonalized
trend LOESS, iterated, with optional bisquare robustness weights.

Parity contract (SURVEY round-10 decision on the round-9 verdict's task):
the DECOMPOSITION IDENTITY seasonal + trend + residue == input holds
exactly (the residue is defined by subtraction), the planted-structure
recovery laws are pinned in tests/test_stl.py, and the default parameters
match the statsmodels/stl-cpp lineage (seasonal=7, trend = smallest odd
>= ceil(1.5·p / (1 − 1.5/seasonal)), low-pass = smallest odd > period,
degree 1 everywhere, 2 inner passes). BIT parity with stl-cpp's floats is
NOT guaranteed — LOESS accumulation order differs across ports — which is
why the dialect surface stays out of the hash-graded window and is
golden-tested on recovery laws instead.
"""

from __future__ import annotations

import numpy as np


def _next_odd(x: float) -> int:
    n = int(np.ceil(x))
    return n if n % 2 == 1 else n + 1


def _tricube(u: np.ndarray) -> np.ndarray:
    w = np.clip(1.0 - np.abs(u) ** 3, 0.0, None)
    return w ** 3


def _loess_fit(
    x: np.ndarray,
    y: np.ndarray,
    x_eval: np.ndarray,
    q: int,
    degree: int,
    rw: np.ndarray | None = None,
) -> np.ndarray:
    """Classic LOESS: at each eval point, tricube-weighted degree-0/1 fit
    over the q nearest observations (q > n extends the bandwidth by the
    paper's (q/n) distance inflation). O(n_eval · n) numpy ops — per-row
    series, not corpus-scale work."""
    n = len(x)
    out = np.empty(len(x_eval))
    for i, xe in enumerate(x_eval):
        d = np.abs(x - xe)
        if q < n:
            r = np.partition(d, q - 1)[q - 1]
        else:
            r = d.max() * q / max(n, 1)
        w = _tricube(d / max(r, 1e-12))
        if rw is not None:
            w = w * rw
        sw = w.sum()
        if sw <= 0:
            # all weights vanished (can only happen under extreme
            # robustness downweighting) — fall back to the plain mean
            out[i] = y.mean()
            continue
        if degree == 0:
            out[i] = (w * y).sum() / sw
        else:
            xm = (w * x).sum() / sw
            ym = (w * y).sum() / sw
            dxw = x - xm
            den = (w * dxw * dxw).sum()
            if den <= 1e-12 * max(1.0, (x * x).max()):
                out[i] = ym
            else:
                b = (w * dxw * (y - ym)).sum() / den
                out[i] = ym + b * (xe - xm)
    return out


def _moving_average(y: np.ndarray, width: int) -> np.ndarray:
    """Simple centered MA of the given width; output length n−width+1."""
    c = np.cumsum(np.concatenate(([0.0], y)))
    return (c[width:] - c[:-width]) / width


def stl_decompose(
    y,
    period: int,
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    seasonal_deg: int = 1,
    trend_deg: int = 1,
    low_pass_deg: int = 1,
    inner: int = 2,
    outer: int = 0,
    robust: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decompose ``y`` into (seasonal, trend, residue). Residue is defined
    as ``y − seasonal − trend`` so the identity holds exactly.

    Refusals mirror CH's: period must be >= 2 and the series must hold at
    least two full periods (stl-cpp's "series is too short" contract)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    period = int(period)
    if period < 2:
        raise ValueError(f"seriesDecomposeSTL: period must be >= 2, got {period}")
    if n < 2 * period:
        raise ValueError(
            f"seriesDecomposeSTL: series length {n} must be >= 2 * period ({2 * period})"
        )
    if not np.all(np.isfinite(y)):
        raise ValueError("seriesDecomposeSTL: series must be finite (no NULL/NaN/Inf)")
    seasonal = max(3, _next_odd(seasonal))
    if trend is None:
        trend = _next_odd(1.5 * period / (1.0 - 1.5 / seasonal))
    trend = max(3, _next_odd(trend))
    if low_pass is None:
        low_pass = _next_odd(period + 1)
    low_pass = max(3, _next_odd(low_pass))
    if robust and outer == 0:
        outer = 10

    x = np.arange(n, dtype=np.float64)
    trend_fit = np.zeros(n)
    season = np.zeros(n)
    rw: np.ndarray | None = None
    for _ in range(outer + 1):
        for _ in range(max(1, inner)):
            # 1. detrend
            detr = y - trend_fit
            # 2. cycle-subseries smoothing, extended one period each side
            c = np.empty(n + 2 * period)
            for k in range(period):
                idx = np.arange(k, n, period, dtype=np.int64)
                sub = detr[idx]
                xs = np.arange(len(sub), dtype=np.float64)
                xe = np.arange(-1, len(sub) + 1, dtype=np.float64)
                sub_rw = rw[idx] if rw is not None else None
                fit = _loess_fit(xs, sub, xe, seasonal, seasonal_deg, sub_rw)
                c[k::period] = fit[: (n + 2 * period - k + period - 1) // period]
            # 3. low-pass filter of the extended subseries means:
            #    MA(period) twice + MA(3) (length back to n), then LOESS
            lp = _moving_average(_moving_average(_moving_average(c, period), period), 3)
            lfit = _loess_fit(x, lp, x, low_pass, low_pass_deg, None)
            # 4. detrended seasonal
            season = c[period : period + n] - lfit
            # 5. deseasonalize, 6. trend LOESS
            trend_fit = _loess_fit(x, y - season, x, trend, trend_deg, rw)
        resid = y - season - trend_fit
        if outer:
            # bisquare robustness weights from the residual spread
            h = 6.0 * np.median(np.abs(resid))
            if h <= 0:
                rw = np.ones(n)
            else:
                u = np.clip(np.abs(resid) / h, 0.0, 1.0)
                rw = (1.0 - u * u) ** 2
    resid = y - season - trend_fit
    return season, trend_fit, resid
