"""seriesDecomposeSTL — the round-10 graduation of the last gated CH
analytics family (functions/stl.py, a faithful numpy port of Cleveland et
al. 1990; CH wraps ankane/stl-cpp, a port of the same Fortran).

What is testable EXACTLY: the decomposition identity (residue is defined
by subtraction). What is testable as a LAW: recovery of planted structure
(a sinusoidal seasonal + a linear trend), seasonal periodicity, and
robustness to outliers. Bit parity with stl-cpp is NOT asserted — LOESS
accumulation order differs across ports (documented in the module)."""

import math

import numpy as np
import pytest

from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.functions.stl import stl_decompose


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh_stl")))


def _planted(n=120, period=12, noise=0.05, seed=7):
    rng = np.random.default_rng(seed)
    x = np.arange(n)
    trend = 0.05 * x + 2.0
    seasonal = 1.5 * np.sin(2 * math.pi * x / period)
    return trend + seasonal + noise * rng.standard_normal(n), trend, seasonal


def test_decomposition_identity():
    y, _, _ = _planted()
    s, t, r = stl_decompose(y, 12)
    # residue is defined as y - s - t; re-adding differs from y only by
    # one float64 add/sub association per element
    assert np.allclose(s + t + r, y, rtol=0, atol=1e-12)
    # and the residue array ITSELF is the exact subtraction
    assert np.array_equal(r, y - s - t)


def test_recovers_planted_trend_and_seasonal():
    y, trend, seasonal = _planted()
    s, t, r = stl_decompose(y, 12)
    # seasonal tracks the planted sinusoid
    corr_s = np.corrcoef(s, seasonal)[0, 1]
    assert corr_s > 0.98, f"seasonal corr {corr_s}"
    # trend tracks the planted line (compare away from the edges)
    sl = slice(12, -12)
    corr_t = np.corrcoef(t[sl], trend[sl])[0, 1]
    assert corr_t > 0.99, f"trend corr {corr_t}"
    # residue is small relative to the signal
    assert np.std(r) < 0.25 * np.std(y)


def test_seasonal_is_periodic():
    y, _, _ = _planted(noise=0.0)
    s, _, _ = stl_decompose(y, 12)
    # one period apart the seasonal component repeats (slow drift allowed)
    d = np.abs(s[12:] - s[:-12])
    assert np.median(d) < 0.1


def test_robust_mode_shrugs_off_an_outlier():
    y, trend, _ = _planted(noise=0.0)
    y2 = y.copy()
    y2[60] += 25.0  # a huge spike
    _, t_plain, _ = stl_decompose(y2, 12)
    _, t_rob, _ = stl_decompose(y2, 12, robust=True)
    sl = slice(54, 67)
    err_plain = np.abs(t_plain[sl] - trend[sl]).max()
    err_rob = np.abs(t_rob[sl] - trend[sl]).max()
    assert err_rob < err_plain, (err_rob, err_plain)
    assert err_rob < 1.0


def test_refusals_match_ch_contract():
    with pytest.raises(ValueError, match="period"):
        stl_decompose([1.0, 2.0, 3.0, 4.0], 1)
    with pytest.raises(ValueError, match="length"):
        stl_decompose([1.0, 2.0, 3.0], 2)
    with pytest.raises(ValueError, match="finite"):
        stl_decompose([1.0, float("nan"), 3.0, 4.0], 2)


def test_dialect_spelling_end_to_end(eng):
    """The CH spelling through the dialect layer: four Float32 arrays
    (seasonal, trend, residue, baseline), identity holds at float32
    precision, NULL series → NULL."""
    n, period = 48, 12
    series = [
        round(0.1 * i + math.sin(2 * math.pi * i / period), 6) for i in range(n)
    ]
    lit = "array(" + ", ".join(f"{v}D" for v in series) + ")"
    row = eng.sql(f"SELECT seriesDecomposeSTL({lit}, {period}) AS d").collect()[0]
    d = row["d"]
    assert len(d) == 4 and all(len(part) == n for part in d)
    s, t, r, b = (np.asarray(part, dtype=np.float64) for part in d)
    assert np.allclose(s + t + r, series, atol=1e-4)  # float32 round-trip
    assert np.allclose(b, s + t, atol=1e-4)
    null_row = eng.sql(
        f"SELECT seriesDecomposeSTL(CAST(NULL AS ARRAY<DOUBLE>), {period}) AS d"
    ).collect()[0]
    assert null_row["d"] is None


def test_series_decompose_profile_registry_slot(spark):
    """r11: the STL surface under the driver's rows-only smoke discipline —
    stable schema, one row per event_type, the decomposition identity
    holding on real data (bit parity with stl-cpp stays out of the hash
    window by design; see the module docstring)."""
    from clickhousedatamocker_spark.queries import REGISTRY

    spec = REGISTRY["series_decompose_profile"]
    assert spec.oracle is None  # rows-only by design
    df = spec.fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns == [
        "event_type", "n_points", "seasonal_amplitude",
        "trend_range", "resid_rms", "identity_ok",
    ]
    assert len(rows) == 5 and all(r["identity_ok"] for r in rows)
    assert all(r["n_points"] >= 14 for r in rows)  # >= 2 periods of 7
