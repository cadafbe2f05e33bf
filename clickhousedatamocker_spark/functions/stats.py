"""Statistical special functions behind the CH hypothesis-test dialect
(batch 23): studentTTest / welchTTest / meanZTest / mannWhitneyUTest /
kolmogorovSmirnovTest / minSampleSize* / largestTriangleThreeBuckets.

The test STATISTICS are exact SQL aggregates (compat.py assembles them
from avg/var_samp/count over per-group CASE projections — algebraic,
distribution-friendly, no collected state). What SQL cannot spell is the
p-VALUE distributions; those live here as tiny Arrow-batched scalar UDFs
evaluated once per GROUP (not per row):

- Student-t two-sided p via the regularized incomplete beta function
  I_x(a, b) — Lentz-style continued fraction (Numerical Recipes §6.4's
  classic public formulation; 2·SF(|t|, ν) = I_{ν/(ν+t²)}(ν/2, ½)).
- Normal tail via math.erfc.
- Inverse normal CDF via Acklam's rational approximation (|ε| < 1.15e-9,
  the widely published constants) — used DRIVER-side by the
  minSampleSize* rewrites, whose arguments are literals.
- Kolmogorov distribution Q(λ) = 2 Σ (-1)^{j-1} e^{-2j²λ²}.

Rank statistics (Mann–Whitney U, two-sample KS D) cannot decompose into
bounded aggregation state — ClickHouse's own implementations hold every
sample value in the aggregate state too — so those rewrite to
collect_list + one Arrow UDF per group; per-group memory is O(group
rows), documented at the rewrite site.

largestTriangleThreeBuckets is the standard LTTB downsampling sweep
(Steinarsson 2013) over the x-sorted collected series.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# special functions (pure python; scalar — callers are per-group)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 3e-15:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def student_t_two_sided_p(t: float, df: float) -> float:
    """P(|T| >= |t|) for T ~ Student-t(df): I_{df/(df+t²)}(df/2, 1/2)."""
    if not (math.isfinite(t) and df > 0):
        return float("nan")
    return betainc_reg(df / 2.0, 0.5, df / (df + t * t))


def normal_two_sided_p(z: float) -> float:
    """P(|Z| >= |z|) for Z ~ N(0,1) = erfc(|z|/√2)."""
    if not math.isfinite(z):
        return float("nan")
    return math.erfc(abs(z) / math.sqrt(2.0))


# Acklam's inverse-normal rational approximation (widely published
# constants; |relative error| < 1.15e-9 over (0, 1))
_ACK_A = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
          1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
_ACK_B = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
          6.680131188771972e01, -1.328068155288572e01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
          -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
          3.754408661907416e00)


def inv_normal_cdf(p: float) -> float:
    """Φ⁻¹(p) via Acklam's approximation."""
    if not (0.0 < p < 1.0):
        raise ValueError(f"inv_normal_cdf needs p in (0,1), got {p}")
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D
    p_low, p_high = 0.02425, 1.0 - 0.02425
    if p < p_low:
        q = math.sqrt(-2.0 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    if p > p_high:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    )


def kolmogorov_q(lam: float) -> float:
    """Asymptotic Kolmogorov tail Q(λ) = 2 Σ_{j≥1} (-1)^{j-1} e^{-2j²λ²}."""
    if lam <= 0.0:
        return 1.0
    s = 0.0
    for j in range(1, 101):
        term = math.exp(-2.0 * j * j * lam * lam)
        s += term if j % 2 == 1 else -term
        if term < 1e-16:
            break
    return min(1.0, max(0.0, 2.0 * s))


# ---------------------------------------------------------------------------
# rank statistics over one collected group


def _avg_ranks(vals: np.ndarray) -> tuple[np.ndarray, float]:
    """Average (midrank) ranks 1..n and the tie-correction sum Σ(t³ - t)."""
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals), dtype=np.float64)
    tie_sum = 0.0
    i = 0
    sv = vals[order]
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        ranks[order[i : j + 1]] = avg
        t = j - i + 1
        if t > 1:
            tie_sum += t**3 - t
        i = j + 1
    return ranks, tie_sum


def mann_whitney_u(
    vals: np.ndarray, groups: np.ndarray, continuity: bool = True
) -> tuple[float, float]:
    """Two-sided Mann–Whitney: U of the index-0 sample + the tie-corrected
    normal-approximation p. ``continuity`` applies the 0.5 continuity
    correction toward the mean (ClickHouse's default,
    continuity_correction=1)."""
    g0 = groups == 0
    n0, n1 = int(g0.sum()), int((~g0).sum())
    if n0 == 0 or n1 == 0:
        return float("nan"), float("nan")
    ranks, tie_sum = _avg_ranks(vals)
    r0 = float(ranks[g0].sum())
    u = r0 - n0 * (n0 + 1) / 2.0
    n = n0 + n1
    mu = n0 * n1 / 2.0
    var = n0 * n1 / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    if var <= 0:
        return u, 1.0
    num = u - mu
    if continuity and num != 0.0:
        num -= 0.5 * math.copysign(1.0, num)
    z = num / math.sqrt(var)
    return u, normal_two_sided_p(z)


# Cap for the exact two-sample KS DP: the big-integer lattice-path count
# is O(n0·n1) additions of ~(n0+n1)·log10(2)-digit integers — exact and
# fast to ~1000 pooled samples, then cost grows cubically. ClickHouse's
# 'exact'/'auto' switch covers larger n with a different recursion; past
# the cap this implementation REFUSES loudly rather than approximating
# (recipe: use 'asymptotic' — at n0+n1 > 1000 the Stephens-adjusted tail
# and the exact tail agree to ~3 decimals anyway).
_KS_EXACT_CAP = 1000


def ks_exact_p(n0: int, n1: int, h: int) -> float:
    """Exact two-sample KS tail P(D ≥ h/(n0·n1)) under H0 for TIE-FREE
    samples (Hodges 1958): count monotone lattice paths (0,0)→(n0,n1)
    whose every vertex keeps |i·n1 − j·n0| < h, all in Python big-int
    arithmetic (no float error); p = 1 − inside/C(n0+n1, n0)."""
    from math import comb

    if h <= 0:
        return 1.0
    col = [0] * (n1 + 1)
    col[0] = 1
    for j in range(1, n1 + 1):
        col[j] = col[j - 1] if j * n0 < h else 0
    for i in range(1, n0 + 1):
        nxt = [col[0] if i * n1 < h else 0]
        for j in range(1, n1 + 1):
            if abs(i * n1 - j * n0) < h:
                nxt.append(nxt[j - 1] + col[j])
            else:
                nxt.append(0)
        col = nxt
    return min(1.0, max(0.0, 1.0 - col[n1] / comb(n0 + n1, n0)))


def ks_two_sample(
    vals: np.ndarray, groups: np.ndarray, method: str = "asymptotic"
) -> tuple[float, float]:
    """Two-sample KS: exact D (integer arithmetic: D = h/(n0·n1) with
    h = max|c0·n1 − c1·n0| over pooled points), and a p-value per
    ``method``:

    - ``asymptotic`` — Kolmogorov tail with the Stephens small-sample
      adjustment λ = (√nₑ + 0.12 + 0.11/√nₑ)·D (Numerical Recipes §14.3).
    - ``exact`` — the Hodges lattice DP (tie-free only, n0+n1 ≤ 1000;
      refuses loudly otherwise: ties break the distribution-free exact
      null — R and SciPy refuse the same way rather than drift).
    - ``auto`` — exact when it applies (tie-free, under the cap), else
      the asymptotic tail (CH's 'auto' spirit: exact where affordable).
    """
    g0 = groups == 0
    x0 = np.sort(vals[g0])
    x1 = np.sort(vals[~g0])
    n0, n1 = len(x0), len(x1)
    if n0 == 0 or n1 == 0:
        return float("nan"), float("nan")
    pooled = np.concatenate([x0, x1])
    c0 = np.searchsorted(x0, pooled, side="right").astype(np.int64)
    c1 = np.searchsorted(x1, pooled, side="right").astype(np.int64)
    h = int(np.abs(c0 * n1 - c1 * n0).max())
    d = h / (n0 * n1)
    if method in ("exact", "auto"):
        ties = len(np.unique(pooled)) < n0 + n1
        fits = n0 + n1 <= _KS_EXACT_CAP
        if method == "exact":
            if not fits:
                raise NotImplementedError(
                    f"kolmogorovSmirnovTest 'exact': n0+n1 = {n0 + n1} exceeds "
                    f"the big-int DP cap ({_KS_EXACT_CAP}) - use 'asymptotic' "
                    f"(the Stephens tail agrees to ~3 decimals at this size)"
                )
            if ties:
                raise NotImplementedError(
                    "kolmogorovSmirnovTest 'exact': pooled samples contain "
                    "ties, which break the distribution-free exact null - "
                    "use 'asymptotic' (R and SciPy refuse the same way)"
                )
            return d, ks_exact_p(n0, n1, h)
        if fits and not ties:
            return d, ks_exact_p(n0, n1, h)
    elif method != "asymptotic":
        raise NotImplementedError(
            f"kolmogorovSmirnovTest: unknown computation method {method!r}"
        )
    ne = n0 * n1 / (n0 + n1)
    sq = math.sqrt(ne)
    return d, kolmogorov_q((sq + 0.12 + 0.11 / sq) * d)


def rank_corr(xs: np.ndarray, ys: np.ndarray) -> float:
    """Spearman rank correlation (CH ``rankCorr``): Pearson correlation of
    the midrank-tied ranks. Degenerate inputs (n < 2, zero rank variance
    on either side) yield nan."""
    if len(xs) < 2:
        return float("nan")
    rx, _ = _avg_ranks(xs)
    ry, _ = _avg_ranks(ys)
    sx, sy = rx.std(), ry.std()
    if sx == 0.0 or sy == 0.0:
        return float("nan")
    return float(((rx - rx.mean()) * (ry - ry.mean())).mean() / (sx * sy))


def one_way_anova(vals: np.ndarray, groups: np.ndarray) -> tuple[float, float]:
    """One-way ANOVA (CH ``analysisOfVariance``): F = (SSB/(k−1)) /
    (SSW/(N−k)) over the observed group labels, p = P(F_{k−1,N−k} > F)
    via the regularized incomplete beta (betainc_reg(d2/2, d1/2,
    d2/(d1·F + d2))). Degenerate inputs (k < 2, N ≤ k, zero
    within-group variance) yield (nan, nan) rather than aborting."""
    uniq = np.unique(groups)
    k, n = len(uniq), len(vals)
    if k < 2 or n <= k:
        return float("nan"), float("nan")
    grand = float(vals.mean())
    ssb = ssw = 0.0
    for g in uniq:
        x = vals[groups == g]
        m = float(x.mean())
        ssb += len(x) * (m - grand) ** 2
        ssw += float(((x - m) ** 2).sum())
    d1, d2 = k - 1, n - k
    if ssw <= 0.0:
        return float("nan"), float("nan")
    f = (ssb / d1) / (ssw / d2)
    p = betainc_reg(d2 / 2.0, d1 / 2.0, d2 / (d1 * f + d2))
    return f, min(1.0, max(0.0, p))


def lttb(xs: np.ndarray, ys: np.ndarray, n_out: int) -> list[tuple[float, float]]:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013):
    keep the endpoints, split the interior into n_out-2 buckets, and from
    each bucket keep the point forming the largest triangle with the
    previously kept point and the next bucket's average."""
    n = len(xs)
    if n_out >= n:
        return [(float(x), float(y)) for x, y in zip(xs, ys)]
    if n_out < 3:
        ends = [(float(xs[0]), float(ys[0])), (float(xs[-1]), float(ys[-1]))]
        return ends[: max(n_out, 0)]
    out = [(float(xs[0]), float(ys[0]))]
    bounds = np.linspace(1, n - 1, n_out - 1).astype(int)  # n_out-2 buckets
    a = 0
    for b in range(n_out - 2):
        lo, hi = bounds[b], bounds[b + 1]
        nxt_lo, nxt_hi = bounds[b + 1], (bounds[b + 2] if b + 2 < len(bounds) else n)
        avg_x = float(xs[nxt_lo:nxt_hi].mean()) if nxt_hi > nxt_lo else float(xs[-1])
        avg_y = float(ys[nxt_lo:nxt_hi].mean()) if nxt_hi > nxt_lo else float(ys[-1])
        ax, ay = float(xs[a]), float(ys[a])
        seg_x, seg_y = xs[lo:hi], ys[lo:hi]
        area = np.abs((ax - avg_x) * (seg_y - ay) - (ax - seg_x) * (avg_y - ay))
        best = int(area.argmax())
        a = lo + best
        out.append((float(xs[a]), float(ys[a])))
    out.append((float(xs[-1]), float(ys[-1])))
    return out


# ---------------------------------------------------------------------------
# Arrow UDF registration (per-GROUP evaluation sites)


def register_stats_functions(spark: SparkSession) -> None:
    @pandas_udf("double")
    def ch_student_t_p(t: pd.Series, df: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if tv is None or dv is None
                else student_t_two_sided_p(float(tv), float(dv))
                for tv, dv in zip(t, df)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def ch_normal_2p(z: pd.Series) -> pd.Series:
        return pd.Series(
            [None if zv is None else normal_two_sided_p(float(zv)) for zv in z],
            dtype="float64",
        )

    @pandas_udf("u_statistic double, p_value double")
    def ch_mann_whitney(pairs: pd.Series, cc: pd.Series) -> pd.DataFrame:
        us, ps = [], []
        for arr, cont in zip(pairs, cc):
            if arr is None or len(arr) == 0:
                us.append(None), ps.append(None)
                continue
            vals = np.array([e["v"] for e in arr], dtype=np.float64)
            grp = np.array([e["g"] for e in arr], dtype=np.int64)
            u, p = mann_whitney_u(vals, grp, continuity=bool(cont))
            us.append(u), ps.append(p)
        return pd.DataFrame({"u_statistic": us, "p_value": ps})

    @pandas_udf("d_statistic double, p_value double")
    def ch_ks_test(pairs: pd.Series, method: pd.Series) -> pd.DataFrame:
        ds, ps = [], []
        for arr, m in zip(pairs, method):
            if arr is None or len(arr) == 0:
                ds.append(None), ps.append(None)
                continue
            vals = np.array([e["v"] for e in arr], dtype=np.float64)
            grp = np.array([e["g"] for e in arr], dtype=np.int64)
            d, p = ks_two_sample(vals, grp, method=str(m))
            ds.append(d), ps.append(p)
        return pd.DataFrame({"d_statistic": ds, "p_value": ps})

    @pandas_udf("array<struct<x: double, y: double>>")
    def ch_lttb(points: pd.Series, n: pd.Series) -> pd.Series:
        out = []
        for arr, nv in zip(points, n):
            if arr is None:
                out.append(None)
                continue
            xs = np.array([e["x"] for e in arr], dtype=np.float64)
            ys = np.array([e["y"] for e in arr], dtype=np.float64)
            out.append(
                [{"x": x, "y": y} for x, y in lttb(xs, ys, int(nv))]
            )
        return pd.Series(out)

    @pandas_udf("f_statistic double, p_value double")
    def ch_anova(pairs: pd.Series) -> pd.DataFrame:
        fs, ps = [], []
        for arr in pairs:
            if arr is None or len(arr) == 0:
                fs.append(None), ps.append(None)
                continue
            vals = np.array([e["v"] for e in arr], dtype=np.float64)
            grp = np.array([e["g"] for e in arr], dtype=np.int64)
            f, p = one_way_anova(vals, grp)
            fs.append(None if math.isnan(f) else f)
            ps.append(None if math.isnan(p) else p)
        return pd.DataFrame({"f_statistic": fs, "p_value": ps})

    @pandas_udf("double")
    def ch_rank_corr(pairs: pd.Series) -> pd.Series:
        out = []
        for arr in pairs:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            xs = np.array([e["x"] for e in arr], dtype=np.float64)
            ys = np.array([e["y"] for e in arr], dtype=np.float64)
            r = rank_corr(xs, ys)
            out.append(None if math.isnan(r) else r)
        return pd.Series(out, dtype="float64")

    spark.udf.register("chRankCorr", ch_rank_corr)
    spark.udf.register("chANOVA", ch_anova)
    spark.udf.register("chStudentTP", ch_student_t_p)
    spark.udf.register("chNormal2P", ch_normal_2p)
    spark.udf.register("chMannWhitneyU", ch_mann_whitney)
    spark.udf.register("chKSTest", ch_ks_test)
    spark.udf.register("chLTTB", ch_lttb)


# ---------------------------------------------------------------------------
# categorical-association family (batch 25): Cramér's V (plain and
# Bergsma-bias-corrected) and Theil's U over one collected group — the same
# O(group) aggregate state the native implementations hold.


def _chi2_table(pairs: list[tuple]) -> tuple[float, int, int, int]:
    """(chi², r, c, n) of the (a, b) contingency table, via the
    observed-cells identity chi² = n·Σ_observed o²/(nₐ·n_b) − n — exactly
    the full-r×c chi² INCLUDING zero cells (they enter through the −n
    term), without materializing the r×c product (which is a 10¹⁰-step
    Python loop on two 100k-cardinality columns)."""
    from collections import Counter

    n = len(pairs)
    joint = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    chi2 = n * sum(o * o / (ca[a] * cb[b]) for (a, b), o in joint.items()) - n
    return chi2, len(ca), len(cb), n


def cramers_v(pairs: list[tuple], bias_corrected: bool) -> float:
    """Cramér's V from the (a, b) contingency table; the corrected form is
    Bergsma 2013's φ²/df adjustment (the one ClickHouse ships as
    cramersVBiasCorrected)."""
    if not pairs:
        return float("nan")
    chi2, r, c, n = _chi2_table(pairs)
    if r < 2 or c < 2:
        return float("nan")
    if not bias_corrected:
        return math.sqrt(chi2 / (n * (min(r, c) - 1)))
    if n <= 1:
        return float("nan")
    phi2 = chi2 / n
    phi2c = max(0.0, phi2 - (r - 1) * (c - 1) / (n - 1))
    rc = r - (r - 1) ** 2 / (n - 1)
    cc = c - (c - 1) ** 2 / (n - 1)
    denom = min(rc, cc) - 1
    if denom <= 0:
        return float("nan")
    return math.sqrt(phi2c / denom)


def contingency_coefficient(pairs: list[tuple]) -> float:
    """Pearson's contingency coefficient C = sqrt(chi² / (chi² + n))."""
    if not pairs:
        return float("nan")
    chi2, _, _, n = _chi2_table(pairs)
    return math.sqrt(chi2 / (chi2 + n))


def theils_u(pairs: list[tuple]) -> float:
    """Theil's U for (x, y) pairs, with CLICKHOUSE'S SIGN CONVENTION: its
    implementation divides by Σp·log p (which is NEGATIVE), so real
    ClickHouse returns the NEGATED textbook uncertainty coefficient —
    perfect association is -1, independence 0 (docs example
    theilsU(number % 10, number % 4) over 150 rows = -0.3019572...,
    reproduced in tests). Parity beats the textbook here. NaN when X is
    constant (H(X) = 0)."""
    from collections import Counter

    n = len(pairs)
    if n == 0:
        return float("nan")
    cx = Counter(x for x, _ in pairs)
    hx = -sum(k / n * math.log(k / n) for k in cx.values())
    if hx <= 0.0:
        return float("nan")
    cy = Counter(y for _, y in pairs)
    joint = Counter(pairs)
    hxy = 0.0
    for (x, y), k in joint.items():
        p_xy = k / n
        p_x_given_y = k / cy[y]
        hxy -= p_xy * math.log(p_x_given_y)
    return -(hx - hxy) / hx


def _norm_elem(v):
    """Normalize an Arrow-delivered element for Python equality: numpy
    scalars -> native (C decimal refuses to compare against np.int64:
    'argument must be an integer'), Decimal -> float (CH compares numerics
    under a common supertype)."""
    import decimal

    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, decimal.Decimal):
        v = float(v)
    return v


def _array_levenshtein(a: list, b: list) -> int:
    """Levenshtein over element sequences (equality on the elements,
    numerics normalized — see _norm_elem)."""
    a = [_norm_elem(v) for v in a]
    b = [_norm_elem(v) for v in b]
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return n or m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def _json_merge_patch(docs: list) -> str | None:
    """RFC 7386 JSON Merge Patch folded left-to-right over the documents."""
    import json

    def patch(target, p):
        if not isinstance(p, dict):
            return p
        if not isinstance(target, dict):
            target = {}
        out = dict(target)
        for k, v in p.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = patch(out.get(k), v)
        return out

    acc = None
    first = True
    for d in docs:
        if d is None:
            return None
        parsed = json.loads(d)
        acc = parsed if first else patch(acc, parsed)
        first = False
    return json.dumps(acc, separators=(",", ":")) if not first else None


def register_stats25_functions(spark: SparkSession) -> None:
    @pandas_udf("double")
    def ch_cramers_v(pairs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if arr is None else cramers_v([(e["a"], e["b"]) for e in arr], False)
                for arr in pairs
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def ch_cramers_v_bc(pairs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if arr is None else cramers_v([(e["a"], e["b"]) for e in arr], True)
                for arr in pairs
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def ch_theils_u(pairs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if arr is None else theils_u([(e["a"], e["b"]) for e in arr])
                for arr in pairs
            ],
            dtype="float64",
        )

    @pandas_udf("int")
    def ch_array_levenshtein(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None) else _array_levenshtein(list(x), list(y))
                for x, y in zip(a, b)
            ],
            dtype="object",
        )

    @pandas_udf("string")
    def ch_json_merge_patch_var(docs: pd.Series) -> pd.Series:
        return docs.map(lambda arr: None if arr is None else _json_merge_patch(list(arr)))

    @pandas_udf("double")
    def ch_contingency(pairs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if arr is None
                else contingency_coefficient([(e["a"], e["b"]) for e in arr])
                for arr in pairs
            ],
            dtype="float64",
        )

    spark.udf.register("chCramersV", ch_cramers_v)
    spark.udf.register("chCramersVBC", ch_cramers_v_bc)
    spark.udf.register("chTheilsU", ch_theils_u)
    spark.udf.register("chContingency", ch_contingency)
    spark.udf.register("chArrayLevenshtein", ch_array_levenshtein)
    spark.udf.register("chJSONMergePatch", ch_json_merge_patch_var)
