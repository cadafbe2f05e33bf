"""Dialect batch 23 (probe-driven, round 8): the hypothesis-test family
with REAL p-values, string-distance UDFs, codec tail, Morton codes,
standard-SQL type aliases.

Golden sources: ClickHouse public docs examples where the docs publish
values (mortonEncode(1,2,3)=53, minSampleSize* tuples), classic textbook
values (Jaro MARTHA/MARHTA, t-table quantiles), and independent in-test
recomputation of the t statistics from first principles.
"""

import math

import pytest

from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.functions.stats import (
    inv_normal_cdf,
    kolmogorov_q,
    normal_two_sided_p,
    student_t_two_sided_p,
)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh23")))


def one(eng, sql):
    rows = eng.sql(sql).collect()
    assert len(rows) == 1
    return rows[0]


# ---------------------------------------------------------------------------
# special functions: pinned against published table values


def test_special_function_table_values():
    # classic two-sided t critical values: P(|T| >= 2.228139 | df=10) = 0.05
    assert student_t_two_sided_p(2.228139, 10) == pytest.approx(0.05, rel=1e-5)
    assert student_t_two_sided_p(1.812461, 10) == pytest.approx(0.10, rel=1e-5)
    # normal quantiles (Acklam) and tail
    assert inv_normal_cdf(0.975) == pytest.approx(1.959963985, rel=1e-8)
    assert inv_normal_cdf(0.8) == pytest.approx(0.8416212336, rel=1e-8)
    assert normal_two_sided_p(1.959964) == pytest.approx(0.05, rel=1e-6)
    # Kolmogorov Q(1.0) (published value 0.26999967...)
    assert kolmogorov_q(1.0) == pytest.approx(0.2699996717, rel=1e-8)
    assert kolmogorov_q(0.0) == 1.0


_TWO_SAMPLE = (
    "VALUES (20.3, 0),(21.1, 0),(21.7, 0),(19.9, 0),(21.8, 0),"
    "(23.5, 1),(22.8, 1),(22.1, 1),(24.0, 1),(23.2, 1) AS t(v, g)"
)
_S0 = [20.3, 21.1, 21.7, 19.9, 21.8]
_S1 = [23.5, 22.8, 22.1, 24.0, 23.2]


def _mean_var(xs):
    m = sum(xs) / len(xs)
    v = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
    return m, v


def test_student_ttest_matches_first_principles(eng):
    r = one(eng, f"SELECT studentTTest(v, g) AS r FROM {_TWO_SAMPLE}")["r"]
    m0, v0 = _mean_var(_S0)
    m1, v1 = _mean_var(_S1)
    n0 = n1 = 5
    sp2 = ((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)
    t = (m0 - m1) / math.sqrt(sp2 * (1 / n0 + 1 / n1))
    assert r["t_statistic"] == pytest.approx(t, rel=1e-12)
    assert r["p_value"] == pytest.approx(
        student_t_two_sided_p(t, n0 + n1 - 2), rel=1e-9
    )
    assert 0.001 < r["p_value"] < 0.01  # strongly separated fixture


def test_welch_ttest_matches_first_principles(eng):
    r = one(eng, f"SELECT welchTTest(v, g) AS r FROM {_TWO_SAMPLE}")["r"]
    m0, v0 = _mean_var(_S0)
    m1, v1 = _mean_var(_S1)
    a, b = v0 / 5, v1 / 5
    t = (m0 - m1) / math.sqrt(a + b)
    df = (a + b) ** 2 / (a**2 / 4 + b**2 / 4)
    assert r["t_statistic"] == pytest.approx(t, rel=1e-12)
    assert r["p_value"] == pytest.approx(student_t_two_sided_p(t, df), rel=1e-9)


def test_mean_ztest(eng):
    r = one(
        eng, f"SELECT meanZTest(0.7, 0.45, 0.95)(v, g) AS r FROM {_TWO_SAMPLE}"
    )["r"]
    m0, _ = _mean_var(_S0)
    m1, _ = _mean_var(_S1)
    se = math.sqrt(0.7 / 5 + 0.45 / 5)
    z = (m0 - m1) / se
    zc = inv_normal_cdf(0.975)
    assert r["z_statistic"] == pytest.approx(z, rel=1e-12)
    assert r["p_value"] == pytest.approx(normal_two_sided_p(z), rel=1e-9)
    assert r["confidence_interval_low"] == pytest.approx((m0 - m1) - zc * se, rel=1e-9)
    assert r["confidence_interval_high"] == pytest.approx((m0 - m1) + zc * se, rel=1e-9)


def test_mann_whitney_and_ks(eng):
    six = "VALUES (1.0, 0),(2.0, 0),(3.0, 0),(4.0, 1),(5.0, 1),(6.0, 1) AS t(v, g)"
    sd = math.sqrt(3 * 3 * 7 / 12.0)
    mw = one(eng, f"SELECT mannWhitneyUTest(v, g) AS r FROM {six}")["r"]
    # fully separated: U of sample 0 is 0; the DEFAULT applies CH's 0.5
    # continuity correction toward the mean
    assert mw["u_statistic"] == 0.0
    assert mw["p_value"] == pytest.approx(
        normal_two_sided_p((0 - 4.5 + 0.5) / sd), rel=1e-9
    )
    # explicit continuity_correction=0 switches it off
    mw0 = one(eng, f"SELECT mannWhitneyUTest('two-sided', 0)(v, g) AS r FROM {six}")["r"]
    assert mw0["p_value"] == pytest.approx(normal_two_sided_p((0 - 4.5) / sd), rel=1e-9)
    # NULL value / NULL index rows are dropped, not crashed on (CH skips them)
    withnull = (
        "VALUES (1.0, 0),(2.0, 0),(3.0, 0),(4.0, 1),(5.0, 1),(6.0, 1),"
        "(CAST(NULL AS DOUBLE), 0),(7.0, CAST(NULL AS INT)) AS t(v, g)"
    )
    mwn = one(eng, f"SELECT mannWhitneyUTest(v, g) AS r FROM {withnull}")["r"]
    assert mwn["u_statistic"] == mw["u_statistic"]
    assert mwn["p_value"] == pytest.approx(mw["p_value"], rel=1e-12)
    ks = one(eng, f"SELECT kolmogorovSmirnovTest(v, g) AS r FROM {six}")["r"]
    assert ks["d_statistic"] == 1.0
    ne = 9 / 6
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * 1.0
    assert ks["p_value"] == pytest.approx(kolmogorov_q(lam), rel=1e-9)
    # ties shift the U variance: triplicated values still produce a p in (0,1]
    tied = "VALUES (1.0, 0),(1.0, 0),(1.0, 1),(2.0, 1) AS t(v, g)"
    mwt = one(eng, f"SELECT mannWhitneyUTest(v, g) AS r FROM {tied}")["r"]
    assert 0.0 < mwt["p_value"] <= 1.0

    # grouped evaluation: one independent test per group key
    per_group = eng.sql(
        "SELECT k, studentTTest(v, g) AS r FROM VALUES "
        "(1, 20.3, 0),(1, 21.1, 0),(1, 23.5, 1),(1, 22.8, 1),"
        "(2, 5.0, 0),(2, 5.1, 0),(2, 5.05, 1),(2, 5.2, 1) AS t(k, v, g) "
        "GROUP BY k ORDER BY k"
    ).collect()
    assert len(per_group) == 2
    assert per_group[0]["r"]["p_value"] < per_group[1]["r"]["p_value"]


def test_refused_test_forms(eng):
    with pytest.raises(Exception, match="CI form is not shimmed"):
        eng.sql(f"SELECT studentTTest(0.95)(v, g) FROM {_TWO_SAMPLE}").collect()
    with pytest.raises(Exception, match="two-sided"):
        eng.sql(f"SELECT mannWhitneyUTest('greater')(v, g) FROM {_TWO_SAMPLE}").collect()
    # r9: 'exact'/'auto' are now REAL (the big-int lattice DP, see
    # test_ks_exact_* below); an unknown method still refuses at translate
    with pytest.raises(Exception, match="asymptotic"):
        eng.sql(
            f"SELECT kolmogorovSmirnovTest('two-sided', 'montecarlo')(v, g) "
            f"FROM {_TWO_SAMPLE}"
        ).collect()
    with pytest.raises(Exception, match="literal numeric"):
        eng.sql("SELECT minSampleSizeConversion(v, 0.03, 0.8, 0.05) FROM ev").collect()
    with pytest.raises(Exception, match="two-pass"):
        eng.sql(
            "SELECT exponentialTimeDecayedSum(10)(v, g) AS r FROM "
            + _TWO_SAMPLE
        ).collect()


def test_degenerate_groups_yield_null_not_ansi_abort(eng):
    """One empty sample side: the try_divide guards yield NULL (CH yields
    nan) instead of an ANSI DIVIDE_BY_ZERO aborting the whole query."""
    one_sided = "VALUES (1.0, 1),(2.0, 1),(3.0, 1) AS t(v, g)"
    for fn in ("studentTTest", "welchTTest"):
        r = one(eng, f"SELECT {fn}(v, g) AS r FROM {one_sided}")["r"]
        assert r["t_statistic"] is None and r["p_value"] is None
    r = one(eng, f"SELECT meanZTest(1.0, 1.0, 0.95)(v, g) AS r FROM {one_sided}")["r"]
    assert r["z_statistic"] is None
    r = one(eng, "SELECT proportionsZTest(0, 1, 0, 10, 0.95, 'unpooled') AS r")["r"]
    assert r["z_statistic"] is None


def test_min_sample_size_ch_docs_goldens(eng):
    """The exact tuples the public ClickHouse docs publish for these calls."""
    r = one(eng, "SELECT minSampleSizeConversion(0.25, 0.03, 0.80, 0.05) AS r")["r"]
    assert r["minimum_sample_size"] == pytest.approx(3396.077603219163, rel=1e-8)
    assert (r["detect_range_lower"], r["detect_range_upper"]) == (0.22, 0.28)
    r = one(
        eng, "SELECT minSampleSizeContinuous(112.25, 21.1, 0.03, 0.80, 0.05) AS r"
    )["r"]
    assert r["minimum_sample_size"] == pytest.approx(616.2931945826209, rel=1e-8)
    assert r["detect_range_lower"] == pytest.approx(108.8825)
    assert r["detect_range_upper"] == pytest.approx(115.6175)


def test_proportions_ztest(eng):
    r = one(eng, "SELECT proportionsZTest(10, 11, 100, 101, 0.95, 'unpooled') AS r")["r"]
    p1, p2 = 10 / 100, 11 / 101
    se = math.sqrt(p1 * (1 - p1) / 100 + p2 * (1 - p2) / 101)
    z = (p1 - p2) / se
    assert r["z_statistic"] == pytest.approx(z, rel=1e-12)
    assert r["p_value"] == pytest.approx(normal_two_sided_p(z), rel=1e-9)
    # pooled variant changes the z denominator
    rp = one(eng, "SELECT proportionsZTest(10, 11, 100, 101, 0.95, 'pooled') AS r")["r"]
    pp = 21 / 201
    sep = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 101))
    assert rp["z_statistic"] == pytest.approx((p1 - p2) / sep, rel=1e-12)


def test_lttb(eng):
    r = one(
        eng,
        "SELECT largestTriangleThreeBuckets(3)(x, y) AS r FROM VALUES "
        "(1.0,2.0),(2.0,4.0),(3.0,9.0),(4.0,1.0),(5.0,5.0) AS t(x, y)",
    )["r"]
    # endpoints kept; the interior bucket keeps the largest-triangle point
    assert [(p["x"], p["y"]) for p in r] == [(1.0, 2.0), (3.0, 9.0), (5.0, 5.0)]
    # n >= series length: identity
    r = one(
        eng,
        "SELECT largestTriangleThreeBuckets(10)(x, y) AS r FROM VALUES "
        "(1.0,2.0),(2.0,4.0) AS t(x, y)",
    )["r"]
    assert len(r) == 2


# ---------------------------------------------------------------------------
# string distances / codecs / morton


def test_string_distances(eng):
    r = one(
        eng,
        "SELECT damerauLevenshteinDistance('ca', 'ac') AS a, "
        "damerauLevenshteinDistance('kitten', 'sitting') AS b, "
        "damerauLevenshteinDistance('abcd', 'acbd') AS c, "
        "jaroSimilarity('MARTHA', 'MARHTA') AS j, "
        "jaroWinklerSimilarity('MARTHA', 'MARHTA') AS jw, "
        "jaroSimilarity('', 'x') AS jz, "
        "editDistanceUTF8('häuser', 'hauser') AS u",
    )
    assert (r["a"], r["b"], r["c"]) == (1, 3, 1)  # transpositions cost 1
    assert r["j"] == pytest.approx(0.9444444444, rel=1e-9)  # textbook value
    assert r["jw"] == pytest.approx(0.9611111111, rel=1e-9)
    assert r["jz"] == 0.0
    assert r["u"] == 1  # codepoint distance, not byte distance


def test_codecs(eng):
    r = one(
        eng,
        "SELECT base32Encode('Encoded') AS a, "
        "base32Decode('IVXGG33EMVSA====') AS b, "
        "tryBase32Decode('~invalid~') AS c, "
        "encodeURLFormComponent('a b&c') AS d, "
        "decodeURLFormComponent('a+b%26c') AS e, "
        "punycodeEncode('München') AS f, "
        "punycodeDecode('Mnchen-3ya') AS g, "
        "idnaEncode('straße.de') AS h",
    )
    assert r["a"] == "IVXGG33EMVSA===="
    assert r["b"] == "Encoded"
    assert r["c"] == ""  # try* returns CH's '' on failure
    assert (r["d"], r["e"]) == ("a+b%26c", "a b&c")
    assert (r["f"], r["g"]) == ("Mnchen-3ya", "München")
    assert r["h"] == "strasse.de"  # IDNA 2003 nameprep folds ß → ss


def test_morton_codes(eng):
    r = one(
        eng,
        "SELECT mortonEncode(1, 1) AS a, mortonEncode(1, 2, 3) AS b, "
        "mortonDecode(3, 53) AS c, mortonDecode(2, mortonEncode(97, 53)) AS d",
    )
    assert r["a"] == 3
    assert r["b"] == 53  # CH docs golden
    assert list(r["c"]) == [1, 2, 3]
    assert list(r["d"]) == [97, 53]
    with pytest.raises(Exception, match="exceeds"):
        eng.sql("SELECT mortonEncode(4294967296, 1, 1, 1, 1, 1, 1, 1) AS a").collect()
    # a negative code must raise loudly, not spin the executor forever
    with pytest.raises(Exception, match="non-negative"):
        eng.sql("SELECT mortonDecode(3, -1) AS a").collect()


# ---------------------------------------------------------------------------
# standard-SQL type aliases


def test_sql_type_aliases(eng):
    r = one(
        eng,
        "SELECT 123::INT AS a, 5::BIGINT AS b, 1.5::DOUBLE AS c, "
        "'x'::VARCHAR AS d, CAST('2.50' AS NUMERIC(10,2)) AS e, "
        "1::BOOLEAN AS f, 7::SMALLINT AS g, 2.5::REAL AS h",
    )
    assert (r["a"], r["b"], r["d"], r["f"], r["g"]) == (123, 5, "x", True, 7)
    assert str(r["e"]) == "2.50"
    assert r["h"] == pytest.approx(2.5)

    eng.sql("DROP TABLE IF EXISTS t23_alias")
    eng.sql(
        "CREATE TABLE t23_alias (id BIGINT, name VARCHAR, score DOUBLE, "
        "ok BOOLEAN, amt NUMERIC(10,2)) ENGINE = MergeTree() ORDER BY id"
    )
    eng.sql("INSERT INTO t23_alias VALUES (1, 'a', 1.5, true, 2.50)")
    got = eng.sql("SELECT * FROM t23_alias").collect()
    assert len(got) == 1 and got[0]["name"] == "a"
    eng.sql("DROP TABLE IF EXISTS t23_alias")


def test_misc_batch23(eng):
    r = one(
        eng,
        "SELECT nowInBlock() IS NOT NULL AS a, "
        "domainRFC('https://example.com/p') AS b, "
        "timeSlots(toDateTime('2012-01-01 12:20:00'), 600::BIGINT) AS c",
    )
    assert r["a"] is True
    assert r["b"] == "example.com"
    assert [str(t) for t in r["c"]] == ["2012-01-01 12:00:00", "2012-01-01 12:30:00"]


# ---------------------------------------------------------------------------
# r9: kolmogorovSmirnovTest 'exact'/'auto' — the big-int lattice DP


def test_ks_exact_matches_full_enumeration():
    """The Hodges DP == brute-force enumeration over ALL C(n0+n1, n0)
    group labelings (the literal definition of the exact null), on a
    tie-free pool — symmetric and asymmetric splits."""
    from itertools import combinations

    import numpy as np

    from clickhousedatamocker_spark.functions.stats import ks_two_sample

    pool = np.array(_S0 + _S1)  # 10 distinct values
    for n0 in (5, 4, 3):
        g_obs = np.array([0] * n0 + [1] * (len(pool) - n0), dtype=np.int64)
        d_obs, p_exact = ks_two_sample(pool, g_obs, method="exact")
        worse = total = 0
        for idx in combinations(range(len(pool)), n0):
            g = np.ones(len(pool), dtype=np.int64)
            g[list(idx)] = 0
            d, _ = ks_two_sample(pool, g)
            total += 1
            if d >= d_obs - 1e-12:
                worse += 1
        assert p_exact == pytest.approx(worse / total, abs=1e-12), n0


def test_ks_exact_and_auto_through_dialect(eng):
    """Fully separated samples: D = 1 and the exact p is the textbook
    2/C(10,5) (only the two extreme interleavings reach D = 1). 'auto'
    picks the same exact branch at this size."""
    want_p = 2.0 / math.comb(10, 5)
    for method in ("exact", "auto"):
        r = one(
            eng,
            f"SELECT kolmogorovSmirnovTest('two-sided', '{method}')(v, g) AS r "
            f"FROM {_TWO_SAMPLE}",
        )["r"]
        assert r["d_statistic"] == 1.0
        assert r["p_value"] == pytest.approx(want_p, rel=1e-12)


def test_ks_exact_refusals_and_auto_fallback(eng):
    import numpy as np

    from clickhousedatamocker_spark.functions.stats import ks_two_sample

    # ties: 'exact' refuses loudly, through the engine too
    with pytest.raises(Exception, match="ties"):
        eng.sql(
            "SELECT kolmogorovSmirnovTest('two-sided', 'exact')(v, g) FROM "
            "(VALUES (1.0, 0),(2.0, 0),(2.0, 1),(3.0, 1)) AS t(v, g)"
        ).collect()
    # cap: past 1000 pooled samples the DP refuses with the recipe
    big_v = np.arange(1002, dtype=np.float64)
    big_g = np.array([0, 1] * 501, dtype=np.int64)
    with pytest.raises(NotImplementedError, match="cap"):
        ks_two_sample(big_v, big_g, method="exact")
    # 'auto' degrades to the asymptotic tail in both refusal cases
    tied_v = np.array([1.0, 2.0, 2.0, 3.0])
    tied_g = np.array([0, 0, 1, 1])
    d_a, p_a = ks_two_sample(tied_v, tied_g, method="auto")
    d_s, p_s = ks_two_sample(tied_v, tied_g, method="asymptotic")
    assert (d_a, p_a) == (d_s, p_s)
    d_b, p_b = ks_two_sample(big_v, big_g, method="auto")
    assert p_b == ks_two_sample(big_v, big_g)[1]


def test_ks_exact_agrees_with_asymptotic_at_moderate_n():
    """Sanity: at n0 = n1 = 50 the Stephens-adjusted tail tracks the
    exact DP to ~10% mid-distribution (this fixture: exact 0.3959,
    asymptotic 0.3584; a 200k-permutation Monte Carlo pins the DP at
    0.3948 ± 0.0033, so the gap is the asymptotic's, not the DP's)."""
    import numpy as np

    from clickhousedatamocker_spark.functions.stats import ks_two_sample

    rng = np.random.default_rng(23)
    v = rng.permutation(np.arange(100, dtype=np.float64))  # tie-free
    g = np.array([0] * 50 + [1] * 50, dtype=np.int64)
    d_e, p_e = ks_two_sample(v, g, method="exact")
    d_s, p_s = ks_two_sample(v, g, method="asymptotic")
    assert d_e == d_s
    assert p_e == pytest.approx(0.3959398631708505, rel=1e-12)  # MC-pinned
    assert p_e == pytest.approx(p_s, rel=0.15)
