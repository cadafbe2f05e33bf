"""Golden tests for the two custom scalar functions (FIXTURES.md §4)."""

import pyspark.sql.functions as F
import pytest

from clickhousedatamocker_spark.functions.scalar import (
    format_readable_size,
    register_sql_functions,
    to_yyyymmddhh,
)

GOLDEN_SIZES = [
    (0, "0.00 B"),
    (1023, "1023.00 B"),
    (1024, "1.00 KiB"),
    (1536, "1.50 KiB"),
    (1048576, "1.00 MiB"),
    (5368709120, "5.00 GiB"),
    (1099511627776, "1.00 TiB"),
]

GOLDEN_HOURS = [
    ("2026-01-01 12:34:56", 2026010112),
    ("2026-01-01 00:00:00", 2026010100),
    ("2025-12-31 23:59:59", 2025123123),
    ("2026-08-13 03:00:01", 2026081303),
    ("2026-02-09 09:05:00", 2026020909),
]


def test_format_readable_size_golden(spark):
    df = spark.createDataFrame([(b,) for b, _ in GOLDEN_SIZES], "bytes long")
    got = [r[0] for r in df.select(format_readable_size("bytes")).orderBy(F.col("bytes")).collect()]
    # orderBy on the projected-out column: re-select to keep order stable
    got = [
        r["s"]
        for r in df.select(F.col("bytes"), format_readable_size("bytes").alias("s")).orderBy("bytes").collect()
    ]
    assert got == [s for _, s in sorted(GOLDEN_SIZES)]


def test_to_yyyymmddhh_golden(spark):
    df = spark.createDataFrame([(ts,) for ts, _ in GOLDEN_HOURS], "ts string")
    got = {
        r["ts"]: r["h"]
        for r in df.select("ts", to_yyyymmddhh(F.col("ts").cast("timestamp")).alias("h")).collect()
    }
    for ts, expect in GOLDEN_HOURS:
        assert got[ts] == expect, ts


def test_sql_registration_matches_column_api(spark):
    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT toYYYYMMDDhh(TIMESTAMP '2026-01-01 12:34:56') AS h, formatReadableSize(1536) AS s"
    ).first()
    assert rows["h"] == 2026010112
    assert rows["s"] == "1.50 KiB"


@pytest.mark.parametrize("b,expect", GOLDEN_SIZES)
def test_sql_format_readable_each(spark, b, expect):
    register_sql_functions(spark)
    assert spark.sql(f"SELECT formatReadableSize({b}) AS s").first()["s"] == expect


# formatDateTime golden parity: MODERN ClickHouse (23.1+) token semantics —
# %M is the full month name, %i is minutes (the pre-23.1 %M-as-minutes
# reading is deliberately NOT honored; documented in functions/scalar.py).
# Reference instant: 2026-02-03 04:05:06 is a Tuesday, day-of-year 034, Q1.
FDT_T = "TIMESTAMP '2026-02-03 04:05:06'"
FDT_GOLDENS = [
    ("%Y-%m-%d %H:%i:%S", "2026-02-03 04:05:06"),
    ("%F", "2026-02-03"),
    ("%D", "02/03/26"),
    ("%T", "04:05:06"),
    ("%R", "04:05"),
    ("%Y", "2026"),
    ("%y", "26"),
    ("%M", "February"),
    ("%m", "02"),
    ("%c", "02"),
    ("%W", "Tuesday"),
    ("%a", "Tue"),
    ("%b", "Feb"),
    ("%d", "03"),
    ("%H", "04"),
    ("%h", "04"),
    ("%I", "04"),
    ("%i", "05"),
    ("%j", "034"),
    ("%p", "AM"),
    ("%Q", "1"),
    ("%S", "06"),
    ("%s", "06"),
    ("100%%", "100%"),
    ("%d%n%m", "03\n02"),
    ("%d%t%m", "03\t02"),
    ("%F %T", "2026-02-03 04:05:06"),
]


@pytest.mark.parametrize("fmt,expect", FDT_GOLDENS)
def test_format_datetime_golden(spark, fmt, expect):
    register_sql_functions(spark)
    got = spark.sql(f"SELECT formatDateTime({FDT_T}, '{fmt}') AS s").first()["s"]
    assert got == expect, fmt


def test_format_datetime_pm_and_quarters(spark):
    register_sql_functions(spark)
    r = spark.sql(
        "SELECT formatDateTime(TIMESTAMP '2026-11-30 16:00:00', '%p') AS p, "
        "formatDateTime(TIMESTAMP '2026-11-30 16:00:00', '%Q') AS q, "
        "formatDateTime(TIMESTAMP '2026-11-30 16:00:00', '%I') AS h12"
    ).first()
    assert (r["p"], r["q"], r["h12"]) == ("PM", "4", "04")


def test_format_datetime_unmapped_token_raises(spark):
    """Every %-token OUTSIDE the supported table must raise with a clear
    message — never silently format the wrong field or leak a Java pattern
    error (hypothesis-driven over the unmapped alphabet)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    register_sql_functions(spark)
    unmapped = sorted(
        set("CEGJKLNOPUVXZefgkloruvwxz")  # letters CH defines or could; none shimmed
    )

    @given(st.sampled_from(unmapped))
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def check(tok):
        with pytest.raises(Exception) as ei:
            spark.sql(f"SELECT formatDateTime({FDT_T}, 'x-%{tok}') AS s").first()
        assert "unsupported %-token" in str(ei.value)

    check()


# -- round-5 vocabulary batch: string/URL/type/hash/array CH spellings -------

# (input SQL expression, expected value) — goldens chosen against ClickHouse's
# documented behavior for each function
VOCAB_GOLDENS = [
    # (position itself is unshimmed — Spark's builtin owns the name with
    # reversed args; the case-insensitive variant has no builtin conflict)
    ("positionCaseInsensitive('Hello', 'hELLO')", 1),
    ("match('access.log 200 OK', '\\\\d{3}')", True),
    ("match('access.log OK', '\\\\d{3}')", False),
    ("extractAll('a=1, b=2, c=3', '(\\\\d)')", ["1", "2", "3"]),
    ("replaceAll('aXbXc', 'X', '-')", "a-b-c"),
    ("replaceOne('aXbXc', 'X', '-')", "a-bXc"),
    ("replaceOne('abc', 'z', '-')", "abc"),
    ("replaceRegexpAll('a1b22c', '\\\\d+', '#')", "a#b#c"),
    ("countSubstrings('foo bar foo', 'foo')", 2),
    ("countSubstrings('foo', '')", 0),
    ("multiSearchAny('error: disk full', array('warn', 'error'))", True),
    ("multiSearchAny('all good', array('warn', 'error'))", False),
    ("lowerUTF8('AbC')", "abc"),
    ("upperUTF8('AbC')", "ABC"),
    ("trimBoth('  x  ')", "x"),
    ("trimLeft('  x  ')", "x  "),
    ("trimRight('  x  ')", "  x"),
    ("leftPad('7', 3, '0')", "007"),
    ("rightPad('7', 3, '0')", "700"),
    # URL family
    ("protocol('https://example.com/a')", "https"),
    ("protocol('example.com/a')", ""),
    ("domain('https://www.example.com:8080/p?q=1')", "www.example.com"),
    ("domain('//cdn.ex.io/x')", "cdn.ex.io"),
    ("domain('example.com/path')", "example.com"),
    ("domainWithoutWWW('https://www.example.com/p')", "example.com"),
    ("topLevelDomain('https://shop.example.co.uk/p')", "uk"),
    ("path('https://e.com/a/b?q=1#f')", "/a/b"),
    ("pathFull('https://e.com/a/b?q=1#f')", "/a/b?q=1"),
    ("queryString('https://e.com/p?a=1&b=2#f')", "a=1&b=2"),
    ("fragment('https://e.com/p?a=1#sec')", "sec"),
    ("extractURLParameter('https://e.com/p?a=1&b=2', 'b')", "2"),
    ("extractURLParameter('https://e.com/p?a=1', 'z')", ""),
    ("cutQueryString('https://e.com/p?a=1#f')", "https://e.com/p#f"),
    ("cutFragment('https://e.com/p?a=1#f')", "https://e.com/p?a=1"),
    ("cutQueryStringAndFragment('https://e.com/p?a=1#f')", "https://e.com/p"),
    # type conversions
    ("toInt16('300')", 300),
    ("toInt8('12')", 12),
    ("toUInt8('200')", 200),
    ("toUInt32('4000000000')", 4000000000),
    ("toFloat32('1.5')", 1.5),
    ("toString(123)", "123"),
    ("toString(TIMESTAMP '2026-01-01 12:00:00')", "2026-01-01 12:00:00"),
    ("toDateTime('2026-01-01 12:00:00')", None),  # checked by type below
    # math
    ("intDivOrZero(7, 0)", 0),
    ("intDivOrZero(7, 2)", 3),
    ("moduloOrZero(7, 0)", 0),
    ("bround(2.5, 0)", 2.0),  # roundBankers unshimmed (literal-scale limit); bround is the HALF_EVEN spelling
    ("bround(3.5, 0)", 4.0),
    ("sign(-3.2)", -1.0),  # Spark builtin (CH-compatible name), returns DOUBLE
    # arrays
    ("arraySum(array(1.0, 2.5, NULL))", 3.5),
    ("arrayAvg(array(2.0, 4.0))", 3.0),
    ("indexOf(array('a', 'b', 'c'), 'b')", 2),
    ("indexOf(array('a'), 'z')", 0),
    ("indexOf(array(1, 2, 3), 2)", 2),
]


def test_ch_vocabulary_goldens(spark):
    register_sql_functions(spark)
    exprs = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(VOCAB_GOLDENS))
    row = spark.sql(f"SELECT {exprs}").first()
    for i, (expr, want) in enumerate(VOCAB_GOLDENS):
        if want is None:
            continue
        got = row[f"c{i}"]
        if isinstance(want, float):
            assert abs(float(got) - want) < 1e-9, f"{expr}: {got} != {want}"
        else:
            assert got == want, f"{expr}: {got!r} != {want!r}"


def test_ch_vocabulary_typed_returns(spark):
    register_sql_functions(spark)
    r = spark.sql(
        "SELECT toDateTime('2026-01-01 12:00:00') AS dt_text, "
        "toDateTime(1767268800) AS dt_epoch, "
        "upper(md5('abc')) AS md5_hex, hex(SHA256('')) AS sha_hex, "
        "cityHash64('x') AS ch, sipHash64('x') AS sh"
    ).first()
    import datetime

    assert r["dt_text"] == datetime.datetime(2026, 1, 1, 12, 0, 0)
    # 1767268800 = 2026-01-01 12:00:00 UTC (session tz pinned UTC)
    assert r["dt_epoch"] == datetime.datetime(2026, 1, 1, 12, 0, 0)
    # CH idiom hex(MD5(x)) must equal a real server's output exactly
    assert r["md5_hex"] == "900150983CD24FB0D6963F7D28E17F72"
    assert r["sha_hex"] == "E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855"
    assert isinstance(r["ch"], int) and isinstance(r["sh"], int)


def test_ch_parametric_rewrites():
    """multiIf / array-lambda spellings → Spark HOFs, including nesting and
    commas inside lambda bodies (the flat-regex-impossible cases)."""
    from clickhousedatamocker_spark.functions.compat import translate_ch_sql as tr

    assert tr("SELECT multiIf(a > 1, 'x', b < 2, 'y', 'z')") == (
        "SELECT (CASE WHEN a > 1 THEN 'x' WHEN b < 2 THEN 'y' ELSE 'z' END)"
    )
    assert tr("SELECT arrayMap(x -> x * 2, nums)") == "SELECT transform(nums, x -> x * 2)"
    assert tr("SELECT arrayMap((x, y) -> x + y, a, b)") == "SELECT zip_with(a, b, (x, y) -> x + y)"
    assert tr("SELECT arrayFilter(x -> x > 0, nums)") == "SELECT filter(nums, x -> x > 0)"
    assert tr("SELECT arrayExists(x -> x = 1, nums)") == "SELECT exists(nums, x -> x = 1)"
    assert tr("SELECT arrayAll(x -> x > 0, nums)") == "SELECT forall(nums, x -> x > 0)"
    assert tr("SELECT arrayCount(x -> x > 0, nums)") == "SELECT size(filter(nums, x -> x > 0))"
    assert tr("SELECT arrayFirst(x -> x > 0, nums)") == "SELECT element_at(filter(nums, x -> x > 0), 1)"
    # comma inside a lambda body (nested call) must not split the args
    assert tr("arrayMap(x -> if(x > 0, 1, 0), nums)") == "transform(nums, x -> if(x > 0, 1, 0))"
    # nesting: inner spelling rewritten on the next fixpoint pass
    assert tr("multiIf(c, arrayMap(x -> x, a), d)") == (
        "(CASE WHEN c THEN transform(a, x -> x) ELSE d END)"
    )
    # strings containing parens/commas stay intact
    assert tr("multiIf(s = '(a,b', 'l(', 'r)')") == (
        "(CASE WHEN s = '(a,b' THEN 'l(' ELSE 'r)' END)"
    )


def test_ch_parametric_execute(spark):
    register_sql_functions(spark)
    from clickhousedatamocker_spark.functions.compat import translate_ch_sql as tr

    r = spark.sql(
        tr(
            "SELECT arrayMap(x -> x * 2, array(1, 2, 3)) AS doubled, "
            "arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4)) AS evens, "
            "arrayCount(x -> x > 1, array(1, 2, 3)) AS n, "
            "arrayFirst(x -> x > 1, array(1, 2, 3)) AS first_big, "
            "multiIf(1 = 2, 'a', 2 = 2, 'b', 'c') AS chosen"
        )
    ).first()
    assert r["doubled"] == [2, 4, 6]
    assert r["evens"] == [2, 4]
    assert r["n"] == 2
    assert r["first_big"] == 2
    assert r["chosen"] == "b"


def test_ch_aggregate_combinator_spellings(spark):
    """argMax/argMin → max_by/min_by (same arg order), -If combinators via
    the parametric rewriter (CASE keeps non-matching rows NULL, so the
    aggregate skips them exactly like CH), quantile families →
    percentile(_approx), bit functions."""
    from clickhousedatamocker_spark.functions.compat import translate_ch_sql as tr

    register_sql_functions(spark)
    assert tr("SELECT sumIf(v, v > 2) FROM t") == "SELECT sum(CASE WHEN v > 2 THEN v END) FROM t"
    assert tr("SELECT argMax(u, ts) FROM t") == "SELECT max_by(u, ts) FROM t"
    assert tr("SELECT quantile(0.5)(v) FROM t") == "SELECT percentile_approx(v, 0.5) FROM t"
    assert tr("SELECT quantilesExact(0.25, 0.75)(v) FROM t") == (
        "SELECT percentile(v, array(0.25, 0.75)) FROM t"
    )
    spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "b"), (4, 40.0, "a")], "k int, v double, g string"
    ).createOrReplaceTempView("comb_t")
    r = spark.sql(
        tr(
            "SELECT sumIf(v, k % 2 = 0) AS s_even, avgIf(v, g = 'a') AS a_a, "
            "minIf(v, g = 'b') AS mn_b, maxIf(v, k < 4) AS mx_3, "
            "argMax(g, v) AS g_of_max, argMin(k, v) AS k_of_min, "
            "quantileExact(0.5)(v) AS med, quantilesExact(0.0, 1.0)(v) AS qs "
            "FROM comb_t"
        )
    ).first()
    assert r["s_even"] == 60.0 and r["a_a"] == 25.0
    assert r["mn_b"] == 20.0 and r["mx_3"] == 30.0
    assert r["g_of_max"] == "a" and r["k_of_min"] == 1
    assert r["med"] == 25.0 and r["qs"] == [10.0, 40.0]
    b = spark.sql(
        "SELECT bitAnd(12, 10) AS a, bitOr(12, 10) AS o, bitXor(12, 10) AS x, "
        "bitNot(0) AS n, bitShiftLeft(1, 4) AS sl, bitShiftRight(256, 4) AS sr, "
        "bitTest(5, 2) AS t1, bitTest(5, 1) AS t0"
    ).first()
    assert (b["a"], b["o"], b["x"], b["n"], b["sl"], b["sr"], b["t1"], b["t0"]) == (
        8, 14, 6, -1, 16, 16, 1, 0
    )
