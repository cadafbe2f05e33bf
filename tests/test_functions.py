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
