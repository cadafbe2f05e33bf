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
