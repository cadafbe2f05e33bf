"""Dialect batch 10 (round 5): CH SQL-defined functions (CREATE FUNCTION
name AS (args) -> expr — textual macro expansion, CH's own evaluation
model) and the COLUMNS('regex') column selector.

Macros persist with the view registry, may call other macros
(fixpoint-bounded; true recursion refuses loudly), and their bodies pass
through the full read-rewrite + dialect chain, so a macro body may use
any CH spelling."""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def wh(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh10"))


@pytest.fixture(scope="module")
def eng(spark, wh):
    return Engine(spark, wh)


def one(eng, sql):
    return eng.sql(sql).first()["a"]


def test_create_function_basic_and_lambda_forms(eng):
    eng.sql("CREATE FUNCTION linear10 AS (x, k, b) -> k * x + b")
    assert one(eng, "SELECT linear10(2, 3, 1) AS a") == 7
    # single-param form without parens; body holds a nested HOF lambda
    eng.sql("CREATE FUNCTION doubleAll10 AS arr -> arrayMap(v -> v * 2, arr)")
    assert one(eng, "SELECT doubleAll10([1, 2]) AS a") == [2, 4]
    # macros may call macros
    eng.sql("CREATE FUNCTION lin210 AS x -> linear10(x, 2, 0)")
    assert one(eng, "SELECT lin210(5) AS a") == 10
    # arguments substitute parenthesized: precedence is preserved
    assert one(eng, "SELECT linear10(1 + 1, 3, 0) AS a") == 6


def test_create_function_lifecycle(eng):
    with pytest.raises(ValueError):
        eng.sql("CREATE FUNCTION linear10 AS x -> x")
    eng.sql("CREATE FUNCTION IF NOT EXISTS linear10 AS x -> x")
    assert one(eng, "SELECT linear10(2, 3, 1) AS a") == 7  # original kept
    eng.sql("DROP FUNCTION lin210")
    with pytest.raises(ValueError):
        eng.sql("DROP FUNCTION lin210")
    eng.sql("DROP FUNCTION IF EXISTS lin210")
    with pytest.raises(Exception):
        eng.sql("SELECT lin210(5) AS a")  # dropped: unresolved
    # wrong arity is a loud error
    with pytest.raises(ValueError):
        eng.sql("SELECT linear10(1) AS a")


def test_create_function_persists_across_engines(spark, wh, eng):
    assert one(eng, "SELECT linear10(2, 3, 1) AS a") == 7  # ensure created
    e2 = Engine(spark, wh)
    assert e2.sql("SELECT linear10(2, 3, 1) AS a").first()["a"] == 7


def test_function_name_inside_string_literal_is_data(eng):
    assert one(eng, "SELECT 'call linear10(1, 2, 3) here' AS a") == (
        "call linear10(1, 2, 3) here"
    )


def test_columns_regex_selector(eng):
    eng.sql(
        "CREATE TABLE ct10 (l_a UInt32, l_b UInt32, other UInt32) "
        "ENGINE = MergeTree ORDER BY l_a"
    )
    eng.sql("INSERT INTO ct10 VALUES (1, 2, 3)")
    r = eng.sql("SELECT COLUMNS('^l_') FROM ct10").first()
    assert r.asDict() == {"l_a": 1, "l_b": 2}
    # usable inside expressions-by-position too (CH allows aggregation over
    # the expansion): here via an explicit aggregate per match
    assert eng.sql("SELECT count() AS a FROM (SELECT COLUMNS('^l_') FROM ct10)").first()["a"] == 1
    with pytest.raises(ValueError):
        eng.sql("SELECT COLUMNS('^zzz') FROM ct10")


# -- string similarity + date-arithmetic batch --------------------------------


def test_string_similarity_functions(eng):
    # levenshtein golden (kitten→sitting = 3 edits)
    assert one(eng, "SELECT editDistance('kitten', 'sitting') AS a") == 3
    assert one(eng, "SELECT levenshteinDistance('ab', 'ba') AS a") == 2
    assert one(eng, "SELECT countMatches('a1b2c3', '[0-9]') AS a") == 3
    assert one(eng, "SELECT hasToken('Hello World', 'World') AS a") is True
    assert one(eng, "SELECT hasToken('HelloWorld', 'World') AS a") is False
    assert one(eng, "SELECT hasSubsequence('hello', 'hlo') AS a") is True
    assert one(eng, "SELECT hasSubsequence('hello', 'ohl') AS a") is False
    assert one(eng, "SELECT hasSubsequence('x', '') AS a") is True
    # chars {a,b,c} vs {b,c,d}: |∩|=2, |∪|=4
    assert one(eng, "SELECT stringJaccardIndex('abc', 'bcd') AS a") == 0.5
    assert one(eng, "SELECT ngramDistance('abcde', 'abcde') AS a") == 0.0
    assert one(eng, "SELECT ngramDistance('abcde', 'xyzzy') AS a") == 1.0
    assert one(eng, "SELECT initcapUTF8('hello world') AS a") == "Hello World"


def test_date_arithmetic_batch(eng):
    assert one(
        eng, "SELECT addMinutes(toDateTime('2024-01-01 00:00:00'), 90) AS a"
    ).isoformat() == "2024-01-01T01:30:00"
    # month arithmetic clamps to month end (CH behavior)
    assert one(
        eng, "SELECT addMonths(toDate('2024-01-31'), 1) AS a"
    ).isoformat() == "2024-02-29T00:00:00"
    assert one(
        eng, "SELECT subtractMonths(toDate('2024-03-31'), 1) AS a"
    ).isoformat() == "2024-02-29T00:00:00"
    assert one(
        eng, "SELECT addQuarters(toDate('2024-01-01'), 1) AS a"
    ).isoformat() == "2024-04-01T00:00:00"
    assert one(
        eng, "SELECT addYears(toDate('2024-02-29'), 1) AS a"
    ).isoformat() == "2025-02-28T00:00:00"
    # toTime pins the CH fixed date 1970-01-02
    assert one(
        eng, "SELECT toTime(toDateTime('2024-03-05 12:30:07')) AS a"
    ).isoformat() == "1970-01-02T12:30:07"
    assert one(
        eng, "SELECT toUnixTimestamp64Milli(toDateTime('2024-01-01 00:00:00')) AS a"
    ) == 1704067200000
    got = one(eng, "SELECT fromUnixTimestamp64Milli(1704067200123) AS a")
    assert got.microsecond == 123000
    assert one(
        eng, "SELECT toRelativeHourNum(toDateTime('1970-01-02 03:00:00')) AS a"
    ) == 27
    assert one(
        eng, "SELECT toRelativeMonthNum(toDateTime('2024-03-05 00:00:00')) AS a"
    ) == 2024 * 12 + 3
    assert one(eng, "SELECT now64() >= now() - INTERVAL 1 MINUTE AS a") is True


def test_julian_and_year_zero_days(eng):
    import datetime

    # public CH docs values
    assert one(eng, "SELECT toModifiedJulianDay('2020-01-01') AS a") == 58849
    assert one(eng, "SELECT fromModifiedJulianDay(58849) AS a").isoformat() == "2020-01-01"
    # proleptic Gregorian: ordinal (days since 0001-01-01, 1-based) + 365
    want = datetime.date(2023, 9, 8).toordinal() + 365
    assert one(eng, "SELECT toDaysSinceYearZero(toDate('2023-09-08')) AS a") == want
