"""Dialect batch 22 (round 8, probe-driven): URL parameter names,
ngramSearch, multi-array arrayFilter / arraySum / arrayAvg lambda forms,
case-insensitive substring/match counters, hasToken*OrNull, the checked
-OrDefault conversion family, Snowflake-ID / UUIDv7 timestamp extraction
(snowflakeToDateTime golden is the ClickHouse docs example verbatim),
toYYYYMMDDhhmmss, topKIf, arrayROCAUC; loud gates for the
non-expressible tails."""

import datetime

import pytest


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    return Engine(spark, str(tmp_path_factory.mktemp("wh22")))


GOLDENS = [
    # URL parameter names, in order; '?flag' without '=' contributes
    # 'flag'; no query string -> []
    (
        "SELECT extractURLParameterNames('http://x.com/?a=1&b=2&flag') AS v",
        ["a", "b", "flag"],
    ),
    ("SELECT extractURLParameterNames('http://x.com/path') AS v", []),
    # ngramSearch: needle-gram coverage in [0, 1] (set form, the
    # ngramDistance deviation note applies)
    ("SELECT round(ngramSearch('abcdefgh', 'abcd'), 4) AS v", 1.0),
    ("SELECT ngramSearch('abcdefgh', 'zzzzz') AS v", 0.0),
    ("SELECT round(ngramSearch('abcdex', 'abcde'), 4) AS v", 1.0),
    # numeric render of a timestamp
    ("SELECT toYYYYMMDDhhmmss(toDateTime('2024-01-05 14:37:21')) AS v", 20240105143721),
    # case-insensitive counters
    ("SELECT countSubstringsCaseInsensitive('AaAa', 'aa') AS v", 2),
    ("SELECT countSubstringsCaseInsensitive('abc', '') AS v", 0),
    ("SELECT countMatchesCaseInsensitive('AaA', 'a') AS v", 3),
    # hasToken*OrNull: NULL when the needle is not a single token
    ("SELECT hasTokenOrNull('hello world', 'world') AS v", True),
    ("SELECT hasTokenOrNull('hello world', 'wo rld') AS v", None),
    ("SELECT hasTokenOrNull('hello world', 'wor-ld') AS v", None),
    ("SELECT hasTokenCaseInsensitiveOrNull('Hello', 'HELLO') AS v", True),
    # -OrDefault family: caller default on parse failure AND on the CH
    # range guard; parsable values pass through; 1-arg form == -OrZero
    ("SELECT toInt32OrDefault('bad', 7) AS v", 7),
    ("SELECT toInt32OrDefault('5', 7) AS v", 5),
    ("SELECT toUInt8OrDefault('300', 9) AS v", 9),
    ("SELECT toFloat64OrDefault('x') AS v", 0.0),
    (
        "SELECT toDateOrDefault('bad', toDate('2024-01-01')) AS v",
        datetime.date(2024, 1, 1),
    ),
    # multi-array lambda forms
    ("SELECT arrayFilter((x, y) -> y, ['a','b','c'], [0,1,1]) AS v", ["b", "c"]),
    ("SELECT arrayFilter(x -> x > 1, [1,2,3]) AS v", [2, 3]),
    ("SELECT arrayFilter((x, y) -> y, slice(['a'], 1, 0), slice([1], 1, 0)) AS v", []),
    ("SELECT arraySum(x -> x * 2, [1, 2, 3]) AS v", 12.0),
    ("SELECT arraySum((x, y) -> x * y, [1,2], [10,20]) AS v", 50.0),
    ("SELECT arraySum([1.0, 2.0]) AS v", 3.0),  # 1-array form still the SQL UDF
    ("SELECT arrayAvg(x -> x * 2, [1, 2, 3]) AS v", 4.0),
    # ROC-AUC alias
    ("SELECT round(arrayROCAUC([0.1,0.4,0.35,0.8], [0,0,1,1]), 4) AS v", 0.75),
    # topKIf: exact heavy hitters over the matching rows only
    ("SELECT topKIf(2)(x, x > 0) AS v FROM VALUES (1),(1),(2),(-5) AS t(x)", [1, 2]),
    # Snowflake legacy epoch — the ClickHouse docs example verbatim:
    # snowflakeToDateTime(1426860702823350272) = 2021-08-15 10:57:56 UTC
    (
        "SELECT toString(snowflakeToDateTime(1426860702823350272)) AS v",
        "2021-08-15 10:57:56",
    ),
    # ID form: ms = id >> 22 (+ optional epoch); 64 variant keeps millis
    (
        "SELECT toString(snowflakeIDToDateTime(7204148689433034752)) AS v",
        "2024-06-05 15:54:54",
    ),
    (
        "SELECT unix_millis(snowflakeIDToDateTime64(7204148689433034752)) AS v",
        7204148689433034752 >> 22,
    ),
    (
        "SELECT snowflakeIDToDateTime(4096000, 1288834974657) = "
        "snowflakeToDateTime(4096000) AS v",
        True,
    ),
    # roundtrip: encode keeps the top 42 bits (sequence/machine bits zero)
    (
        "SELECT dateTimeToSnowflakeID(snowflakeIDToDateTime64(7204148689433034752)) AS v",
        (7204148689433034752 >> 22) << 22,
    ),
    # UUIDv7: unix-ms in the top 48 bits (RFC 9562)
    (
        "SELECT unix_millis(UUIDv7ToDateTime('018f05af-f4a8-778f-86ea-1d157db7987b')) AS v",
        int("018f05aff4a8", 16),
    ),
]


@pytest.mark.parametrize("sql,expected", GOLDENS, ids=[g[0][:70] for g in GOLDENS])
def test_batch22_goldens(eng, sql, expected):
    got = eng.sql(sql).collect()[0]["v"]
    if isinstance(expected, list):
        got = list(got)
    assert got == expected, f"{sql}\n got: {got!r}\n want: {expected!r}"


def test_batch22_gates(eng):
    for sql, msg in [
        ("SELECT tupleToNameValuePairs((1, 2)) AS v", "map_entries"),
        ("SELECT arrayNormalizedGini([1,2,3]) AS v", "cumulative"),
        ("SELECT randPoisson(5) AS v", "mapInPandas"),
        ("SELECT randBinomial(10, 0.5) AS v", "mapInPandas"),
        ("SELECT arrayFilter((x, y, z) -> x, [1], [1], [1]) AS v", "1 or 2 array"),
        ("SELECT snowflakeToDateTime(1, 'UTC') AS v", "UTC"),
    ]:
        with pytest.raises(NotImplementedError, match=msg):
            eng.sql(sql)
