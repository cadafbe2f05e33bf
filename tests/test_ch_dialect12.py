"""Dialect batch 12 (round 5, probe-driven): ISO year, 64-bit unix epochs,
XML component escapes, UUID binary forms, snowflake ids, the simpleJSON
family, maxIntersections, arrayShiftLeft/Right, unicode normalization,
map/array renames, randConstant.

Values verified against documented ClickHouse outputs (docs goldens) or
round-trip laws — never just "it runs" (the silent-wrong-answer trap class
from the round-5 probe workflow).
"""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh12")))


def one(eng, sql):
    return eng.sql(sql).first()["a"]


def test_iso_year_and_digit_dates(eng):
    # 2027-01-01 is a Friday: its ISO week's Thursday falls in 2026
    assert one(eng, "SELECT toISOYear(toDate('2027-01-01')) AS a") == 2026
    assert one(eng, "SELECT toISOYear(toDate('2026-06-01')) AS a") == 2026
    # 2024-12-30 is a Monday of ISO week 1 of 2025
    assert one(eng, "SELECT toISOYear(toDate('2024-12-30')) AS a") == 2025
    assert str(one(eng, "SELECT YYYYMMDDToDate(20260814) AS a")) == "2026-08-14"


def test_unix_timestamp64_family(eng):
    t = "toDateTime64('2026-01-01 00:00:00', 3)"
    assert one(eng, f"SELECT toUnixTimestamp64Milli({t}) AS a") == 1767225600000
    assert one(eng, f"SELECT toUnixTimestamp64Micro({t}) AS a") == 1767225600000000
    assert one(eng, f"SELECT toUnixTimestamp64Nano({t}) AS a") == 1767225600000000000
    with pytest.raises(NotImplementedError, match="timezone"):
        eng.sql("SELECT toDateTime64('2026-01-01 00:00:00', 3, 'UTC') AS a")


def test_xml_component_escapes(eng):
    assert (
        one(eng, "SELECT encodeXMLComponent('<a href=\"x\">''&''</a>') AS a")
        == "&lt;a href=&quot;x&quot;&gt;&apos;&amp;&apos;&lt;/a&gt;"
    )
    # decode(encode(x)) == x including the ampersand-last ordering trap
    assert (
        one(eng, "SELECT decodeXMLComponent(encodeXMLComponent('<a>\"x\" & ''y''</a>')) AS a")
        == "<a>\"x\" & 'y'</a>"
    )


def test_uuid_binary_forms(eng):
    u = "612f3c40-5d3b-217e-707b-6a546a3d7b29"
    assert one(eng, f"SELECT length(UUIDStringToNum('{u}')) AS a") == 16
    assert one(eng, f"SELECT UUIDNumToString(UUIDStringToNum('{u}')) AS a") == u


def test_snowflake_ids(eng):
    # docs example: 1426860702823350272 -> 2021-08-15 10:57:56 UTC; this
    # engine renders session-zone instants, so pin the roundtrip law plus
    # the epoch arithmetic on a known millisecond
    assert (
        str(one(eng, "SELECT snowflakeToDateTime(dateTimeToSnowflake(toDateTime('2026-08-14 12:00:00'))) AS a"))
        == "2026-08-14 12:00:00"
    )
    assert one(eng, "SELECT shiftright(dateTimeToSnowflake(toDateTime('2026-08-14 12:00:00')), 22) + 1288834974657 = unix_millis(toDateTime('2026-08-14 12:00:00')) AS a")


def test_simple_json_family(eng):
    j = "'{\"a\": 5, \"f\": 1.5, \"s\": \"x\", \"b\": true}'"
    assert one(eng, f"SELECT simpleJSONExtractInt({j}, 'a') AS a") == 5
    assert one(eng, f"SELECT simpleJSONExtractFloat({j}, 'f') AS a") == 1.5
    assert one(eng, f"SELECT simpleJSONExtractString({j}, 's') AS a") == "x"
    assert one(eng, f"SELECT simpleJSONExtractBool({j}, 'b') AS a") is True
    assert one(eng, f"SELECT simpleJSONHas({j}, 'a') AS a") is True
    assert one(eng, f"SELECT simpleJSONHas({j}, 'z') AS a") is False
    assert one(eng, "SELECT JSONExtractRaw('{\"a\": {\"b\": 1}}', 'a') AS a") == '{"b":1}'
    assert one(eng, "SELECT JSONExtractArrayRaw('{\"a\": [1, 2]}', 'a') AS a") == ["1", "2"]


def test_json_extract_keys_and_values(eng):
    rows = one(eng, "SELECT JSONExtractKeysAndValues('{\"a\": 1, \"b\": 2}', 'Int64') AS a")
    assert [(r["key"], r["value"]) for r in rows] == [("a", 1), ("b", 2)]
    with pytest.raises(NotImplementedError, match="literal type"):
        eng.sql("SELECT JSONExtractKeysAndValues('{}', x) AS a FROM (SELECT 'Int64' AS x)")


def test_max_intersections(eng):
    assert (
        one(eng, "SELECT maxIntersections(s, e) AS a FROM values('s Int64, e Int64', (1, 5), (2, 6), (3, 7))")
        == 3
    )
    # half-open: an interval ending at t does not intersect one starting at t
    assert (
        one(eng, "SELECT maxIntersections(s, e) AS a FROM values('s Int64, e Int64', (1, 3), (3, 5))")
        == 1
    )


def test_array_shift(eng):
    assert one(eng, "SELECT arrayShiftLeft([1, 2, 3], 1) AS a") == [2, 3, None]
    assert one(eng, "SELECT arrayShiftLeft([1, 2, 3], 2, 0) AS a") == [3, 0, 0]
    assert one(eng, "SELECT arrayShiftRight([1, 2, 3], 1, 9) AS a") == [9, 1, 2]
    # over-shift keeps the length, all fill
    assert one(eng, "SELECT arrayShiftLeft([1, 2], 5, 0) AS a") == [0, 0]


def test_unicode_normalization(eng):
    # e + combining acute (NFD) composes to U+00E9 under NFC and back
    assert one(eng, "SELECT normalizeUTF8NFC('é') AS a") == "é"
    assert one(eng, "SELECT length(normalizeUTF8NFD('é')) AS a") == 2
    # NFKC folds compatibility forms (ligature fi)
    assert one(eng, "SELECT normalizeUTF8NFKC('ﬁ') AS a") == "fi"


def test_map_and_array_renames(eng):
    assert one(eng, "SELECT mapContainsKeyLike(map('abc', 1), 'ab%') AS a") is True
    assert one(eng, "SELECT mapContainsKeyLike(map('abc', 1), 'zz%') AS a") is False
    assert one(eng, "SELECT mapFromArrays(['a'], [1]) AS a") == {"a": 1}
    assert sorted(one(eng, "SELECT arrayUnion([1, 2], [2, 3]) AS a")) == [1, 2, 3]
    assert sorted(one(eng, "SELECT arrayShuffle([1, 2, 3]) AS a")) == [1, 2, 3]
    assert one(eng, "SELECT regexpExtract('a12b', '([0-9]+)') AS a") == "12"


def test_rand_constant_is_constant_per_query(eng):
    rows = eng.sql(
        "SELECT randConstant() AS a FROM (SELECT number FROM numbers(5))"
    ).collect()
    assert len({r["a"] for r in rows}) == 1
    assert all(0 <= r["a"] < 2**32 for r in rows)
