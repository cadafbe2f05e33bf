"""Dialect batch 19 (probe-driven, round 7): map sorting, byte Hamming,
the changeYear/...Second date-component family (saturating, CH docs
examples), UTC conversions, literal-scale decimal conversions, -If
distinct/median forms, and loud gates for 128/256-bit ints + full HTML
entity decoding."""

import pytest


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    return Engine(spark, str(tmp_path_factory.mktemp("wh19")))


GOLDENS = [
    # CH docs: mapSort sorts by key ascending; mapReverseSort descending
    ("SELECT toJSONString(mapSort(map('b', 1, 'a', 2))) AS v", '{"a":2,"b":1}'),
    ("SELECT toJSONString(mapReverseSort(map('a', 2, 'b', 1))) AS v", '{"b":1,"a":2}'),
    # byte Hamming: common-prefix mismatches + length difference
    ("SELECT byteHammingDistance('abc', 'abd') AS v", 1),
    ("SELECT byteHammingDistance('abc', 'ab') AS v", 1),
    ("SELECT byteHammingDistance('', 'xy') AS v", 2),
    ("SELECT byteHammingDistance('same', 'same') AS v", 0),
    # BYTE-wise, as CH defines it: 'é' is 0xC3 0xA9 vs 'e' 0x65 — one
    # mismatching byte plus one length byte (a character-based spelling
    # would answer 1)
    ("SELECT byteHammingDistance('é', 'e') AS v", 2),
    ("SELECT byteHammingDistance('aé', 'aé') AS v", 0),
    # timeDiff(first, second) = second - first in seconds
    (
        "SELECT timeDiff(toDateTime('2026-01-01 00:00:00'), "
        "toDateTime('2026-01-01 00:01:30')) AS v",
        90,
    ),
    # changeX family (CH docs examples; result is TIMESTAMP — Date inputs
    # land at midnight, documented deviation)
    (
        "SELECT toString(changeYear(toDateTime('2024-03-05 10:20:30'), 2021)) AS v",
        "2021-03-05 10:20:30",
    ),
    (
        "SELECT toString(changeMonth(toDateTime('2024-03-05 10:20:30'), 7)) AS v",
        "2024-07-05 10:20:30",
    ),
    (
        "SELECT toString(changeDay(toDateTime('2024-03-05 10:20:30'), 25)) AS v",
        "2024-03-25 10:20:30",
    ),
    (
        "SELECT toString(changeHour(toDateTime('2024-03-05 10:20:30'), 23)) AS v",
        "2024-03-05 23:20:30",
    ),
    (
        "SELECT toString(changeMinute(toDateTime('2024-03-05 10:20:30'), 0)) AS v",
        "2024-03-05 10:00:30",
    ),
    (
        "SELECT toString(changeSecond(toDateTime('2024-03-05 10:20:30'), 59)) AS v",
        "2024-03-05 10:20:59",
    ),
    # saturation: day 31 in February clamps to the month's last day
    (
        "SELECT toString(changeDay(toDateTime('2024-02-10 00:00:00'), 31)) AS v",
        "2024-02-29 00:00:00",
    ),
    # the day clamps against the TARGET (year, month) — the naive spelling
    # builds Feb 29 in a non-leap year / Feb 31 and throws under ANSI
    (
        "SELECT toString(changeYear(toDateTime('2024-02-29 08:00:00'), 2021)) AS v",
        "2021-02-28 08:00:00",
    ),
    (
        "SELECT toString(changeMonth(toDateTime('2024-03-31 08:00:00'), 2)) AS v",
        "2024-02-29 08:00:00",
    ),
    ("SELECT toString(changeYear(toDate('2024-03-05'), 2021)) AS v", "2021-03-05 00:00:00"),
    # UTC conversions (Spark builtins under CH spellings)
    (
        "SELECT toString(toUTCTimestamp(toDateTime('2024-02-24 12:00:00'), 'Asia/Shanghai')) AS v",
        "2024-02-24 04:00:00",
    ),
    (
        "SELECT toString(fromUTCTimestamp(toDateTime('2024-02-24 12:00:00'), 'Asia/Shanghai')) AS v",
        "2024-02-24 20:00:00",
    ),
    # literal-scale decimal conversions
    ("SELECT toString(toDecimal32('1.555', 2)) AS v", "1.56"),
    ("SELECT toString(toDecimal64(10.5, 2)) AS v", "10.50"),
    ("SELECT toString(toDecimal128('-99.9', 1)) AS v", "-99.9"),
    # distinct / median -If forms
    (
        "SELECT countDistinctIf(x, x > 1) AS v FROM "
        "(SELECT explode(array(1, 2, 2, 3)) AS x)",
        2,
    ),
    (
        "SELECT sumDistinctIf(x, x > 1) AS v FROM "
        "(SELECT explode(array(1, 2, 2, 3)) AS x)",
        5,
    ),
    (
        "SELECT medianIf(x, x <= 3) AS v FROM (SELECT explode(sequence(1, 5)) AS x)",
        2.0,
    ),
    # batch-20 tail: camelCase window aliases, group-wide array intersection
    (
        "SELECT rowNumber() OVER (ORDER BY x) AS v FROM "
        "(SELECT explode(sequence(5, 7)) AS x) ORDER BY v LIMIT 1",
        1,
    ),
    (
        "SELECT denseRank() OVER (ORDER BY x) AS v FROM "
        "(SELECT explode(array(1, 1, 2)) AS x) ORDER BY v DESC LIMIT 1",
        2,
    ),
    (
        "SELECT array_sort(groupArrayIntersect(a)) AS v FROM "
        "(SELECT array(1, 2, 3) AS a UNION ALL SELECT array(2, 3, 4) "
        "UNION ALL SELECT array(3, 2))",
        [2, 3],
    ),
    (
        "SELECT countIfDistinct(x, x > 1) AS v FROM "
        "(SELECT explode(array(1, 2, 2, 3)) AS x)",
        2,
    ),
]


@pytest.mark.parametrize("sql,want", GOLDENS, ids=[g[0][:64] for g in GOLDENS])
def test_batch19_goldens(eng, sql, want):
    got = eng.sql(sql).first()["v"]
    assert got == want


def test_batch19_gates(eng):
    with pytest.raises(NotImplementedError, match="DECIMAL\\(38\\)"):
        eng.sql("SELECT toDecimal256('1.5', 2) AS v")
    for fn in ("toUInt128", "toInt128", "toUInt256", "toInt256"):
        with pytest.raises(NotImplementedError, match=fn):
            eng.sql(f"SELECT {fn}('5') AS v")
    # decodeHTMLComponent / URLHierarchy graduated from gates to shims in
    # batch 21 — goldens live in tests/test_ch_dialect21.py
    with pytest.raises(NotImplementedError, match="comparator"):
        eng.sql("SELECT mapSort((l, r) -> l, map('a', 1)) AS v")
    with pytest.raises(NotImplementedError, match="integer literal"):
        eng.sql("SELECT toDecimal32('1.5', x) AS v FROM (SELECT 2 AS x)")
