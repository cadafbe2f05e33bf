"""Dialect batch 18 (probe-driven, round 7): string/date/array stragglers
(firstLine, toMillisecond, arrayZipUnaligned, variadic arrayIntersect,
hasAnyTokens/hasAllTokens, dateTrunc, connectionId) and loud gates for
truncating decimal arithmetic + JSON-type introspection."""

import pytest


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    return Engine(spark, str(tmp_path_factory.mktemp("wh18")))


GOLDENS = [
    # firstLine: everything before the first newline (CH docs example shape)
    (r"SELECT firstLine('foo\nbar\nbaz') AS v", "foo"),
    ("SELECT firstLine('single') AS v", "single"),
    # toMillisecond of a sub-second timestamp
    (
        "SELECT toMillisecond(toDateTime64('2023-04-21 10:20:30.456', 3)) AS v",
        456,
    ),
    ("SELECT toMillisecond(toDateTime('2023-04-21 10:20:30')) AS v", 0),
    # dateTrunc camelCase alias
    (
        "SELECT toString(dateTrunc('hour', toDateTime('2026-01-01 12:22:33'))) AS v",
        "2026-01-01 12:00:00",
    ),
    # variadic arrayIntersect (CH docs: intersect of all arguments)
    ("SELECT arrayIntersect([1, 2], [1, 3], [1, 4]) AS v", [1]),
    ("SELECT arrayIntersect([1, 2], [2, 3]) AS v", [2]),
    # token predicates over the CH default tokenizer (alnum runs)
    ("SELECT hasAnyTokens('Hello, world!', ['hello', 'world']) AS v", True),
    ("SELECT hasAnyTokens('Hello, world!', ['nope']) AS v", False),
    ("SELECT hasAllTokens('Hello, world!', ['Hello', 'world']) AS v", True),
    ("SELECT hasAllTokens('Hello, world!', ['Hello', 'nope']) AS v", False),
    # connectionId: single in-process connection
    ("SELECT connectionId() AS v", 0),
]


@pytest.mark.parametrize("sql,want", GOLDENS, ids=[g[0][:60] for g in GOLDENS])
def test_batch18_goldens(eng, sql, want):
    got = eng.sql(sql).first()["v"]
    if isinstance(want, list):
        assert list(got) == want
    else:
        assert got == want


def test_array_zip_unaligned(eng):
    # CH pads the shorter arrays with NULLs (unlike arrayZip, which throws)
    rows = eng.sql(
        "SELECT arrayZipUnaligned(['a'], [1, 2, 3]) AS v"
    ).first()["v"]
    assert [(r["col1"], r["col2"]) for r in rows] == [
        ("a", 1),
        (None, 2),
        (None, 3),
    ]
    # three arrays + both-empty guard (sequence(1,0) would descend)
    rows = eng.sql("SELECT arrayZipUnaligned([1], [2], []) AS v").first()["v"]
    assert [(r["col1"], r["col2"], r["col3"]) for r in rows] == [(1, 2, None)]
    assert eng.sql("SELECT arrayZipUnaligned([], []) AS v").first()["v"] == []


def test_batch18_gates(eng):
    with pytest.raises(NotImplementedError, match="truncates the result"):
        eng.sql("SELECT divideDecimal(toDecimal64(10.5, 2), toDecimal64(3, 0)) AS v")
    with pytest.raises(NotImplementedError, match="truncates the result"):
        eng.sql("SELECT multiplyDecimal(toDecimal64(10.5, 2), toDecimal64(3, 0)) AS v")
    with pytest.raises(NotImplementedError, match="JSON object type"):
        eng.sql("SELECT JSONAllPaths('{\"a\":1}') AS v")
