"""Round-5 dialect batch 6: URL functions, regex extract family,
multi-substring search, IPv4 helpers, readable-quantity / bar display
helpers, geo distance, trim/pad flat spellings, and GROUP BY ALL.

Goldens are ClickHouse's documented outputs for the same expressions
(URL function examples follow the CH docs' canonical test URL). Known
documented deviations: leftPad/rightPad count codepoints (CH's plain
forms count bytes — identical for ASCII), encodeURLComponent follows
Java's unreserved set beyond the space→%20 fix, and extract/extractAll
with a NON-literal pattern extract the whole match rather than group 1.
"""

import pytest

from clickhousedatamocker_spark.engine import Engine

from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


_U = "'https://paul@www.example.com:8080/top/news.html?page=2&lr=213#comments'"

URL_GOLDENS = [
    (f"SELECT protocol({_U}) AS a", "https"),
    (f"SELECT domain({_U}) AS a", "www.example.com"),
    # scheme-less URLs work too (CH's forgiving parse)
    ("SELECT domain('some.svn-hosting.com:80/repo/trunk') AS a", "some.svn-hosting.com"),
    (f"SELECT domainWithoutWWW({_U}) AS a", "example.com"),
    (f"SELECT topLevelDomain({_U}) AS a", "com"),
    ("SELECT topLevelDomain('http://localhost:9000/x') AS a", ""),
    (f"SELECT firstSignificantSubdomain({_U}) AS a", "example"),
    # registrar-style second level: the significant label hops one left
    ("SELECT firstSignificantSubdomain('https://news.clickhouse.com.tr/') AS a", "clickhouse"),
    (f"SELECT cutToFirstSignificantSubdomain({_U}) AS a", "example.com"),
    ("SELECT cutToFirstSignificantSubdomain('https://news.clickhouse.com.tr/') AS a", "clickhouse.com.tr"),
    (f"SELECT path({_U}) AS a", "/top/news.html"),
    (f"SELECT pathFull({_U}) AS a", "/top/news.html?page=2&lr=213#comments"),
    (f"SELECT queryString({_U}) AS a", "page=2&lr=213"),
    (f"SELECT fragment({_U}) AS a", "comments"),
    (f"SELECT queryStringAndFragment({_U}) AS a", "page=2&lr=213#comments"),
    (f"SELECT netloc({_U}) AS a", "paul@www.example.com:8080"),
    (f"SELECT extractURLParameter({_U}, 'page') AS a", "2"),
    (f"SELECT extractURLParameter({_U}, 'lr') AS a", "213"),
    (f"SELECT extractURLParameter({_U}, 'missing') AS a", ""),
    (
        f"SELECT cutQueryString({_U}) AS a",
        "https://paul@www.example.com:8080/top/news.html#comments",
    ),
    (
        f"SELECT cutFragment({_U}) AS a",
        "https://paul@www.example.com:8080/top/news.html?page=2&lr=213",
    ),
    (
        f"SELECT cutQueryStringAndFragment({_U}) AS a",
        "https://paul@www.example.com:8080/top/news.html",
    ),
    ("SELECT cutWWW('https://www.example.com/x') AS a", "https://example.com/x"),
    ("SELECT cutQueryString('http://e.com/a') AS a", "http://e.com/a"),
    # '+' survives decode (CH is percent-decoding only, NOT form-encoding)
    ("SELECT decodeURLComponent('a+b%20c%3B') AS a", "a+b c;"),
    ("SELECT encodeURLComponent('SELECT 1;') AS a", "SELECT%201%3B"),
]


@pytest.mark.parametrize("sql,want", URL_GOLDENS)
def test_url_vocabulary(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    assert got == want, f"{sql}: got {got!r} want {want!r}"


STRING_IP_GOLDENS = [
    # extract: group 1 when the literal pattern has a capturing group,
    # whole match otherwise — CH's exact contract
    ("SELECT extract('hello123world', '[0-9]+') AS a", "123"),
    ("SELECT extract('hello', 'e(l+)') AS a", "ll"),
    ("SELECT extract('no digits', '[0-9]+') AS a", ""),
    # non-capturing groups don't count as capture groups
    ("SELECT extract('abcabc', '(?:ab)c') AS a", "abc"),
    ("SELECT extractAll('a1b22c333', '[0-9]+') AS a", ["1", "22", "333"]),
    ("SELECT extractAll('k1=v1&k2=v2', '=(\\\\w+)') AS a", ["v1", "v2"]),
    # native Spark extract must survive the shim untouched
    ("SELECT extract(YEAR FROM TIMESTAMP '2024-01-02 03:04:05') AS a", 2024),
    ("SELECT multiSearchAny('Hello, World', ['o', 'zzz']) AS a", 1),
    ("SELECT multiSearchAny('Hello, World', ['x', 'zzz']) AS a", 0),
    ("SELECT multiSearchAnyCaseInsensitive('Hello', ['HELL']) AS a", 1),
    ("SELECT countSubstrings('aaaa', 'aa') AS a", 2),
    ("SELECT countSubstrings('abc', 'z') AS a", 0),
    ("SELECT unhex('616263') AS a", "abc"),
    ("SELECT hex('abc') AS a", "616263"),
    ("SELECT trimLeft('  ab ') AS a", "ab "),
    ("SELECT trimRight('  ab ') AS a", "  ab"),
    ("SELECT trimBoth('  ab ') AS a", "ab"),
    ("SELECT leftPad('abc', 5) AS a", "  abc"),
    ("SELECT leftPad('abc', 5, '*') AS a", "**abc"),
    ("SELECT rightPad('abc', 5, '*') AS a", "abc**"),
    ("SELECT leftPadUTF8('abc', 2) AS a", "ab"),
    ("SELECT concatWithSeparator('-', 'a', 'b') AS a", "a-b"),
    ("SELECT IPv4NumToString(3232235521) AS a", "192.168.0.1"),
    ("SELECT IPv4NumToString(0) AS a", "0.0.0.0"),
    ("SELECT IPv4StringToNum('192.168.0.1') AS a", 3232235521),
    ("SELECT IPv4NumToString(IPv4StringToNum('1.2.3.4')) AS a", "1.2.3.4"),
    ("SELECT formatReadableQuantity(123) AS a", "123.00"),
    ("SELECT formatReadableQuantity(1024) AS a", "1.02 thousand"),
    ("SELECT formatReadableQuantity(1234567) AS a", "1.23 million"),
    ("SELECT formatReadableQuantity(1234567890123) AS a", "1.23 trillion"),
    ("SELECT bar(5, 0, 10, 10) AS a", "█" * 5),
    ("SELECT bar(1, 0, 16, 2) AS a", "▏"),
    ("SELECT bar(0, 0, 10, 10) AS a", ""),
    # clamped at the top end: exactly `width` full blocks
    ("SELECT bar(99, 0, 10, 10) AS a", "█" * 10),
]


@pytest.mark.parametrize("sql,want", STRING_IP_GOLDENS)
def test_string_ip_vocabulary(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    assert got == want, f"{sql}: got {got!r} want {want!r}"


def test_great_circle_distance_matches_ch_golden(eng):
    # CH docs: greatCircleDistance(55.755831, 37.617673, -55.755831,
    # -37.617673) ≈ 14132374.19 m; the haversine sphere model agrees to
    # within 0.05%
    got = eng.sql(
        "SELECT greatCircleDistance(55.755831, 37.617673, -55.755831, -37.617673) AS a"
    ).first()["a"]
    assert abs(got - 14132374.0) / 14132374.0 < 5e-4, got


def test_group_by_all_passthrough(eng):
    # CH and Spark both spell GROUP BY ALL; it must survive translation
    eng.spark.read.parquet(f"{SF_DIR}/nation.parquet").createOrReplaceTempView(
        "nation_gba"
    )
    got = eng.sql(
        "SELECT n_regionkey, count() AS c FROM nation_gba GROUP BY ALL ORDER BY n_regionkey"
    ).collect()
    assert len(got) == 5 and all(r["c"] == 5 for r in got)


def test_url_functions_stay_jvm_side(eng):
    # the whole URL family must compile to built-in expressions — no
    # BatchEvalPython / Python UDFs anywhere in the plan
    df = eng.sql(
        f"SELECT domain({_U}) AS d, firstSignificantSubdomain({_U}) AS s, "
        f"pathFull({_U}) AS p, extractURLParameter({_U}, 'page') AS q"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
