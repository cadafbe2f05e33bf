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
    # round-5 advisory: with MORE than one named table the selector cannot
    # know which SELECT it belongs to — refuse loudly, never expand the
    # wrong table's columns
    eng.sql(
        "CREATE TABLE ct10b (r_a UInt32, r_b UInt32) ENGINE = MergeTree ORDER BY r_a"
    )
    eng.sql("INSERT INTO ct10b VALUES (7, 8)")
    with pytest.raises(NotImplementedError, match="exactly ONE named table"):
        eng.sql(
            "SELECT COLUMNS('^l_') FROM ct10 JOIN ct10b ON ct10.l_a = ct10b.r_a"
        )
    with pytest.raises(NotImplementedError, match="exactly ONE named table"):
        eng.sql(
            "SELECT COLUMNS('^l_') FROM ct10 "
            "WHERE l_a IN (SELECT r_a FROM ct10b)"
        )


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


# -- math / bit / rand / parseDateTime batch ----------------------------------


def test_special_math_matches_python(eng):
    import math

    for x in [0.1, 0.5, 1.0, 2.0, -1.5]:
        assert abs(one(eng, f"SELECT erf({x}) AS a") - math.erf(x)) < 2e-7, x
        assert abs(one(eng, f"SELECT erfc({x}) AS a") - math.erfc(x)) < 2e-7, x
    for x in [0.5, 1.0, 2.5, 5.0, 10.0]:
        assert abs(one(eng, f"SELECT lgamma({x}) AS a") - math.lgamma(x)) < 1e-8, x
        assert abs(one(eng, f"SELECT tgamma({x}) AS a") - math.gamma(x)) < 1e-6 * math.gamma(x), x


def test_bit_batch2(eng):
    assert one(eng, "SELECT bitRotateLeft(1, 1) AS a") == 2
    assert one(eng, "SELECT bitRotateRight(2, 1) AS a") == 1
    # 64-bit wraparound law
    assert one(eng, "SELECT bitRotateRight(bitRotateLeft(12345, 17), 17) AS a") == 12345
    # public CH docs golden
    assert one(eng, "SELECT byteSwap(3351772109) AS a") == 3455829959
    # mortonEncode(3, 1) interleaves to 7 (docs example); decode round-trips
    assert one(eng, "SELECT mortonEncode(3, 1) AS a") == 7
    r = eng.sql("SELECT mortonDecode(mortonEncode(123, 456)) AS a").first()["a"]
    assert (r["col1"], r["col2"]) == (123, 456)
    assert one(eng, "SELECT bin(5) AS a") == "00000101"  # CH pads to bytes
    assert one(eng, "SELECT bin(256) AS a") == "0000000100000000"
    assert one(eng, "SELECT unbin('00000101') AS a") == "\x05"
    assert one(eng, "SELECT bitTestAll(7, 0, 1, 2) AS a") is True
    assert one(eng, "SELECT bitTestAll(5, 1) AS a") is False
    assert one(eng, "SELECT bitTestAny(8, 0, 3) AS a") is True
    assert one(eng, "SELECT bitTestAny(8, 0, 1) AS a") is False


def test_rand_family_contracts(eng):
    # CH rand() is UInt32-uniform: `% 10` must yield an INTEGER in [0, 10)
    got = one(eng, "SELECT rand() % 10 AS a")
    assert got == int(got) and 0 <= got < 10
    big = one(eng, "SELECT rand() AS a")
    assert 0 <= big < 2**32 and big == int(big)
    assert 0 <= one(eng, "SELECT rand64() AS a") < 2**63
    assert 0.0 <= one(eng, "SELECT randCanonical() AS a") < 1.0
    assert 1.0 <= one(eng, "SELECT randUniform(1, 5) AS a") <= 5.0
    assert 99.0 <= one(eng, "SELECT randNormal(100, 0.001) AS a") <= 101.0
    assert one(eng, "SELECT randBernoulli(1.0) AS a") == 1


def test_parse_datetime_mysql_tokens(eng):
    got = one(eng, "SELECT parseDateTime('2024-03-05 12:30:07', '%Y-%m-%d %H:%i:%S') AS a")
    assert got.isoformat() == "2024-03-05T12:30:07"
    assert one(eng, "SELECT parseDateTimeOrNull('nope', '%Y-%m-%d') AS a") is None
    got0 = one(eng, "SELECT parseDateTimeOrZero('nope', '%Y-%m-%d') AS a")
    assert got0.isoformat() == "1970-01-01T00:00:00"
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT parseDateTime('x', '%Q') AS a")  # unknown token
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT parseDateTime('x', fmt_col) AS a")  # dynamic format


def test_array_last_and_jaccard(eng):
    assert one(eng, "SELECT arrayLast(x -> x < 3, [1, 2, 3]) AS a") == 2
    assert one(eng, "SELECT arrayLastIndex(x -> x < 3, [1, 2, 3]) AS a") == 2
    assert one(eng, "SELECT arrayLastIndex(x -> x > 9, [1, 2]) AS a") == 0
    assert one(eng, "SELECT arrayFirstOrNull(x -> x > 9, [1, 2]) AS a") is None
    assert one(eng, "SELECT arrayJaccardIndex([1, 2], [2, 3]) AS a") == pytest.approx(1 / 3)
    assert one(eng, "SELECT leftUTF8('héllo', 2) AS a") == "hé"
    assert one(eng, "SELECT substringIndex('a.b.c', '.', 2) AS a") == "a.b"


# -- map HOFs / enumerate / base64url batch -----------------------------------


def test_map_hofs(eng):
    assert one(eng, "SELECT mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)) AS a") == {"b": 2}
    assert one(eng, "SELECT mapConcat(map('a', 1), map('b', 2)) AS a") == {"a": 1, "b": 2}
    # update: right side wins on collision (map_concat would throw)
    assert one(eng, "SELECT mapUpdate(map('a', 1, 'b', 2), map('b', 9)) AS a") == {"a": 1, "b": 9}
    assert one(
        eng, "SELECT mapExists((k, v) -> k = 'b' AND v = 2, map('a', 1, 'b', 2)) AS a"
    ) is True
    assert one(eng, "SELECT mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) AS a") is True
    assert one(eng, "SELECT mapAll((k, v) -> v > 1, map('a', 1, 'b', 2)) AS a") is False
    # mapApply graduated to a real rewrite in r9 — goldens in
    # tests/test_ch_dialect26.py::test_map_apply_real_rewrite
    assert one(eng, "SELECT mapApply((k, v) -> (k, v * 2), map('a', 1)) AS a") == {"a": 2}


def test_array_enumerate_variants(eng):
    # occurrence index of each element (1st, 2nd, ... appearance)
    assert one(eng, "SELECT arrayEnumerateUniq([10, 20, 10, 30, 10]) AS a") == [1, 1, 2, 1, 3]
    # dense rank by first appearance
    assert one(eng, "SELECT arrayEnumerateDense([10, 20, 10, 30]) AS a") == [1, 2, 1, 3]


def test_base64_url_and_try(eng):
    assert one(eng, "SELECT tryBase64Decode(base64Encode('abc')) AS a") == "abc"
    assert one(eng, "SELECT tryBase64Decode('###') AS a") == ""
    s = "https://a.com/?x=1&y=2~~~"
    got = one(eng, f"SELECT base64URLDecode(base64URLEncode('{s}')) AS a")
    assert got == s
    # url-safe alphabet: no +, /, or = in the encoded form
    enc = one(eng, f"SELECT base64URLEncode('{s}') AS a")
    assert not any(c in enc for c in "+/=")


def test_live_window_view_gates(eng):
    for q in [
        "CREATE LIVE VIEW lv AS SELECT 1",
        "CREATE WINDOW VIEW wv AS SELECT count() FROM t GROUP BY tumble(now(), INTERVAL 5 SECOND)",
        "WATCH lv",
    ]:
        with pytest.raises(NotImplementedError):
            eng.sql(q)


# -- near-dup fingerprints, WITH TIES, FETCH ----------------------------------


def test_minhash_simhash_fingerprints(eng):
    # determinism + equality law
    assert one(eng, "SELECT ngramMinHash('abcdef') = ngramMinHash('abcdef') AS a") is True
    t = eng.sql("SELECT ngramMinHash('ClickHouse') AS a").first()["a"]
    assert t["col1"] <= t["col2"]
    assert one(
        eng, "SELECT wordShingleMinHash('a b c d e') = wordShingleMinHash('a b c d e') AS a"
    ) is True
    # SimHash locality: one-character edit stays Hamming-close, unrelated
    # text is Hamming-far (the property the fingerprint exists for)
    near = one(
        eng,
        "SELECT bitCount(bitXor(ngramSimHash('the quick brown fox jumps'), "
        "ngramSimHash('the quick brown fox jumped'))) AS a",
    )
    far = one(
        eng,
        "SELECT bitCount(bitXor(ngramSimHash('the quick brown fox jumps'), "
        "ngramSimHash('zzz qqq vvv kkk www yyy'))) AS a",
    )
    assert near < far
    assert one(
        eng, "SELECT wordShingleSimHash('a b c') = wordShingleSimHash('a b c') AS a"
    ) is True


def test_limit_with_ties_and_fetch(eng):
    # 9 rows of k in {0,1,2}: LIMIT 2 WITH TIES keeps ALL the k=0 ties
    rows = eng.sql(
        "SELECT number % 3 AS k FROM numbers(9) ORDER BY k LIMIT 2 WITH TIES"
    ).collect()
    assert [r["k"] for r in rows] == [0, 0, 0]
    rows = eng.sql(
        "SELECT number FROM numbers(10) ORDER BY number "
        "OFFSET 2 ROWS FETCH NEXT 3 ROWS ONLY"
    ).collect()
    assert [r["number"] for r in rows] == [2, 3, 4]
    rows = eng.sql(
        "SELECT number FROM numbers(10) ORDER BY number FETCH FIRST 2 ROWS ONLY"
    ).collect()
    assert [r["number"] for r in rows] == [0, 1]


def test_corr_matrix_and_random_sample(eng):
    m = one(
        eng,
        "SELECT corrMatrix(x, y) AS a FROM VALUES (1.0, 2.0), (2.0, 4.1), (3.0, 5.9) AS t(x, y)",
    )
    assert m[0][0] == 1.0 and m[1][1] == 1.0
    assert abs(m[0][1] - m[1][0]) < 1e-12 and 0.99 < m[0][1] < 1.0
    s = one(eng, "SELECT arrayRandomSample([1, 2, 3, 4], 2) AS a")
    assert len(s) == 2 and set(s) <= {1, 2, 3, 4}
    # proportionsZTest / kolmogorovSmirnovTest were gated here until
    # batch 23 implemented them (tests/test_ch_dialect23.py)
    z = one(eng, "SELECT proportionsZTest(1, 2, 3, 4, 0.95, 'pooled') AS a")
    assert set(z.asDict()) >= {"z_statistic", "p_value"}


def test_system_functions_lists_macros(eng):
    eng.sql("CREATE FUNCTION IF NOT EXISTS sysfn10 AS x -> x + 1")
    rows = {
        r["name"]: r
        for r in eng.sql(
            "SELECT name, origin, create_query FROM system.functions"
        ).collect()
    }
    assert "sysfn10" in rows
    assert rows["sysfn10"]["origin"] == "SQLUserDefined"
    assert "-> x + 1" in rows["sysfn10"]["create_query"]
    eng.sql("DROP FUNCTION sysfn10")
    assert (
        eng.sql("SELECT count() AS c FROM system.functions WHERE name = 'sysfn10'")
        .first()["c"]
        == 0
    )
