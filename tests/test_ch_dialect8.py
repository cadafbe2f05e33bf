"""Dialect batch 8 (round 5, probe-driven): string-search ARG-ORDER fixes
(CH position(haystack, needle) is the reverse of Spark's builtin — a
silent-wrong-answer trap), binary MD5 so hex(MD5(x)) prints CH's digest,
CH format()/char(), gcd/lcm/javaHash as exact JVM folds, date parts with
mode arguments, the bitmap family over sorted-distinct arrays, array
vocabulary 3, QUALIFY, and readable-format goldens.

Verification strategy: hashes against hashlib / pure-Python reference
implementations, date modes against hand-checked calendar facts, array ops
against literal goldens, QUALIFY against the equivalent subquery filter."""

import hashlib
import math
import struct

import pytest

from clickhousedatamocker_spark.engine import Engine

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark, str(tmp_path_factory.mktemp("wh8")))
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("ev8")
    return e


def one(eng, sql):
    return eng.sql(sql).first()["a"]


# -- position: CH arg order (haystack, needle) --------------------------------


def test_position_uses_ch_arg_order(eng):
    # Spark's builtin position(substr, str) would return 0 here — the
    # rewrite must swap to locate(needle, haystack)
    assert one(eng, "SELECT position('Hello world', 'world') AS a") == 7
    assert one(eng, "SELECT position('abcabc', 'bc', 3) AS a") == 5
    assert one(eng, "SELECT position('abc', 'zz') AS a") == 0
    # the ANSI 1-arg spelling declines the rewrite and parses natively
    assert one(eng, "SELECT position('lo' IN 'hello') AS a") == 4
    # a 'position(' inside a string literal is data
    assert one(eng, "SELECT 'position(x)' AS a") == "position(x)"


def test_replace_regexp_one(eng):
    assert one(eng, "SELECT replaceRegexpOne('a1b2', '[0-9]', 'x') AS a") == "axb2"
    # backreferences work (the replace runs on the matched slice)
    got = one(eng, r"SELECT replaceRegexpOne('a1b2', '([0-9])', '<$1>') AS a")
    assert got == "a<1>b2"
    assert one(eng, "SELECT replaceRegexpOne('abc', '[0-9]', 'x') AS a") == "abc"


# -- hashes vs hashlib / pure Python -----------------------------------------


def test_md5_is_binary_and_halfmd5_is_bit_exact(eng):
    for s in ["abc", "", "The quick brown fox"]:
        digest = hashlib.md5(s.encode()).hexdigest()
        got = one(eng, f"SELECT hex(MD5('{s}')) AS a")
        assert got == digest.upper()
        want_half = int(digest[:16], 16)  # big-endian first 8 bytes
        got_half = one(eng, f"SELECT halfMD5('{s}') AS a")
        assert int(got_half) == want_half


def _java_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def test_java_hash_matches_reference(eng):
    for s in ["", "a", "abc", "hello world", "Zz9"]:
        assert one(eng, f"SELECT javaHash('{s}') AS a") == _java_hash(s)


def test_reinterpret_little_endian(eng):
    # struct.unpack('<I') is the spec: first 4 bytes, little-endian
    want = struct.unpack("<I", b"abcd")[0]
    assert one(eng, "SELECT reinterpretAsUInt32('abcd') AS a") == want
    assert one(eng, "SELECT reinterpretAsUInt8('abcd') AS a") == ord("a")
    assert one(eng, "SELECT reinterpretAsUInt16('ab') AS a") == struct.unpack("<H", b"ab")[0]
    # shorter input zero-pads (CH's contract)
    assert one(eng, "SELECT reinterpretAsUInt32('a') AS a") == ord("a")
    want64 = struct.unpack("<Q", b"abcdefgh")[0]
    assert int(one(eng, "SELECT reinterpretAsUInt64('abcdefgh') AS a")) == want64


# -- math ---------------------------------------------------------------------


def test_gcd_lcm_match_python(eng):
    for a, b in [(12, 18), (0, 5), (5, 0), (0, 0), (-12, 18), (17, 13), (1071, 462)]:
        assert one(eng, f"SELECT gcd({a}, {b}) AS a") == math.gcd(a, b), (a, b)
        assert one(eng, f"SELECT lcm({a}, {b}) AS a") == math.lcm(a, b), (a, b)


def test_round_family(eng):
    assert float(one(eng, "SELECT roundBankers(2.5) AS a")) == 2.0
    assert float(one(eng, "SELECT roundBankers(3.5) AS a")) == 4.0
    assert float(one(eng, "SELECT roundBankers(2.345, 2) AS a")) == 2.34
    assert one(eng, "SELECT roundToExp2(100) AS a") == 64
    assert one(eng, "SELECT roundToExp2(0) AS a") == 0
    assert one(eng, "SELECT roundToExp2(1) AS a") == 1
    assert one(eng, "SELECT roundDown(5, [1, 4, 10]) AS a") == 4.0
    assert one(eng, "SELECT roundDown(0, [1, 4, 10]) AS a") == 1.0


# -- format() / char() --------------------------------------------------------


def test_format_placeholders(eng):
    assert one(eng, "SELECT format('{} and {}', 'a', 'b') AS a") == "a and b"
    # indexed placeholders reorder
    assert one(eng, "SELECT format('{1} {0}', 'a', 'b') AS a") == "b a"
    # {{ }} escape to literal braces
    assert one(eng, "SELECT format('{{}}{}', 'x') AS a") == "{}x"
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT format(col, 'a') AS a FROM ev8")


def test_char_builds_string(eng):
    assert one(eng, "SELECT char(65, 66, 67) AS a") == "ABC"


# -- dates: modes and names ---------------------------------------------------


def test_to_week_modes(eng):
    # 2024-01-01 is a Monday; the first Sunday is Jan 7 → mode 0 week 0
    assert one(eng, "SELECT toWeek(toDate('2024-01-01')) AS a") == 0
    assert one(eng, "SELECT toWeek(toDate('2024-01-07')) AS a") == 1
    # MySQL WEEK('2024-03-05', 0) = 9
    assert one(eng, "SELECT toWeek(toDate('2024-03-05')) AS a") == 9
    assert one(eng, "SELECT toWeek(toDate('2024-03-05'), 0) AS a") == 9
    # ISO mode 3 == weekofyear
    assert one(eng, "SELECT toWeek(toDate('2024-01-01'), 3) AS a") == 1
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT toWeek(toDate('2024-01-01'), 2) AS a")


def test_to_day_of_week_modes(eng):
    # 2024-03-05 is a Tuesday
    assert one(eng, "SELECT toDayOfWeek(toDate('2024-03-05')) AS a") == 2
    assert one(eng, "SELECT toDayOfWeek(toDate('2024-03-05'), 0) AS a") == 2
    assert one(eng, "SELECT toDayOfWeek(toDate('2024-03-05'), 1) AS a") == 1
    assert one(eng, "SELECT toDayOfWeek(toDate('2024-03-05'), 2) AS a") == 2
    assert one(eng, "SELECT toDayOfWeek(toDate('2024-03-05'), 3) AS a") == 3


def test_date_name_and_month_name(eng):
    assert one(eng, "SELECT dateName('month', toDate('2024-03-05')) AS a") == "March"
    assert one(eng, "SELECT dateName('weekday', toDate('2024-03-05')) AS a") == "Tuesday"
    assert one(eng, "SELECT dateName('year', toDate('2024-03-05')) AS a") == "2024"
    assert one(eng, "SELECT monthName(toDate('2024-03-05')) AS a") == "March"
    assert one(eng, "SELECT makeDate(2024, 3, 5) AS a").isoformat() == "2024-03-05"
    got = one(eng, "SELECT makeDateTime(2024, 3, 5, 12, 30, 7) AS a")
    assert got.isoformat() == "2024-03-05T12:30:07"


def test_start_of_n_minutes(eng):
    got = one(eng, "SELECT toStartOfFiveMinutes(toDateTime('2024-01-01 12:07:44')) AS a")
    assert got.isoformat() == "2024-01-01T12:05:00"
    got = one(eng, "SELECT toStartOfFifteenMinutes(toDateTime('2024-01-01 12:29:59')) AS a")
    assert got.isoformat() == "2024-01-01T12:15:00"


# -- readable formats (CH-documented renderings) ------------------------------


def test_format_readable_time_delta_goldens(eng):
    # 7322 s: ClickHouse docs render '2 hours, 2 minutes and 2 seconds'
    assert one(eng, "SELECT formatReadableTimeDelta(7322) AS a") == (
        "2 hours, 2 minutes and 2 seconds"
    )
    assert one(eng, "SELECT formatReadableTimeDelta(0) AS a") == "0 seconds"
    assert one(eng, "SELECT formatReadableTimeDelta(1) AS a") == "1 second"
    assert one(eng, "SELECT formatReadableTimeDelta(61) AS a") == "1 minute and 1 second"
    assert one(eng, "SELECT formatReadableTimeDelta(86400) AS a") == "1 day"


def test_format_readable_decimal_size(eng):
    assert one(eng, "SELECT formatReadableDecimalSize(1500000) AS a") == "1.50 MB"
    assert one(eng, "SELECT formatReadableDecimalSize(999) AS a") == "999.00 B"
    assert one(eng, "SELECT formatReadableDecimalSize(1024) AS a") == "1.02 KB"


# -- bitmap family (sets as sorted distinct arrays) ---------------------------


def test_bitmap_family_laws(eng):
    assert one(eng, "SELECT bitmapToArray(bitmapBuild([3, 1, 2, 3])) AS a") == [1, 2, 3]
    assert one(eng, "SELECT bitmapCardinality(bitmapBuild([1, 2, 2])) AS a") == 2
    a, b = "bitmapBuild([1, 2, 3])", "bitmapBuild([2, 3, 4])"
    assert one(eng, f"SELECT bitmapToArray(bitmapAnd({a}, {b})) AS a") == [2, 3]
    assert one(eng, f"SELECT bitmapToArray(bitmapOr({a}, {b})) AS a") == [1, 2, 3, 4]
    assert one(eng, f"SELECT bitmapToArray(bitmapXor({a}, {b})) AS a") == [1, 4]
    assert one(eng, f"SELECT bitmapToArray(bitmapAndnot({a}, {b})) AS a") == [1]
    assert one(eng, f"SELECT bitmapAndCardinality({a}, {b}) AS a") == 2
    assert one(eng, f"SELECT bitmapXorCardinality({a}, {b}) AS a") == 2
    assert one(eng, f"SELECT bitmapContains({a}, 2) AS a") is True
    assert one(eng, f"SELECT bitmapHasAny({a}, {b}) AS a") is True
    assert one(eng, f"SELECT bitmapHasAll({a}, bitmapBuild([1, 2])) AS a") is True
    assert one(eng, f"SELECT bitmapHasAll(bitmapBuild([1, 2]), {a}) AS a") is False
    assert one(eng, "SELECT groupBitmap(user_id) AS a FROM ev8") == one(
        eng, "SELECT uniqExact(user_id) AS a FROM ev8"
    )


# -- array vocabulary 3 -------------------------------------------------------


def test_array_vocabulary_batch3(eng):
    assert one(eng, "SELECT arrayReduce('sum', [1, 2, 3]) AS a") == 6.0
    assert one(eng, "SELECT arrayReduce('max', [1, 5, 3]) AS a") == 5
    assert one(eng, "SELECT arrayReduce('uniqExact', [1, 1, 2]) AS a") == 2
    # 'median' graduated to a real rewrite (wave 30b, R-7 interpolation);
    # the graduation's own goldens live in test_ch_dialect29.py
    assert one(eng, "SELECT arrayReduce('median', [1, 2]) AS a") == 1.5
    assert one(eng, "SELECT arrayCompact([1, 1, 2, 2, 1]) AS a") == [1, 2, 1]
    assert one(eng, "SELECT arrayCompact(CAST(array() AS ARRAY<INT>)) AS a") == []
    assert one(eng, "SELECT arrayResize([1, 2], 4, 0) AS a") == [1, 2, 0, 0]
    assert one(eng, "SELECT arrayResize([1, 2, 3], 2) AS a") == [1, 2]
    assert one(eng, "SELECT arrayResize([1, 2], 3) AS a") == [1, 2, None]
    assert one(eng, "SELECT arrayWithConstant(3, 'x') AS a") == ["x", "x", "x"]
    assert one(eng, "SELECT arrayProduct([2, 3, 4]) AS a") == 24.0
    assert one(eng, "SELECT arrayRotateLeft([1, 2, 3, 4], 1) AS a") == [2, 3, 4, 1]
    assert one(eng, "SELECT arrayRotateRight([1, 2, 3, 4], 1) AS a") == [4, 1, 2, 3]
    assert one(eng, "SELECT arrayRotateLeft([1, 2, 3], 5) AS a") == [3, 1, 2]
    assert one(eng, "SELECT arrayRotateLeft(CAST(array() AS ARRAY<INT>), 2) AS a") == []
    assert one(eng, "SELECT arrayPartialSort(2, [3, 1, 2]) AS a") == [1, 2, 3]
    assert one(eng, "SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3], 10) AS a") == 16
    assert one(eng, "SELECT arrayShingles([1, 2, 3, 4], 3) AS a") == [[1, 2, 3], [2, 3, 4]]
    assert one(eng, "SELECT arrayShingles([1, 2], 3) AS a") == []


# -- misc ---------------------------------------------------------------------


def test_qualify_matches_subquery_filter(eng, spark):
    got = eng.sql(
        "SELECT user_id, ts, row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts) AS rn FROM ev8 QUALIFY rn = 1 ORDER BY user_id"
    ).collect()
    want = spark.sql(
        "SELECT * FROM (SELECT user_id, ts, row_number() OVER (PARTITION BY "
        "user_id ORDER BY ts) AS rn FROM ev8) WHERE rn = 1 ORDER BY user_id"
    ).collect()
    assert got == want
    assert len(got) > 0
    # a raw window expression inside QUALIFY is legal too
    n = eng.sql(
        "SELECT user_id, ts FROM ev8 QUALIFY row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts) = 1"
    ).count()
    assert n == len(got)


def test_probe_misc_surface(eng):
    assert one(eng, "SELECT identity(42) AS a") == 42
    assert one(eng, "SELECT isConstant(1) AS a") == 1
    assert one(eng, "SELECT isConstant(user_id) AS a FROM ev8 LIMIT 1") == 0
    assert one(eng, "SELECT sleepEachRow(0.1) AS a") == 0
    assert isinstance(one(eng, "SELECT hostName() AS a"), str)
    assert one(eng, "SELECT uptime() AS a") >= 0
    assert len(one(eng, "SELECT queryID() AS a")) == 36
    assert one(eng, "SELECT currentUser() AS a") == "default"
    assert eng.sql("SELECT count() AS a FROM numbers(5, 10)").first()["a"] == 10
    assert eng.sql(
        "SELECT min(number) AS a, max(number) AS b FROM numbers(5, 10)"
    ).first() == (5, 14)
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT stem('en', 'running') AS a")
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT rowNumberInAllBlocks() AS a FROM ev8")


def test_string_and_json_probe_surface(eng):
    assert one(eng, "SELECT splitByWhitespace(' a b  c ') AS a") == ["a", "b", "c"]
    assert one(eng, "SELECT alphaTokens('ab12cd') AS a") == ["ab", "cd"]
    assert one(eng, "SELECT tokens('a-b c') AS a") == ["a", "b", "c"]
    assert one(eng, "SELECT ngrams('abcd', 3) AS a") == ["abc", "bcd"]
    assert one(eng, "SELECT ngrams('ab', 3) AS a") == []
    assert one(eng, "SELECT normalizeQuery('SELECT 12 + \\'x\\'') AS a") == "SELECT ? + ?"
    assert one(eng, "SELECT reverseUTF8('abc') AS a") == "cba"
    assert one(eng, "SELECT JSONLength('[1,2,3]') AS a") == 3
    assert one(eng, "SELECT JSONLength('{\"a\":1,\"b\":2}') AS a") == 2
    assert one(eng, "SELECT JSONLength('5') AS a") == 0
    assert one(eng, "SELECT isValidJSON('{\"a\":1}') AS a") is True
    assert one(eng, "SELECT isValidJSON('nope{') AS a") is False
    assert one(eng, "SELECT JSONExtractKeys('{\"a\":1,\"b\":2}') AS a") == ["a", "b"]
    assert one(eng, "SELECT JSON_VALUE('{\"a\":{\"b\":7}}', '$.a.b') AS a") == "7"
    assert one(eng, "SELECT byteSize('abc') AS a") == 12


def test_ipv4_probe_surface(eng):
    assert one(eng, "SELECT isIPv4String('192.168.0.1') AS a") is True
    assert one(eng, "SELECT isIPv4String('256.1.1.1') AS a") is False
    assert one(eng, "SELECT isIPv4String('a.b.c.d') AS a") is False
    got = eng.sql(
        "SELECT IPv4CIDRToRange(toIPv4('192.168.5.2'), 16) AS a"
    ).first()["a"]
    assert (got["lower"], got["upper"]) == ("192.168.0.0", "192.168.255.255")


def test_sampling_aggregates(eng, spark):
    # quantileDeterministic == exact percentile (documented deviation)
    got = one(eng, "SELECT quantileDeterministic(0.5)(value, user_id) AS a FROM ev8")
    want = spark.sql("SELECT percentile(value, 0.5) AS a FROM ev8").first()["a"]
    assert got == want
    # groupArraySample: right size, deterministic across runs, values real
    s1 = one(eng, "SELECT groupArraySample(5)(event_id) AS a FROM ev8")
    s2 = one(eng, "SELECT groupArraySample(5)(event_id) AS a FROM ev8")
    assert s1 == s2 and len(s1) == 5
    all_ids = {r["event_id"] for r in spark.sql("SELECT event_id FROM ev8").collect()}
    assert set(s1) <= all_ids


# -- geo + base58 (Arrow-batched UDF surface) ---------------------------------


def test_geohash_encode_golden_and_roundtrip(eng):
    # public ClickHouse docs example
    got = one(eng, "SELECT geohashEncode(-5.60302734375, 42.593994140625) AS a")
    assert got == "ezs42d000000"
    assert one(eng, "SELECT geohashEncode(-5.60302734375, 42.593994140625, 5) AS a") == "ezs42"
    dec = eng.sql("SELECT geohashDecode('ezs42') AS a").first()["a"]
    assert abs(dec["longitude"] - (-5.60302734375)) < 1e-9
    assert abs(dec["latitude"] - 42.60498046875) < 1e-9
    # roundtrip law at full precision: cell center within cell size
    dec2 = eng.sql(
        "SELECT geohashDecode(geohashEncode(2.3522, 48.8566, 12)) AS a"
    ).first()["a"]
    assert abs(dec2["longitude"] - 2.3522) < 1e-6
    assert abs(dec2["latitude"] - 48.8566) < 1e-6


def test_point_in_polygon(eng):
    ring = "[(6, 0), (8, 4), (5, 8), (0, 2)]"
    # public ClickHouse docs example: (3, 3) is inside
    assert one(eng, f"SELECT pointInPolygon((3., 3.), {ring}) AS a") == 1
    assert one(eng, f"SELECT pointInPolygon((100., 100.), {ring}) AS a") == 0
    # a vertex is IN
    assert one(eng, f"SELECT pointInPolygon((6., 0.), {ring}) AS a") == 1
    with pytest.raises(NotImplementedError):
        eng.sql(f"SELECT pointInPolygon((1., 1.), {ring}, {ring}) AS a")


def _b58_ref(raw: bytes) -> str:
    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    num, enc = int.from_bytes(raw, "big"), ""
    while num:
        num, rem = divmod(num, 58)
        enc = alphabet[rem] + enc
    return "1" * (len(raw) - len(raw.lstrip(b"\0"))) + enc


def test_base58_vectors_and_roundtrip(eng):
    # standard Bitcoin test vector
    assert one(eng, "SELECT base58Encode('Hello World!') AS a") == "2NEpo7TZRRrLZSi2U"
    for s in ["", "abc", "ClickHouse"]:
        assert one(eng, f"SELECT base58Encode('{s}') AS a") == _b58_ref(s.encode())
        got = one(eng, f"SELECT base58Decode(base58Encode('{s}')) AS a")
        assert got == s
