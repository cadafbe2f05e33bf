"""Dev tool: run candidate CH spellings through Engine.sql and report which
fail — drives the next dialect batch. Not part of the package surface; run
from the repo root (`python tools/probe_dialect.py`). Cases that pass get
promoted into tests/test_ch_dialectN.py goldens."""

import os
import sys
import traceback

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh")

SF = "/root/testdata/sf0.001"
spark.read.parquet(f"{SF}/events.parquet").createOrReplaceTempView("ev")
spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView("ord")
spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView("docs")

PROBES = [
    # --- clauses ---
    ("array_join_clause", "SELECT a FROM (SELECT array(1,2,3) AS arr) ARRAY JOIN arr AS a"),
    ("left_array_join", "SELECT a FROM (SELECT array() AS arr) LEFT ARRAY JOIN arr AS a"),
    ("arrayJoin_fn", "SELECT arrayJoin(array(1,2,3)) AS a"),
    ("with_scalar", "WITH 2 AS k SELECT k + 1 AS a"),
    ("with_cte", "WITH t AS (SELECT 1 AS x) SELECT x FROM t"),
    ("group_by_all", "SELECT event_type, count() AS c FROM ev GROUP BY ALL"),
    ("with_cube", "SELECT event_type, count() AS c FROM ev GROUP BY event_type WITH CUBE"),
    ("with_rollup", "SELECT event_type, count() AS c FROM ev GROUP BY event_type WITH ROLLUP"),
    ("intersect", "SELECT 1 AS a INTERSECT SELECT 1 AS a"),
    ("except_setop", "SELECT 1 AS a EXCEPT SELECT 2 AS a"),
    ("union_distinct", "SELECT 1 AS a UNION DISTINCT SELECT 1 AS a"),
    ("qualify", "SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM ev QUALIFY rn = 1 LIMIT 1"),
    ("settings_clause", "SELECT 1 AS a SETTINGS max_threads = 8"),
    ("order_nulls", "SELECT x FROM VALUES (1),(NULL) AS t(x) ORDER BY x NULLS FIRST"),
    ("exists_subq", "SELECT count() AS c FROM ord WHERE EXISTS (SELECT 1 FROM ev WHERE ev.user_id = ord.o_custkey)"),
    ("in_subquery", "SELECT count() AS c FROM ev WHERE user_id IN (SELECT user_id FROM ev LIMIT 5)"),
    ("interval_lit", "SELECT toDateTime('2024-01-01 00:00:00') + INTERVAL 1 DAY AS a"),
    # --- quantiles / uniq ---
    ("quantileTDigest", "SELECT quantileTDigest(0.5)(value) AS a FROM ev"),
    ("quantilesTDigest", "SELECT quantilesTDigest(0.25, 0.5)(value) AS a FROM ev"),
    ("quantileDeterministic", "SELECT quantileDeterministic(0.5)(value, user_id) AS a FROM ev"),
    ("uniqExact", "SELECT uniqExact(user_id) AS a FROM ev"),
    ("uniqCombined", "SELECT uniqCombined(user_id) AS a FROM ev"),
    ("uniqHLL12", "SELECT uniqHLL12(user_id) AS a FROM ev"),
    ("uniqTheta", "SELECT uniqTheta(user_id) AS a FROM ev"),
    # --- aggregates ---
    ("argMin", "SELECT argMin(user_id, value) AS a FROM ev"),
    ("avgWeighted", "SELECT avgWeighted(value, user_id) AS a FROM ev"),
    ("anyLast", "SELECT anyLast(user_id) AS a FROM ev"),
    ("anyHeavy", "SELECT anyHeavy(event_type) AS a FROM ev"),
    ("deltaSum", "SELECT deltaSum(x) AS a FROM VALUES (1),(2),(5),(4),(6) AS t(x)"),
    ("groupArraySample", "SELECT groupArraySample(3)(user_id) AS a FROM ev"),
    ("groupUniqArray", "SELECT groupUniqArray(event_type) AS a FROM ev"),
    ("countDistinctPair", "SELECT count(DISTINCT user_id, event_type) AS a FROM ev"),
    ("minMax2", "SELECT max2(1, 2) AS a, min2(3, 4) AS b"),
    # --- string fns ---
    ("position", "SELECT position('Hello world', 'world') AS a"),
    ("positionCI", "SELECT positionCaseInsensitive('Hello world', 'WORLD') AS a"),
    ("match", "SELECT match('abc123', '[0-9]+') AS a"),
    ("extract_fn", "SELECT extract('abc123def', '[0-9]+') AS a"),
    ("extractAll", "SELECT extractAll('a1b2c3', '[0-9]') AS a"),
    ("replaceOne", "SELECT replaceOne('aaa', 'a', 'b') AS a"),
    ("replaceAll", "SELECT replaceAll('aaa', 'a', 'b') AS a"),
    ("replaceRegexpOne", "SELECT replaceRegexpOne('a1b2', '[0-9]', 'x') AS a"),
    ("replaceRegexpAll", "SELECT replaceRegexpAll('a1b2', '[0-9]', 'x') AS a"),
    ("countSubstrings", "SELECT countSubstrings('ababa', 'ab') AS a"),
    ("startsEndsWith", "SELECT startsWith('abc', 'ab') AS a, endsWith('abc', 'bc') AS b"),
    ("leftRightPad", "SELECT leftPad('x', 3, '0') AS a, rightPad('x', 3, '0') AS b"),
    ("left_right", "SELECT left('hello', 2) AS a, right('hello', 2) AS b"),
    ("trimBoth", "SELECT trimBoth('  x  ') AS a, trimLeft(' x') AS b, trimRight('x ') AS c"),
    ("lowerUpperUTF8", "SELECT lowerUTF8('ABC') AS a, upperUTF8('abc') AS b"),
    ("lengthUTF8", "SELECT lengthUTF8('héllo') AS a"),
    ("substringUTF8", "SELECT substringUTF8('héllo', 2, 3) AS a"),
    ("reverseUTF8", "SELECT reverseUTF8('abc') AS a"),
    ("repeat_space", "SELECT repeat('ab', 3) AS a, space(2) AS b"),
    ("concatWithSeparator", "SELECT concatWithSeparator('-', 'a', 'b', 'c') AS a"),
    ("format_fn", "SELECT format('{} and {}', 'a', 'b') AS a"),
    ("splitByChar", "SELECT splitByChar(',', 'a,b,c') AS a"),
    ("splitByWhitespace", "SELECT splitByWhitespace('a b  c') AS a"),
    ("alphaTokens", "SELECT alphaTokens('ab12cd') AS a"),
    ("multiSearchAny", "SELECT multiSearchAny('hello world', ['world', 'xyz']) AS a"),
    ("ngrams", "SELECT ngrams('abcd', 3) AS a"),
    ("tokens", "SELECT tokens('a b c') AS a"),
    ("ilike", "SELECT 'ABC' ILIKE 'ab%' AS a"),
    ("notLike", "SELECT 'abc' NOT LIKE 'x%' AS a"),
    ("ascii_char", "SELECT ascii('A') AS a, char(65, 66) AS b"),
    ("normalizeQuery", "SELECT normalizeQuery('SELECT 1 + 2') AS a"),
    ("stem", "SELECT stem('en', 'running') AS a"),
    # --- dates ---
    ("toHour_etc", "SELECT toHour(ts) AS a, toMinute(ts) AS b, toSecond(ts) AS c FROM ev LIMIT 1"),
    ("toDayOf", "SELECT toDayOfMonth(ts) AS a, toDayOfWeek(ts) AS b, toDayOfYear(ts) AS c FROM ev LIMIT 1"),
    ("toQuarter", "SELECT toQuarter(ts) AS a, toMonth(ts) AS b, toYear(ts) AS c FROM ev LIMIT 1"),
    ("dateDiff", "SELECT dateDiff('day', toDate('2024-01-01'), toDate('2024-02-01')) AS a"),
    ("date_add", "SELECT date_add(DAY, 3, toDate('2024-01-01')) AS a"),
    ("addDays", "SELECT addDays(toDate('2024-01-01'), 5) AS a, subtractDays(toDate('2024-01-10'), 5) AS b"),
    ("addHours", "SELECT addHours(toDateTime('2024-01-01 00:00:00'), 25) AS a"),
    ("toUnixTimestamp", "SELECT toUnixTimestamp(toDateTime('2024-01-01 00:00:00')) AS a"),
    ("fromUnixTimestamp", "SELECT fromUnixTimestamp(1704067200) AS a"),
    ("toStartOfFiveMinutes", "SELECT toStartOfFiveMinutes(ts) AS a FROM ev LIMIT 1"),
    ("toStartOfFifteenMinutes", "SELECT toStartOfFifteenMinutes(ts) AS a FROM ev LIMIT 1"),
    ("toStartOfTenMinutes", "SELECT toStartOfTenMinutes(ts) AS a FROM ev LIMIT 1"),
    ("dateName", "SELECT dateName('month', toDate('2024-03-05')) AS a"),
    ("monthName", "SELECT monthName(toDate('2024-03-05')) AS a"),
    ("now_today", "SELECT now() >= today() AS a"),
    ("yesterday", "SELECT yesterday() < today() AS a"),
    ("makeDate", "SELECT makeDate(2024, 3, 5) AS a"),
    ("makeDateTime", "SELECT makeDateTime(2024, 3, 5, 12, 30, 0) AS a"),
    ("toWeek", "SELECT toWeek(toDate('2024-03-05')) AS a"),
    ("toDayOfWeek_mode", "SELECT toDayOfWeek(toDate('2024-03-05'), 1) AS a"),
    # --- math ---
    ("intDiv", "SELECT intDiv(7, 2) AS a, intDivOrZero(7, 0) AS b"),
    ("modulo", "SELECT modulo(7, 3) AS a, moduloOrZero(7, 0) AS b"),
    ("gcd_lcm", "SELECT gcd(12, 18) AS a, lcm(4, 6) AS b"),
    ("exp_logs", "SELECT exp2(3) AS a, exp10(2) AS b, log2(8) AS c, log10(100) AS d, cbrt(27) AS e"),
    ("e_pi", "SELECT e() AS a, pi() AS b"),
    ("roundBankers", "SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b"),
    ("roundToExp2", "SELECT roundToExp2(100) AS a"),
    ("roundDown", "SELECT roundDown(5, [1, 4, 10]) AS a"),
    ("sign_fn", "SELECT sign(-5) AS a"),
    ("degrees_radians", "SELECT degrees(pi()) AS a, radians(180.0) AS b"),
    ("pow_power", "SELECT pow(2, 10) AS a, power(2, 3) AS b"),
    ("atan2_hypot", "SELECT atan2(1, 1) AS a, hypot(3, 4) AS b"),
    ("sigmoid", "SELECT sigmoid(0) AS a"),
    # --- hash / encoding ---
    ("cityHash64", "SELECT cityHash64('abc') AS a"),
    ("sipHash64", "SELECT sipHash64('abc') AS a"),
    ("xxHash64", "SELECT xxHash64('abc') AS a, xxHash32('abc') AS b"),
    ("MD5hex", "SELECT hex(MD5('abc')) AS a"),
    ("SHA256hex", "SELECT hex(SHA256('abc')) AS a"),
    ("halfMD5", "SELECT halfMD5('abc') AS a"),
    ("farmHash", "SELECT farmFingerprint64('abc') AS a"),
    ("crc32", "SELECT CRC32('abc') AS a"),
    ("javaHash", "SELECT javaHash('abc') AS a"),
    ("base58", "SELECT base58Encode('abc') AS a"),
    ("bin_fn", "SELECT bin(5) AS a"),
    # --- URL fns (corpus governance tie-in) ---
    ("domain", "SELECT domain('https://www.example.com/path?q=1') AS a"),
    ("domainWithoutWWW", "SELECT domainWithoutWWW('https://www.example.com/x') AS a"),
    ("topLevelDomain", "SELECT topLevelDomain('https://example.co.uk/x') AS a"),
    ("protocol", "SELECT protocol('https://example.com') AS a"),
    ("path_fn", "SELECT path('https://example.com/a/b?q=1') AS a"),
    ("pathFull", "SELECT pathFull('https://example.com/a/b?q=1') AS a"),
    ("queryString", "SELECT queryString('https://example.com/a?q=1&r=2') AS a"),
    ("extractURLParameter", "SELECT extractURLParameter('https://e.com/?a=1&b=2', 'b') AS a"),
    ("cutQueryString", "SELECT cutQueryString('https://e.com/a?q=1') AS a"),
    ("firstSignificantSubdomain", "SELECT firstSignificantSubdomain('https://news.example.com.ua/') AS a"),
    ("cutToFirstSignificantSubdomain", "SELECT cutToFirstSignificantSubdomain('https://news.example.com/') AS a"),
    ("netloc", "SELECT netloc('https://u:p@example.com:8080/a') AS a"),
    ("encodeURLComponent", "SELECT encodeURLComponent('a b') AS a, decodeURLComponent('a%20b') AS b"),
    # --- IP fns ---
    ("IPv4NumToString", "SELECT IPv4NumToString(3232235521) AS a"),
    ("IPv4StringToNum", "SELECT IPv4StringToNum('192.168.0.1') AS a"),
    ("isIPv4String", "SELECT isIPv4String('1.2.3.4') AS a, isIPv4String('x') AS b"),
    ("IPv4CIDRToRange", "SELECT IPv4CIDRToRange(toIPv4('192.168.5.2'), 16) AS a"),
    # --- JSON ---
    ("JSONHas", "SELECT JSONHas('{\"a\": 1}', 'a') AS a"),
    ("JSONLength", "SELECT JSONLength('[1,2,3]') AS a"),
    ("isValidJSON", "SELECT isValidJSON('{\"a\":1}') AS a, isValidJSON('nope{') AS b"),
    ("JSONExtractKeys", "SELECT JSONExtractKeys('{\"a\":1,\"b\":2}') AS a"),
    ("JSON_VALUE", "SELECT JSON_VALUE('{\"a\":{\"b\":7}}', '$.a.b') AS a"),
    ("JSONArrayLength", "SELECT JSONArrayLength('[1,2]') AS a"),
    # --- arrays ---
    ("arrayReduce", "SELECT arrayReduce('sum', array(1, 2, 3)) AS a"),
    ("arrayCompact", "SELECT arrayCompact(array(1, 1, 2, 2, 1)) AS a"),
    ("arrayResize", "SELECT arrayResize(array(1, 2), 4, 0) AS a"),
    ("arrayWithConstant", "SELECT arrayWithConstant(3, 7) AS a"),
    ("arrayStringConcat", "SELECT arrayStringConcat(array('a', 'b'), '-') AS a"),
    ("indexOf", "SELECT indexOf(array(10, 20, 30), 20) AS a"),
    ("arrayAvg", "SELECT arrayAvg(array(1, 2, 3)) AS a"),
    ("arrayProduct", "SELECT arrayProduct(array(2, 3, 4)) AS a"),
    ("arrayShuffleSort", "SELECT arraySort(array(3, 1, 2)) AS a"),
    ("arrayRotate", "SELECT arrayRotateLeft(array(1,2,3,4), 1) AS a"),
    ("arrayPartialSort", "SELECT arrayPartialSort(2, array(3, 1, 2)) AS a"),
    ("arrayFold", "SELECT arrayFold((acc, x) -> acc + x, array(1,2,3), toInt64(0)) AS a"),
    ("arrayShingles", "SELECT arrayShingles(array(1,2,3,4), 3) AS a"),
    ("empty_notEmpty", "SELECT empty(array()) AS a, notEmpty(array(1)) AS b"),
    ("emptyString", "SELECT empty('') AS a, notEmpty('x') AS b"),
    # --- conditionals / misc ---
    ("multiIf", "SELECT multiIf(1 > 2, 'a', 2 > 1, 'b', 'c') AS a"),
    ("if_fn", "SELECT if(1 > 0, 'y', 'n') AS a"),
    ("nullIf_ifNull", "SELECT nullIf(1, 1) AS a, ifNull(NULL, 5) AS b"),
    ("greatest_least", "SELECT greatest(1, 2, 3) AS a, least(1, 2, 3) AS b"),
    ("bar", "SELECT bar(5, 0, 10, 10) AS a"),
    ("formatReadableQuantity", "SELECT formatReadableQuantity(1234567) AS a"),
    ("formatReadableTimeDelta", "SELECT formatReadableTimeDelta(7322) AS a"),
    ("formatReadableDecimalSize", "SELECT formatReadableDecimalSize(1500000) AS a"),
    ("transform_3arg", "SELECT transform(2, [1, 2], ['a', 'b'], 'z') AS a"),
    ("sleep_gated", "SELECT sleepEachRow(0.001) AS a"),
    ("hostName", "SELECT hostName() AS a"),
    ("version_fn", "SELECT version() AS a"),
    ("uptime_fn", "SELECT uptime() >= 0 AS a"),
    ("initialQueryId", "SELECT queryID() AS a"),
    ("rowNumberInAllBlocks", "SELECT rowNumberInAllBlocks() AS a FROM ev LIMIT 3"),
    ("toTypeName_t", "SELECT toTypeName(array(1, 2)) AS a"),
    ("reinterpretAsUInt32", "SELECT reinterpretAsUInt32('abcd') AS a"),
    ("byteSize", "SELECT byteSize('abc') AS a"),
    ("identity", "SELECT identity(42) AS a"),
    ("isConstant", "SELECT isConstant(1) AS a"),
    # --- table functions ---
    ("numbers_tf", "SELECT count() AS c FROM numbers(10)"),
    ("numbers_range_tf", "SELECT count() AS c FROM numbers(5, 10)"),
    ("generateRandom_tf", "SELECT count() AS c FROM (SELECT * FROM generateRandom('x Int64, s String', 42) LIMIT 5)"),
    ("values_tf", "SELECT * FROM values('x Int32', 1, 2, 3)"),
    ("format_tf", "SELECT * FROM format(JSONEachRow, '{\"a\": 1}')"),
    # --- bitmap ---
    ("groupBitmap", "SELECT groupBitmap(user_id) AS a FROM ev"),
    ("bitmapBuild", "SELECT bitmapCardinality(bitmapBuild(array(1, 2, 3, 2))) AS a"),
    # --- geo ---
    ("greatCircleDistance", "SELECT round(greatCircleDistance(-0.13, 51.51, 2.35, 48.86)) AS a"),
    ("geohashEncode", "SELECT geohashEncode(-5.60303, 42.593994, 5) AS a"),
    ("pointInPolygon", "SELECT pointInPolygon((0.5, 0.5), [(0.0,0.0),(1.0,0.0),(1.0,1.0),(0.0,1.0)]) AS a"),
]

ok, fail = [], []
for name, sql in PROBES:
    try:
        rows = eng.sql(sql).collect()
        ok.append((name, rows[0] if rows else None))
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        fail.append((name, type(e).__name__, msg))

print(f"\n==== OK: {len(ok)}  FAIL: {len(fail)} ====")
for name, r in ok:
    print(f"OK   {name}: {r}")
print("----")
for name, t, m in fail:
    print(f"FAIL {name}: {t}: {m}")
