"""Dev tool: dialect probe wave 27 (round 10) — candidate CH spellings not
covered by waves 1-26. Same harness as probe_dialect.py; run from the repo
root. Every FAIL must be closed as a rewrite or a loud gate (an
UNRESOLVED_ROUTINE fall-through is the banned failure mode)."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe27", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh27")

SF = "/root/testdata/sf0.001"
spark.read.parquet(f"{SF}/events.parquet").createOrReplaceTempView("ev")

PROBES = [
    # --- aggregates: moving / map / exotic ---
    ("groupArrayMovingAvg", "SELECT groupArrayMovingAvg(x) AS a FROM VALUES (1),(2),(3),(4) AS t(x)"),
    ("groupArrayMovingAvgN", "SELECT groupArrayMovingAvg(2)(x) AS a FROM VALUES (1),(2),(3),(4) AS t(x)"),
    ("groupArrayMovingSum", "SELECT groupArrayMovingSum(x) AS a FROM VALUES (1),(2),(3),(4) AS t(x)"),
    ("groupArrayMovingSumN", "SELECT groupArrayMovingSum(2)(x) AS a FROM VALUES (1),(2),(3),(4) AS t(x)"),
    ("sumCount", "SELECT sumCount(x) AS a FROM VALUES (1.0),(2.0),(NULL) AS t(x)"),
    ("sumKahan", "SELECT sumKahan(x) AS a FROM VALUES (0.1),(0.2),(0.3) AS t(x)"),
    ("maxMap", "SELECT maxMap(map(k, v)) AS a FROM VALUES ('a', 1),('a', 3),('b', 2) AS t(k, v)"),
    ("minMap", "SELECT minMap(map(k, v)) AS a FROM VALUES ('a', 1),('a', 3),('b', 2) AS t(k, v)"),
    ("topKWeighted", "SELECT topKWeighted(2)(event_type, user_id) AS a FROM ev"),
    ("approx_top_k", "SELECT approx_top_k(2)(event_type) AS a FROM ev"),
    ("approx_top_sum", "SELECT approx_top_sum(2)(event_type, user_id) AS a FROM ev"),
    ("quantileExactLow", "SELECT quantileExactLow(0.5)(value) AS a FROM ev"),
    ("quantileExactHigh", "SELECT quantileExactHigh(0.5)(value) AS a FROM ev"),
    ("quantileInterpolatedWeighted", "SELECT quantileInterpolatedWeighted(0.5)(value, user_id) AS a FROM ev"),
    ("quantileGK", "SELECT quantileGK(100, 0.5)(value) AS a FROM ev"),
    ("quantilesGK", "SELECT quantilesGK(100, 0.25, 0.75)(value) AS a FROM ev"),
    ("quantilesExactExclusive", "SELECT quantilesExactExclusive(0.25, 0.75)(value) AS a FROM ev"),
    ("quantilesExactInclusive", "SELECT quantilesExactInclusive(0.25, 0.75)(value) AS a FROM ev"),
    ("quantileBFloat16", "SELECT quantileBFloat16(0.5)(value) AS a FROM ev"),
    ("quantileTiming", "SELECT quantileTiming(0.5)(value) AS a FROM ev"),
    ("medianExact", "SELECT medianExact(value) AS a FROM ev"),
    ("entropy", "SELECT entropy(event_type) AS a FROM ev"),
    ("boundingRatio", "SELECT boundingRatio(user_id, value) AS a FROM ev"),
    ("intervalLengthSum", "SELECT intervalLengthSum(s, e) AS a FROM VALUES (1, 3),(2, 5),(10, 12) AS t(s, e)"),
    ("maxIntersections", "SELECT maxIntersections(s, e) AS a FROM VALUES (1, 3),(2, 5),(10, 12) AS t(s, e)"),
    ("maxIntersectionsPosition", "SELECT maxIntersectionsPosition(s, e) AS a FROM VALUES (1, 3),(2, 5),(10, 12) AS t(s, e)"),
    ("uniqUpTo", "SELECT uniqUpTo(3)(event_type) AS a FROM ev"),
    ("uniqCombined64", "SELECT uniqCombined64(user_id) AS a FROM ev"),
    ("sumWithOverflow", "SELECT sumWithOverflow(user_id) AS a FROM ev"),
    ("deltaSumTimestamp", "SELECT deltaSumTimestamp(v, t) AS a FROM VALUES (1, 10),(3, 11),(2, 12) AS t(v, t)"),
    ("singleValueOrNull", "SELECT singleValueOrNull(x) AS a FROM VALUES (7),(7) AS t(x)"),
    ("categoricalInformationValue", "SELECT categoricalInformationValue(x, y) AS a FROM VALUES (1, 0),(1, 1),(0, 1) AS t(x, y)"),
    ("simpleLinearRegression", "SELECT simpleLinearRegression(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 4.0),(3.0, 6.0) AS t(x, y)"),
    ("largestTriangleThreeBuckets", "SELECT largestTriangleThreeBuckets(3)(x, y) AS a FROM VALUES (1.0, 1.0),(2.0, 3.0),(3.0, 2.0),(4.0, 5.0),(5.0, 4.0) AS t(x, y)"),
    ("sparkbar", "SELECT sparkbar(5)(x, y) AS a FROM VALUES (1, 10),(2, 4),(3, 7) AS t(x, y)"),
    ("histogram_agg", "SELECT histogram(3)(value) AS a FROM ev"),
    ("sequenceCount", "SELECT sequenceCount('(?1).*(?2)')(ts, event_type = 'click', event_type = 'view') AS a FROM ev"),
    ("meanZTest", "SELECT meanZTest(1.0, 1.0, 0.95)(value, user_id % 2) AS a FROM ev"),
    ("first_value_rn", "SELECT first_value(x) RESPECT NULLS AS a FROM VALUES (NULL),(2) AS t(x)"),
    ("any_respect_nulls", "SELECT any_respect_nulls(x) AS a FROM VALUES (NULL),(2) AS t(x)"),
    ("aggIf_combo", "SELECT sumIf(value, event_type = 'click') AS a, countIf(event_type = 'click') AS b FROM ev"),
    ("avgIf_orNull", "SELECT avgOrNull(x) AS a, sumOrNull(x) AS b FROM (SELECT value AS x FROM ev WHERE false)"),
    ("minIf_maxIf", "SELECT minIf(value, user_id > 0) AS a, maxIf(value, user_id > 0) AS b FROM ev"),
    ("argMinIf", "SELECT argMinIf(user_id, value, value > 0) AS a FROM ev"),
    ("sumArray", "SELECT sumArray(arr) AS a FROM (SELECT array(1, 2) AS arr UNION ALL SELECT array(3, 4))"),
    ("uniqArray", "SELECT uniqArray(arr) AS a FROM (SELECT array(1, 2) AS arr UNION ALL SELECT array(2, 3))"),
    ("avgArray", "SELECT avgArray(arr) AS a FROM (SELECT array(1.0, 2.0) AS arr UNION ALL SELECT array(3.0, 4.0))"),
    ("countDistinctIf", "SELECT countDistinctIf(event_type, user_id > 0) AS a FROM ev"),
    # --- arrays ---
    ("arrayRotateLeft", "SELECT arrayRotateLeft(array(1,2,3,4), 1) AS a"),
    ("arrayRotateRight", "SELECT arrayRotateRight(array(1,2,3,4), 1) AS a"),
    ("arrayShiftLeft", "SELECT arrayShiftLeft(array(1,2,3), 1) AS a"),
    ("arrayShiftRight", "SELECT arrayShiftRight(array(1,2,3), 1, 9) AS a"),
    ("arrayShingles", "SELECT arrayShingles(array(1,2,3,4), 3) AS a"),
    ("arrayZipUnaligned", "SELECT arrayZipUnaligned(array(1,2), array('a')) AS a"),
    ("arrayPartialSort", "SELECT arrayPartialSort(2, array(3,1,2)) AS a"),
    ("arrayPartialReverseSort", "SELECT arrayPartialReverseSort(2, array(3,1,2)) AS a"),
    ("arrayEnumerateUniqRanked", "SELECT arrayEnumerateUniqRanked(array(1,1,2)) AS a"),
    ("arrayRandomSample", "SELECT length(arrayRandomSample(array(1,2,3,4), 2)) AS a"),
    ("arrayJaccardIndex", "SELECT arrayJaccardIndex(array(1,2), array(2,3)) AS a"),
    ("arrayDotProduct", "SELECT arrayDotProduct(array(1.0,2.0), array(3.0,4.0)) AS a"),
    ("arrayNormalizedGini", "SELECT arrayNormalizedGini(array(1.0,2.0,3.0), array(1.0,2.0,3.0)) AS a"),
    # --- maps ---
    ("mapFromArrays", "SELECT mapFromArrays(array('a','b'), array(1,2)) AS a"),
    ("mapConcat", "SELECT mapConcat(map('a', 1), map('b', 2)) AS a"),
    ("mapExists", "SELECT mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) AS a"),
    ("mapAll", "SELECT mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) AS a"),
    ("mapFilter", "SELECT mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)) AS a"),
    ("mapSort", "SELECT mapSort(map('b', 2, 'a', 1)) AS a"),
    ("mapReverseSort", "SELECT mapReverseSort(map('a', 1, 'b', 2)) AS a"),
    ("mapUpdate", "SELECT mapUpdate(map('a', 1), map('a', 9, 'b', 2)) AS a"),
    ("mapContainsKeyLike", "SELECT mapContainsKeyLike(map('abc', 1), 'a%') AS a"),
    ("mapExtractKeyLike", "SELECT mapExtractKeyLike(map('abc', 1, 'xyz', 2), 'a%') AS a"),
    # --- strings ---
    ("translate", "SELECT translate('hello', 'el', 'ip') AS a"),
    ("soundex", "SELECT soundex('Robert') AS a"),
    ("punycodeEncode", "SELECT punycodeEncode('münchen') AS a"),
    ("punycodeDecode", "SELECT punycodeDecode('mnchen-3ya') AS a"),
    ("idnaEncode", "SELECT idnaEncode('münchen.de') AS a"),
    ("base58Encode", "SELECT base58Encode('abc') AS a"),
    ("base58Decode", "SELECT base58Decode(base58Encode('abc')) AS a"),
    ("tryBase64Decode", "SELECT tryBase64Decode('YWJj') AS a, tryBase64Decode('!!') AS b"),
    ("base64URLEncode", "SELECT base64URLEncode('ab?cd') AS a"),
    ("substringIndex", "SELECT substringIndex('a.b.c', '.', 2) AS a"),
    ("countMatches", "SELECT countMatches('a1b2c3', '[0-9]') AS a"),
    ("hasToken", "SELECT hasToken('hello world', 'world') AS a"),
    ("hasSubsequence", "SELECT hasSubsequence('hello', 'hlo') AS a"),
    ("editDistance", "SELECT editDistance('kitten', 'sitting') AS a"),
    ("editDistanceUTF8", "SELECT editDistanceUTF8('héllo', 'hello') AS a"),
    ("damerauLevenshteinDistance", "SELECT damerauLevenshteinDistance('ab', 'ba') AS a"),
    ("jaroSimilarity", "SELECT round(jaroSimilarity('MARTHA', 'MARHTA'), 4) AS a"),
    ("jaroWinklerSimilarity", "SELECT round(jaroWinklerSimilarity('MARTHA', 'MARHTA'), 4) AS a"),
    ("stringJaccardIndex", "SELECT stringJaccardIndex('abc', 'bcd') AS a"),
    ("isValidUTF8", "SELECT isValidUTF8('abc') AS a"),
    ("toValidUTF8", "SELECT toValidUTF8('abc') AS a"),
    ("normalizeUTF8NFC", "SELECT normalizeUTF8NFC('abc') AS a"),
    ("initcap", "SELECT initcap('hello world') AS a"),
    ("firstLine", "SELECT firstLine('a\nb') AS a"),
    # --- dates ---
    ("age_fn", "SELECT age('day', toDate('2024-01-01'), toDate('2024-02-01')) AS a"),
    ("timeSlot", "SELECT timeSlot(toDateTime('2024-01-01 00:20:00')) AS a"),
    ("timeSlots", "SELECT timeSlots(toDateTime('2024-01-01 00:00:00'), toUInt32(3700)) AS a"),
    ("toModifiedJulianDay", "SELECT toModifiedJulianDay('2020-01-01') AS a"),
    ("fromModifiedJulianDay", "SELECT fromModifiedJulianDay(58849) AS a"),
    ("toDaysSinceYearZero", "SELECT toDaysSinceYearZero(toDate('2023-09-08')) AS a"),
    ("fromDaysSinceYearZero", "SELECT fromDaysSinceYearZero(739136) AS a"),
    ("YYYYMMDDToDate", "SELECT YYYYMMDDToDate(20240305) AS a"),
    ("YYYYMMDDhhmmssToDateTime", "SELECT YYYYMMDDhhmmssToDateTime(20240305123000) AS a"),
    ("toYYYYMMDDhhmmss", "SELECT toYYYYMMDDhhmmss(toDateTime('2024-03-05 12:30:00')) AS a"),
    ("changeYear", "SELECT changeYear(toDate('2024-03-05'), 2000) AS a"),
    ("changeMonth", "SELECT changeMonth(toDate('2024-03-05'), 12) AS a"),
    ("changeDay", "SELECT changeDay(toDate('2024-03-05'), 28) AS a"),
    ("toRelativeDayNum", "SELECT toRelativeDayNum(toDateTime('2024-01-02 00:00:00')) AS a"),
    ("toRelativeHourNum", "SELECT toRelativeHourNum(toDateTime('2024-01-02 00:00:00')) AS a"),
    ("UTCTimestamp", "SELECT UTCTimestamp() >= toDateTime('2020-01-01 00:00:00') AS a"),
    ("nowInBlock", "SELECT nowInBlock() >= toDateTime('2020-01-01 00:00:00') AS a"),
    ("snowflakeIDToDateTime", "SELECT snowflakeIDToDateTime(7204148380452372480) AS a"),
    ("dateTimeToSnowflakeID", "SELECT dateTimeToSnowflakeID(toDateTime('2021-08-15 18:57:56')) AS a"),
    ("ULIDStringToDateTime", "SELECT ULIDStringToDateTime(generateULID()) > toDateTime('2020-01-01 00:00:00') AS a"),
    ("generateUUIDv7", "SELECT length(toString(generateUUIDv7())) AS a"),
    ("UUIDv7ToDateTime", "SELECT UUIDv7ToDateTime(generateUUIDv7()) > toDateTime('2020-01-01 00:00:00') AS a"),
    ("toStartOfInterval", "SELECT toStartOfInterval(toDateTime('2024-01-01 12:34:56'), INTERVAL 15 MINUTE) AS a"),
    ("date_trunc_week", "SELECT date_trunc('week', toDateTime('2024-03-05 12:00:00')) AS a"),
    # --- math / numeric ---
    ("widthBucket", "SELECT widthBucket(3.5, 0, 10, 5) AS a"),
    ("proportionsZTest", "SELECT proportionsZTest(10, 11, 100, 101, 0.95, 'unpooled') AS a"),
    ("sinh_cosh", "SELECT sinh(1.0) AS a, cosh(1.0) AS b, tanh(1.0) AS c"),
    ("asinh_acosh", "SELECT asinh(1.0) AS a, acosh(2.0) AS b, atanh(0.5) AS c"),
    ("atan2_hypot", "SELECT atan2(1.0, 2.0) AS a, hypot(3.0, 4.0) AS b"),
    ("erf_erfc", "SELECT erf(1.0) AS a, erfc(1.0) AS b"),
    ("lgamma_tgamma", "SELECT lgamma(5.0) AS a, tgamma(5.0) AS b"),
    ("degrees_radians", "SELECT degrees(pi()) AS a, radians(180.0) AS b"),
    ("factorial", "SELECT factorial(5) AS a"),
    ("roundAge", "SELECT roundAge(23) AS a"),
    ("roundDuration", "SELECT roundDuration(45) AS a"),
    ("roundDown", "SELECT roundDown(7, array(1, 5, 10)) AS a"),
    ("roundToExp2", "SELECT roundToExp2(100) AS a"),
    ("roundBankers", "SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b"),
    ("ifNotFinite", "SELECT ifNotFinite(1.0 / 0.0, 42.0) AS a"),
    ("isZeroOrNull", "SELECT isZeroOrNull(0) AS a, isZeroOrNull(NULL) AS b"),
    ("bitHammingDistance", "SELECT bitHammingDistance(111, 121) AS a"),
    ("bitRotateLeft", "SELECT bitRotateLeft(toUInt8(1), 2) AS a"),
    ("bitSlice", "SELECT bitSlice('ab', 2, 7) AS a"),
    ("mortonEncode", "SELECT mortonEncode(1, 2) AS a"),
    ("mortonDecode", "SELECT mortonDecode(2, 9) AS a"),
    ("hilbertEncode", "SELECT hilbertEncode(1, 2) AS a"),
    ("transform_3arg", "SELECT transform(2, array(1, 2), array('a', 'b'), 'z') AS a"),
    ("formatReadableTimeDelta", "SELECT formatReadableTimeDelta(3661) AS a"),
    ("formatReadableDecimalSize", "SELECT formatReadableDecimalSize(1000000) AS a"),
    ("formatReadableQuantity", "SELECT formatReadableQuantity(1234567) AS a"),
    ("parseTimeDelta", "SELECT parseTimeDelta('1h 30m') AS a"),
    # --- random distributions ---
    ("randNormal", "SELECT abs(randNormal(0, 1)) >= 0 AS a"),
    ("randUniform", "SELECT randUniform(0, 1) BETWEEN 0 AND 1 AS a"),
    ("randBernoulli", "SELECT randBernoulli(0.5) IN (0, 1) AS a"),
    ("randExponential", "SELECT randExponential(1.0) >= 0 AS a"),
    ("randCanonical", "SELECT randCanonical() BETWEEN 0 AND 1 AS a"),
    # --- URL ---
    ("cutToFirstSignificantSubdomain", "SELECT cutToFirstSignificantSubdomain('https://news.clickhouse.com.tr/') AS a"),
    ("firstSignificantSubdomain", "SELECT firstSignificantSubdomain('https://news.clickhouse.com.tr/') AS a"),
    ("URLHierarchy", "SELECT URLHierarchy('https://example.com/a/b?x=1') AS a"),
    ("URLPathHierarchy", "SELECT URLPathHierarchy('https://example.com/a/b') AS a"),
    ("extractURLParameters", "SELECT extractURLParameters('http://e.com/?a=1&b=2') AS a"),
    ("extractURLParameterNames", "SELECT extractURLParameterNames('http://e.com/?a=1&b=2') AS a"),
    ("encodeURLComponent", "SELECT encodeURLComponent('a b') AS a, decodeURLComponent('a%20b') AS b"),
    ("encodeURLFormComponent", "SELECT encodeURLFormComponent('a b') AS a, decodeURLFormComponent('a+b') AS b"),
    ("netloc", "SELECT netloc('http://u:p@example.com:80/a') AS a"),
    ("queryStringAndFragment", "SELECT queryStringAndFragment('http://e.com/?a=1#f') AS a"),
    # --- IP ---
    ("IPv4CIDRToRange", "SELECT IPv4CIDRToRange(toIPv4('192.168.5.2'), 16) AS a"),
    ("IPv6CIDRToRange", "SELECT IPv6CIDRToRange(toIPv6('2001:db8::1'), 32) AS a"),
    ("cutIPv6", "SELECT cutIPv6(toIPv6('2001:db8::1'), 2, 0) AS a"),
    ("toIPv4OrNull", "SELECT toIPv4OrNull('bad') AS a, toIPv4OrNull('1.2.3.4') AS b"),
    ("isIPv4String", "SELECT isIPv4String('1.2.3.4') AS a, isIPv6String('::1') AS b"),
    # --- misc ---
    ("bar_fn", "SELECT bar(5, 0, 10, 10) AS a"),
    ("throwIf", "SELECT throwIf(false, 'nope') AS a"),
    ("hostName", "SELECT length(hostName()) > 0 AS a"),
    ("currentUser", "SELECT length(currentUser()) >= 0 AS a"),
    ("version_fn", "SELECT length(version()) > 0 AS a"),
    ("uptime_fn", "SELECT uptime() >= 0 AS a"),
    ("blockSize", "SELECT blockSize() >= 1 AS a"),
    ("rowNumberInAllBlocks", "SELECT rowNumberInAllBlocks() AS a"),
    ("materialize", "SELECT materialize(42) AS a"),
    ("ignore_fn", "SELECT ignore(1, 2) AS a"),
    ("sleepEachRow", "SELECT sleepEachRow(0.0) AS a"),
    ("runningDifference", "SELECT runningDifference(x) AS a FROM VALUES (1),(3),(6) AS t(x)"),
    ("runningAccumulate", "SELECT runningAccumulate(s) FROM (SELECT sumState(1) AS s)"),
    ("neighbor", "SELECT neighbor(x, 1) AS a FROM VALUES (1),(2) AS t(x)"),
    ("indexHint", "SELECT count() AS a FROM ev WHERE indexHint(user_id > 0)"),
    ("assumeNotNull", "SELECT assumeNotNull(CAST(1 AS Nullable(Int32))) AS a"),
    ("toTypeName", "SELECT toTypeName(1) AS a"),
    ("dumpColumnStructure", "SELECT dumpColumnStructure(1) AS a"),
    ("emptyArrayInt32", "SELECT emptyArrayInt32() AS a, emptyArrayString() AS b"),
    ("emptyArrayToSingle", "SELECT emptyArrayToSingle(emptyArrayInt32()) AS a"),
    ("replicate_fn", "SELECT 1 AS a"),  # placeholder
    ("getMacro", "SELECT getMacro('replica') AS a"),
    ("isDecimalOverflow", "SELECT isDecimalOverflow(toDecimal32(1000000000, 0), 9) AS a"),
    ("countDigits", "SELECT countDigits(toDecimal32(12.345, 3)) AS a"),
]

ok, fail = [], []
for name, sql in PROBES:
    try:
        rows = eng.sql(sql).collect()
        ok.append((name, rows[0] if rows else None))
    except NotImplementedError as e:
        fail.append((name, "GATE", str(e).split("\n")[0][:140]))
    except Exception as e:
        fail.append((name, type(e).__name__, str(e).split("\n")[0][:160]))

print(f"\n==== OK: {len(ok)}  FAIL: {len(fail)} ====")
for name, r in ok:
    print(f"OK   {name}: {str(r)[:120]}")
print("----")
for name, t, m in fail:
    print(f"FAIL {name}: {t}: {m}")
