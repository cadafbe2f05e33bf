"""Dev tool: dialect probe wave 28 (round 11, first wave) — math/array
stragglers, date arithmetic tails, aggregate combinators, URL parts,
string similarity, window spellings."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe28", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh28")

PROBES = [
    # --- math stragglers ---
    ("erf_erfc", "SELECT erf(1.0) AS a, erfc(1.0) AS b"),
    ("lgamma_tgamma", "SELECT lgamma(5.0) AS a, tgamma(5.0) AS b"),
    ("cbrt", "SELECT cbrt(27.0) AS a"),
    ("hypot_atan2", "SELECT hypot(3.0, 4.0) AS a, atan2(1.0, 1.0) AS b"),
    ("sinh_cosh", "SELECT sinh(1.0) AS a, cosh(1.0) AS b, asinh(1.0) AS c, acosh(2.0) AS d, atanh(0.5) AS e"),
    ("log1p_exp2_exp10", "SELECT log1p(0.5) AS a, exp2(3) AS b, exp10(2) AS c"),
    ("intExp2_intExp10", "SELECT intExp2(10) AS a, intExp10(3) AS b"),
    ("degrees_radians", "SELECT degrees(pi()) AS a, radians(180.0) AS b"),
    ("factorial", "SELECT factorial(5) AS a"),
    ("gcd_lcm", "SELECT gcd(12, 18) AS a, lcm(4, 6) AS b"),
    ("max2_min2", "SELECT max2(1, 2) AS a, min2(1, 2) AS b"),
    ("intDiv_orZero", "SELECT intDiv(7, 2) AS a, intDivOrZero(7, 0) AS b, moduloOrZero(7, 0) AS c"),
    ("isFinite_etc", "SELECT isFinite(1.0) AS a, isInfinite(1.0/0.0) AS b, isNaN(0.0/0.0) AS c"),
    ("ifNotFinite", "SELECT ifNotFinite(1.0/0.0, 42.0) AS a"),
    ("multiplyDecimal", "SELECT multiplyDecimal(CAST(2.5 AS DECIMAL(10,2)), CAST(4.0 AS DECIMAL(10,2))) AS a"),
    ("divideDecimal", "SELECT divideDecimal(CAST(5.0 AS DECIMAL(10,2)), CAST(2.0 AS DECIMAL(10,2))) AS a"),
    ("sign_fn", "SELECT sign(-3.0) AS a"),
    ("widthBucket", "SELECT widthBucket(10.15, 0, 20, 4) AS a"),
    ("proportionsZTest_done", "SELECT 1 AS a"),
    # --- aggregates / combinators ---
    ("sumKahan", "SELECT sumKahan(x) AS a FROM VALUES (1.0),(2.0) AS t(x)"),
    ("sumCount", "SELECT sumCount(x) AS a FROM VALUES (1.0),(2.0) AS t(x)"),
    ("sumWithOverflow", "SELECT sumWithOverflow(x) AS a FROM VALUES (1),(2) AS t(x)"),
    ("avgWeighted", "SELECT avgWeighted(x, w) AS a FROM VALUES (1.0, 1),(3.0, 3) AS t(x, w)"),
    ("boundingRatio", "SELECT boundingRatio(t2, v) AS a FROM VALUES (1, 10.0),(5, 50.0) AS t(t2, v)"),
    ("deltaSum", "SELECT deltaSum(x) AS a FROM VALUES (1),(3),(2),(5) AS t(x)"),
    ("skewPop_skewSamp", "SELECT skewPop(x) AS a, skewSamp(x) AS b FROM VALUES (1.0),(2.0),(5.0) AS t(x)"),
    ("kurtPop_kurtSamp", "SELECT kurtPop(x) AS a, kurtSamp(x) AS b FROM VALUES (1.0),(2.0),(5.0) AS t(x)"),
    ("entropy", "SELECT entropy(x) AS a FROM VALUES (1),(1),(2) AS t(x)"),
    ("uniqCombined", "SELECT uniqCombined(x) AS a, uniqCombined64(x) AS b FROM VALUES (1),(2),(2) AS t(x)"),
    ("uniqTheta", "SELECT uniqTheta(x) AS a FROM VALUES (1),(2) AS t(x)"),
    ("groupArrayMovingAvg", "SELECT groupArrayMovingAvg(2)(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("groupArrayMovingSum", "SELECT groupArrayMovingSum(2)(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("groupBitAnd_Or_Xor", "SELECT groupBitAnd(x) AS a, groupBitOr(x) AS b, groupBitXor(x) AS c FROM VALUES (3),(5) AS t(x)"),
    ("singleValueOrNull", "SELECT singleValueOrNull(x) AS a FROM VALUES (7),(7) AS t(x)"),
    ("intervalLengthSum", "SELECT intervalLengthSum(s, e) AS a FROM VALUES (1.0, 3.0),(2.0, 5.0) AS t(s, e)"),
    ("sumDistinct_avgDistinct", "SELECT sumDistinct(x) AS a, avgDistinct(x) AS b FROM VALUES (1),(1),(2) AS t(x)"),
    ("minIf_maxIf", "SELECT minIf(x, x > 1) AS a, maxIf(x, x < 2) AS b FROM VALUES (1),(2) AS t(x)"),
    ("anyHeavy", "SELECT anyHeavy(x) AS a FROM VALUES (1),(1),(2) AS t(x)"),
    ("sumForEach", "SELECT sumForEach(xs) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(10, 20))"),
    ("maxForEach", "SELECT maxForEach(xs) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(10, 0))"),
    ("quantileExactExclusive", "SELECT quantileExactExclusive(0.5)(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("quantileExactInclusive", "SELECT quantileExactInclusive(0.5)(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("avgOrNull_combinator", "SELECT avgOrNull(x) AS a FROM (SELECT 1.0 AS x WHERE 1 = 0)"),
    ("sumArgMin", "SELECT sumArgMin(v, k) AS a FROM VALUES (1.0, 'b'),(2.0, 'a') AS t(v, k)"),
    # --- arrays ---
    ("arrayRotateLeft", "SELECT arrayRotateLeft(array(1, 2, 3, 4), 1) AS a, arrayRotateRight(array(1, 2, 3, 4), 1) AS b"),
    ("arrayShiftLeft", "SELECT arrayShiftLeft(array(1, 2, 3), 1) AS a, arrayShiftRight(array(1, 2, 3), 1, 9) AS b"),
    ("arrayPartialSort", "SELECT arrayPartialSort(2, array(3, 1, 2)) AS a"),
    ("arrayFold", "SELECT arrayFold((acc, x) -> acc + x, array(1, 2, 3), CAST(10 AS BIGINT)) AS a"),
    ("arrayIntersect_union", "SELECT arrayIntersect(array(1, 2), array(2, 3)) AS a, arrayUnion(array(1), array(2)) AS b"),
    ("arraySymmetricDifference", "SELECT arraySymmetricDifference(array(1, 2), array(2, 3)) AS a"),
    ("arrayJaccardIndex", "SELECT arrayJaccardIndex(array(1, 2), array(2, 3)) AS a"),
    ("arrayZip", "SELECT arrayZip(array(1, 2), array('a', 'b')) AS a"),
    ("arrayZipUnaligned", "SELECT arrayZipUnaligned(array(1), array('a', 'b')) AS a"),
    ("arrayCumSum", "SELECT arrayCumSum(array(1, 2, 3)) AS a"),
    ("arrayCumSumNonNegative", "SELECT arrayCumSumNonNegative(array(1, -2, 3)) AS a"),
    ("arrayDifference", "SELECT arrayDifference(array(1, 3, 6)) AS a"),
    ("arrayDotProduct", "SELECT arrayDotProduct(array(1.0, 2.0), array(3.0, 4.0)) AS a"),
    ("arrayAll_exists", "SELECT arrayAll(x -> x > 0, array(1, 2)) AS a, arrayExists(x -> x > 1, array(1, 2)) AS b"),
    ("arrayFirst_last", "SELECT arrayFirst(x -> x > 1, array(1, 2, 3)) AS a, arrayLast(x -> x > 1, array(1, 2, 3)) AS b"),
    ("arrayFirstIndex", "SELECT arrayFirstIndex(x -> x > 1, array(1, 2, 3)) AS a, arrayLastIndex(x -> x > 1, array(1, 2, 3)) AS b"),
    ("arrayFirstOrNull", "SELECT arrayFirstOrNull(x -> x > 9, array(1, 2)) AS a, arrayLastOrNull(x -> x > 0, array(1, 2)) AS b"),
    ("arrayShuffle", "SELECT arrayShuffle(array(1, 2, 3)) AS a"),
    ("arrayRandomSample", "SELECT arrayRandomSample(array(1, 2, 3), 2) AS a"),
    # --- dates ---
    ("age_fn", "SELECT age('day', toDate('2024-01-01'), toDate('2024-02-01')) AS a"),
    ("dateName_monthName", "SELECT dateName('month', toDate('2024-03-05')) AS a, monthName(toDate('2024-03-05')) AS b"),
    ("toDaysSinceYearZero", "SELECT toDaysSinceYearZero(toDate('2023-09-08')) AS a"),
    ("fromDaysSinceYearZero", "SELECT fromDaysSinceYearZero(739131) AS a"),
    ("toModifiedJulianDay", "SELECT toModifiedJulianDay('2020-01-01') AS a"),
    ("fromModifiedJulianDay", "SELECT fromModifiedJulianDay(58849) AS a"),
    ("YYYYMMDDToDate", "SELECT YYYYMMDDToDate(20230911) AS a"),
    ("YYYYMMDDhhmmssToDateTime", "SELECT YYYYMMDDhhmmssToDateTime(20230911131415) AS a"),
    ("changeYear", "SELECT changeYear(toDate('2024-01-01'), 2023) AS a, changeMonth(toDate('2024-01-01'), 7) AS b, changeDay(toDate('2024-01-01'), 15) AS c"),
    ("changeHour", "SELECT changeHour(toDateTime('2024-01-01 10:00:00'), 5) AS a, changeMinute(toDateTime('2024-01-01 10:00:00'), 30) AS b, changeSecond(toDateTime('2024-01-01 10:00:00'), 59) AS c"),
    ("timeSlot", "SELECT timeSlot(toDateTime('2024-01-01 10:17:00')) AS a"),
    ("timeSlots", "SELECT timeSlots(toDateTime('2024-01-01 10:00:00'), CAST(3700 AS BIGINT)) AS a"),
    ("toTime", "SELECT toTime(toDateTime('2024-01-01 10:17:13')) AS a"),
    ("toRelativeHourNum", "SELECT toRelativeHourNum(toDateTime('2024-01-01 10:00:00')) AS a, toRelativeDayNum(toDate('2024-01-01')) AS b"),
    ("UTCTimestamp", "SELECT UTCTimestamp() AS a"),
    ("nowInBlock", "SELECT nowInBlock() AS a"),
    ("monthName2", "SELECT 1 AS a"),
    # --- strings ---
    ("soundex", "SELECT soundex('Robert') AS a"),
    ("stringJaccardIndex", "SELECT stringJaccardIndex('clickhouse', 'mouse') AS a"),
    ("byteHammingDistance", "SELECT byteHammingDistance('abc', 'abd') AS a"),
    ("hasSubsequence", "SELECT hasSubsequence('garbage', 'arg') AS a, hasSubsequenceCaseInsensitive('garbage', 'ARG') AS b"),
    ("ngramDistance", "SELECT ngramDistance('ClickHouse', 'ClickHome') AS a"),
    ("translate_fn", "SELECT translate('Hello', 'el', 'ip') AS a"),
    ("base58", "SELECT base58Encode('Encoded') AS a, base58Decode(base58Encode('x')) AS b"),
    ("bin_unbin", "SELECT bin('A') AS a, unbin('01000001') AS b"),
    ("splitByNonAlpha", "SELECT splitByNonAlpha('a.b  c') AS a"),
    ("splitByWhitespace", "SELECT splitByWhitespace('a  b c') AS a"),
    ("splitByRegexp", "SELECT splitByRegexp('\\\\d+', 'a1b22c') AS a"),
    ("ngrams_tokens", "SELECT ngrams('abcd', 3) AS a, tokens('a b, c') AS b"),
    ("isValidUTF8", "SELECT isValidUTF8('ab') AS a, toValidUTF8('ab') AS b"),
    ("normalizeUTF8NFC", "SELECT normalizeUTF8NFC('ab') AS a"),
    ("initcapUTF8", "SELECT initcap('hello world') AS a, initcapUTF8('héllo') AS b"),
    ("space_repeat", "SELECT space(3) AS a, repeat('ab', 2) AS b"),
    ("ascii_char", "SELECT ascii('A') AS a, char(72, 105) AS b"),
    ("format_fn", "SELECT format('{}-{}', 'a', 'b') AS a"),
    ("leftPadUTF8", "SELECT leftPad('x', 3, '_') AS a, rightPadUTF8('x', 3, '_') AS b"),
    ("regexpExtract", "SELECT regexpExtract('100-200', '(\\\\d+)-(\\\\d+)', 1) AS a"),
    ("stringCompare_done", "SELECT 1 AS a"),
    # --- URL parts ---
    ("port_netloc", "SELECT port('http://example.com:8080/a') AS a, netloc('http://u:p@example.com/a?q=1') AS b"),
    ("queryString_fragment", "SELECT queryString('http://x.io/a?q=1&r=2#f') AS a, fragment('http://x.io/a#frag') AS b, queryStringAndFragment('http://x.io/a?q=1#f') AS c"),
    ("removeQueryString", "SELECT cutQueryString('http://x.io/a?q=1') AS a, cutFragment('http://x.io/a#f') AS b, cutQueryStringAndFragment('http://x.io/a?q=1#f') AS c"),
    ("encodeURLComponent", "SELECT encodeURLComponent('a b&c') AS a, decodeURLComponent('a%20b%26c') AS b"),
    ("encodeURLFormComponent", "SELECT encodeURLFormComponent('a b') AS a, decodeURLFormComponent('a+b') AS b"),
    ("cutWWW", "SELECT cutWWW('http://www.example.com/a') AS a"),
    ("domainWithoutWWW", "SELECT domainWithoutWWW('http://www.example.com/a') AS a"),
    ("topLevelDomain", "SELECT topLevelDomain('http://www.example.com/a') AS a"),
    ("pathFull_path", "SELECT path('http://x.io/a/b?q=1') AS a, pathFull('http://x.io/a/b?q=1') AS b"),
    # --- windows / misc ---
    ("nonNegativeDerivative", "SELECT 1 AS a"),
    ("ntile_win", "SELECT ntile(2) OVER (ORDER BY x) AS a FROM VALUES (1),(2),(3),(4) AS t(x)"),
    ("nth_value_win", "SELECT nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("lagInFrame", "SELECT lagInFrame(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a FROM VALUES (1),(2) AS t(x)"),
    ("leadInFrame", "SELECT leadInFrame(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a FROM VALUES (1),(2) AS t(x)"),
    ("bitSlice", "SELECT bitSlice('Hello', 1, 8) AS a"),
    ("byteSize", "SELECT byteSize(CAST(1 AS INT)) AS a"),
    ("bitPositionsToArray", "SELECT bitPositionsToArray(CAST(5 AS BIGINT)) AS a"),
    ("tupleElement", "SELECT tupleElement(tuple(1, 'a'), 1) AS a"),
    ("untuple", "SELECT untuple(tuple(1, 2)) FROM (SELECT 1)"),
    ("tupleNames", "SELECT tupleNames(CAST(tuple(1, 2) AS Tuple(a Int32, b Int32))) AS a"),
    ("flattenTuple", "SELECT 1 AS a"),
    ("transform_fn", "SELECT transform(2, array(1, 2), array('a', 'b'), 'z') AS a"),
    ("transform_3arg", "SELECT transform('x', array('x'), array('y')) AS a"),
    ("indexHint", "SELECT count() AS a FROM (SELECT 1 AS x) WHERE indexHint(x = 1)"),
]

ok, fail = [], []
for name, sql in PROBES:
    try:
        rows = eng.sql(sql).collect()
        ok.append((name, rows[0] if rows else None))
    except NotImplementedError as e:
        fail.append((name, "GATE", str(e).split("\n")[0][:110]))
    except Exception as e:
        fail.append((name, type(e).__name__, str(e).split("\n")[0][:130]))

print(f"\n==== OK: {len(ok)}  FAIL: {len(fail)} ====")
for name, r in ok:
    print(f"OK   {name}: {str(r)[:100]}")
print("----")
for name, t, m in fail:
    print(f"FAIL {name}: {t}: {m}")
