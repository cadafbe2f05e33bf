"""Dev tool: dialect probe wave 27b (round 10, second wave)."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe27b", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh27b")

SF = "/root/testdata/sf0.001"
spark.read.parquet(f"{SF}/events.parquet").createOrReplaceTempView("ev")

PROBES = [
    # --- window-function CH spellings ---
    ("lagInFrame", "SELECT x, lagInFrame(x, 1) OVER (ORDER BY x) AS a FROM VALUES (1),(2),(3) AS t(x) ORDER BY x"),
    ("leadInFrame", "SELECT x, leadInFrame(x, 1) OVER (ORDER BY x) AS a FROM VALUES (1),(2),(3) AS t(x) ORDER BY x"),
    ("nth_value_win", "SELECT nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a FROM VALUES (1),(2),(3) AS t(x) LIMIT 1"),
    ("denseRank", "SELECT denseRank() OVER (ORDER BY x) AS a FROM VALUES (1),(1),(2) AS t(x) LIMIT 1"),
    ("percentRank", "SELECT percent_rank() OVER (ORDER BY x) AS a FROM VALUES (1),(2) AS t(x) LIMIT 1"),
    ("ntile_win", "SELECT ntile(2) OVER (ORDER BY x) AS a FROM VALUES (1),(2),(3),(4) AS t(x) LIMIT 1"),
    # --- tuple math ---
    ("tupleElement", "SELECT tupleElement((1, 'a'), 1) AS a"),
    ("tuplePlus", "SELECT tuplePlus((1, 2), (3, 4)) AS a"),
    ("tupleMinus", "SELECT tupleMinus((5, 6), (1, 2)) AS a"),
    ("tupleMultiply", "SELECT tupleMultiply((2, 3), (4, 5)) AS a"),
    ("tupleDivide", "SELECT tupleDivide((8.0, 9.0), (2.0, 3.0)) AS a"),
    ("tupleNegate", "SELECT tupleNegate((1, -2)) AS a"),
    ("tupleMultiplyByNumber", "SELECT tupleMultiplyByNumber((1, 2), 3) AS a"),
    ("tupleDivideByNumber", "SELECT tupleDivideByNumber((4.0, 6.0), 2) AS a"),
    ("dotProduct_tuple", "SELECT dotProduct((1, 2), (3, 4)) AS a"),
    ("tupleToNameValuePairs", "SELECT tupleToNameValuePairs((1, 2)) AS a"),
    ("tupleIntDiv", "SELECT tupleIntDiv((15, 10), (5, 3)) AS a"),
    ("tupleModulo", "SELECT tupleModulo((15, 10), (5, 3)) AS a"),
    # --- UUID family ---
    ("toUUID", "SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS a"),
    ("toUUIDOrNull", "SELECT toUUIDOrNull('bad') AS a"),
    ("toUUIDOrZero", "SELECT toUUIDOrZero('bad') AS a"),
    ("UUIDStringToNum", "SELECT length(UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS a"),
    ("UUIDNumToString", "SELECT UUIDNumToString(UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS a"),
    ("UUIDToNum", "SELECT length(UUIDToNum(toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0'))) AS a"),
    ("generateUUIDv4", "SELECT length(toString(generateUUIDv4())) AS a"),
    ("serverUUID", "SELECT length(toString(serverUUID())) >= 0 AS a"),
    # --- XML / HTML ---
    ("encodeXMLComponent", "SELECT encodeXMLComponent('<a & \"b\">') AS a"),
    ("decodeXMLComponent", "SELECT decodeXMLComponent('&lt;a&gt; &amp; &quot;b&quot;') AS a"),
    ("decodeHTMLComponent", "SELECT decodeHTMLComponent('&nbsp;&lt;x&gt;') AS a"),
    ("extractTextFromHTML", "SELECT extractTextFromHTML('<p>hello <b>world</b></p>') AS a"),
    # --- intervals ---
    ("toIntervalDay", "SELECT toDate('2024-01-01') + toIntervalDay(3) AS a"),
    ("toIntervalMonth", "SELECT toDate('2024-01-01') + toIntervalMonth(2) AS a"),
    ("toIntervalSecond", "SELECT toDateTime('2024-01-01 00:00:00') + toIntervalSecond(90) AS a"),
    ("toIntervalWeek", "SELECT toDate('2024-01-01') + toIntervalWeek(1) AS a"),
    # --- combinators on less-common bases ---
    ("sumDistinct", "SELECT sumDistinct(x) AS a FROM VALUES (1),(1),(2) AS t(x)"),
    ("avgDistinct", "SELECT avgDistinct(x) AS a FROM VALUES (1.0),(1.0),(3.0) AS t(x)"),
    ("countIfDistinct", "SELECT countIf(DISTINCT x, x > 0) AS a FROM VALUES (1),(1),(2) AS t(x)"),
    ("maxOrDefault", "SELECT maxOrDefault(x) AS a FROM (SELECT CAST(NULL AS INT) AS x WHERE false)"),
    ("sumOrDefault", "SELECT sumOrDefault(x) AS a FROM (SELECT CAST(1 AS INT) AS x WHERE false)"),
    ("quantileIf", "SELECT quantileIf(0.5)(x, x > 0) AS a FROM VALUES (1.0),(2.0),(-5.0) AS t(x)"),
    ("uniqExactIf", "SELECT uniqExactIf(x, x > 1) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("groupArrayIf", "SELECT groupArrayIf(x, x > 1) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("argMaxOrNull", "SELECT argMaxOrNull(x, y) AS a FROM (SELECT 1 AS x, 2 AS y WHERE false)"),
    ("anyIf", "SELECT anyIf(x, x > 1) AS a FROM VALUES (1),(2) AS t(x)"),
    ("medianIf", "SELECT medianIf(x, x > 0) AS a FROM VALUES (1.0),(3.0),(-1.0) AS t(x)"),
    # --- strings round 2 ---
    ("regexpExtract", "SELECT regexpExtract('a1b2', '([a-z])([0-9])', 2) AS a"),
    ("splitByRegexp", "SELECT splitByRegexp('[0-9]+', 'a1b22c') AS a"),
    ("splitByString", "SELECT splitByString('::', 'a::b::c') AS a"),
    ("splitByNonAlpha", "SELECT splitByNonAlpha('a.b 1c') AS a"),
    ("extractGroups", "SELECT extractGroups('a1b2', '([a-z])([0-9])') AS a"),
    ("ngramDistance", "SELECT round(ngramDistance('hello', 'hallo'), 4) AS a"),
    ("ngramSearch", "SELECT round(ngramSearch('hello world', 'world'), 4) AS a"),
    ("wordShingleSimHash", "SELECT wordShingleSimHash('a b c d e f') >= 0 AS a"),
    ("toStringCutToZero2", "SELECT toStringCutToZero('ab\\0cd') AS a"),
    ("startsWithUTF8", "SELECT startsWithUTF8('héllo', 'hé') AS a"),
    ("endsWithUTF8", "SELECT endsWithUTF8('héllo', 'lo') AS a"),
    ("substringIndexUTF8", "SELECT substringIndexUTF8('é.b.c', '.', 1) AS a"),
    ("stringCompare", "SELECT stringCompare('abc', 'abd') AS a"),
    ("sparseGrams", "SELECT sparseGrams('hello') AS a"),
    # --- arrays round 2 ---
    ("arrayFold", "SELECT arrayFold((acc, x) -> acc + x, array(1, 2, 3), CAST(0 AS BIGINT)) AS a"),
    ("arrayReduce", "SELECT arrayReduce('sum', array(1, 2, 3)) AS a"),
    ("arrayReduceInRanges", "SELECT arrayReduceInRanges('sum', array((1, 2)), array(1, 2, 3)) AS a"),
    ("arrayCumSumNonNegative", "SELECT arrayCumSumNonNegative(array(1, -3, 2)) AS a"),
    ("arrayDifference2", "SELECT arrayDifference(array(1, 4, 2)) AS a"),
    ("arrayFlatten", "SELECT arrayFlatten(array(array(1, 2), array(3))) AS a"),
    ("arrayIntersect", "SELECT arraySort(arrayIntersect(array(1, 2, 3), array(2, 3, 4))) AS a"),
    ("arraySymmetricDifference", "SELECT arraySort(arraySymmetricDifference(array(1, 2), array(2, 3))) AS a"),
    ("arrayUnion", "SELECT arraySort(arrayUnion(array(1, 2), array(2, 3))) AS a"),
    ("arrayPushBack", "SELECT arrayPushBack(array(1, 2), 3) AS a, arrayPushFront(array(2, 3), 1) AS b"),
    ("arrayPopBack", "SELECT arrayPopBack(array(1, 2, 3)) AS a, arrayPopFront(array(1, 2, 3)) AS b"),
    ("arrayResize", "SELECT arrayResize(array(1, 2), 4) AS a, arrayResize(array(1, 2, 3), 2) AS b"),
    ("arrayWithConstant", "SELECT arrayWithConstant(3, 'x') AS a"),
    ("arraySplit", "SELECT arraySplit((x, y) -> y, array(1, 2, 3, 4, 5), array(1, 0, 0, 1, 0)) AS a"),
    ("arrayReverseSplit", "SELECT arrayReverseSplit((x, y) -> y, array(1, 2, 3, 4, 5), array(1, 0, 0, 1, 0)) AS a"),
    ("arrayFirstLast", "SELECT arrayFirst(x -> x > 1, array(1, 2, 3)) AS a, arrayLast(x -> x > 1, array(1, 2, 3)) AS b"),
    ("arrayFirstLastOrNull", "SELECT arrayFirstOrNull(x -> x > 9, array(1)) AS a, arrayLastOrNull(x -> x > 0, array(1, 2)) AS b"),
    ("arrayFirstLastIndex", "SELECT arrayFirstIndex(x -> x > 1, array(1, 2, 3)) AS a, arrayLastIndex(x -> x > 1, array(1, 2, 3)) AS b"),
    ("arrayCount2", "SELECT arrayCount(x -> x > 1, array(1, 2, 3)) AS a"),
    ("arrayAvg_lambda", "SELECT arrayAvg(x -> x * 2, array(1, 2, 3)) AS a"),
    ("arrayMin_lambda", "SELECT arrayMin(x -> -x, array(1, 2, 3)) AS a"),
    ("arrayProduct", "SELECT arrayProduct(array(2.0, 3.0, 4.0)) AS a"),
    ("arrayAll", "SELECT arrayAll(x -> x > 0, array(1, 2)) AS a, arrayExists(x -> x > 1, array(1, 2)) AS b"),
    # --- encoding / hash round 2 ---
    ("bin_unbin", "SELECT bin(5) AS a, unbin('0011') AS b"),
    ("hex_unhex64", "SELECT hex(255) AS a"),
    ("wyHash64", "SELECT wyHash64('abc') >= 0 OR true AS a"),
    ("gccMurmurHash", "SELECT gccMurmurHash('abc') IS NOT NULL AS a"),
    ("kafkaMurmurHash", "SELECT kafkaMurmurHash('abc') IS NOT NULL AS a"),
    ("javaHashUTF16LE", "SELECT javaHashUTF16LE('abc') IS NOT NULL AS a"),
    ("hiveHash", "SELECT hiveHash('abc') IS NOT NULL AS a"),
    ("crc32", "SELECT CRC32('abc') AS a"),
    ("crc32ieee", "SELECT CRC32IEEE('abc') AS a"),
    ("crc64", "SELECT CRC64('abc') IS NOT NULL AS a"),
    ("farmHash64", "SELECT farmHash64('abc') IS NOT NULL AS a"),
    ("metroHash64", "SELECT metroHash64('abc') IS NOT NULL AS a"),
    # --- dates round 2 ---
    ("toStartOfSecond", "SELECT toStartOfSecond(toDateTime64('2024-01-01 00:00:01.55', 3)) AS a"),
    ("toMillisecond", "SELECT toMillisecond(toDateTime64('2024-01-01 00:00:01.55', 3)) AS a"),
    ("toUnixTimestamp64Milli", "SELECT toUnixTimestamp64Milli(toDateTime64('2024-01-01 00:00:00', 3)) AS a"),
    ("fromUnixTimestamp64Milli", "SELECT fromUnixTimestamp64Milli(1704067200000) AS a"),
    ("toTimeWithFixedDate", "SELECT toTime(toDateTime('2024-03-05 14:30:00')) AS a"),
    ("toLastDayOfMonth", "SELECT toLastDayOfMonth(toDate('2024-02-05')) AS a"),
    ("toLastDayOfWeek", "SELECT toLastDayOfWeek(toDate('2024-03-05')) AS a"),
    ("addTupleOfIntervals2", "SELECT addTupleOfIntervals(toDate('2024-01-01'), (toIntervalDay(1), toIntervalMonth(1))) AS a"),
    ("subtractTupleOfIntervals", "SELECT subtractTupleOfIntervals(toDate('2024-02-02'), (toIntervalDay(1), toIntervalMonth(1))) AS a"),
    ("timestamp_fn", "SELECT timestamp('2024-01-01 12:00:00') AS a"),
    ("toDateOrDefault", "SELECT toDateOrDefault('bad', toDate('2020-01-01')) AS a"),
    ("toDateTimeOrDefault", "SELECT toDateTimeOrDefault('bad', toDateTime('2020-01-01 00:00:00')) AS a"),
    ("toInt32OrDefault", "SELECT toInt32OrDefault('bad', 7) AS a"),
    # --- misc ---
    ("isNullable", "SELECT isNullable(CAST(1 AS Nullable(Int32))) AS a"),
    ("isNotDistinctFrom", "SELECT isNotDistinctFrom(NULL, NULL) AS a"),
    ("nothing_null", "SELECT NULL AS a"),
    ("least_greatest_multi", "SELECT least(3, 1, 2) AS a, greatest(3, 1, 2) AS b"),
    ("multiIf", "SELECT multiIf(1 = 2, 'a', 2 = 2, 'b', 'c') AS a"),
    ("toBool", "SELECT toBool(1) AS a, toBool('true') AS b"),
    ("toFixedString", "SELECT toFixedString('ab', 3) AS a"),
    ("reinterpretAsString", "SELECT length(reinterpretAsString(65)) >= 1 AS a"),
    ("structureToProtobufSchema", "SELECT structureToProtobufSchema('x Int32') AS a"),
    ("formatQuery", "SELECT formatQuery('select 1') AS a"),
    ("minSampleSizeConversion", "SELECT minSampleSizeConversion(0.25, 0.05, 0.8, 0.05) AS a"),
    ("minSampleSizeContinuous", "SELECT minSampleSizeContinous(100.0, 10.0, 0.05, 0.8, 0.05) AS a"),
]

ok, fail = [], []
for name, sql in PROBES:
    try:
        rows = eng.sql(sql).collect()
        ok.append((name, rows[0] if rows else None))
    except NotImplementedError as e:
        fail.append((name, "GATE", str(e).split("\n")[0][:120]))
    except Exception as e:
        fail.append((name, type(e).__name__, str(e).split("\n")[0][:150]))

print(f"\n==== OK: {len(ok)}  FAIL: {len(fail)} ====")
for name, r in ok:
    print(f"OK   {name}: {str(r)[:110]}")
print("----")
for name, t, m in fail:
    print(f"FAIL {name}: {t}: {m}")
