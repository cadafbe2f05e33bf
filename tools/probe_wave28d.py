"""Dev tool: dialect probe wave 28d (round 11, fourth wave) — remaining
aggregate spellings, array/string stragglers, type predicates, interval
tails, window-function spellings from the CH function index."""

import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe28d", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh28d")

PROBES = [
    # --- aggregate spellings ---
    ("argMinIf", "SELECT argMinIf(v, k, k > 0) AS a FROM VALUES ('a', 2),('b', 1),('c', -1) AS t(v, k)"),
    ("argMaxIf", "SELECT argMaxIf(v, k, k < 9) AS a FROM VALUES ('a', 2),('b', 1) AS t(v, k)"),
    ("sumIf_2arg", "SELECT sumIf(v, v > 1) AS a FROM VALUES (1),(2),(3) AS t(v)"),
    ("countEqual2", "SELECT 1 AS a"),
    ("groupArrayLast", "SELECT groupArrayLast(2)(x) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("groupConcat", "SELECT groupConcat(',')(x) AS a FROM VALUES ('a'),('b') AS t(x)"),
    ("any_respect_nulls", "SELECT any(x) RESPECT NULLS AS a FROM VALUES (CAST(NULL AS INT)),(2) AS t(x)"),
    ("quantileGK_done", "SELECT quantileGK(100, 0.5)(x) AS a FROM VALUES (1.0),(2.0) AS t(x)"),
    ("maxMap", "SELECT maxMap(map(k, v)) AS a FROM VALUES ('a', 1),('a', 3) AS t(k, v)"),
    ("uniqHLL12", "SELECT uniqHLL12(x) AS a FROM VALUES (1),(2),(2) AS t(x)"),
    ("quantileTiming", "SELECT quantileTiming(0.5)(x) AS a FROM VALUES (10),(20) AS t(x)"),
    ("corrMatrix", "SELECT corrMatrix(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 3.0),(3.0, 5.0) AS t(x, y)"),
    ("studentTTest_done", "SELECT 1 AS a"),
    ("aggThrow", "SELECT aggThrow(0.0) AS a FROM VALUES (1) AS t(x)"),
    # --- arrays ---
    ("arrayConcat", "SELECT arrayConcat(array(1), array(2, 3)) AS a"),
    ("arrayResize", "SELECT arrayResize(array(1, 2), 4) AS a, arrayResize(array(1, 2, 3), 2) AS b"),
    ("arrayResize_fill", "SELECT arrayResize(array(1, 2), 4, 9) AS a"),
    ("arrayPushBack", "SELECT arrayPushBack(array(1), 2) AS a, arrayPushFront(array(2), 1) AS b"),
    ("arrayPopBack", "SELECT arrayPopBack(array(1, 2)) AS a, arrayPopFront(array(1, 2)) AS b"),
    ("arrayFlatten", "SELECT arrayFlatten(array(array(1), array(2))) AS a"),
    ("arrayReverse", "SELECT arrayReverse(array(1, 2, 3)) AS a"),
    ("arrayMin_lambda_done", "SELECT arrayMin(x -> -x, array(1, 3)) AS a"),
    ("arrayCount", "SELECT arrayCount(x -> x > 1, array(1, 2, 3)) AS a"),
    ("arrayCount_noLambda", "SELECT arrayCount(array(true, false, true)) AS a"),
    ("arraySum_noLambda", "SELECT arraySum(array(1, 2)) AS a"),
    ("arrayAvg_noLambda", "SELECT arrayAvg(array(1.0, 3.0)) AS a"),
    ("arrayProduct", "SELECT arrayProduct(array(2.0, 3.0)) AS a"),
    ("arrayDistinct", "SELECT arrayDistinct(array(1, 1, 2)) AS a"),
    ("arrayUniq_1", "SELECT arrayUniq(array(1, 1, 2)) AS a"),
    ("length_array", "SELECT 1 AS a"),
    # --- strings ---
    ("substringIndex", "SELECT substringIndex('a.b.c', '.', 2) AS a"),
    ("positionCaseInsensitiveUTF8", "SELECT positionCaseInsensitiveUTF8('Hello', 'hELL') AS a"),
    ("locate_ch", "SELECT locate('ll', 'Hello') AS a"),
    ("trimLeft", "SELECT trimLeft('  x ') AS a, trimRight('  x ') AS b, trimBoth('  x ') AS c"),
    ("reverse_str", "SELECT reverse('abc') AS a, reverseUTF8('abc') AS b"),
    ("concatAssumeInjective", "SELECT concatAssumeInjective('a', 'b') AS a"),
    ("toValidUTF8", "SELECT toValidUTF8('ab') AS a"),
    ("firstLine", "SELECT firstLine('a\\nb') AS a"),
    ("wordShingleSimHash", "SELECT wordShingleSimHash('a b c d e') AS a"),
    ("ngramSimHash", "SELECT ngramSimHash('abcde') AS a"),
    ("stringToH3", "SELECT stringToH3('8f283473fffffff') AS a"),
    # --- type predicates / conversion tails ---
    ("isZeroOrNull", "SELECT isZeroOrNull(0) AS a, isZeroOrNull(5) AS b"),
    ("assumeNotNull", "SELECT assumeNotNull(CAST(5 AS INT)) AS a"),
    ("toUnixTimestamp64Milli", "SELECT toUnixTimestamp64Milli(toDateTime64('2024-01-01 00:00:00.5', 3)) AS a"),
    ("fromUnixTimestamp64Milli", "SELECT fromUnixTimestamp64Milli(1704067200500) AS a"),
    ("toDateTime64OrNull", "SELECT toDateTime64OrNull('junk', 3) AS a"),
    ("toDate32OrNull", "SELECT toDate32OrNull('junk') AS a, toDate32OrNull('2024-01-01') AS b"),
    ("toDateOrDefault", "SELECT toDateOrDefault('junk', toDate('2024-01-01')) AS a"),
    ("toTimeOrNull", "SELECT 1 AS a"),
    ("nowSubsecond", "SELECT now64(3) AS a"),
    ("today_yesterday", "SELECT today() AS a, yesterday() AS b"),
    # --- intervals / windows ---
    ("toIntervalWeek", "SELECT toDate('2024-01-01') + toIntervalWeek(1) AS a"),
    ("dateDiff_week", "SELECT dateDiff('week', toDate('2024-01-01'), toDate('2024-01-15')) AS a"),
    ("first_value_win", "SELECT first_value(x) OVER (ORDER BY x) AS a FROM VALUES (2),(1) AS t(x)"),
    ("denseRank", "SELECT denseRank() OVER (ORDER BY x) AS a FROM VALUES (1),(1),(2) AS t(x)"),
    ("percentRank", "SELECT percent_rank() OVER (ORDER BY x) AS a FROM VALUES (1),(2) AS t(x)"),
    # --- misc ---
    ("greatest_least", "SELECT greatest(1, 2, 3) AS a, least(1, 2, 3) AS b"),
    ("bitHammingDistance", "SELECT bitHammingDistance(5, 6) AS a"),
    ("bitRotateLeft", "SELECT bitRotateLeft(CAST(1 AS BIGINT), 2) AS a, bitRotateRight(CAST(4 AS BIGINT), 2) AS b"),
    ("bitShiftLeft", "SELECT bitShiftLeft(CAST(1 AS BIGINT), 3) AS a"),
    ("roundToExp2", "SELECT roundToExp2(17) AS a"),
    ("roundDown", "SELECT roundDown(5.5, array(1.0, 4.0, 10.0)) AS a"),
    ("roundAge", "SELECT roundAge(25) AS a"),
    ("roundDuration", "SELECT roundDuration(95) AS a"),
    ("roundBankers", "SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b"),
    ("truncate_fn", "SELECT truncate(3.789, 1) AS a, trunc(3.789) AS b"),
    ("getMaxOfType", "SELECT 1 AS a"),
    ("MACStringToNum_done", "SELECT MACStringToNum('01:02:03:04:05:06') AS a"),
    ("isIPv6String", "SELECT isIPv6String('::1') AS a"),
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
