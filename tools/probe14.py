"""Dev tool: probe batch 14 — next candidate CH spellings sweep.
Run from repo root: python tools/probe14.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe14", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
import tempfile

eng = Engine(spark, tempfile.mkdtemp())

CASES = [
    # --- window spellings ---
    "SELECT number, nth_value(number, 2) OVER (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a FROM numbers(4)",
    "SELECT number, lagInFrame(number) OVER (ORDER BY number) AS a FROM numbers(3)",
    "SELECT number, leadInFrame(number) OVER (ORDER BY number) AS a FROM numbers(3)",
    # --- aggregates ---
    "SELECT anyHeavy(x) AS a FROM VALUES (1), (1), (2) AS t(x)",
    "SELECT sumWithOverflow(x) AS a FROM VALUES (1), (2) AS t(x)",
    "SELECT studentTTest(v, g) AS a FROM VALUES (1.0, 0), (2.0, 0), (2.5, 1), (3.0, 1) AS t(v, g)",
    "SELECT welchTTest(v, g) AS a FROM VALUES (1.0, 0), (2.0, 0), (2.5, 1), (3.0, 1) AS t(v, g)",
    "SELECT mannWhitneyUTest(v, g) AS a FROM VALUES (1.0, 0), (2.0, 0), (2.5, 1), (3.0, 1) AS t(v, g)",
    "SELECT quantileTiming(0.5)(x) AS a FROM VALUES (10), (20), (30) AS t(x)",
    "SELECT groupArraySample(2)(x) AS a FROM VALUES (1), (2), (3) AS t(x)",
    "SELECT groupArrayInsertAt(0)(x, p) AS a FROM VALUES ('a', 1), ('b', 0) AS t(x, p)",
    "SELECT boundingRatio(x, y) AS a FROM VALUES (1.0, 1.0), (2.0, 3.0) AS t(x, y)",
    "SELECT cramersV(a, b) AS a FROM VALUES (1, 1), (1, 1), (2, 2) AS t(a, b)",
    "SELECT theilsU(a, b) AS a FROM VALUES (1, 1), (1, 1), (2, 2) AS t(a, b)",
    "SELECT contingency(a, b) AS a FROM VALUES (1, 1), (1, 1), (2, 2) AS t(a, b)",
    "SELECT maxIntersectionsPosition(s, e) AS a FROM VALUES (1, 5), (3, 7) AS t(s, e)",
    "SELECT argMinIf(x, y, y > 0) AS a FROM VALUES (1, 5), (2, 0), (3, 2) AS t(x, y)",
    "SELECT countEqual([1, 2, 1], 1) AS a",
    # --- dates ---
    "SELECT toStartOfISOYear(toDate('2026-01-01')) AS a",
    "SELECT toLastDayOfMonth(toDate('2026-02-10')) AS a",
    "SELECT toLastDayOfWeek(toDate('2026-08-12')) AS a",
    "SELECT makeDate(2026, 3, 15) AS a",
    "SELECT makeDateTime(2026, 3, 15, 10, 30, 0) AS a",
    "SELECT YYYYMMDDToDate(20260315) AS a",
    "SELECT YYYYMMDDhhmmssToDateTime(20260315103000) AS a",
    "SELECT addDate(toDate('2026-01-01'), INTERVAL 3 DAY) AS a",
    "SELECT subDate(toDate('2026-01-10'), INTERVAL 3 DAY) AS a",
    "SELECT timestampAdd(toDateTime('2026-01-01 00:00:00'), INTERVAL 1 HOUR) AS a",
    "SELECT timestampSub(toDateTime('2026-01-01 02:00:00'), INTERVAL 1 HOUR) AS a",
    "SELECT toQuarter(toDate('2026-08-15')) AS a",
    "SELECT toUnixTimestamp(toDateTime('2026-01-01 00:00:00')) AS a",
    "SELECT addQuarters(toDate('2026-01-01'), 2) AS a",
    "SELECT subtractQuarters(toDate('2026-07-01'), 2) AS a",
    # --- strings ---
    "SELECT positionCaseInsensitive('Hello World', 'WORLD') AS a",
    "SELECT multiSearchAny('hello world', ['xyz', 'wor']) AS a",
    "SELECT multiSearchFirstIndex('hello world', ['xyz', 'wor']) AS a",
    "SELECT multiSearchAllPositions('hello', ['l', 'o']) AS a",
    "SELECT extractAll('a1b22c', '\\\\d+') AS a",
    "SELECT translate('hello', 'el', 'ip') AS a",
    "SELECT concatWithSeparator('-', 'a', 'b', 'c') AS a",
    "SELECT reverseUTF8('abc') AS a",
    "SELECT isValidUTF8('abc') AS a",
    "SELECT damerauLevenshteinDistance('kitten', 'sitting') AS a",
    "SELECT jaroSimilarity('abc', 'abd') AS a",
    "SELECT jaroWinklerSimilarity('abc', 'abd') AS a",
    "SELECT stringJaccardIndex('abc', 'bcd') AS a",
    "SELECT hasToken('hello world code', 'world') AS a",
    "SELECT hasTokenCaseInsensitive('hello World', 'world') AS a",
    "SELECT ngramDistance('hello', 'hallo') AS a",
    "SELECT countDigits(12345) AS a",
    "SELECT byteSize('abc') AS a",
    "SELECT regexpQuoteMeta('a.b?') AS a",
    # --- arrays ---
    "SELECT arrayUnion([1, 2], [2, 3]) AS a",
    "SELECT arrayIntersect([1, 2], [2, 3]) AS a",
    "SELECT arraySymmetricDifference([1, 2], [2, 3]) AS a",
    "SELECT arrayCompact([1, 1, 2, 2, 1]) AS a",
    "SELECT arrayResize([1, 2], 4, 0) AS a",
    "SELECT arrayPushBack([1, 2], 3) AS a",
    "SELECT arrayPushFront([1, 2], 0) AS a",
    "SELECT arrayPopBack([1, 2, 3]) AS a",
    "SELECT arrayPopFront([1, 2, 3]) AS a",
    "SELECT arrayWithConstant(3, 'x') AS a",
    "SELECT arrayFlatten([[1, 2], [3]]) AS a",
    "SELECT arraySplit((x, y) -> y, [1, 2, 3, 4, 5], [1, 0, 1, 0, 0]) AS a",
    "SELECT arrayFill(x -> x < 10, [1, 20, 2, 30]) AS a",
    "SELECT arrayReverseFill(x -> x < 10, [20, 1, 30, 2]) AS a",
    "SELECT hasAll([1, 2, 3], [1, 3]) AS a",
    "SELECT hasAny([1, 2], [3, 2]) AS a",
    "SELECT hasSubstr([1, 2, 3, 4], [2, 3]) AS a",
    "SELECT indexOfAssumeSorted([1, 3, 5, 7], 5) AS a",
    # --- maps ---
    "SELECT mapAdd(map('k', 1), map('k', 2)) AS a",
    "SELECT mapSubtract(map('k', 5), map('k', 2)) AS a",
    "SELECT mapPopulateSeries(map(1, 10, 4, 40)) AS a",
    "SELECT mapContainsKeyLike(map('abc', 1), 'a%') AS a",
    "SELECT mapExtractKeyLike(map('abc', 1, 'xyz', 2), 'a%') AS a",
    # --- tuples ---
    "SELECT tupleConcat((1, 'a'), (2,)) AS a",
    "SELECT tuplePlus((1, 2), (3, 4)) AS a",
    "SELECT tupleMinus((5, 5), (1, 2)) AS a",
    "SELECT tupleMultiplyByNumber((1, 2), 3) AS a",
    "SELECT tupleToNameValuePairs(CAST((1, 2) AS Tuple(a UInt8, b UInt8))) AS a",
    # --- type functions ---
    "SELECT toTypeName(1) AS a",
    "SELECT toTypeName('x') AS a",
    "SELECT isNaN(0.0 / 0.0) AS a",
    "SELECT isFinite(1.0) AS a",
    "SELECT isInfinite(1.0 / 0.0) AS a",
    "SELECT ifNotFinite(1.0 / 0.0, 42.0) AS a",
    "SELECT isZeroOrNull(0) AS a",
    "SELECT accurateCast(5, 'UInt8') AS a",
    "SELECT accurateCastOrNull(300, 'UInt8') AS a",
    "SELECT defaultValueOfTypeName('UInt8') AS a",
    "SELECT toBool('true') AS a",
    # --- encoding / bits ---
    "SELECT bitmaskToList(10) AS a",
    "SELECT bitmaskToArray(10) AS a",
    "SELECT bitPositionsToArray(10) AS a",
    "SELECT byteSwap(3351772109) AS a",
    "SELECT mortonEncode(1, 2) AS a",
    "SELECT mortonDecode(2, 9) AS a",
    "SELECT bitRotateLeft(1, 1) AS a",
    "SELECT bitRotateRight(2, 1) AS a",
    # --- misc ---
    "SELECT bar(5, 0, 10, 10) AS a",
    "SELECT modulo(7, 3) AS a",
    "SELECT plus(1, 2) AS a",
    "SELECT minus(5, 2) AS a",
    "SELECT multiply(3, 4) AS a",
    "SELECT divide(8, 2) AS a",
    "SELECT negate(5) AS a",
    "SELECT parseReadableSize('1 KiB') AS a",
    "SELECT formatReadableSize(1024) AS a",
    # --- statements ---
    "DESCRIBE (SELECT 1 AS x)",
    "SELECT * FROM VALUES('n UInt8, s String', (1, 'a'), (2, 'b')) ORDER BY n",
    "SELECT count() AS a FROM (SELECT 1 UNION DISTINCT SELECT 1 UNION DISTINCT SELECT 2)",
    "SELECT 1 AS a INTERSECT DISTINCT SELECT 1 AS a",
    "SELECT a FROM (SELECT 1 AS a UNION ALL SELECT 2) EXCEPT DISTINCT SELECT 2 AS a",
]

fails = []
for q in CASES:
    try:
        rows = eng.sql(q).collect()
        print(f"PASS  {q!r}  ->  {[tuple(r) for r in rows][:2]}")
    except Exception as ex:
        first = str(ex).strip().splitlines()[0][:150] if str(ex).strip() else type(ex).__name__
        print(f"FAIL  {q!r}  ->  {first}")
        fails.append((q, first))

print(f"\n{len(CASES) - len(fails)}/{len(CASES)} pass; {len(fails)} fail")
spark.stop()
