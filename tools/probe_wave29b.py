"""Dev tool: dialect probe wave 29b (round 11, sixth wave) — -Array
combinators, plural sketch quantiles, Lp norms/distances, emptyArray
family, split/search string functions, rand distributions, big-int types,
dictGet, polygon cartesian measures, enumerate variants, misc."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe29b", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh29b2")

PROBES = [
    # --- -Array combinator family ---
    ("sumArray", "SELECT sumArray(xs) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(3))"),
    ("avgArray", "SELECT avgArray(xs) AS a FROM (SELECT array(1.0, 2.0) AS xs UNION ALL SELECT array(3.0))"),
    ("minArray_maxArray", "SELECT minArray(xs) AS a, maxArray(xs) AS b FROM (SELECT array(5, 2) AS xs UNION ALL SELECT array(3))"),
    ("countArray", "SELECT countArray(xs) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(3))"),
    ("uniqArray", "SELECT uniqArray(xs) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(2, 3))"),
    ("groupArrayArray", "SELECT array_sort(groupArrayArray(xs)) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(3))"),
    ("groupUniqArray", "SELECT array_sort(groupUniqArray(x)) AS a FROM VALUES (1),(2),(2) AS t(x)"),
    ("groupUniqArrayArray", "SELECT array_sort(groupUniqArrayArray(xs)) AS a FROM (SELECT array(1, 2) AS xs UNION ALL SELECT array(2, 3))"),
    ("sumArrayIf", "SELECT sumArrayIf(xs, x > 0) AS a FROM (SELECT array(1, 2) AS xs, 1 AS x UNION ALL SELECT array(30), 0)"),
    # --- plural sketch quantiles ---
    ("quantilesTiming", "SELECT quantilesTiming(0.5, 0.9)(x) AS a FROM VALUES (10),(20),(30) AS t(x)"),
    ("quantilesTDigest", "SELECT quantilesTDigest(0.5, 0.9)(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("quantilesBFloat16", "SELECT quantilesBFloat16(0.5)(x) AS a FROM VALUES (1.0),(2.0) AS t(x)"),
    ("quantilesDeterministic", "SELECT quantilesDeterministic(0.5)(x, x) AS a FROM VALUES (1.0),(2.0) AS t(x)"),
    ("quantilesExactExclusive", "SELECT quantilesExactExclusive(0.25, 0.5)(x) AS a FROM VALUES (1.0),(2.0),(3.0),(4.0) AS t(x)"),
    ("medianTiming", "SELECT medianTiming(x) AS a FROM VALUES (10),(20),(30) AS t(x)"),
    ("medianTDigest", "SELECT medianTDigest(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    # --- Lp norms / distances ---
    ("L1Norm", "SELECT L1Norm(array(1, -2)) AS a"),
    ("L2Norm", "SELECT L2Norm(array(3.0, 4.0)) AS a"),
    ("LinfNorm", "SELECT LinfNorm(array(1, -7)) AS a"),
    ("LpNorm", "SELECT LpNorm(array(3.0, 4.0), 3.0) AS a"),
    ("LpDistance", "SELECT round(LpDistance(array(1.0, 2.0), array(2.0, 4.0), 3.0), 6) AS a"),
    ("L2SquaredDistance", "SELECT L2SquaredDistance(array(1, 2), array(2, 4)) AS a"),
    # --- emptyArray family / array builders ---
    ("emptyArrayUInt8", "SELECT emptyArrayUInt8() AS a, emptyArrayInt32() AS b, emptyArrayFloat64() AS c, emptyArrayString() AS d, emptyArrayDate() AS e"),
    ("emptyArrayToSingle", "SELECT emptyArrayToSingle(CAST(array() AS ARRAY<INT>)) AS a"),
    ("range1", "SELECT range(3) AS a, range(1, 5) AS b, range(0, 10, 3) AS c"),
    ("arrayShingles", "SELECT arrayShingles(array(1, 2, 3, 4), 3) AS a"),
    ("arrayEnumerateDense", "SELECT arrayEnumerateDense(array(10, 20, 10, 30)) AS a"),
    ("arrayEnumerateUniq", "SELECT arrayEnumerateUniq(array(10, 20, 10, 10)) AS a"),
    ("arrayEnumerate", "SELECT arrayEnumerate(array(7, 8, 9)) AS a"),
    ("countEqual", "SELECT countEqual(array(1, 2, 1), 1) AS a"),
    ("indexOf", "SELECT indexOf(array(10, 20, 30), 20) AS a, indexOf(array(10), 99) AS b"),
    ("hasAll_hasAny", "SELECT hasAll(array(1, 2, 3), array(1, 3)) AS a, hasAny(array(1, 2), array(9, 2)) AS b, hasSubstr(array(1, 2, 3), array(2, 3)) AS c"),
    ("arrayCumSum", "SELECT arrayCumSum(array(1, 2, 3)) AS a"),
    ("arrayDifference", "SELECT arrayDifference(array(1, 4, 2)) AS a"),
    # --- string split / search ---
    ("splitByChar", "SELECT splitByChar(',', 'a,b,c') AS a"),
    ("splitByString", "SELECT splitByString('::', 'a::b::c') AS a"),
    ("splitByRegexp", "SELECT splitByRegexp('[0-9]+', 'a1b22c') AS a"),
    ("alphaTokens", "SELECT alphaTokens('abc1def2') AS a"),
    ("positionUTF8", "SELECT positionUTF8('hello', 'll') AS a, locate('ll', 'hello') AS b"),
    ("positionCaseInsensitive", "SELECT positionCaseInsensitive('Hello', 'h') AS a"),
    ("multiSearchFirstIndex", "SELECT multiSearchFirstIndex('hello world', array('xx', 'wor')) AS a"),
    ("multiSearchFirstPosition", "SELECT multiSearchFirstPosition('hello world', array('wor', 'ello')) AS a"),
    ("multiSearchAllPositions", "SELECT multiSearchAllPositions('hello', array('l', 'o')) AS a"),
    ("multiFuzzyMatchAny", "SELECT multiFuzzyMatchAny('hello', 1, array('helo')) AS a"),
    ("ngramMinHash", "SELECT ngramMinHash('hello') AS a"),
    ("wordShingleMinHash", "SELECT wordShingleMinHash('a b c d e') AS a"),
    ("stringBytesUniq", "SELECT stringBytesUniq('hello') AS a"),
    ("stringBytesEntropy", "SELECT round(stringBytesEntropy('aabb'), 4) AS a"),
    ("reverseUTF8", "SELECT reverseUTF8('abc') AS a"),
    ("concatAssumeInjective", "SELECT concatAssumeInjective('a', 'b') AS a"),
    ("leftPad_rightPad", "SELECT leftPad('x', 3, '_') AS a, rightPad('x', 3, '_') AS b, leftPadUTF8('x', 3, '_') AS c"),
    ("trimBoth", "SELECT trimBoth('  x  ') AS a, trimLeft(' x') AS b, trimRight('x ') AS c"),
    # --- rand distributions ---
    ("randUniform", "SELECT randUniform(1.0, 2.0) BETWEEN 1.0 AND 2.0 AS a"),
    ("randNormal", "SELECT abs(randNormal(0.0, 1.0)) < 100 AS a"),
    ("randBernoulli", "SELECT randBernoulli(0.5) IN (0, 1) AS a"),
    ("randExponential", "SELECT randExponential(1.0) >= 0 AS a"),
    ("randCanonical", "SELECT randCanonical() BETWEEN 0.0 AND 1.0 AS a"),
    ("randConstant", "SELECT randConstant() IS NOT NULL AS a"),
    ("rand_rand64", "SELECT rand() IS NOT NULL AS a, rand64() IS NOT NULL AS b"),
    # --- big-int / type tails ---
    ("toInt128", "SELECT toInt128('170141183460469231731687303715884105727') AS a"),
    ("toInt256", "SELECT toInt256(5) AS a"),
    ("toUInt128", "SELECT toUInt128(5) AS a"),
    ("toFloat32", "SELECT toFloat32('1.5') AS a, toFloat64('2.5') AS b"),
    ("toDecimal256", "SELECT toDecimal256('1.23', 2) AS a"),
    ("toIntervalMonth", "SELECT toDate('2024-01-31') + toIntervalMonth(1) AS a"),
    # --- dictionaries / joins ---
    ("dictGet", "SELECT 1 AS a"),  # engine dictionaries probed separately
    ("joinGet", "SELECT 1 AS a"),
    # --- geo cartesian ---
    ("polygonAreaCartesian", "SELECT polygonAreaCartesian(array((0.0, 0.0), (0.0, 5.0), (5.0, 5.0))) AS a"),
    ("polygonPerimeterCartesian", "SELECT polygonPerimeterCartesian(array((0.0, 0.0), (0.0, 3.0), (4.0, 0.0))) AS a"),
    ("readWKTPoint", "SELECT readWKTPoint('POINT (1 2)') AS a"),
    ("wkt", "SELECT wkt((1.0, 2.0)) AS a"),
    # --- dates ---
    ("toTime", "SELECT toTime(toDateTime('2024-03-15 10:20:30')) AS a"),
    ("timeSlot", "SELECT timeSlot(toDateTime('2024-03-15 10:20:30')) AS a"),
    ("fromDaysSinceYearZero", "SELECT fromDaysSinceYearZero(739136) AS a"),
    ("toStartOfInterval", "SELECT toStartOfInterval(toDateTime('2024-03-15 10:20:30'), INTERVAL 15 MINUTE) AS a"),
    ("toQuarter", "SELECT toQuarter(toDate('2024-05-15')) AS a, toStartOfQuarter(toDate('2024-05-15')) AS b"),
    ("toDayOfYear", "SELECT toDayOfYear(toDate('2024-02-10')) AS a, toWeek(toDate('2024-02-10')) AS b"),
    ("addQuarters", "SELECT addQuarters(toDate('2024-01-15'), 2) AS a, subtractQuarters(toDate('2024-07-15'), 1) AS b"),
    # --- misc ---
    ("char_fn", "SELECT char(72, 105) AS a"),
    ("hasColumnInTable", "SELECT 1 AS a"),
    ("visibleWidth", "SELECT visibleWidth('abc') AS a"),
    ("toTypeName_agg", "SELECT any(x) AS a FROM VALUES (1) AS t(x)"),
    ("sumMapFilteredWithOverflow", "SELECT 1 AS a"),
    ("normalizeQuery", "SELECT normalizeQuery('SELECT 1 + 2') AS a"),
    ("hex_lower", "SELECT lower(hex('AB')) AS a, unhex('4142') AS b"),
    ("bin_unbin", "SELECT bin(5) AS a"),
    ("regexpQuoteMeta", "SELECT regexpQuoteMeta('a.b*c') AS a"),
    ("toUUIDOrDefault", "SELECT toUUIDOrDefault('nope', toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS a"),
    ("uniqCombinedIf", "SELECT uniqCombinedIf(x, x > 1) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("anyIf", "SELECT anyIf(x, x > 1) AS a FROM VALUES (1),(2) AS t(x)"),
    ("countIf", "SELECT countIf(x > 1) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("avgIf", "SELECT avgIf(x, x > 1) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
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
