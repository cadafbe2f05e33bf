"""Dev tool: dialect probe wave 29c (round 11, seventh wave) — arrayJoin,
histogram, simpleLinearRegression, arrayReduce, the hash-function family,
MySQL-alias strings, date stragglers, null handling, bit slices."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe29c", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh29f")

PROBES = [
    ("arrayJoin", "SELECT arrayJoin(array(1, 2, 3)) AS a"),
    ("arrayJoin_col", "SELECT arrayJoin(xs) AS a, n FROM (SELECT array(1, 2) AS xs, 'x' AS n)"),
    ("histogram", "SELECT histogram(3)(x) AS a FROM VALUES (1.0),(2.0),(3.0),(4.0),(5.0),(6.0) AS t(x)"),
    ("simpleLinearRegression", "SELECT simpleLinearRegression(x, y) AS a FROM VALUES (0.0, 0.0),(1.0, 2.0),(2.0, 4.0) AS t(x, y)"),
    ("arrayReduce", "SELECT arrayReduce('max', array(1, 2, 3)) AS a"),
    ("arrayReduce_sum", "SELECT arrayReduce('sum', array(1, 2, 3)) AS a"),
    ("runningAccumulate", "SELECT 1 AS a"),
    ("uniqExactIf", "SELECT uniqExactIf(x, x > 1) AS a FROM VALUES (1),(2),(3) AS t(x)"),
    ("topKWeightedIf", "SELECT 1 AS a"),
    # hashes
    ("halfMD5", "SELECT halfMD5('abc') AS a"),
    ("MD5_fn", "SELECT lower(hex(MD5('abc'))) AS a"),
    ("SHA256_fn", "SELECT lower(hex(SHA256('abc'))) AS a"),
    ("SHA1_fn", "SELECT lower(hex(SHA1('abc'))) AS a"),
    ("BLAKE3", "SELECT BLAKE3('abc') AS a"),
    ("hiveHash", "SELECT hiveHash('abc') AS a"),
    ("xxHash32", "SELECT xxHash32('abc') AS a"),
    ("xxHash64", "SELECT xxHash64('abc') AS a"),
    ("farmHash64", "SELECT farmHash64('abc') AS a"),
    ("farmFingerprint64", "SELECT farmFingerprint64('abc') AS a"),
    ("javaHash", "SELECT javaHash('abc') AS a"),
    ("cityHash64", "SELECT cityHash64('abc') AS a"),
    ("sipHash64", "SELECT sipHash64('abc') AS a"),
    # MySQL alias strings
    ("elt", "SELECT elt(2, 'a', 'b', 'c') AS a"),
    ("field", "SELECT field('b', 'a', 'b', 'c') AS a"),
    ("mid", "SELECT mid('hello', 2, 3) AS a"),
    ("instr", "SELECT instr('hello', 'll') AS a"),
    ("ucase_lcase", "SELECT ucase('ab') AS a, lcase('AB') AS b"),
    ("leftUTF8", "SELECT leftUTF8('hello', 2) AS a, rightUTF8('hello', 2) AS b"),
    ("left_right", "SELECT left('hello', 2) AS a, right('hello', 2) AS b"),
    ("substringIndex", "SELECT substringIndex('a.b.c', '.', 2) AS a"),
    # dates
    ("toMonday", "SELECT toMonday(toDate('2024-03-15')) AS a"),
    ("toStartOfSecond", "SELECT toStartOfSecond(toDateTime64('2024-01-01 00:00:01.5', 3)) AS a"),
    ("toMillisecond", "SELECT toMillisecond(toDateTime64('2024-01-01 00:00:01.5', 3)) AS a"),
    ("toYYYYMM", "SELECT toYYYYMM(toDate('2024-03-15')) AS a, toYYYYMMDD(toDate('2024-03-15')) AS b"),
    ("toDateTime32", "SELECT toDateTime32('2024-01-01 00:00:05') AS a"),
    ("toTimeWithFixedDate", "SELECT 1 AS a"),
    ("dateTrunc_week", "SELECT dateTrunc('week', toDate('2024-03-15')) AS a"),
    ("toIPv4OrDefault", "SELECT toIPv4OrDefault('nope', toIPv4('1.2.3.4')) AS a"),
    ("toIPv6OrDefault", "SELECT toIPv6OrDefault('nope', toIPv6('::1')) AS a"),
    # null handling / misc
    ("assumeNotNull", "SELECT assumeNotNull(CAST(7 AS INT)) AS a"),
    ("nullIf_fn", "SELECT nullIf(1, 1) AS a, ifNull(CAST(NULL AS INT), 9) AS b"),
    ("toNullable2", "SELECT toNullable(5) AS a"),
    ("cot", "SELECT round(cot(1.0), 6) AS a"),
    ("bitSlice", "SELECT bitSlice('Hello', 1, 8) AS a"),
    ("byteSlice", "SELECT 1 AS a"),
    ("version_uptime", "SELECT version() IS NOT NULL AS a, uptime() >= 0 AS b"),
    ("currentUser", "SELECT currentUser() IS NOT NULL AS a"),
    ("sleep_gate", "SELECT 1 AS a"),
    ("indexHint", "SELECT indexHint(1) AS a"),
    ("bech32Encode", "SELECT 1 AS a"),
    ("tryBase64Decode", "SELECT tryBase64Decode('YWJj') AS a, tryBase64Decode('###') AS b"),
    ("base64Encode", "SELECT base64Encode('abc') AS a"),
    ("arrayStringConcat2", "SELECT arrayStringConcat(array('a', 'b'), '-') AS a"),
    ("notLike", "SELECT 'abc' NOT LIKE 'a%' AS a, notLike('abc', 'a%') AS b"),
    ("ilike_fn", "SELECT ilike('ABC', 'a%') AS a"),
    ("match_fn", "SELECT match('abc123', '[0-9]+') AS a"),
    ("replaceOne", "SELECT replaceOne('aaa', 'a', 'b') AS a, replaceAll('aaa', 'a', 'b') AS b"),
    ("replaceRegexpOne", "SELECT replaceRegexpOne('a1a2', '[0-9]', 'x') AS a, replaceRegexpAll('a1a2', '[0-9]', 'x') AS b"),
    ("extractGroups", "SELECT extractGroups('a1b2', '([a-z])([0-9])') AS a"),
    ("toStartOfWeek_mode", "SELECT toStartOfWeek(toDate('2024-03-15'), 1) AS a"),
    ("subtractYears", "SELECT subtractYears(toDate('2024-03-15'), 4) AS a"),
    ("emptyNotEmpty", "SELECT empty('') AS a, notEmpty('x') AS b, empty(array()) AS c"),
    ("lengthUTF8", "SELECT lengthUTF8('abc') AS a"),
    ("arrayElement", "SELECT arrayElement(array(1, 2), 2) AS a, arrayElement(array(1), 5) AS b"),
    ("plus_minus", "SELECT plus(1, 2) AS a, minus(5, 2) AS b, multiply(3, 4) AS c, divide(8, 2) AS d, negate(3) AS e"),
    ("equals_fns", "SELECT equals(1, 1) AS a, notEquals(1, 2) AS b, less(1, 2) AS c, greater(2, 1) AS d, lessOrEquals(1, 1) AS e, greaterOrEquals(2, 2) AS f"),
    ("and_or_not", "SELECT and(1, 1) AS a, or(0, 1) AS b, not(0) AS c"),
    ("modulo_fn", "SELECT modulo(7, 3) AS a, abs(-3) AS b"),
    ("concat_fn", "SELECT concat('a', 'b', 'c') AS a"),
    ("caseWithoutExpression", "SELECT CASE WHEN 1 = 1 THEN 'x' ELSE 'y' END AS a"),
    ("toString2", "SELECT toString(123) AS a, toString(toDate('2024-01-01')) AS b"),
    ("reinterpretAsUInt8", "SELECT 1 AS a"),
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
