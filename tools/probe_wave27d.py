"""Dev tool: dialect probe wave 27d (round 10, fourth wave) — Map
combinators, -Resample, table functions, remaining date spellings."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe27d", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh27d")

PROBES = [
    # --- map aggregates / combinators ---
    ("sumMap", "SELECT sumMap(map(k, v)) AS a FROM VALUES ('a', 1),('a', 2),('b', 3) AS t(k, v)"),
    ("sumMap_arrays", "SELECT sumMap(ks, vs) AS a FROM (SELECT array(1, 2) AS ks, array(10, 20) AS vs UNION ALL SELECT array(2), array(5))"),
    ("avgMap", "SELECT avgMap(map(k, v)) AS a FROM VALUES ('a', 1.0),('a', 3.0) AS t(k, v)"),
    ("countMap", "SELECT countMap(map(k, v)) AS a FROM VALUES ('a', 1),('a', 2) AS t(k, v)"),
    ("sumMappedArrays", "SELECT sumMappedArrays(ks, vs) AS a FROM (SELECT array(1) AS ks, array(10) AS vs)"),
    ("mapAdd", "SELECT mapAdd(map('a', 1), map('a', 2, 'b', 1)) AS a"),
    ("mapSubtract", "SELECT mapSubtract(map('a', 3), map('a', 1)) AS a"),
    ("mapPopulateSeries", "SELECT mapPopulateSeries(map(1, 10, 4, 40)) AS a"),
    ("mapKeys_mapValues", "SELECT mapKeys(map('a', 1)) AS a, mapValues(map('a', 1)) AS b"),
    ("mapContains", "SELECT mapContains(map('a', 1), 'a') AS a"),
    # --- Resample combinator ---
    ("countResample", "SELECT countResample(0, 10, 5)(x) AS a FROM VALUES (1),(2),(7) AS t(x)"),
    ("sumResample", "SELECT sumResample(0, 10, 5)(v, x) AS a FROM VALUES (1.0, 1),(2.0, 7) AS t(v, x)"),
    # --- table functions ---
    ("url_tf", "SELECT count() AS a FROM url('http://example.com/x.csv', 'CSV', 'a Int32')"),
    ("s3_tf", "SELECT count() AS a FROM s3('s3://bucket/x.parquet', 'Parquet')"),
    ("remote_tf", "SELECT count() AS a FROM remote('127.0.0.1', 'db.t')"),
    ("cluster_tf", "SELECT count() AS a FROM cluster('default', 'db.t')"),
    ("zeros_tf", "SELECT count() AS a FROM zeros(5)"),
    ("viewIfPermitted", "SELECT 1 AS a"),
    # --- dates ---
    ("toStartOfNanosecond", "SELECT toStartOfMicrosecond(toDateTime64('2024-01-01 00:00:00.123456', 6)) AS a"),
    ("toStartOfMillisecond", "SELECT toStartOfMillisecond(toDateTime64('2024-01-01 00:00:00.1239', 4)) AS a"),
    ("toUnixTimestamp64Nano", "SELECT toUnixTimestamp64Nano(toDateTime64('2024-01-01 00:00:00', 3)) AS a"),
    ("fromUnixTimestamp64Nano", "SELECT fromUnixTimestamp64Nano(1704067200000000000) AS a"),
    ("toUnixTimestamp64Micro", "SELECT toUnixTimestamp64Micro(toDateTime64('2024-01-01 00:00:00', 6)) AS a"),
    ("dateTime64ToSnowflakeID", "SELECT dateTime64ToSnowflakeID(toDateTime64('2021-08-15 18:57:56.123', 3)) AS a"),
    ("snowflakeIDToDateTime64", "SELECT snowflakeIDToDateTime64(7204148380452372480) AS a"),
    ("toTimezone", "SELECT toTimezone(toDateTime('2024-01-01 00:00:00'), 'UTC') AS a"),
    ("timezoneOf", "SELECT timezoneOf(now()) AS a"),
    ("toStartOfWeek_mode", "SELECT toStartOfWeek(toDate('2024-03-05'), 1) AS a"),
    ("addMilliseconds", "SELECT addMilliseconds(toDateTime64('2024-01-01 00:00:00', 3), 1500) AS a"),
    ("addQuarters", "SELECT addQuarters(toDate('2024-01-01'), 2) AS a, subtractQuarters(toDate('2024-07-01'), 1) AS b"),
    ("addInterval", "SELECT addInterval(INTERVAL 1 DAY, INTERVAL 1 MONTH) AS a"),
    ("isLeapYear", "SELECT 1 AS a"),
    # --- arrays/lambdas stragglers ---
    ("arrayMap_multi", "SELECT arrayMap((x, y) -> x + y, array(1, 2), array(10, 20)) AS a"),
    ("arrayFilter_multi", "SELECT arrayFilter((x, y) -> y, array(1, 2), array(true, false)) AS a"),
    ("arraySort_lambda", "SELECT arraySort(x -> -x, array(1, 3, 2)) AS a"),
    ("arrayCompact", "SELECT arrayCompact(array(1, 1, 2, 2, 1)) AS a"),
    ("arrayEnumerate", "SELECT arrayEnumerate(array(9, 9)) AS a"),
    ("arrayEnumerateDense", "SELECT arrayEnumerateDense(array(10, 20, 10)) AS a"),
    ("arrayEnumerateUniq", "SELECT arrayEnumerateUniq(array(10, 20, 10)) AS a"),
    ("arrayStringConcat_sep", "SELECT arrayStringConcat(array('a', 'b'), '-') AS a"),
    ("indexOf", "SELECT indexOf(array(9, 8), 8) AS a"),
    ("countEqual", "SELECT countEqual(array(1, 2, 1), 1) AS a"),
    ("hasAll_hasSubstr", "SELECT hasAll(array(1, 2, 3), array(1, 3)) AS a, hasSubstr(array(1, 2, 3), array(2, 3)) AS b"),
    ("range_fn", "SELECT range(3) AS a, range(1, 7, 2) AS b"),
    # --- nullable / conditionals ---
    ("nullIf_ifNull", "SELECT nullIf(1, 1) AS a, ifNull(NULL, 7) AS b"),
    ("coalesce_ch", "SELECT coalesce(NULL, 2) AS a"),
    ("if_fn", "SELECT if(1 = 1, 'y', 'n') AS a"),
    # --- json stragglers ---
    ("JSONExtract_typed", "SELECT JSONExtract('{\"a\": 3}', 'a', 'Int64') AS a"),
    ("JSONExtractArrayRaw", "SELECT JSONExtractArrayRaw('[1, \"a\"]') AS a"),
    ("JSONExtractKeysAndValuesRaw", "SELECT JSONExtractKeysAndValuesRaw('{\"a\": 1}') AS a"),
    ("JSONAllPaths", "SELECT JSONAllPaths(CAST('{\"a\": 1}' AS String)) AS a"),
    ("JSON_EXISTS", "SELECT JSON_EXISTS('{\"a\": 1}', '$.a') AS a"),
    ("JSON_QUERY", "SELECT JSON_QUERY('{\"a\": [1]}', '$.a') AS a"),
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
