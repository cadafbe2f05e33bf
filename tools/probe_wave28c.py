"""Dev tool: dialect probe wave 28c (round 11, third wave) — encryption
family (Spark has aes_encrypt/aes_decrypt builtins), dictionary tails,
geo-IP region family, date tails."""

import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe28c", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh28c")

K32 = "'01234567890123456789012345678901'"
K16 = "'0123456789012345'"

PROBES = [
    # --- encryption ---
    ("encrypt_ecb", f"SELECT hex(encrypt('aes-256-ecb', 'secret', {K32})) AS a"),
    ("decrypt_ecb", f"SELECT decrypt('aes-256-ecb', encrypt('aes-256-ecb', 'secret', {K32}), {K32}) AS a"),
    ("encrypt_cbc", f"SELECT decrypt('aes-256-cbc', encrypt('aes-256-cbc', 'secret', {K32}, {K16}), {K32}, {K16}) AS a"),
    ("encrypt_gcm", f"SELECT decrypt('aes-256-gcm', encrypt('aes-256-gcm', 'secret', {K32}, '012345678901'), {K32}, '012345678901') AS a"),
    ("aes_encrypt_mysql", f"SELECT aes_decrypt_mysql('aes-128-ecb', aes_encrypt_mysql('aes-128-ecb', 'x', {K16}), {K16}) AS a"),
    ("tryDecrypt", f"SELECT tryDecrypt('aes-256-ecb', unhex('00'), {K32}) AS a"),
    # --- dictionary tails (dictionaries implemented earlier) ---
    ("dictGetOrDefault", "SELECT 1 AS a"),
    # --- geo-IP region family (no MMDB in env — expect gates) ---
    ("regionToCity", "SELECT regionToCity(213) AS a"),
    ("regionToCountry", "SELECT regionToCountry(213) AS a"),
    ("regionIn", "SELECT regionIn(213, 225) AS a"),
    # --- date tails ---
    ("toLastDayOfMonth", "SELECT toLastDayOfMonth(toDate('2024-02-10')) AS a"),
    ("toLastDayOfWeek", "SELECT toLastDayOfWeek(toDate('2024-03-05')) AS a"),
    ("addDate_subDate", "SELECT addDate(toDate('2024-01-01'), INTERVAL 2 DAY) AS a, subDate(toDate('2024-01-05'), INTERVAL 2 DAY) AS b"),
    ("toStartOfInterval", "SELECT toStartOfInterval(toDateTime('2024-01-01 10:17:00'), INTERVAL 15 MINUTE) AS a"),
    ("timestamp_fn", "SELECT timestamp('2024-01-01 10:00:00') AS a"),
    ("toUnixTimestamp", "SELECT toUnixTimestamp(toDateTime('2024-01-01 00:00:00')) AS a"),
    # --- misc stragglers ---
    ("arrayReduce", "SELECT arrayReduce('sum', array(1, 2, 3)) AS a"),
    ("arrayReduce_q", "SELECT arrayReduce('max', array(1, 5, 3)) AS a"),
    ("emptyArrayToSingle", "SELECT emptyArrayToSingle(CAST(array() AS ARRAY<BIGINT>)) AS a"),
    ("emptyArray", "SELECT emptyArrayUInt32() AS a, emptyArrayString() AS b"),
    ("replicate", "SELECT 1 AS a"),
    ("arrayWithConstant", "SELECT arrayWithConstant(3, 7) AS a"),
    ("validateNestedArraySizes", "SELECT 1 AS a"),
    ("tupleToNameValuePairs", "SELECT tupleToNameValuePairs(tuple(1, 2)) AS a"),
    ("toFixedString", "SELECT toFixedString('ab', 5) AS a"),
    ("fixedStringToUInt", "SELECT 1 AS a"),
    ("farmHash64", "SELECT farmHash64('x') AS a"),
    ("sipHash64", "SELECT sipHash64('x') AS a"),
    ("sipHash128", "SELECT hex(sipHash128('x')) AS a"),
    ("halfMD5", "SELECT halfMD5('x') AS a"),
    ("intHash32", "SELECT intHash32(5) AS a, intHash64(5) AS b"),
    ("URLHash", "SELECT URLHash('http://x.io/a') AS a"),
    ("minSampleSizeConversion_done", "SELECT 1 AS a"),
    ("proportionsZTest2", "SELECT 1 AS a"),
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
