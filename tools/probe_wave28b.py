"""Dev tool: dialect probe wave 28b (round 11, second wave) — multiSearch
family, readable-size parsing, random distributions, introspection /
server spellings, JSON tails, stable aggregate spellings, misc."""

import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe28b", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh28b")

PROBES = [
    # --- multiSearch family ---
    ("multiSearchAny", "SELECT multiSearchAny('Hello World', array('or', 'xx')) AS a"),
    ("multiSearchAnyCaseInsensitive", "SELECT multiSearchAnyCaseInsensitive('Hello', array('HELL')) AS a"),
    ("multiSearchFirstIndex", "SELECT multiSearchFirstIndex('Hello World', array('xx', 'or')) AS a"),
    ("multiSearchFirstPosition", "SELECT multiSearchFirstPosition('Hello World', array('or', 'll')) AS a"),
    ("multiSearchAllPositions", "SELECT multiSearchAllPositions('Hello World', array('o', 'l')) AS a"),
    ("multiMatchAny", "SELECT multiMatchAny('abcabc', array('ab', 'zz')) AS a"),
    ("multiMatchAnyIndex", "SELECT multiMatchAnyIndex('abc', array('zz', 'bc')) AS a"),
    ("positionCaseInsensitive", "SELECT positionCaseInsensitive('Hello', 'hELL') AS a"),
    ("positionUTF8", "SELECT positionUTF8('Hello', 'llo') AS a"),
    ("match_fn", "SELECT match('abc', '^a') AS a"),
    ("extract_fn", "SELECT extract('abc123def', '\\\\d+') AS a"),
    ("extractAll", "SELECT extractAll('a1b22', '\\\\d+') AS a"),
    ("ilike_fn", "SELECT ilike('Hello', 'hell%') AS a, notILike('Hello', 'x%') AS b"),
    ("extractTextFromHTML", "SELECT extractTextFromHTML('<p>Hi <b>there</b></p>') AS a"),
    ("normalizeQuery", "SELECT normalizeQuery('SELECT 1 + 2') AS a"),
    # --- readable sizes / quantities ---
    ("formatReadableQuantity", "SELECT formatReadableQuantity(1024000) AS a"),
    ("parseReadableSize", "SELECT parseReadableSize('1 KiB') AS a"),
    ("parseReadableSizeOrNull", "SELECT parseReadableSizeOrNull('junk') AS a"),
    ("parseReadableSizeOrZero", "SELECT parseReadableSizeOrZero('junk') AS a"),
    ("formatReadableSize_done", "SELECT formatReadableSize(1024) AS a"),
    # --- random distributions (expect gates, not fall-throughs) ---
    ("randNormal", "SELECT randNormal(0, 1) AS a"),
    ("randLogNormal", "SELECT randLogNormal(0, 1) AS a"),
    ("randExponential", "SELECT randExponential(1) AS a"),
    ("randChiSquared", "SELECT randChiSquared(5) AS a"),
    ("randStudentT", "SELECT randStudentT(5) AS a"),
    ("randFisherF", "SELECT randFisherF(5, 5) AS a"),
    ("randUniform", "SELECT randUniform(0, 1) AS a"),
    ("randBernoulli", "SELECT randBernoulli(0.5) AS a"),
    # --- introspection / server ---
    ("hostName", "SELECT hostName() AS a"),
    ("FQDN", "SELECT FQDN() AS a"),
    ("version_fn", "SELECT version() AS a"),
    ("uptime_fn", "SELECT uptime() AS a"),
    ("serverUUID", "SELECT serverUUID() AS a"),
    ("queryID", "SELECT queryID() AS a"),
    ("initialQueryID", "SELECT initialQueryID() AS a"),
    ("currentUser", "SELECT currentUser() AS a"),
    ("connectionId", "SELECT connectionId() AS a"),
    ("shardNum", "SELECT shardNum() AS a, shardCount() AS b"),
    ("identity_fn", "SELECT identity(7) AS a"),
    ("materialize", "SELECT materialize(7) AS a"),
    ("ignore_fn", "SELECT ignore(1, 'a') AS a"),
    ("isConstant", "SELECT isConstant(1) AS a"),
    ("bar_fn", "SELECT bar(5, 0, 10, 10) AS a"),
    ("sleep_fn", "SELECT sleep(0.01) AS a"),
    ("getSizeOfEnumType", "SELECT 1 AS a"),
    ("toColumnTypeName", "SELECT toColumnTypeName(1) AS a"),
    ("toTypeName", "SELECT toTypeName(CAST(1 AS INT)) AS a"),
    ("rowNumberInAllBlocks", "SELECT rowNumberInAllBlocks() AS a FROM VALUES (1),(2) AS t(x)"),
    # --- JSON tails ---
    ("JSONLength", "SELECT JSONLength('{\"a\": 1, \"b\": 2}') AS a, JSONLength('[1,2,3]') AS b"),
    ("JSONHas", "SELECT JSONHas('{\"a\": 1}', 'a') AS a"),
    ("JSONArrayLength", "SELECT JSONArrayLength('[1,2,3]') AS a"),
    ("toJSONString", "SELECT toJSONString(map('a', 1)) AS a"),
    ("JSONExtractUInt", "SELECT JSONExtractUInt('{\"a\": 3}', 'a') AS a"),
    ("JSONExtractKeys", "SELECT JSONExtractKeys('{\"a\": 1, \"b\": 2}') AS a"),
    # --- stable / synonym aggregate spellings ---
    ("corrStable", "SELECT corrStable(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 4.0),(3.0, 5.0) AS t(x, y)"),
    ("covarSampStable", "SELECT covarSampStable(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 4.0) AS t(x, y)"),
    ("varSampStable", "SELECT varSampStable(x) AS a FROM VALUES (1.0),(2.0),(4.0) AS t(x)"),
    ("stddevSampStable", "SELECT stddevSampStable(x) AS a FROM VALUES (1.0),(2.0),(4.0) AS t(x)"),
    ("groupUniqArray", "SELECT groupUniqArray(x) AS a FROM VALUES (1),(1),(2) AS t(x)"),
    ("groupArrayIntersect", "SELECT groupArrayIntersect(xs) AS a FROM (SELECT array(1, 2, 3) AS xs UNION ALL SELECT array(2, 3, 4))"),
    ("median_fn", "SELECT median(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("medianExact", "SELECT medianExact(x) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("avgIf", "SELECT avgIf(x, x > 1) AS a FROM VALUES (1.0),(2.0),(3.0) AS t(x)"),
    ("uniqExactIf", "SELECT uniqExactIf(x, x > 1) AS a FROM VALUES (1),(2),(2) AS t(x)"),
    ("countDistinctIf", "SELECT countIf(x > 1) AS a FROM VALUES (1),(2) AS t(x)"),
    # --- encoding / codecs tails ---
    ("base64URLEncode", "SELECT base64URLEncode('https://x.io/?a=1') AS a"),
    ("base64URLDecode", "SELECT base64URLDecode(base64URLEncode('ab?')) AS a"),
    ("tryBase64Decode", "SELECT tryBase64Decode('###') AS a"),
    ("sqidEncode", "SELECT sqidEncode(1, 2, 3) AS a"),
    ("sqidDecode", "SELECT sqidDecode('86Rf07') AS a"),
    ("UUIDStringToNum", "SELECT UUIDStringToNum('612f3c40-5d3b-217e-707b-6a546a3d7b29') AS a"),
    ("generateUUIDv4", "SELECT generateUUIDv4() AS a"),
    ("generateUUIDv7", "SELECT generateUUIDv7() AS a"),
    # --- geo tails ---
    ("geoDistance", "SELECT geoDistance(-86.5, 38.8, -77.1, 38.9) AS a"),
    ("pointInPolygon", "SELECT pointInPolygon(tuple(3.0, 3.0), array(tuple(6.0, 0.0), tuple(8.0, 4.0), tuple(5.0, 8.0), tuple(0.0, 2.0))) AS a"),
    ("geohashEncode", "SELECT geohashEncode(-5.60302734375, 42.593994140625, 0) AS a"),
    ("geohashDecode", "SELECT geohashDecode('ezs42') AS a"),
    # --- conversion tails ---
    ("toBool", "SELECT toBool('true') AS a, toBool(1) AS b"),
    ("toIntervalSecond", "SELECT toDateTime('2024-01-01 00:00:00') + toIntervalSecond(30) AS a"),
    ("toIntervalMonth", "SELECT toDate('2024-01-01') + toIntervalMonth(2) AS a"),
    ("accurateCast", "SELECT accurateCast(5, 'UInt8') AS a"),
    ("toUInt8OrNull", "SELECT toUInt8OrNull('300') AS a, toUInt8OrNull('30') AS b"),
    ("reinterpretAsUInt8", "SELECT reinterpretAsUInt8('a') AS a"),
    ("formatDateTime_done", "SELECT formatDateTime(toDateTime('2024-01-02 03:04:05'), '%Y-%m-%d') AS a"),
    ("fromUnixTimestampInJodaSyntax", "SELECT fromUnixTimestampInJodaSyntax(1704067200, 'yyyy-MM-dd') AS a"),
    ("indexOfAssumeSorted", "SELECT indexOfAssumeSorted(array(1, 3, 5), 3) AS a"),
    ("arrayElementOrNull", "SELECT arrayElementOrNull(array(1, 2), 5) AS a"),
    ("lemmatize", "SELECT lemmatize('en', 'wolves') AS a"),
    ("stem", "SELECT stem('en', 'running') AS a"),
    ("detectLanguage", "SELECT detectLanguage('hello world') AS a"),
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
