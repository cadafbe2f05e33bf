"""Dev tool: dialect probe wave 27c (round 10, third wave) — the
State/Merge combinator grid, bitmap family, remaining statistics, geo."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe27c", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh27c")

SF = "/root/testdata/sf0.001"
spark.read.parquet(f"{SF}/events.parquet").createOrReplaceTempView("ev")

PROBES = [
    # --- bitmap family ---
    ("bitmapAnd", "SELECT bitmapCardinality(bitmapAnd(bitmapBuild(array(1,2,3)), bitmapBuild(array(2,3,4)))) AS a"),
    ("bitmapOr", "SELECT bitmapCardinality(bitmapOr(bitmapBuild(array(1,2)), bitmapBuild(array(3)))) AS a"),
    ("bitmapXor", "SELECT bitmapCardinality(bitmapXor(bitmapBuild(array(1,2)), bitmapBuild(array(2,3)))) AS a"),
    ("bitmapAndnot", "SELECT bitmapCardinality(bitmapAndnot(bitmapBuild(array(1,2)), bitmapBuild(array(2)))) AS a"),
    ("bitmapContains", "SELECT bitmapContains(bitmapBuild(array(1,2)), 2) AS a"),
    ("bitmapHasAny", "SELECT bitmapHasAny(bitmapBuild(array(1)), bitmapBuild(array(1,9))) AS a"),
    ("bitmapHasAll", "SELECT bitmapHasAll(bitmapBuild(array(1,2,3)), bitmapBuild(array(1,2))) AS a"),
    ("bitmapToArray", "SELECT bitmapToArray(bitmapBuild(array(3,1,2))) AS a"),
    ("bitmapMinMax", "SELECT bitmapMin(bitmapBuild(array(3,1))) AS a, bitmapMax(bitmapBuild(array(3,1))) AS b"),
    ("bitmapSubsetInRange", "SELECT bitmapToArray(bitmapSubsetInRange(bitmapBuild(array(1,5,9)), 2, 9)) AS a"),
    ("bitmapSubsetLimit", "SELECT bitmapToArray(bitmapSubsetLimit(bitmapBuild(array(1,5,9)), 2, 2)) AS a"),
    ("bitmapTransform", "SELECT bitmapToArray(bitmapTransform(bitmapBuild(array(1,2)), array(1), array(9))) AS a"),
    ("bitmapAndCardinality", "SELECT bitmapAndCardinality(bitmapBuild(array(1,2)), bitmapBuild(array(2,3))) AS a"),
    ("bitmapOrCardinality", "SELECT bitmapOrCardinality(bitmapBuild(array(1)), bitmapBuild(array(2))) AS a"),
    ("groupBitmapAnd", "SELECT groupBitmapAnd(b) AS a FROM (SELECT bitmapBuild(array(1,2,3)) AS b UNION ALL SELECT bitmapBuild(array(2,3,4)))"),
    ("groupBitmapOr", "SELECT groupBitmapOr(b) AS a FROM (SELECT bitmapBuild(array(1)) AS b UNION ALL SELECT bitmapBuild(array(2)))"),
    # --- State/Merge combinators (MV machinery) ---
    ("sumState_Merge", "SELECT sumMerge(s) AS a FROM (SELECT sumState(x) AS s FROM VALUES (1),(2) AS t(x) UNION ALL SELECT sumState(x) FROM VALUES (3) AS t(x))"),
    ("countState_Merge", "SELECT countMerge(s) AS a FROM (SELECT countState(x) AS s FROM VALUES (1),(2) AS t(x))"),
    ("avgState_Merge", "SELECT avgMerge(s) AS a FROM (SELECT avgState(x) AS s FROM VALUES (1.0),(3.0) AS t(x))"),
    ("minMaxState", "SELECT minMerge(s) AS a, maxMerge(m) AS b FROM (SELECT minState(x) AS s, maxState(x) AS m FROM VALUES (1),(5) AS t(x))"),
    ("uniqState_Merge", "SELECT uniqMerge(s) AS a FROM (SELECT uniqState(x) AS s FROM VALUES (1),(1),(2) AS t(x))"),
    ("uniqExactState_Merge", "SELECT uniqExactMerge(s) AS a FROM (SELECT uniqExactState(x) AS s FROM VALUES (1),(2),(2) AS t(x))"),
    ("groupArrayState_Merge", "SELECT array_sort(groupArrayMerge(s)) AS a FROM (SELECT groupArrayState(x) AS s FROM VALUES (2),(1) AS t(x))"),
    ("quantileState_Merge", "SELECT quantileMerge(0.5)(s) AS a FROM (SELECT quantileState(0.5)(x) AS s FROM VALUES (1.0),(2.0),(3.0) AS t(x))"),
    ("sumSimpleState", "SELECT sumMerge(s) AS a FROM (SELECT sumSimpleState(x) AS s FROM VALUES (1),(2) AS t(x))"),
    ("argMaxState_Merge", "SELECT argMaxMerge(s) AS a FROM (SELECT argMaxState(x, y) AS s FROM VALUES (1, 10),(2, 20) AS t(x, y))"),
    ("stddevState_Merge", "SELECT round(stddevSampMerge(s), 6) AS a FROM (SELECT stddevSampState(x) AS s FROM VALUES (1.0),(2.0),(3.0) AS t(x))"),
    ("finalizeAggregation", "SELECT finalizeAggregation(sumState(x)) AS a FROM VALUES (1),(2) AS t(x)"),
    ("initializeAggregation", "SELECT finalizeAggregation(initializeAggregation('sumState', 3)) AS a"),
    ("runningAccumulate2", "SELECT runningAccumulate(sumState(x)) AS a FROM VALUES (1) AS t(x)"),
    # --- statistics remaining ---
    ("studentTTestOneSample", "SELECT studentTTestOneSample(1.5)(x) AS a FROM VALUES (1.0),(2.0),(3.0),(2.5) AS t(x)"),
    ("welchTTest", "SELECT welchTTest(x, g) AS a FROM VALUES (1.0, 0),(2.0, 0),(5.0, 1),(6.0, 1) AS t(x, g)"),
    ("mannWhitneyUTest", "SELECT mannWhitneyUTest(x, g) AS a FROM VALUES (1.0, 0),(2.0, 0),(5.0, 1),(6.0, 1) AS t(x, g)"),
    ("skewSamp", "SELECT round(skewSamp(x), 6) AS a FROM VALUES (1.0),(2.0),(9.0) AS t(x)"),
    ("kurtSamp", "SELECT round(kurtSamp(x), 6) AS a FROM VALUES (1.0),(2.0),(9.0),(3.0) AS t(x)"),
    ("corrMatrix", "SELECT corrMatrix(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 4.0),(3.0, 5.0) AS t(x, y)"),
    ("covarSampMatrix", "SELECT covarSampMatrix(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 4.0),(3.0, 5.0) AS t(x, y)"),
    ("covarPopMatrix", "SELECT covarPopMatrix(x, y) AS a FROM VALUES (1.0, 2.0),(2.0, 4.0) AS t(x, y)"),
    ("stochasticLinearRegression", "SELECT stochasticLinearRegression(0.1, 0.0, 5, 'SGD')(y, x) AS a FROM VALUES (1.0, 1.0),(2.0, 2.0) AS t(y, x)"),
    ("stochasticLogisticRegression", "SELECT stochasticLogisticRegression(0.1, 0.0, 5, 'SGD')(y, x) AS a FROM VALUES (0.0, 1.0),(1.0, 2.0) AS t(y, x)"),
    ("sequenceMatchEvents", "SELECT sequenceMatchEvents('(?1).*(?2)')(ts, event_type = 'click', event_type = 'view') AS a FROM ev"),
    ("exponentialTimeDecayedSum_win", "SELECT exponentialTimeDecayedSum(10)(value, epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS a FROM ev LIMIT 1"),
    ("nonNegativeDerivative", "SELECT nonNegativeDerivative(value, ts) OVER (PARTITION BY user_id ORDER BY ts) AS a FROM ev LIMIT 1"),
    # --- geo ---
    ("geoDistance", "SELECT round(geoDistance(-0.13, 51.51, 2.35, 48.86)) AS a"),
    ("greatCircleAngle", "SELECT round(greatCircleAngle(-0.13, 51.51, 2.35, 48.86), 2) AS a"),
    ("geohashDecode", "SELECT geohashDecode('ezs42') AS a"),
    ("geohashesInBox", "SELECT geohashesInBox(-1.0, -1.0, 1.0, 1.0, 3) AS a"),
    ("h3ToGeo", "SELECT h3ToGeo(644325524701193974) AS a"),
    ("geoToH3", "SELECT geoToH3(37.79, 55.71, 15) AS a"),
    ("pointInPolygon_holes", "SELECT pointInPolygon((0.5, 0.5), [(0.0,0.0),(1.0,0.0),(1.0,1.0),(0.0,1.0)], [(0.4,0.4),(0.6,0.4),(0.6,0.6),(0.4,0.6)]) AS a"),
    # --- type system remaining ---
    ("toLowCardinality", "SELECT toLowCardinality('x') AS a"),
    ("CAST_ch_style", "SELECT CAST('1' AS UInt8) AS a"),
    ("accurateCast", "SELECT accurateCast(1.0, 'Int32') AS a"),
    ("accurateCastOrNull", "SELECT accurateCastOrNull(300, 'UInt8') AS a"),
    ("accurateCastOrDefault", "SELECT accurateCastOrDefault(300, 'UInt8', 7) AS a"),
    ("toIntervalYear_mul", "SELECT toDate('2020-01-01') + 2 * toIntervalYear(1) AS a"),
    ("variantType", "SELECT variantType(CAST(1 AS Variant(Int32, String))) AS a"),
    ("dynamicType", "SELECT dynamicType(CAST(1 AS Dynamic)) AS a"),
    # --- formats / misc ---
    ("formatRow", "SELECT formatRow('CSV', 1, 'a') AS a"),
    ("formatRowNoNewline", "SELECT formatRowNoNewline('TSV', 1, 'a') AS a"),
    ("toJSONString", "SELECT toJSONString(map('a', 1)) AS a"),
    ("fromJSONString", "SELECT 1 AS a"),
    ("randomString", "SELECT length(randomString(10)) AS a"),
    ("randomPrintableASCII", "SELECT length(randomPrintableASCII(10)) AS a"),
    ("randomStringUTF8", "SELECT randomStringUTF8(5) IS NOT NULL AS a"),
    ("randomFixedString", "SELECT length(randomFixedString(8)) AS a"),
    ("generateRandomStructure", "SELECT generateRandomStructure(3) IS NOT NULL AS a"),
    ("revision", "SELECT revision() >= 0 AS a"),
    ("zookeeperSessionUptime", "SELECT zookeeperSessionUptime() AS a"),
    ("currentProfiles", "SELECT currentProfiles() AS a"),
    ("currentRoles", "SELECT currentRoles() AS a"),
    ("currentSchemas", "SELECT currentSchemas(true) AS a"),
    ("connectionId", "SELECT connectionId() AS a"),
    ("displayName", "SELECT displayName() IS NOT NULL AS a"),
    ("filesystemCapacity", "SELECT filesystemCapacity() > 0 AS a"),
    ("transactionID", "SELECT transactionID() AS a"),
    ("showCertificate", "SELECT showCertificate() AS a"),
    ("hasColumnInTable", "SELECT 1 AS a"),
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
