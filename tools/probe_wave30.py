"""Dev tool: dialect probe wave 30 (round 11, eighth wave) — SELECT-clause
dialect: join strictness spellings (ASOF/ANY/SEMI/ANTI/GLOBAL), WITH
TOTALS, ORDER BY WITH FILL / INTERPOLATE, LIMIT WITH TIES, IN-subquery
forms, tuple IN, EXISTS."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe30", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, "/tmp/probe_wh30")

PROBES = [
    ("asof_join", """
SELECT t.k, t.t2, q.v FROM
  (SELECT 1 AS k, 5 AS t2) t
ASOF LEFT JOIN (SELECT 1 AS k, 3 AS t2, 'x' AS v UNION ALL SELECT 1, 4, 'y') q
ON t.k = q.k AND t.t2 >= q.t2
"""),
    ("any_left_join", """
SELECT a.k, b.v FROM (SELECT 1 AS k) a
ANY LEFT JOIN (SELECT 1 AS k, 'x' AS v UNION ALL SELECT 1, 'y') b USING (k)
"""),
    ("semi_join", """
SELECT a.k FROM (SELECT 1 AS k UNION ALL SELECT 2) a
LEFT SEMI JOIN (SELECT 1 AS k) b USING (k)
"""),
    ("anti_join", """
SELECT a.k FROM (SELECT 1 AS k UNION ALL SELECT 2) a
LEFT ANTI JOIN (SELECT 1 AS k) b USING (k)
"""),
    ("global_join", """
SELECT a.k, b.v FROM (SELECT 1 AS k) a
GLOBAL LEFT JOIN (SELECT 1 AS k, 'x' AS v) b USING (k)
"""),
    ("global_in", "SELECT 1 AS a WHERE 1 GLOBAL IN (SELECT 1)"),
    ("with_totals", """
SELECT k, count(*) AS n FROM (SELECT 1 AS k UNION ALL SELECT 1 UNION ALL SELECT 2) t
GROUP BY k WITH TOTALS ORDER BY k
"""),
    ("order_with_fill", """
SELECT k FROM (SELECT 1 AS k UNION ALL SELECT 4) t ORDER BY k WITH FILL
"""),
    ("order_with_fill_from_to", """
SELECT k FROM (SELECT 2 AS k) t ORDER BY k WITH FILL FROM 1 TO 5
"""),
    ("limit_with_ties", """
SELECT k FROM (SELECT 1 AS k UNION ALL SELECT 1 UNION ALL SELECT 2) t
ORDER BY k LIMIT 1 WITH TIES
"""),
    ("tuple_in", "SELECT (1, 'a') IN ((1, 'a'), (2, 'b')) AS a"),
    ("in_subquery", "SELECT count(*) AS a FROM (SELECT 1 AS k UNION ALL SELECT 2) t WHERE k IN (SELECT 1)"),
    ("not_in_subquery", "SELECT count(*) AS a FROM (SELECT 1 AS k UNION ALL SELECT 2) t WHERE k NOT IN (SELECT 1)"),
    ("exists_subquery", "SELECT count(*) AS a FROM (SELECT 1 AS k) t WHERE EXISTS (SELECT 1)"),
    ("scalar_subquery", "SELECT (SELECT max(k) FROM (SELECT 1 AS k UNION ALL SELECT 5)) AS a"),
    ("intersect_distinct", "SELECT 1 AS k INTERSECT DISTINCT SELECT 1"),
    ("except_distinct", "SELECT 1 AS k EXCEPT DISTINCT SELECT 2"),
    ("union_distinct", "SELECT 1 AS k UNION DISTINCT SELECT 1"),
    ("format_null", "SELECT 1 AS a FORMAT Null"),
    ("select_except_modifier", "SELECT * EXCEPT (b) FROM (SELECT 1 AS a, 2 AS b)"),
    ("select_replace_modifier", "SELECT * REPLACE (a + 1 AS a) FROM (SELECT 1 AS a, 2 AS b)"),
    ("select_apply_modifier", "SELECT * APPLY (sum) FROM (SELECT 1 AS a, 2 AS b)"),
    ("columns_matcher", "SELECT COLUMNS('^a') FROM (SELECT 1 AS a1, 2 AS a2, 3 AS b)"),
    ("distinct_on", "SELECT DISTINCT ON (k) k, v FROM (SELECT 1 AS k, 'x' AS v UNION ALL SELECT 1, 'y' UNION ALL SELECT 2, 'z') ORDER BY k, v"),
    ("qualify_clause", """
SELECT k, v FROM (SELECT 1 AS k, 10 AS v UNION ALL SELECT 1, 20 UNION ALL SELECT 2, 5)
QUALIFY row_number() OVER (PARTITION BY k ORDER BY v DESC) = 1
ORDER BY k
"""),
    ("is_not_distinct", "SELECT 1 IS NOT DISTINCT FROM 1 AS a, NULL IS NOT DISTINCT FROM NULL AS b"),
    ("interval_arith", "SELECT toDateTime('2024-01-01 00:00:00') + INTERVAL 1 DAY + INTERVAL 2 HOUR AS a"),
    ("between_op", "SELECT 5 BETWEEN 1 AND 10 AS a"),
    ("case_value_form", "SELECT CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END AS a"),
    ("lambda_arrow", "SELECT arrayMap(x -> x * 2, array(1, 2)) AS a"),
    ("higher_order_two", "SELECT arrayMap((x, y) -> x + y, array(1, 2), array(10, 20)) AS a"),
    ("view_fn", "SELECT * FROM view(SELECT 1 AS a)"),
    ("cte_reuse", "WITH c AS (SELECT 1 AS k) SELECT a.k, b.k FROM c a JOIN c b USING (k)"),
    ("with_scalar_alias", "WITH 5 AS five SELECT five + 1 AS a"),
    ("paste_join", "SELECT 1 AS a"),
    ("cross_join", "SELECT count(*) AS a FROM (SELECT 1 AS x UNION ALL SELECT 2) a CROSS JOIN (SELECT 1 AS y UNION ALL SELECT 2) b"),
]

ok, fail = [], []
for name, sql in PROBES:
    try:
        rows = eng.sql(sql).collect()
        ok.append((name, rows[:3] if rows else None))
    except NotImplementedError as e:
        fail.append((name, "GATE", str(e).split("\n")[0][:110]))
    except Exception as e:
        fail.append((name, type(e).__name__, str(e).split("\n")[0][:130]))

print(f"\n==== OK: {len(ok)}  FAIL: {len(fail)} ====")
for name, r in ok:
    print(f"OK   {name}: {str(r)[:110]}")
print("----")
for name, t, m in fail:
    print(f"FAIL {name}: {t}: {m}")
