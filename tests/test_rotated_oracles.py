"""Value-exact checks for queries rotated OUT of the driver's 50-slot
graded window (their oracle= slot freed for newer operators) — rotation
must not cost correctness coverage, so the former DuckDB oracles live on
here, compared with the same order-insensitive discipline the driver uses.

r8 rotation (made room for the PCA/SQ8/PQ/soft-dedup fixed-model twins):
join_semi_anti, window_running_and_lag, agg_grouping_analytics,
q18_large_volume_customers.

r8 second rotation (made room for the epoch-mixture / weighted-reservoir
twins): setops_customer_segments, tumbling_window_hourly.

r8 third rotation (made room for the exact-integer BQ Hamming twin):
monitor_inlist_filter.

r9 rotation (made room for the snapshot-diff and packing-layout twins):
sample_histogram_events, retention_analysis.

r9 second rotation (made room for the BPE segmenter twin):
funnel_click_view_purchase (oracle built by funnel_oracle_sql, imported
rather than frozen so the fold stays in lockstep with the operator).

r10 rotation (made room for the trained-classifier, IVF-PQ and EMA
time-decay twins): q7_volume_shipping, join_broadcast_dims,
dedup_ngram_jaccard_pairs.

r11 rotation (made room for the trained-IVF integer-k-means twin):
q10_returned_items.

r11 second rotation (made room for the global-shuffle permutation twin):
sessionize_events (session-window semantics stay graded via
stream_session_windows, the streaming sibling of the same 30-min-gap
shape).
"""

import math
import os

import duckdb
import pytest

from clickhousedatamocker_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]

from clickhousedatamocker_spark.operators.funnel import funnel_oracle_sql

FORMER_ORACLES = {
    "funnel_click_view_purchase": funnel_oracle_sql(
        ["click", "view", "purchase"], 2 * 86400, seq_match_col="seq_match_cvp"
    ),
    "sample_histogram_events": """
WITH sampled AS (
  SELECT * FROM events
  WHERE (event_id * 2654435761) % 4294967296 < 429496730
), b AS (
  SELECT CAST(LEAST(FLOOR(value / 10.0), 9) AS INT) AS bucket,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS bucket_sum
  FROM sampled GROUP BY 1
)
SELECT bucket, n, bucket_sum FROM b ORDER BY bucket
""",
    "retention_analysis": """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(r1) AS BIGINT) AS cohort,
       CAST(SUM(r1 * c2) AS BIGINT) AS retained_click,
       CAST(SUM(r1 * c3) AS BIGINT) AS retained_purchase
FROM per_user
""",
    "sessionize_events": """
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
         THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, event_id,
    SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events, min(ts) AS session_start
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    "monitor_inlist_filter": """
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IN ('click', 'purchase', 'signup')
GROUP BY event_type
ORDER BY event_type
""",
    "setops_customer_segments": """
SELECT 'building_with_orders' AS tag, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'building_without_orders' AS tag, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey FROM orders
)
ORDER BY tag, c_custkey
""",
    "tumbling_window_hourly": """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour_start, event_type
""",
    "join_semi_anti": """
SELECT tag, n_name, n FROM (
  SELECT 'with_orders' AS tag, n_name, COUNT(*) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY n_name
  UNION ALL
  SELECT 'without_orders' AS tag, n_name, COUNT(*) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY n_name
  UNION ALL
  SELECT 'suppliers_left_outer' AS tag, n_name, COUNT(s_suppkey) AS n
  FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
  GROUP BY n_name
) ORDER BY tag, n_name
""",
    "window_running_and_lag": """
SELECT user_id, event_id, ts,
  CAST(SUM(CAST(value AS DECIMAL(10,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
WHERE user_id <= 5
ORDER BY user_id, ts, event_id
""",
    "agg_grouping_analytics": """
SELECT 'rollup' AS tag, r_name AS k1, n_name AS k2, COUNT(*) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
UNION ALL
SELECT 'cube' AS tag, o_orderstatus AS k1, o_orderpriority AS k2, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets' AS tag, o_orderstatus AS k1, o_orderpriority AS k2, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY tag, k1 NULLS FIRST, k2 NULLS FIRST
""",
    "q7_volume_shipping": """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(14,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1995-01-01'
    AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    "join_broadcast_dims": """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
    "dedup_ngram_jaccard_pairs": """
WITH dd AS (
  SELECT doc_id, lang, string_split(text,' ') tk FROM documents
), sh AS (
  SELECT doc_id, lang,
    list_distinct(list_transform(generate_series(1, len(tk)-2),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) sg
  FROM dd WHERE len(tk) >= 3
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  len(list_intersect(a.sg, b.sg)) * 1.0
    / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
WHERE len(list_intersect(a.sg, b.sg)) * 1.0
    / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.2
ORDER BY id_a, id_b
""",
    "q10_returned_items": """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(volume AS DECIMAL(14,4))) AS DOUBLE) AS revenue, n_name
FROM (
  SELECT c_custkey, c_name, n_name,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume
  FROM customer JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1995-10-01'
    AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-01-01'
)
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    "q18_large_volume_customers": """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 212
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else "nan"
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(FORMER_ORACLES))
def test_rotated_query_still_matches_former_oracle(spark, duck, name):
    spec = REGISTRY[name]
    assert spec.oracle is None, f"{name} regained an oracle — drop it from this file"
    sdf = spec.fn(spark, SF_DIR)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    rel = duck.sql(FORMER_ORACLES[name])
    orows = _normalize(rel.fetchall(), list(rel.columns))
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert srows == orows
