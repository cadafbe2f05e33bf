"""Extended TPC-H coverage beyond the registry's graded slots.

The driver grades exactly 50 registry entries; these queries extend SQL
coverage without consuming slots — each SQL text is dialect-portable and
runs VERBATIM on both Spark SQL and DuckDB, then compares with the same
order-insensitive normalization as tests/test_oracle_parity.py.

Queries adapted to the fixture's reduced TPC-H schema (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no p_container/o_comment/c_phone).
With this file, all 22 TPC-H query SHAPES are exercised cross-engine: the
graded registry carries q1/q3/q5/q6/q7/q10/q18 verbatim, and the rest run
here — q8/q13/q14/q15/q17/q22 near-verbatim, and q2/q4/q9/q11/q12/q16/
q19/q20/q21 in '-shaped' form where a missing column gets a semantically
parallel stand-in (each deviation noted per query). The point of a shaped
variant is the PLAN shape — correlated MIN (q2), scalar-subquery threshold
(q11), NOT IN decorrelation (q16), nested IN over a correlated share (q20),
EXISTS + NOT-EXISTS double self-join (q21) — not the exact TPC-H answer:

- q8  market-share: nested 7-table join, share-of-total division (the
      numerator nation filter is a nationkey range — SF-robust where a
      single named nation can miss the tiny fixture's 10 suppliers)
- q13 customer order-count distribution (no o_comment filter)
- q14 promo revenue percentage
- q15 top supplier by revenue (CTE + scalar-subquery max)
- q17 small-quantity-order revenue (correlated scalar subquery;
      p_brand+p_size instead of p_container)
- q4  order-priority checking ('-shaped': the correlated EXISTS keeps its
      decorrelate-to-left-semi-join shape, with late-shipped lines
      (l_shipdate > o_orderdate) standing in for the missing
      l_commitdate < l_receiptdate)
- q12 priority CASE-counting ('-shaped': grouped by l_linestatus for the
      missing l_shipmode; the IN-list CASE sums and the AND-range
      predicates are the original shape)
- q19 OR-of-ANDs disjunctive pushdown ('-shaped': three brand/size/
      quantity AND-groups OR'd, p_size for the missing p_container —
      the disjunction-over-conjunctions scan shape is the point)

Float discipline (queries/base.py rules): every sum is exact-decimal cast
to double; ratios divide two such doubles — one IEEE op, identical on both
engines.
"""

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_oracle_parity import TABLES, _normalize

_VOLUME = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
_DSUM_DISC = f"SUM({_VOLUME})"

QUERIES = {
    "q8_market_share": f"""
SELECT YEAR(o_orderdate) AS o_year,
  CAST(SUM(CASE WHEN n2.n_nationkey < 13 THEN {_VOLUME} ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
    / CAST(SUM({_VOLUME}) AS DOUBLE) AS mkt_share,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
GROUP BY YEAR(o_orderdate)
ORDER BY o_year
""",
    "q13_order_count_distribution": """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "q14_promo_revenue": f"""
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
      ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE) * 100.0
    / CAST({_DSUM_DISC} AS DOUBLE) AS promo_revenue_pct,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
    "q15_top_supplier": f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST({_DSUM_DISC} AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    "q17_small_quantity_revenue": """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 15
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
""",
    "q4_order_priority": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT * FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "q12_priority_case_counts": """
SELECT l_linestatus,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    "q22_global_sales_opportunity": """
SELECT cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT c_nationkey AS cntry, c_acctbal, c_custkey FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    AND c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    AND NOT EXISTS (SELECT * FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
) prospects
GROUP BY cntry
ORDER BY cntry
""",
    # q2-shaped: minimum-cost-supplier correlated subquery. partsupp's
    # ps_supplycost is absent; the stand-in "cost" is s_acctbal among the
    # suppliers that actually shipped the part (lineitem as the
    # part-supplier relation). The correlated-MIN-per-part plan shape —
    # decorrelated into an aggregated self-join — is the original's.
    "q2_min_cost_supplier": """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM supplier s2
    JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    # q9-shaped: product-type profit by nation and year. ps_supplycost is
    # absent; unit cost stands in as 60%% of p_retailprice. The 5-table
    # star join + LIKE part filter + (nation, year) rollup is the original.
    "q9_product_profit": """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
         - CAST(0.6 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
    AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%gear%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
""",
    # q11-shaped: important-stock identification. partsupp value is absent;
    # the stand-in is shipped revenue per part from one nation's suppliers.
    # The HAVING-against-global-scalar-subquery threshold shape (value >
    # fraction * total) is exactly the original's.
    "q11_important_stock": f"""
SELECT l_partkey, CAST({_DSUM_DISC} AS DOUBLE) AS value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_nationkey < 13
GROUP BY l_partkey
HAVING CAST({_DSUM_DISC} AS DOUBLE) > (
  SELECT CAST({_DSUM_DISC} AS DOUBLE) * 0.001
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_nationkey < 13
)
ORDER BY value DESC, l_partkey
""",
    # q16-shaped: supplier count by part attributes. partsupp is absent
    # (lineitem is the part-supplier relation) and the s_comment
    # '%Customer%Complaints%' exclusion becomes a negative-balance
    # exclusion. COUNT(DISTINCT) + NOT-IN-subquery decorrelation is the
    # original's plan shape.
    "q16_parts_supplier_count": """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
""",
    # q20-shaped: potential-part-promotion nested IN. ps_availqty is
    # absent; a supplier qualifies when it shipped MORE THAN HALF of a
    # small part's total shipped quantity (threshold 0.15 — the highest
    # share in the fixtures is ~0.37, so the original's 0.5 would be
    # vacuous; the original's availqty > frac*sum(qty) correlated
    # comparison is flattened through a
    # share/total CTE join that Catalyst plans as one aggregated co-join).
    "q20_part_promotion_suppliers": """
WITH part_share AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_size < 20
  GROUP BY l_suppkey, l_partkey
), part_total AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS tq
  FROM lineitem
  GROUP BY l_partkey
)
SELECT s_name FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_nationkey < 13
  AND s_suppkey IN (
    SELECT ps.l_suppkey
    FROM part_share ps JOIN part_total pt ON ps.l_partkey = pt.l_partkey
    WHERE CAST(ps.sq AS DOUBLE) > 0.15 * CAST(pt.tq AS DOUBLE)
  )
ORDER BY s_name
""",
    # q21-shaped: suppliers who kept orders waiting. l_commitdate/
    # l_receiptdate are absent; "late" becomes shipped >365 days after the
    # order date (median lateness in this fixture is 36 days, so the
    # predicate is selective). The multi-supplier EXISTS + sole-late-
    # supplier NOT EXISTS double self-join on lineitem is the original's
    # signature shape.
    "q21_suppliers_kept_waiting": """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_nationkey < 13
  AND l1.l_shipdate > o_orderdate + INTERVAL '365' DAY
  AND EXISTS (
    SELECT * FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT * FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL '365' DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    "q19_disjunctive_pushdown": f"""
SELECT CAST({_DSUM_DISC} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def spark_views(spark):
    from clickhousedatamocker_spark.sources.tables import register_views

    register_views(spark, SF_DIR, list(TABLES))
    return spark


@pytest.mark.parametrize("name", list(QUERIES))
def test_tpch_extra_portable_sql(spark_views, duck, name):
    sql = QUERIES[name]
    sdf = spark_views.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    snorm = _normalize(srows, sdf.columns)
    onorm = _normalize(orows, ocols)
    bad = [(a, b) for a, b in zip(snorm, onorm) if a != b]
    assert not bad, f"{name}: {len(bad)} mismatches; first {bad[0]}"
