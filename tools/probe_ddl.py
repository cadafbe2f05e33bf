"""Dev tool: probe the DDL / statement / type-level CH surface through
Engine.sql. Not part of the package surface; run from the repo root."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhousedatamocker_spark.session import get_spark
from clickhousedatamocker_spark.engine import Engine

spark = get_spark(app_name="probe2", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
import tempfile
eng = Engine(spark, tempfile.mkdtemp())

STMTS = [
    # type coverage in DDL
    ("enum_type", [
        "CREATE TABLE te (id UInt32, status Enum8('new' = 1, 'done' = 2)) ENGINE = MergeTree ORDER BY id",
        "INSERT INTO te VALUES (1, 'new'), (2, 'done')",
        "SELECT status FROM te ORDER BY id",
    ]),
    ("decimal_type", [
        "CREATE TABLE td (id UInt32, amt Decimal(18, 4)) ENGINE = MergeTree ORDER BY id",
        "INSERT INTO td VALUES (1, 12.5)",
        "SELECT amt FROM td",
    ]),
    ("decimal64_type", [
        "CREATE TABLE td64 (id UInt32, amt Decimal64(4)) ENGINE = MergeTree ORDER BY id",
        "SELECT 1",
    ]),
    ("fixedstring_type", [
        "CREATE TABLE tf (id UInt32, code FixedString(3)) ENGINE = MergeTree ORDER BY id",
        "INSERT INTO tf VALUES (1, 'ab')",
        "SELECT code FROM tf",
    ]),
    ("uuid_type", [
        "CREATE TABLE tu (id UUID, x UInt8) ENGINE = MergeTree ORDER BY x",
        "SELECT 1",
    ]),
    ("map_type", [
        "CREATE TABLE tm (id UInt32, attrs Map(String, UInt64)) ENGINE = MergeTree ORDER BY id",
        "INSERT INTO tm VALUES (1, map('a', 10))",
        "SELECT attrs['a'] AS v FROM tm",
    ]),
    ("tuple_type", [
        "CREATE TABLE tt (id UInt32, pt Tuple(Float64, Float64)) ENGINE = MergeTree ORDER BY id",
        "SELECT 1",
    ]),
    ("ipv4_type", [
        "CREATE TABLE tip (id UInt32, addr IPv4) ENGINE = MergeTree ORDER BY id",
        "SELECT 1",
    ]),
    ("nested_type", [
        "CREATE TABLE tn (id UInt32, items Nested(name String, qty UInt32)) ENGINE = MergeTree ORDER BY id",
        "SELECT 1",
    ]),
    ("datetime64", [
        "CREATE TABLE tdt (id UInt32, t DateTime64(3)) ENGINE = MergeTree ORDER BY id",
        "SELECT 1",
    ]),
    ("date32", [
        "CREATE TABLE td32 (id UInt32, d Date32) ENGINE = MergeTree ORDER BY id",
        "SELECT 1",
    ]),
    # insert VALUES forms
    ("insert_values_short", [
        "CREATE TABLE iv (a UInt32, b String) ENGINE = MergeTree ORDER BY a",
        "INSERT INTO iv (a, b) VALUES (1, 'x')",
        "INSERT INTO iv VALUES (2, 'y'), (3, 'z')",
        "SELECT count() AS c FROM iv",
    ]),
    # CREATE VIEW / OR REPLACE
    ("create_or_replace_view", [
        "CREATE OR REPLACE VIEW vv AS SELECT 1 AS one",
        "SELECT one FROM vv",
    ]),
    ("create_table_as_select", [
        "CREATE TABLE ctas1 ENGINE = MergeTree ORDER BY number AS SELECT number FROM numbers(10)",
        "SELECT count() AS c FROM ctas1",
    ]),
    ("truncate", [
        "CREATE TABLE tr (a UInt32) ENGINE = MergeTree ORDER BY a",
        "INSERT INTO tr VALUES (1)",
        "TRUNCATE TABLE tr",
        "SELECT count() AS c FROM tr",
    ]),
    ("exchange_tables", [
        "CREATE TABLE ex1 (a UInt32) ENGINE = MergeTree ORDER BY a",
        "CREATE TABLE ex2 (a UInt32) ENGINE = MergeTree ORDER BY a",
        "EXCHANGE TABLES ex1 AND ex2",
    ]),
    ("alter_add_index", [
        "CREATE TABLE ai (a UInt32, s String) ENGINE = MergeTree ORDER BY a",
        "ALTER TABLE ai ADD INDEX idx_s s TYPE bloom_filter GRANULARITY 4",
    ]),
    ("describe", [
        "CREATE TABLE de (a UInt32, b String) ENGINE = MergeTree ORDER BY a",
        "DESCRIBE TABLE de",
    ]),
    ("show_tables_like", ["SHOW TABLES LIKE 'de%'"]),
    ("kill_query", ["KILL QUERY WHERE query_id = 'x'"]),
    ("window_clause", [
        "SELECT number, sum(number) OVER w AS s FROM numbers(5) WINDOW w AS (ORDER BY number) ORDER BY number",
    ]),
    ("with_totals_having", [
        "SELECT number % 2 AS k, count() AS c FROM numbers(10) GROUP BY k WITH TOTALS HAVING count() > 2 ORDER BY k",
    ]),
    ("any_join", [
        "CREATE TABLE aj1 (k UInt32, v String) ENGINE = MergeTree ORDER BY k",
        "CREATE TABLE aj2 (k UInt32, w String) ENGINE = MergeTree ORDER BY k",
        "INSERT INTO aj1 VALUES (1, 'a')",
        "INSERT INTO aj2 VALUES (1, 'x'), (1, 'y')",
        "SELECT count() AS c FROM aj1 ANY LEFT JOIN aj2 USING (k)",
    ]),
    ("cross_join_comma", ["SELECT count() AS c FROM numbers(3), numbers(4)"]),
    ("in_tuple", ["SELECT count() AS c FROM numbers(10) WHERE (number, number) IN ((1, 1), (2, 2))"]),
    ("global_in", ["SELECT count() AS c FROM numbers(10) WHERE number GLOBAL IN (SELECT number FROM numbers(5))"]),
    ("mutation_delete", [
        "CREATE TABLE md (a UInt32) ENGINE = MergeTree ORDER BY a",
        "INSERT INTO md VALUES (1), (2), (3)",
        "ALTER TABLE md DELETE WHERE a = 2",
        "SELECT count() AS c FROM md",
    ]),
    ("lightweight_delete", [
        "CREATE TABLE ld (a UInt32) ENGINE = MergeTree ORDER BY a",
        "INSERT INTO ld VALUES (1), (2), (3)",
        "DELETE FROM ld WHERE a = 2",
        "SELECT count() AS c FROM ld",
    ]),
    ("insert_select_columns", [
        "CREATE TABLE isc (a UInt32, b UInt32) ENGINE = MergeTree ORDER BY a",
        "INSERT INTO isc (a, b) SELECT number, number * 2 FROM numbers(5)",
        "SELECT sum(b) AS c FROM isc",
    ]),
    ("comment_on", [
        "CREATE TABLE cm (a UInt32) ENGINE = MergeTree ORDER BY a COMMENT 'my table'",
    ]),
    ("sample_by", [
        "CREATE TABLE sb (a UInt64) ENGINE = MergeTree ORDER BY (a, cityHash64(a)) SAMPLE BY cityHash64(a)",
    ]),
]

ok, fail = [], []
for name, stmts in STMTS:
    try:
        out = None
        for s in stmts:
            out = eng.sql(s)
        rows = out.collect() if out is not None else []
        ok.append((name, rows[:3]))
    except Exception as e:
        fail.append((name, type(e).__name__, str(e).split("\n")[0][:140]))

print(f"==== OK {len(ok)} FAIL {len(fail)} ====")
for n, r in ok:
    print("OK  ", n, r)
for n, t, m in fail:
    print("FAIL", n, t, m)
