"""Dialect batch 11 (round 5): the values() and format() TABLE functions.

- ``values('structure', row, ...)`` (CH docs: table-functions/values) —
  the structure-string form previously misparsed as Spark's native
  inline-VALUES row syntax, silently returning ONE row whose first column
  was the structure string (the probe-found silent-wrong-answer class).
- ``format(Name[, 'structure'], 'data')`` (table-functions/format) —
  literal-data relation; unquoted format name distinguishes it from the
  format() string function.
"""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh11")))


def test_values_single_column(eng):
    rows = eng.sql("SELECT * FROM values('x Int32', 1, 2, 3) ORDER BY x").collect()
    assert [r["x"] for r in rows] == [1, 2, 3]
    # typed per the structure, not string
    assert eng.sql("SELECT sum(x) AS s FROM values('x UInt64', 10, 20)").first()["s"] == 30


def test_values_multi_column_tuples(eng):
    rows = eng.sql(
        "SELECT * FROM values('x Int32, s String', (1, 'a'), (2, 'b')) ORDER BY x"
    ).collect()
    assert [(r["x"], r["s"]) for r in rows] == [(1, "a"), (2, "b")]


def test_values_joins_and_composes(eng):
    # a values() relation behaves like any table: joinable, aggregable
    row = eng.sql(
        "SELECT count() AS c FROM values('k Int32', 1, 2) AS a "
        "JOIN values('k Int32, v String', (1,'x'), (2,'y'), (3,'z')) AS b USING (k)"
    ).first()
    assert row["c"] == 2


def test_spark_native_values_untouched(eng):
    # native Spark inline rows — including a string-first row that is NOT
    # a structure — must pass through unrewritten
    rows = eng.sql("SELECT * FROM VALUES ('abc', 1), ('def', 2) AS t(s, n) ORDER BY n").collect()
    assert [(r["s"], r["n"]) for r in rows] == [("abc", 1), ("def", 2)]


def test_values_multi_column_requires_tuples(eng):
    with pytest.raises(Exception, match="tuple"):
        eng.sql("SELECT * FROM values('x Int32, s String', 1, 'a')")


def test_format_jsoneachrow_inferred(eng):
    rows = eng.sql(
        "SELECT * FROM format(JSONEachRow, "
        "'{\"a\": 1, \"b\": \"x\"}\\n{\"a\": 2, \"b\": \"y\"}') ORDER BY a"
    ).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "y")]


def test_format_csv_with_structure(eng):
    rows = eng.sql(
        "SELECT * FROM format(CSV, 'x Int32, s String', '1,hello\\n2,world') ORDER BY x"
    ).collect()
    assert [(r["x"], r["s"]) for r in rows] == [(1, "hello"), (2, "world")]
    assert rows[0].asDict()["x"] == 1  # typed Int32 via the structure


def test_format_unknown_name_refuses(eng):
    with pytest.raises(Exception, match="unknown FORMAT"):
        eng.sql("SELECT * FROM format(NotAFormat, '1')")


def test_format_string_function_still_works(eng):
    # the scalar format() with a literal pattern is a different function
    # and must keep working alongside the table function
    assert (
        eng.sql("SELECT format('{} and {}', 'a', 'b') AS f").first()["f"] == "a and b"
    )


def test_remote_cluster_spelling_forms(eng):
    # every shard lives in this engine: remote()/cluster() resolve to the
    # local table across CH's spelling forms (bare, quoted, 3-arg)
    eng.sql("CREATE TABLE IF NOT EXISTS rt11 (x Int32) ENGINE = MergeTree ORDER BY x")
    eng.sql("INSERT INTO rt11 VALUES (1), (2), (3)")
    for q in [
        "SELECT count() AS c FROM remote('h:9000', rt11)",
        "SELECT count() AS c FROM remote('h:9000', default.rt11)",
        "SELECT count() AS c FROM remote('h:9000', 'default.rt11')",
        "SELECT count() AS c FROM remote('h:9000', 'rt11')",
        "SELECT count() AS c FROM remote('h:9000', 'default', 'rt11')",
        "SELECT count() AS c FROM cluster('mycluster', 'default.rt11')",
    ]:
        assert eng.sql(q).first()["c"] == 3, q
    with pytest.raises(NotImplementedError, match="not the current database"):
        eng.sql("SELECT count() AS c FROM remote('h', 'otherdb', 'rt11')")


def test_external_dbms_table_functions_gate_loudly(eng):
    for fn in ["mysql", "postgresql", "mongodb", "redis", "sqlite"]:
        with pytest.raises(NotImplementedError, match="external DBMS"):
            eng.sql(f"SELECT * FROM {fn}('h:1', 'db', 't', 'u', 'p')")


def test_show_settings_and_system_admin_views(eng):
    eng.sql("SET max_threads = 8")
    rows = eng.sql("SHOW SETTINGS LIKE 'max%'").collect()
    assert [(r["name"], r["value"]) for r in rows] == [("max_threads", "8")]
    assert eng.sql("SHOW SETTINGS").count() >= 1
    # system.databases / processes / disks analogues
    assert [r["name"] for r in eng.sql("SELECT name FROM system.databases").collect()] == ["default"]
    assert eng.sql("SELECT * FROM system.processes").count() == 0
    disk = eng.sql("SELECT * FROM system.disks").first()
    assert disk["name"] == "default" and disk["total_space"] >= disk["free_space"] > 0


def test_system_numbers_limit_bounded(eng):
    rows = eng.sql("SELECT number FROM system.numbers LIMIT 5").collect()
    assert [r["number"] for r in rows] == [0, 1, 2, 3, 4]
    # composes: arithmetic + WHERE before the LIMIT bound
    assert (
        eng.sql(
            "SELECT sum(number) AS s FROM (SELECT number FROM system.numbers LIMIT 10)"
        ).first()["s"]
        == 45
    )
    with pytest.raises(ValueError, match="unbounded"):
        eng.sql("SELECT count() AS c FROM system.numbers")


def test_system_numbers_offset_and_where_semantics(eng):
    """CH applies LIMIT after OFFSET, so the bound must cover both; a WHERE
    over the stream cannot be bounded by LIMIT at all (round-5 advisory:
    the old max-LIMIT bound silently returned 0 rows for LIMIT 10 OFFSET
    100 and half the rows for a filtered stream)."""
    rows = eng.sql(
        "SELECT number FROM system.numbers LIMIT 10 OFFSET 100"
    ).collect()
    assert [r["number"] for r in rows] == list(range(100, 110))
    # CH's comma form: LIMIT offset, n
    rows = eng.sql("SELECT number FROM system.numbers LIMIT 7, 3").collect()
    assert [r["number"] for r in rows] == [7, 8, 9]
    with pytest.raises(NotImplementedError, match="numbers\\(N\\)"):
        eng.sql("SELECT number FROM system.numbers WHERE number % 2 = 0 LIMIT 10")


def test_access_control_statements_gate_loudly(eng):
    for stmt in [
        "GRANT SELECT ON *.* TO user1",
        "REVOKE SELECT ON *.* FROM user1",
        "CREATE USER u IDENTIFIED BY 'p'",
        "CREATE ROLE admin",
        "DROP USER u",
        "SET ROLE admin",
        "CREATE ROW POLICY p ON t FOR SELECT USING 1",
        "SHOW GRANTS",
    ]:
        with pytest.raises(NotImplementedError, match="access control"):
            eng.sql(stmt)
