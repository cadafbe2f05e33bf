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
