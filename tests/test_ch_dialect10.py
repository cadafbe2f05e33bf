"""Dialect batch 10 (round 5): CH SQL-defined functions (CREATE FUNCTION
name AS (args) -> expr — textual macro expansion, CH's own evaluation
model) and the COLUMNS('regex') column selector.

Macros persist with the view registry, may call other macros
(fixpoint-bounded; true recursion refuses loudly), and their bodies pass
through the full read-rewrite + dialect chain, so a macro body may use
any CH spelling."""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def wh(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh10"))


@pytest.fixture(scope="module")
def eng(spark, wh):
    return Engine(spark, wh)


def one(eng, sql):
    return eng.sql(sql).first()["a"]


def test_create_function_basic_and_lambda_forms(eng):
    eng.sql("CREATE FUNCTION linear10 AS (x, k, b) -> k * x + b")
    assert one(eng, "SELECT linear10(2, 3, 1) AS a") == 7
    # single-param form without parens; body holds a nested HOF lambda
    eng.sql("CREATE FUNCTION doubleAll10 AS arr -> arrayMap(v -> v * 2, arr)")
    assert one(eng, "SELECT doubleAll10([1, 2]) AS a") == [2, 4]
    # macros may call macros
    eng.sql("CREATE FUNCTION lin210 AS x -> linear10(x, 2, 0)")
    assert one(eng, "SELECT lin210(5) AS a") == 10
    # arguments substitute parenthesized: precedence is preserved
    assert one(eng, "SELECT linear10(1 + 1, 3, 0) AS a") == 6


def test_create_function_lifecycle(eng):
    with pytest.raises(ValueError):
        eng.sql("CREATE FUNCTION linear10 AS x -> x")
    eng.sql("CREATE FUNCTION IF NOT EXISTS linear10 AS x -> x")
    assert one(eng, "SELECT linear10(2, 3, 1) AS a") == 7  # original kept
    eng.sql("DROP FUNCTION lin210")
    with pytest.raises(ValueError):
        eng.sql("DROP FUNCTION lin210")
    eng.sql("DROP FUNCTION IF EXISTS lin210")
    with pytest.raises(Exception):
        eng.sql("SELECT lin210(5) AS a")  # dropped: unresolved
    # wrong arity is a loud error
    with pytest.raises(ValueError):
        eng.sql("SELECT linear10(1) AS a")


def test_create_function_persists_across_engines(spark, wh, eng):
    assert one(eng, "SELECT linear10(2, 3, 1) AS a") == 7  # ensure created
    e2 = Engine(spark, wh)
    assert e2.sql("SELECT linear10(2, 3, 1) AS a").first()["a"] == 7


def test_function_name_inside_string_literal_is_data(eng):
    assert one(eng, "SELECT 'call linear10(1, 2, 3) here' AS a") == (
        "call linear10(1, 2, 3) here"
    )


def test_columns_regex_selector(eng):
    eng.sql(
        "CREATE TABLE ct10 (l_a UInt32, l_b UInt32, other UInt32) "
        "ENGINE = MergeTree ORDER BY l_a"
    )
    eng.sql("INSERT INTO ct10 VALUES (1, 2, 3)")
    r = eng.sql("SELECT COLUMNS('^l_') FROM ct10").first()
    assert r.asDict() == {"l_a": 1, "l_b": 2}
    # usable inside expressions-by-position too (CH allows aggregation over
    # the expansion): here via an explicit aggregate per match
    assert eng.sql("SELECT count() AS a FROM (SELECT COLUMNS('^l_') FROM ct10)").first()["a"] == 1
    with pytest.raises(ValueError):
        eng.sql("SELECT COLUMNS('^zzz') FROM ct10")
