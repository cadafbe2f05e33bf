"""Dialect batch 9 (round 5): type-system completion (Map/Tuple/Nested/
UUID/IPv4/Date32 in DDL), ANY JOIN USING (was silently parsing as a table
ALIAS named ANY — an ALL join), tuple-IN expansion, ALTER ADD/DROP INDEX,
KILL QUERY.

The ANY JOIN USING case is the batch's load-bearing fix: before it, the
strictness keyword fell through to Spark's parser as an alias and the
query returned EVERY match — a silent wrong answer the guard now makes
impossible (unhandled ANY forms refuse loudly)."""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh9")))


def one(eng, sql):
    return eng.sql(sql).first()["a"]


def test_any_join_using_keeps_one_match(eng):
    eng.sql("CREATE TABLE aj9l (k UInt32, v String) ENGINE = MergeTree ORDER BY k")
    eng.sql("CREATE TABLE aj9r (k UInt32, w String) ENGINE = MergeTree ORDER BY k")
    eng.sql("INSERT INTO aj9l VALUES (1, 'a'), (2, 'b')")
    eng.sql("INSERT INTO aj9r VALUES (1, 'x'), (1, 'y'), (1, 'z')")
    # ALL (default) keeps every match; ANY keeps exactly one per left row
    assert one(eng, "SELECT count() AS a FROM aj9l LEFT JOIN aj9r USING (k)") == 4
    assert one(eng, "SELECT count() AS a FROM aj9l ANY LEFT JOIN aj9r USING (k)") == 2
    assert one(eng, "SELECT count() AS a FROM aj9l ANY INNER JOIN aj9r USING (k)") == 1
    # the unmatched left row still survives the LEFT form
    rows = eng.sql(
        "SELECT k, w FROM aj9l ANY LEFT JOIN aj9r USING (k) ORDER BY k"
    ).collect()
    assert [r["k"] for r in rows] == [1, 2] and rows[1]["w"] is None


def test_unsupported_any_forms_refuse_loudly(eng):
    # before the guard these parsed as a table alias named ANY == ALL join
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT count() AS a FROM aj9l ANY RIGHT JOIN aj9r USING (k)")
    with pytest.raises(NotImplementedError):
        eng.sql(
            "SELECT count() AS a FROM aj9l ANY FULL JOIN aj9r ON aj9l.k = aj9r.k"
        )


def test_tuple_in_expansion(eng):
    assert one(
        eng,
        "SELECT count() AS a FROM numbers(10) WHERE (number, number) IN ((1, 1), (2, 2))",
    ) == 2
    assert one(
        eng,
        "SELECT count() AS a FROM numbers(10) WHERE (number, number) NOT IN ((1, 1))",
    ) == 9
    # a function's argument list is NOT a tuple-IN left side (round-5
    # advisory): the rewrite must leave `f(a, b) IN (...)` alone
    from clickhousedatamocker_spark.functions.compat import translate_ch_sql

    assert "greatest(number, number) IN ((1,2))" in translate_ch_sql(
        "SELECT greatest(number, number) IN ((1,2)) AS z FROM numbers(3)"
    )
    # scalar IN subqueries are untouched by the tuple rewrite
    assert one(
        eng,
        "SELECT count() AS a FROM numbers(10) WHERE number IN (SELECT number FROM numbers(3))",
    ) == 3


def test_map_tuple_nested_types_round_trip(eng):
    eng.sql(
        "CREATE TABLE t9m (id UInt32, attrs Map(String, UInt64)) "
        "ENGINE = MergeTree ORDER BY id"
    )
    eng.sql("INSERT INTO t9m VALUES (1, map('a', 10, 'b', 20))")
    assert one(eng, "SELECT attrs['a'] AS a FROM t9m") == 10
    assert one(eng, "SELECT mapKeys(attrs) AS a FROM t9m") == ["a", "b"]

    eng.sql(
        "CREATE TABLE t9t (id UInt32, pt Tuple(Float64, Float64), "
        "named Tuple(lon Float64, lat Float64)) ENGINE = MergeTree ORDER BY id"
    )
    eng.sql(
        "INSERT INTO t9t VALUES (1, named_struct('col1', 1.5, 'col2', 2.5), "
        "named_struct('lon', 3.5, 'lat', 4.5))"
    )
    r = eng.sql("SELECT pt.1 AS a, named.lat AS b FROM t9t").first()
    assert (r["a"], r["b"]) == (1.5, 4.5)

    eng.sql(
        "CREATE TABLE t9n (id UInt32, items Nested(name String, qty UInt32)) "
        "ENGINE = MergeTree ORDER BY id"
    )
    eng.sql(
        "INSERT INTO t9n VALUES (1, array(named_struct('name', 'x', 'qty', 2)))"
    )
    got = eng.sql(
        "SELECT it.name AS n, it.qty AS q FROM t9n ARRAY JOIN items AS it"
    ).first()
    assert (got["n"], got["q"]) == ("x", 2)


def test_uuid_ipv4_date32_types(eng):
    eng.sql(
        "CREATE TABLE t9u (id UUID, addr IPv4, d Date32, x UInt8) "
        "ENGINE = MergeTree ORDER BY x"
    )
    # toIPv4 is a SQL UDF — not foldable inside an inline VALUES table, so
    # the expression form uses INSERT ... SELECT (CH accepts both)
    eng.sql(
        "INSERT INTO t9u SELECT '123e4567-e89b-12d3-a456-426614174000', "
        "toIPv4('192.168.0.1'), toDate('2024-03-05'), 1"
    )
    r = eng.sql("SELECT id, IPv4NumToString(addr) AS ip, d FROM t9u").first()
    assert r["id"].startswith("123e4567")
    assert r["ip"] == "192.168.0.1"
    assert r["d"].isoformat() == "2024-03-05"


def test_alter_add_drop_index_round_trip(eng):
    eng.sql("CREATE TABLE t9i (a UInt32, s String) ENGINE = MergeTree ORDER BY a")
    eng.sql("ALTER TABLE t9i ADD INDEX idx_s s TYPE bloom_filter GRANULARITY 4")
    ddl = "\n".join(
        r["statement"] for r in eng.sql("SHOW CREATE TABLE t9i").collect()
    )
    assert "INDEX idx_s s TYPE bloom_filter GRANULARITY 4" in ddl
    # duplicate add refuses unless IF NOT EXISTS
    with pytest.raises(ValueError):
        eng.sql("ALTER TABLE t9i ADD INDEX idx_s s TYPE minmax")
    eng.sql("ALTER TABLE t9i ADD INDEX IF NOT EXISTS idx_s s TYPE minmax")
    eng.sql("ALTER TABLE t9i MATERIALIZE INDEX idx_s")
    eng.sql("ALTER TABLE t9i DROP INDEX idx_s")
    ddl2 = "\n".join(
        r["statement"] for r in eng.sql("SHOW CREATE TABLE t9i").collect()
    )
    assert "idx_s" not in ddl2
    with pytest.raises(ValueError):
        eng.sql("ALTER TABLE t9i DROP INDEX idx_s")
    eng.sql("ALTER TABLE t9i DROP INDEX IF EXISTS idx_s")


def test_kill_query_reports_nothing_pending(eng):
    df = eng.sql("KILL QUERY WHERE query_id = 'x'")
    assert df.count() == 0
    assert df.columns == ["kill_status", "query_id"]
    assert eng.sql("KILL MUTATION WHERE table = 't9i'").count() == 0


# -- combinator batch: -OrNull/-OrDefault/-Array/-ForEach/-SimpleState --------


def test_or_null_or_default_combinators(eng):
    assert one(eng, "SELECT sumOrNull(x) AS a FROM (SELECT 1 AS x WHERE false)") is None
    assert one(eng, "SELECT sumOrDefault(x) AS a FROM (SELECT 1 AS x WHERE false)") == 0
    assert one(eng, "SELECT countOrNull(x) AS a FROM (SELECT 1 AS x WHERE false)") is None
    assert one(eng, "SELECT countOrNull(x) AS a FROM VALUES (1) AS t(x)") == 1
    assert one(eng, "SELECT minSimpleState(x) AS a FROM VALUES (5), (2) AS t(x)") == 2


def test_array_combinators_match_explode(eng, spark):
    vals = "FROM VALUES (array(1, 2)), (array(2, 3)) AS t(arr)"
    assert one(eng, f"SELECT sumArray(arr) AS a {vals}") == 8.0
    assert one(eng, f"SELECT avgArray(arr) AS a {vals}") == 2.0
    assert one(eng, f"SELECT uniqArray(arr) AS a {vals}") == 3
    assert one(eng, f"SELECT minArray(arr) AS a {vals}") == 1
    assert one(eng, f"SELECT maxArray(arr) AS a {vals}") == 3
    assert sorted(one(eng, f"SELECT groupArrayArray(arr) AS a {vals}")) == [1, 2, 2, 3]
    # independent check: explode + plain aggregates
    want = spark.sql(
        "SELECT sum(e) AS s, count(e) AS c FROM (SELECT explode(arr) AS e "
        "FROM VALUES (array(1, 2)), (array(2, 3)) AS t(arr))"
    ).first()
    assert one(eng, f"SELECT sumArray(arr) AS a {vals}") == float(want["s"])
    assert one(eng, f"SELECT countArray(arr) AS a {vals}") == want["c"]


def test_for_each_combinators(eng):
    vals = "FROM VALUES (array(1, 2)), (array(3, 4, 5)) AS t(arr)"
    assert one(eng, f"SELECT sumForEach(arr) AS a {vals}") == [4.0, 6.0, 5.0]
    assert one(eng, f"SELECT minForEach(arr) AS a {vals}") == [1.0, 2.0, 5.0]
    assert one(eng, f"SELECT maxForEach(arr) AS a {vals}") == [3.0, 4.0, 5.0]


def test_interval_length_sum_union_semantics(eng):
    # [1,3) ∪ [2,5) = [1,5) → 4; plus the disjoint [10,11) → 5
    assert one(
        eng,
        "SELECT intervalLengthSum(s, e) AS a FROM VALUES (1, 3), (2, 5), (10, 11) AS t(s, e)",
    ) == 5
    # fully overlapping intervals count once
    assert one(
        eng,
        "SELECT intervalLengthSum(s, e) AS a FROM VALUES (1, 10), (2, 3) AS t(s, e)",
    ) == 9


def test_quantile_exact_low_high_are_element_picks(eng):
    # CH docs: even n → LOWER median for Low, UPPER for High (never 2.5)
    vals = "FROM VALUES (1), (2), (3), (4) AS t(x)"
    assert one(eng, f"SELECT quantileExactLow(0.5)(x) AS a {vals}") == 2
    assert one(eng, f"SELECT quantileExactHigh(0.5)(x) AS a {vals}") == 3
    assert one(eng, f"SELECT quantileExactLow(0)(x) AS a {vals}") == 1
    assert one(eng, f"SELECT quantileExactLow(1)(x) AS a {vals}") == 4
    assert one(eng, f"SELECT quantileExactHigh(1)(x) AS a {vals}") == 4
    # round-5 advisory golden: integral level*size — CH's 0-based
    # floor(level*size) means quantileExactLow(0.25) over 8 rows is the
    # THIRD element, not the second
    vals8 = "FROM VALUES (1), (2), (3), (4), (5), (6), (7), (8) AS t(x)"
    assert one(eng, f"SELECT quantileExactLow(0.25)(x) AS a {vals8}") == 3
    assert one(eng, f"SELECT quantileExactLow(0.75)(x) AS a {vals8}") == 7
    # non-integral level*size still picks floor+1 (0-based floor)
    assert one(eng, f"SELECT quantileExactLow(0.3)(x) AS a {vals8}") == 3


def test_histogram_and_stat_test_gates(eng):
    got = one(eng, "SELECT histogram(3)(x) AS a FROM VALUES (1.0), (2.0), (9.0) AS t(x)")
    assert len(got) == 3 and sum(b["y"] for b in got) == 3.0
    # studentTTest / mannWhitneyUTest were gated here until batch 23
    # implemented them with real p-values (tests/test_ch_dialect23.py);
    # a one-group input now yields NULL moments rather than a raise
    r = one(
        eng,
        "SELECT studentTTest(v, g) AS a FROM VALUES (1.0, 0), (2.0, 1) AS t(v, g)",
    )
    assert set(r.asDict()) == {"t_statistic", "p_value"}


def test_system_one_and_remote_cluster(eng):
    assert eng.sql("SELECT * FROM system.one").first()["dummy"] == 0
    eng.sql("CREATE TABLE r9 (a UInt32) ENGINE = MergeTree ORDER BY a")
    eng.sql("INSERT INTO r9 VALUES (7)")
    assert one(eng, "SELECT a FROM remote('127.0.0.1', default.r9)") == 7
    assert one(eng, "SELECT a FROM cluster('default', r9)") == 7
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT * FROM url('https://x.com/d.csv', 'CSV', 'a UInt8')")
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT * FROM s3('https://b.s3.amazonaws.com/k.parquet')")


# -- syntax batch: ::casts, map literals, view(), PASTE JOIN gate -------------


def test_cast_operator_forms(eng):
    assert one(eng, "SELECT '5'::Int64 AS a") == 5
    assert one(eng, "SELECT 5::Float64 AS a") == 5.0
    assert one(eng, "SELECT concat('1', '2')::Int32 AS a") == 12
    assert one(eng, "SELECT number::String AS a FROM numbers(1)") == "0"
    assert one(eng, "SELECT 'x'::Nullable(String) AS a") == "x"
    # '::' inside a string literal is data (IPv6 spelling)
    assert one(eng, "SELECT '::1' AS a") == "::1"


def test_brace_map_literals(eng):
    assert one(eng, "SELECT {'a': 1, 'b': 2} AS a") == {"a": 1, "b": 2}
    assert one(eng, "SELECT {'a': {'b': 1}} AS a") == {"a": {"b": 1}}
    assert one(eng, "SELECT {'a': 7}['a'] AS a") == 7
    assert one(eng, "SELECT 'keep {this: here}' AS a") == "keep {this: here}"


def test_view_table_function_and_paste_gate(eng):
    r = eng.sql("SELECT * FROM view(SELECT 1 AS a, 2 AS b)").first()
    assert (r["a"], r["b"]) == (1, 2)
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT * FROM (SELECT 1 AS a) PASTE JOIN (SELECT 2 AS b)")
