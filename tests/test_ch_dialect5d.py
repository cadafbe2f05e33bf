"""Round-5 dialect batch 4: bracket array syntax (literals + 1-based
subscripts), the lambda/array function vocabulary, CH type names in CAST,
tuple positional access, simple-engine families (Memory/Log/TinyLog/
StripeLog), and the COMMENT COLUMN / CLEAR COLUMN / CHECK TABLE statements.

Reference surface: these are ClickHouse SQL spellings a migrating user
hits immediately (the reference repo's DDL/queries are plain CH dialect);
none have native Spark equivalents under the same name/shape.
"""

import pytest

from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.functions.compat import translate_ch_sql


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


# one scalar-valued statement per vocabulary item; goldens are ClickHouse's
# documented outputs for the same expressions
BRACKET_AND_ARRAY_GOLDENS = [
    ("SELECT [1,2,3] AS a", [1, 2, 3]),
    ("SELECT [[1],[2,3]] AS a", [[1], [2, 3]]),
    # CH subscripts are 1-BASED; -1 is the last element — a pass-through to
    # Spark's native 0-based [] would silently shift every element
    ("SELECT [10,20,30][2] AS a", 20),
    ("SELECT [10,20,30][-1] AS a", 30),
    ("SELECT [[1,2],[3,4]][2][1] AS a", 3),
    ("SELECT splitByChar(',', 'a,b,c')[2] AS a", "b"),
    ("SELECT arrayMap(i -> i * 2, [1,2,3]) AS a", [2, 4, 6]),
    ("SELECT arrayFilter(i -> i > 1, [1,2,3]) AS a", [2, 3]),
    ("SELECT arrayExists(i -> i > 2, [1,2,3]) AS a", True),
    ("SELECT arraySort([3,1,2]) AS a", [1, 2, 3]),
    ("SELECT arrayReverseSort([3,1,2]) AS a", [3, 2, 1]),
    ("SELECT arrayMin([3,1,2]) AS a", 1),
    ("SELECT arrayMax(x -> -x, [1,3,2]) AS a", -1),
    ("SELECT arrayUniq([1,1,2]) AS a", 2),
    ("SELECT arrayDistinct([1,1,2]) AS a", [1, 2]),
    ("SELECT arraySlice([1,2,3,4], 2, 2) AS a", [2, 3]),
    ("SELECT arrayConcat([1], [2]) AS a", [1, 2]),
    ("SELECT arrayReverse([1,2,3]) AS a", [3, 2, 1]),
    ("SELECT arrayFlatten([[1,2],[3]]) AS a", [1, 2, 3]),
    ("SELECT arrayIntersect([1,2,3], [2,3,4]) AS a", [2, 3]),
    ("SELECT arrayPushBack([1,2], 3) AS a", [1, 2, 3]),
    ("SELECT arrayPushFront([2,3], 1) AS a", [1, 2, 3]),
    ("SELECT arrayPopBack([1,2,3]) AS a", [1, 2]),
    ("SELECT arrayPopFront([1,2,3]) AS a", [2, 3]),
    ("SELECT arrayEnumerate(['a','b']) AS a", [1, 2]),
    ("SELECT arrayFirstIndex(x -> x > 1, [1,2,3]) AS a", 2),
    ("SELECT has([1,2,3], 2) AS a", True),
    ("SELECT hasAll([1,2,3], [1,3]) AS a", True),
    ("SELECT hasAll([1,2], [1,9]) AS a", False),
    ("SELECT hasAny([1,2], [2,9]) AS a", True),
    # range: end-EXCLUSIVE, empty when end <= start (sequence() alone would
    # include the end and auto-reverse on a descending range)
    ("SELECT range(4) AS a", [0, 1, 2, 3]),
    ("SELECT range(2, 5) AS a", [2, 3, 4]),
    ("SELECT range(0) AS a", []),
    ("SELECT range(5, 5) AS a", []),
    ("SELECT range(0, 10, 3) AS a", [0, 3, 6, 9]),
]


@pytest.mark.parametrize("sql,want", BRACKET_AND_ARRAY_GOLDENS)
def test_bracket_and_array_vocabulary(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    assert got == want, f"{sql}: got {got!r} want {want!r}"


SCALAR_GOLDENS = [
    ("SELECT tuple(1, 'a').2 AS a", "a"),
    ("SELECT plus(1, 2) AS a", 3),
    ("SELECT minus(5, 2) AS a", 3),
    ("SELECT multiply(2, 3) AS a", 6),
    ("SELECT negate(4) AS a", -4),
    ("SELECT CAST('7' AS UInt32) AS a", 7),
    ("SELECT CAST(1 AS String) AS a", "1"),
    ("SELECT accurateCast(1, 'String') AS a", "1"),
    ("SELECT assumeNotNull(3) AS a", 3),
    ("SELECT length(toFixedString('ab', 4)) AS a", 4),
]


@pytest.mark.parametrize("sql,want", SCALAR_GOLDENS)
def test_scalar_vocabulary(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    assert got == want, f"{sql}: got {got!r} want {want!r}"


# batch-3 vocabulary (probe-driven): stats/bit aggregates, float guards,
# map/tuple accessors, running array math, two-arg CAST
VOCAB3_GOLDENS = [
    ("SELECT CAST(1, 'String') AS a", "1"),
    ("SELECT arrayElement([1,2,3], -1) AS a", 3),
    ("SELECT tupleElement(tuple(1,'a'), 2) AS a", "a"),
    ("SELECT isNaN(double('nan')) AS a", True),
    ("SELECT isFinite(1.0) AS a", True),
    ("SELECT isFinite(double('inf')) AS a", False),
    ("SELECT isInfinite(double('inf')) AS a", True),
    ("SELECT ifNotFinite(double('inf'), 9.0) AS a", 9.0),
    ("SELECT ifNotFinite(2.0, 9.0) AS a", 2.0),
    ("SELECT toYYYYMM(toDate('2024-03-05')) AS a", 202403),
    ("SELECT toISOWeek(toDate('2024-01-10')) AS a", 2),
    ("SELECT arrayCumSum([1,2,3]) AS a", [1.0, 3.0, 6.0]),
    ("SELECT arrayCumSum([1.5,2.5]) AS a", [1.5, 4.0]),
    ("SELECT arrayDifference([1,4,9]) AS a", [0, 3, 5]),
    ("SELECT countEqual([1,2,1], 1) AS a", 2),
    ("SELECT bitCount(7) AS a", 3),
    ("SELECT stddevPop(x) AS a FROM (SELECT 1.0 AS x UNION ALL SELECT 3.0) t", 1.0),
    ("SELECT varSamp(x) AS a FROM (SELECT 1.0 AS x UNION ALL SELECT 3.0) t", 2.0),
    ("SELECT groupBitAnd(x) AS a FROM (SELECT 6 AS x UNION ALL SELECT 3) t", 2),
    ("SELECT groupBitOr(x) AS a FROM (SELECT 4 AS x UNION ALL SELECT 1) t", 5),
    ("SELECT base64Encode('ab') AS a", "YWI="),
    ("SELECT base64Decode('YWI=') AS a", "ab"),
    ("SELECT medianExact(x) AS a FROM (SELECT 1.0 AS x UNION ALL SELECT 3.0) t", 2.0),
    ("SELECT mapKeys(map('a', 1)) AS a", ["a"]),
    ("SELECT mapValues(map('a', 1)) AS a", [1]),
    ("SELECT mapContains(map('a', 1), 'b') AS a", False),
    ("SELECT sumDistinct(x) AS a FROM (SELECT 2 AS x UNION ALL SELECT 2) t", 2),
    ("SELECT timeSlot(toDateTime('2024-01-01 10:47:00')) AS a", "2024-01-01 10:30:00"),
]


@pytest.mark.parametrize("sql,want", VOCAB3_GOLDENS)
def test_vocabulary_batch3(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    if "timeSlot" in sql:
        got = str(got)
    assert got == want, f"{sql}: got {got!r} want {want!r}"


# batch-4: checked conversions, best-effort parse, tuple dot access,
# LIMIT offset,count / DISTINCT ON clause forms
VOCAB4_GOLDENS = [
    ("SELECT toInt32OrNull('xxx') AS a", None),
    ("SELECT toInt32OrNull('42') AS a", 42),
    ("SELECT toInt32OrZero('xxx') AS a", 0),
    ("SELECT toUInt64OrNull('7') AS a", 7),
    ("SELECT toFloat64OrZero('1.5') AS a", 1.5),
    ("SELECT toDateOrNull('nope') AS a", None),
    ("SELECT toDateOrZero('nope') AS a", "1970-01-01"),
    ("SELECT age('day', toDate('2024-01-01'), toDate('2024-02-01')) AS a", 31),
    ("SELECT toLastDayOfMonth(toDate('2024-02-15')) AS a", "2024-02-29"),
    ("SELECT toRelativeDayNum(toDate('1970-01-03')) AS a", 2),
    ("SELECT length(toString(generateUUIDv4())) AS a", 36),
    ("SELECT emptyArrayUInt8() AS a", []),
    ("SELECT emptyArrayString() AS a", []),
    # ident.digit tuple access; string literals are data, never rewritten
    ("SELECT x.1 AS a FROM (SELECT tuple(5, 6) AS x) t", 5),
    ("SELECT 'v1.5' AS a", "v1.5"),
    ("SELECT lagInFrame(x) OVER (ORDER BY x) AS a FROM (SELECT 1 AS x) t", None),
]


@pytest.mark.parametrize("sql,want", VOCAB4_GOLDENS)
def test_vocabulary_batch4(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    if "toLastDay" in sql or "toDateOrZero" in sql:
        got = str(got)
    assert got == want, f"{sql}: got {got!r} want {want!r}"


VOCAB5_GOLDENS = [
    ("SELECT anyHeavy(x) AS a FROM (SELECT 1 AS x UNION ALL SELECT 1 UNION ALL SELECT 2) t", 1),
    ("SELECT uniqTheta(x) AS a FROM (SELECT 1 AS x UNION ALL SELECT 2) t", 2),
    ("SELECT corrStable(x, x) AS a FROM (SELECT 1.0 AS x UNION ALL SELECT 2.0) t", 1.0),
    ("SELECT varPopStable(x) AS a FROM (SELECT 1.0 AS x UNION ALL SELECT 3.0) t", 1.0),
    # quantileExactLow picks the LOWER element for even n (real CH value;
    # batch 9 replaced the earlier interpolated-percentile deviation)
    ("SELECT quantileExactLow(0.5)(x) AS a FROM (SELECT 1.0 AS x UNION ALL SELECT 3.0) t", 1.0),
    ("SELECT avgWeighted(x, w) AS a FROM (SELECT 1.0 AS x, 1.0 AS w UNION ALL SELECT 3.0, 3.0) t", 2.5),
    ("SELECT splitByString('::', 'a::b::c') AS a", ["a", "b", "c"]),
    # separator is regex-ESCAPED: '.' splits on the dot, not on everything
    ("SELECT splitByString('.', 'a.b') AS a", ["a", "b"]),
    ("SELECT size(groupArray(2)(x)) AS a FROM (SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3) t", 2),
]


@pytest.mark.parametrize("sql,want", VOCAB5_GOLDENS)
def test_vocabulary_batch5(eng, sql, want):
    got = eng.sql(sql).first()["a"]
    assert got == want, f"{sql}: got {got!r} want {want!r}"


def test_distinct_on_and_limit_comma(eng):
    base = "(SELECT 1 AS x, 'a' AS s UNION ALL SELECT 1, 'b' UNION ALL SELECT 2, 'c') t"
    rows = eng.sql(f"SELECT DISTINCT ON (x) x, s FROM {base} ORDER BY x").collect()
    # one row per key; trailing ORDER BY applies AFTER the dedup
    assert [r["x"] for r in rows] == [1, 2]
    assert rows[1]["s"] == "c"
    rows = eng.sql(
        "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3) t "
        "ORDER BY x LIMIT 1, 2"
    ).collect()
    assert [r["x"] for r in rows] == [2, 3]  # LIMIT offset, count


def test_distinct_combinators(eng):
    r = eng.sql(
        "SELECT sumDistinct(x) AS s, avgDistinct(x) AS a, countDistinct(x) AS c "
        "FROM (SELECT 1 AS x UNION ALL SELECT 1 UNION ALL SELECT 3) t"
    ).first()
    assert (r["s"], r["a"], r["c"]) == (4, 2.0, 2)


def test_any_and_interval_and_week_functions(eng):
    assert eng.sql("SELECT any(x) AS a FROM (SELECT 5 AS x) t").first()["a"] == 5
    d = eng.sql("SELECT toDate('2024-01-10') + toIntervalDay(2) AS d").first()["d"]
    assert str(d) == "2024-01-12"
    # 2024-01-10 is a Wednesday: Monday-start week = Jan 8, Sunday-start = Jan 7
    assert str(eng.sql("SELECT toMonday(toDate('2024-01-10')) AS d").first()["d"]) == "2024-01-08"
    assert (
        str(eng.sql("SELECT toStartOfWeek(toDate('2024-01-10')) AS d").first()["d"])
        == "2024-01-07"
    )
    assert (
        str(eng.sql("SELECT toStartOfWeek(toDate('2024-01-10'), 1) AS d").first()["d"])
        == "2024-01-08"
    )


def test_flat_rewrites_skip_string_literals(eng):
    """A CH spelling inside a string constant is DATA: 'any(x)' must not
    become 'any_value(x)'. Matches are skipped when they START inside a
    literal; multi-quote rewrites (dictGet, JSONExtract) still fire because
    their match starts on the function name, outside any literal."""
    r = eng.sql(
        "SELECT 'any(x)' AS s, 'count()' AS c, any(x) AS a "
        "FROM (SELECT 7 AS x) t"
    ).first()
    assert (r["s"], r["c"], r["a"]) == ("any(x)", "count()", 7)
    r = eng.sql("SELECT countIf(s = 'uniq(y)') AS n FROM (SELECT 'uniq(y)' AS s) t").first()
    assert r["n"] == 1


def test_bracket_rewrite_leaves_strings_and_table_range_alone(eng):
    # bracket inside a string literal is data, not syntax
    assert eng.sql("SELECT '[1,2]' AS a").first()["a"] == "[1,2]"
    # numbers() expands to FROM range(N) — Spark's TABLE-valued range must
    # not be rewritten into the array builder
    assert eng.sql("SELECT count(*) AS c FROM numbers(10)").first()["c"] == 10
    # CAST anchored to the paren: an alias sharing a type name is untouched
    assert "AS Date," in translate_ch_sql("SELECT toDate(t) AS Date, x FROM v")


def test_simple_engine_families(eng):
    for name, fam in (("m_mem", "Memory"), ("m_log", "Log"), ("m_tiny", "TinyLog"),
                      ("m_stripe", "StripeLog")):
        eng.sql(f"CREATE TABLE {name} (x UInt32, s String) ENGINE = {fam}")
        eng.sql(f"INSERT INTO {name} VALUES (1, 'a'), (2, 'b')")
        assert eng.sql(f"SELECT count(*) AS c FROM {name}").first()["c"] == 2
        # round-trips through SHOW CREATE with its own family name
        ddl = eng.sql(f"SHOW CREATE TABLE {name}").first()[0]
        assert f"ENGINE = {fam}(" in ddl
    # no merge discipline: OPTIMIZE is a plain rewrite, rows unchanged
    eng.sql("OPTIMIZE TABLE m_mem")
    assert eng.sql("SELECT count(*) AS c FROM m_mem").first()["c"] == 2


def test_comment_clear_check_statements(eng):
    eng.sql(
        "CREATE TABLE cc (x UInt32, s String DEFAULT 'dflt', v Float64) "
        "ENGINE = MergeTree ORDER BY x"
    )
    eng.sql("INSERT INTO cc VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    eng.sql("ALTER TABLE cc COMMENT COLUMN s 'the label'")
    assert "COMMENT 'the label'" in eng.sql("SHOW CREATE TABLE cc").first()[0]
    # CLEAR resets to the declared DEFAULT where present...
    eng.sql("ALTER TABLE cc CLEAR COLUMN s")
    assert {r["s"] for r in eng.sql("SELECT s FROM cc").collect()} == {"dflt"}
    # ...and to the type's zero value otherwise (CH's contract)
    eng.sql("ALTER TABLE cc CLEAR COLUMN v")
    assert {r["v"] for r in eng.sql("SELECT v FROM cc").collect()} == {0.0}
    assert eng.sql("CHECK TABLE cc").first()["result"] == 1
    with pytest.raises(ValueError):
        eng.sql("ALTER TABLE cc CLEAR COLUMN nope")
    eng.sql("ALTER TABLE cc CLEAR COLUMN IF EXISTS nope")  # no-op, no raise


def test_star_apply_modifier(eng):
    eng.sql("CREATE TABLE ap (k UInt64, a Float64, b Float64) ENGINE = MergeTree ORDER BY k")
    eng.sql("INSERT INTO ap VALUES (1, 1.5, 2.5), (2, 3.5, 4.5)")
    r = eng.sql("SELECT * APPLY(sum) FROM ap").first()
    assert (r["sum(k)"], r["sum(a)"], r["sum(b)"]) == (3, 5.0, 7.0)
    df = eng.sql("SELECT * EXCEPT (k) APPLY(max) FROM ap")
    assert df.columns == ["max(a)", "max(b)"]  # CH's result-column naming
    assert tuple(df.first()) == (3.5, 4.5)
    with pytest.raises(NotImplementedError):
        eng.sql("SELECT * APPLY(sum) FROM (SELECT 1 AS x) t JOIN ap ON true")


def test_with_fill_interpolate(eng):
    eng.sql("CREATE TABLE fi (k UInt64, a Float64) ENGINE = MergeTree ORDER BY k")
    eng.sql("INSERT INTO fi VALUES (1, 1.5), (2, 3.5), (5, 9.0)")
    rows = eng.sql(
        "SELECT k AS x, max(a) AS v FROM fi GROUP BY k "
        "ORDER BY x WITH FILL FROM 1 TO 7 INTERPOLATE (v)"
    ).collect()
    got = [(r["x"], r["v"]) for r in rows]
    # filled rows carry the previous present value forward; present rows
    # keep their own values (CH INTERPOLATE default)
    assert got == [(1, 1.5), (2, 3.5), (3, 3.5), (4, 3.5), (5, 9.0), (6, 9.0)]
    with pytest.raises(NotImplementedError):
        eng.sql(
            "SELECT k AS x, max(a) AS v FROM fi GROUP BY k "
            "ORDER BY x WITH FILL INTERPOLATE (v AS v + 1)"
        )


def test_add_column_position_and_modify_default(eng):
    eng.sql("CREATE TABLE acp (k UInt64, v Float64) ENGINE = MergeTree ORDER BY k")
    eng.sql("INSERT INTO acp VALUES (1, 1.0)")
    eng.sql("ALTER TABLE acp ADD COLUMN s String AFTER k")
    eng.sql("ALTER TABLE acp ADD COLUMN z UInt32 FIRST")
    assert eng.read_table("acp").columns == ["z", "k", "s", "v"]
    with pytest.raises(ValueError, match="no such column"):
        eng.sql("ALTER TABLE acp ADD COLUMN q UInt32 AFTER ghost")
    # MODIFY COLUMN DEFAULT changes the read-path fill only
    eng.sql("ALTER TABLE acp MODIFY COLUMN v DEFAULT 7.5")
    eng.sql("INSERT INTO acp (k) VALUES (9)")
    assert eng.sql("SELECT v FROM acp WHERE k = 9").first()["v"] == 7.5
    assert eng.sql("SELECT v FROM acp WHERE k = 1").first()["v"] == 1.0  # stored untouched
    eng.sql("ALTER TABLE acp MODIFY COLUMN v REMOVE DEFAULT")
    assert "DEFAULT 7.5" not in eng.sql("SHOW CREATE TABLE acp").first()[0]


def test_transform_value_mapping_and_case_with_expression(eng):
    # CH transform: 3/4-arg value mapping; 2-arg stays Spark's HOF
    assert eng.sql("SELECT transform(2, [1,2], ['a','b'], 'z') AS a").first()["a"] == "b"
    assert eng.sql("SELECT transform(9, [1,2], ['a','b'], 'z') AS a").first()["a"] == "z"
    assert eng.sql("SELECT transform(5, [1,2], [10,20]) AS a").first()["a"] == 5
    assert eng.sql("SELECT transform([1,2], x -> x + 1) AS a").first()["a"] == [2, 3]
    assert eng.sql("SELECT caseWithExpression(2, 1, 'a', 2, 'b', 'z') AS a").first()["a"] == "b"
    assert (
        eng.sql("SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS a").first()["a"]
        == "61f0c404-5cb3-11e7-907b-a6006ad3dba0"
    )


def test_set_settings_temp_table_nested_cast(eng):
    eng.sql("SET max_threads = 8")
    eng.sql("SET join_algorithm = 'hash'")
    rows = eng.sql("SELECT name, value, changed FROM system.settings ORDER BY name").collect()
    assert [(r["name"], r["value"], r["changed"]) for r in rows] == [
        ("join_algorithm", "hash", 1),
        ("max_threads", "8", 1),
    ]
    # TEMPORARY is accepted (session scoping documented as a deviation)
    eng.sql("CREATE TEMPORARY TABLE tt5d (x UInt32) ENGINE = Memory")
    eng.sql("INSERT INTO tt5d VALUES (4)")
    assert eng.sql("SELECT x FROM tt5d").first()["x"] == 4
    # parameterized CH types inside CAST
    assert eng.sql("SELECT CAST([1,2] AS Array(Int64)) AS a").first()["a"] == [1, 2]
    assert eng.sql("SELECT CAST(5 AS Nullable(Int64)) AS a").first()["a"] == 5


def test_detach_attach_table(eng):
    """DETACH TABLE removes the table from the active catalog keeping meta
    + data on disk; ATTACH restores it intact (CH's table-level contract,
    sibling of the existing DETACH/ATTACH PARTITION surface)."""
    eng.sql("CREATE TABLE dt (k UInt64, v Float64) ENGINE = MergeTree ORDER BY k")
    eng.sql("INSERT INTO dt VALUES (1, 1.0), (2, 2.0)")
    eng.sql("DETACH TABLE dt")
    assert "dt" not in [r["name"] for r in eng.sql("SHOW TABLES").collect()]
    with pytest.raises(Exception):
        eng.sql("SELECT count(*) FROM dt").collect()
    # name is free for ATTACH only — re-CREATE would collide on the data
    # path, and CH also refuses CREATE over a detached table's directory
    eng.sql("ATTACH TABLE dt")
    assert eng.sql("SELECT count(*) AS c FROM dt").first()["c"] == 2
    eng.sql("INSERT INTO dt VALUES (3, 3.0)")
    assert eng.sql("SELECT count(*) AS c FROM dt").first()["c"] == 3
    eng.sql("DETACH TABLE IF EXISTS ghost")  # no-op
    with pytest.raises(Exception):
        eng.sql("DETACH TABLE ghost")
    with pytest.raises(ValueError):
        eng.sql("ATTACH TABLE dt")  # already attached
    with pytest.raises(ValueError):
        eng.sql("ATTACH TABLE ghost")  # nothing detached under that name


def test_system_noops_and_processlist(eng):
    # ops-runbook statements: accepted, no effect to observe beyond success
    for s in (
        "SYSTEM FLUSH LOGS",
        "SYSTEM DROP MARK CACHE",
        "SYSTEM DROP UNCOMPRESSED CACHE",
        "SYSTEM DROP DNS CACHE",
        "SYSTEM RELOAD CONFIG",
        "SYSTEM RELOAD DICTIONARIES",
    ):
        eng.sql(s)
    with pytest.raises(ValueError):
        eng.sql("SYSTEM RELOAD DICTIONARY nonexistent")
    df = eng.sql("SHOW PROCESSLIST")
    assert df.columns == ["query", "elapsed", "user"] and df.count() == 0


def test_rename_column_mutation(eng):
    """RENAME COLUMN: CH does this O(1)-metadata; this engine rewrites the
    parts (documented deviation in Engine.rename_column) with identical
    observable semantics — old name gone, new name queryable, sort keys
    and DEFAULT/COMMENT metadata follow, later inserts keep working."""
    eng.sql(
        "CREATE TABLE rn (k UInt64, val Float64 DEFAULT 9.0, s String) "
        "ENGINE = MergeTree ORDER BY (k, val)"
    )
    eng.sql("INSERT INTO rn VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    eng.sql("ALTER TABLE rn COMMENT COLUMN val 'amount'")
    eng.sql("ALTER TABLE rn RENAME COLUMN val TO price")
    assert eng.sql("SELECT price FROM rn WHERE k = 1").first()["price"] == 1.5
    with pytest.raises(Exception):
        eng.sql("SELECT val FROM rn").collect()
    # inserts after the rename land under the new name in the same parts dirs
    eng.sql("INSERT INTO rn VALUES (3, 3.5, 'c')")
    assert eng.sql("SELECT sum(price) AS p FROM rn").first()["p"] == 7.5
    ddl = eng.sql("SHOW CREATE TABLE rn").first()[0]
    assert "price Float64 DEFAULT 9.0 COMMENT 'amount'" in ddl
    assert "ORDER BY (k, price)" in ddl
    # guards: duplicate target, partition column, IF EXISTS no-op
    with pytest.raises(ValueError):
        eng.sql("ALTER TABLE rn RENAME COLUMN k TO price")
    eng.sql("ALTER TABLE rn RENAME COLUMN IF EXISTS ghost TO x")
