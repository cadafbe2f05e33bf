"""Round-5 dialect batch 2: ARRAY JOIN clause, scalar WITH aliases,
file() and merge() table functions — all through Engine.sql, the CH
spellings a migrating user types verbatim."""

import pytest
from pyspark.sql import types as T

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture()
def aj_view(spark):
    spark.createDataFrame(
        [(1, [10, 20], ["a", "b"]), (2, [30], ["c"]), (3, [], [])],
        "id int, arr array<int>, tag array<string>",
    ).createOrReplaceTempView("aj_t")
    return "aj_t"


def test_array_join_clause_forms(spark, tmp_warehouse, aj_view):
    e = Engine(spark, tmp_warehouse)
    # aliased single array
    got = [
        (r["id"], r["x"])
        for r in e.sql("SELECT id, x FROM aj_t ARRAY JOIN arr AS x ORDER BY id, x").collect()
    ]
    assert got == [(1, 10), (1, 20), (2, 30)]
    # bare column: CH rebinds the NAME to the element
    got = [
        (r["id"], r["arr"])
        for r in e.sql(
            "SELECT id, arr FROM aj_t ARRAY JOIN arr WHERE arr > 10 ORDER BY id, arr"
        ).collect()
    ]
    assert got == [(1, 20), (2, 30)]
    # LEFT ARRAY JOIN keeps empty-array rows (element NULL)
    got = [
        (r["id"], r["x"])
        for r in e.sql(
            "SELECT id, x FROM aj_t LEFT ARRAY JOIN arr AS x ORDER BY id, x"
        ).collect()
    ]
    assert got == [(1, 10), (1, 20), (2, 30), (3, None)]
    # multiple arrays zip positionally
    got = [
        (r["id"], r["x"], r["y"])
        for r in e.sql(
            "SELECT id, x, y FROM aj_t ARRAY JOIN arr AS x, tag AS y ORDER BY id, x"
        ).collect()
    ]
    assert got == [(1, 10, "a"), (1, 20, "b"), (2, 30, "c")]
    # expression item requires an alias
    with pytest.raises(NotImplementedError, match="alias"):
        e.sql("SELECT id FROM aj_t ARRAY JOIN arraySort(arr)")
    # the spelling inside a string literal is untouched
    row = e.sql("SELECT 'ARRAY JOIN arr' AS s FROM aj_t LIMIT 1").first()
    assert row["s"] == "ARRAY JOIN arr"


def test_scalar_with_aliases(spark, tmp_warehouse, aj_view):
    e = Engine(spark, tmp_warehouse)
    got = [
        r["v"]
        for r in e.sql(
            "WITH 2 AS two, two * 10 AS twenty SELECT id * two + twenty AS v "
            "FROM aj_t ORDER BY v"
        ).collect()
    ]
    assert got == [22, 24, 26]
    # alias usable in WHERE
    n = e.sql(
        "WITH 1 + 1 AS lim SELECT count(*) AS n FROM aj_t WHERE id > lim"
    ).first()["n"]
    assert n == 1
    # CTE form passes through to Spark untouched
    assert e.sql("WITH c AS (SELECT 41 AS x) SELECT x + 1 AS y FROM c").first()["y"] == 42


def test_file_table_function(spark, tmp_warehouse, tmp_path):
    e = Engine(spark, tmp_warehouse)
    pq = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string").write.parquet(pq)
    assert e.sql(f"SELECT count(*) AS n FROM file('{pq}')").first()["n"] == 2
    # TSV with CH structure string
    tsv = tmp_path / "t.tsv"
    tsv.write_text("5\thello\n6\tworld\n")
    got = [
        (r["id"], r["s"])
        for r in e.sql(
            f"SELECT id, s FROM file('{tsv}', 'TabSeparated', 'id UInt64, s String') ORDER BY id"
        ).collect()
    ]
    assert got == [(5, "hello"), (6, "world")]
    # non-self-describing format without structure is loud, not inferred
    with pytest.raises(ValueError, match="structure"):
        e.sql(f"SELECT * FROM file('{tsv}', 'TabSeparated')")
    with pytest.raises(ValueError, match="FORMAT"):
        e.sql(f"SELECT * FROM file('{tmp_path}/x.bin')")


def test_merge_table_function(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    for t in ("mt_a", "mt_b", "other"):
        e.sql(f"CREATE TABLE {t} (k UInt64, v Float64) ENGINE = MergeTree() ORDER BY k")
        e.sql(f"INSERT INTO {t} VALUES (1, 1.0), (2, 2.0)")
    e.sql("INSERT INTO mt_b VALUES (3, 3.0)")
    got = [
        (r["_table"], r["n"])
        for r in e.sql(
            "SELECT _table, count(*) AS n FROM merge('^mt_') GROUP BY _table ORDER BY _table"
        ).collect()
    ]
    assert got == [("mt_a", 2), ("mt_b", 3)]
    # two-arg (db, regex) spelling; regex re-resolves per statement
    e.sql("CREATE TABLE mt_c (k UInt64, v Float64) ENGINE = MergeTree() ORDER BY k")
    e.sql("INSERT INTO mt_c VALUES (9, 9.0)")
    n = e.sql("SELECT count(*) AS n FROM merge('default', '^mt_')").first()["n"]
    assert n == 6
    with pytest.raises(ValueError, match="no catalog table"):
        e.sql("SELECT * FROM merge('^nope_')")
