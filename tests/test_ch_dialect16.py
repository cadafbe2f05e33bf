"""Dialect batch 16 (probe-driven, clause-level): row-generator table
functions (zeros / numbers_mt / null), LIMIT BY offset forms + trailing
outer LIMIT, the * REPLACE and COLUMNS(...) APPLY column transformers, and
the ASOF JOIN ... USING shorthand."""

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    e = Engine(spark, str(tmp_path_factory.mktemp("wh16")))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.createOrReplaceTempView("ev16")
    ev.select("user_id", "ts", "value").filter(F.col("user_id") < 50).createOrReplaceTempView(
        "quotes16"
    )
    return e


def test_zeros_and_numbers_mt(eng):
    r = eng.sql("SELECT count() AS c, sum(zero) AS s FROM zeros(7)").collect()[0]
    assert (r["c"], r["s"]) == (7, 0)
    assert eng.sql("SELECT count() AS c FROM zeros_mt(3)").collect()[0]["c"] == 3
    assert eng.sql("SELECT count() AS c FROM numbers_mt(10)").collect()[0]["c"] == 10
    assert eng.sql("SELECT max(number) AS m FROM numbers_mt(5)").collect()[0]["m"] == 4


def test_null_table_function(eng):
    df = eng.sql("SELECT * FROM null('x UInt32, s String')")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["x", "s"]
    assert df.schema["x"].dataType.simpleString() == "int"  # parse_ch_type(UInt32)
    with pytest.raises(NotImplementedError, match="name Type"):
        eng.sql("SELECT * FROM null('justaname')").collect()


def test_limit_by_offset_forms(eng, spark):
    base = "SELECT user_id, value FROM ev16 ORDER BY user_id, value"
    # per user: skip the smallest value, keep the next one
    off_form = eng.sql(f"{base} LIMIT 1 OFFSET 1 BY user_id LIMIT 4").collect()
    comma_form = eng.sql(f"{base} LIMIT 1, 1 BY user_id LIMIT 4").collect()
    assert [tuple(r) for r in off_form] == [tuple(r) for r in comma_form]
    assert len(off_form) == 4
    # verify against a window twin
    from pyspark.sql import Window

    ev = spark.table("ev16").select("user_id", "value")
    w = Window.partitionBy("user_id").orderBy("user_id", "value")
    want = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 2)
        .orderBy("user_id", "value")
        .limit(4)
        .select("user_id", "value")
        .collect()
    )
    assert [tuple(r) for r in off_form] == [tuple(r) for r in want]


def test_star_replace(eng):
    got = eng.sql(
        "SELECT * REPLACE (value * 0 AS value) FROM ev16 LIMIT 3"
    ).collect()
    assert all(r["value"] == 0 for r in got)
    cols = eng.sql("SELECT * FROM ev16 LIMIT 1").columns
    assert eng.sql("SELECT * REPLACE (value * 0 AS value) FROM ev16 LIMIT 1").columns == cols
    # EXCEPT + REPLACE compose
    got = eng.sql(
        "SELECT * EXCEPT (props) REPLACE (user_id + 1000000 AS user_id) "
        "FROM ev16 LIMIT 2"
    )
    assert "props" not in got.columns and "user_id" in got.columns
    assert all(r["user_id"] >= 1000000 for r in got.collect())
    with pytest.raises(ValueError, match="no such column"):
        eng.sql("SELECT * REPLACE (1 AS nope) FROM ev16 LIMIT 1").collect()
    with pytest.raises(NotImplementedError, match="expr AS col"):
        eng.sql("SELECT * REPLACE (value) FROM ev16 LIMIT 1").collect()


def test_columns_apply(eng, spark):
    got = eng.sql("SELECT COLUMNS('^(value|user_id)$') APPLY (max) FROM ev16").collect()[0]
    ev = spark.table("ev16")
    want = ev.agg(F.max("value"), F.max("user_id")).collect()[0]
    assert got["max(value)"] == want[0] and got["max(user_id)"] == want[1]
    with pytest.raises(ValueError, match="no column matches"):
        eng.sql("SELECT COLUMNS('zzz') APPLY (sum) FROM ev16").collect()


def test_asof_using_equals_on_form(eng):
    using = eng.sql(
        "SELECT count() AS c, sum(value_asof) AS s FROM ev16 "
        "ASOF JOIN quotes16 USING (user_id, ts)"
    ).collect()[0]
    on_form = eng.sql(
        "SELECT count() AS c, sum(value_asof) AS s FROM ev16 a "
        "ASOF JOIN quotes16 q ON a.user_id = q.user_id AND a.ts >= q.ts"
    ).collect()[0]
    assert tuple(using) == tuple(on_form)
    assert using["c"] > 0


def test_asof_using_multi_key_refuses(eng):
    with pytest.raises(NotImplementedError, match="exactly \\(key, ts\\)"):
        eng.sql(
            "SELECT count() AS c FROM ev16 ASOF JOIN quotes16 "
            "USING (user_id, value, ts)"
        ).collect()


# ---------------------------------------------------------------------------
# admin surface: db-qualified reads, FREEZE snapshots, comments, SHOW forms


@pytest.fixture()
def admin_eng(spark, tmp_path):
    from clickhousedatamocker_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.sql("CREATE TABLE adm (id UInt64, v Float64) ENGINE = MergeTree() ORDER BY id")
    e.sql("INSERT INTO adm VALUES (1, 1.5), (2, 2.5)")
    return e


def test_db_qualified_select(admin_eng):
    assert admin_eng.sql("SELECT count() AS c FROM default.adm").collect()[0]["c"] == 2
    # unknown database does NOT rewrite (falls through to Spark's error)
    with pytest.raises(Exception, match="nosuchdb|TABLE_OR_VIEW_NOT_FOUND"):
        admin_eng.sql("SELECT count() AS c FROM nosuchdb.adm").collect()


def test_db_qualified_rewrite_leaves_string_literals(admin_eng):
    # a db.table spelling INSIDE a string literal is data: it must survive
    # verbatim even when db/table resolve (round-6 advisory — the bare
    # pat.sub used to corrupt the value to 'removed FROM adm')
    r = admin_eng.sql(
        "SELECT 'removed FROM default.adm' AS s, count() AS c FROM default.adm"
    ).collect()[0]
    assert r["s"] == "removed FROM default.adm"
    assert r["c"] == 2


def test_freeze_and_restore_roundtrip(admin_eng):
    r = admin_eng.sql("ALTER TABLE adm FREEZE").collect()[0]
    assert r["parts_copied"] > 0 and "/shadow/1/" in r["shadow_path"]
    shadow_dir = r["shadow_path"].rsplit("/adm", 1)[0]
    admin_eng.sql("DROP TABLE adm")
    admin_eng.sql(f"RESTORE TABLE adm FROM '{shadow_dir}'")
    assert admin_eng.sql("SELECT count() AS c FROM adm").collect()[0]["c"] == 2
    # a second freeze lands in increment 2
    r2 = admin_eng.sql("ALTER TABLE adm FREEZE").collect()[0]
    assert "/shadow/2/" in r2["shadow_path"]


def test_freeze_partition_scoped(admin_eng):
    admin_eng.sql(
        "CREATE TABLE admp (id UInt64, event_time DateTime) ENGINE = MergeTree() "
        "PARTITION BY toYYYYMMDDhh(event_time) ORDER BY id"
    )
    admin_eng.sql(
        "INSERT INTO admp VALUES (1, '2026-01-01 10:00:00'), (2, '2026-01-01 11:00:00')"
    )
    parts = [
        r[0]
        for r in admin_eng.sql(
            "SELECT DISTINCT partition FROM system.parts WHERE table = 'admp'"
        ).collect()
    ]
    assert len(parts) == 2
    r = admin_eng.sql(f"ALTER TABLE admp FREEZE PARTITION '{parts[0]}'").collect()[0]
    assert r["parts_copied"] >= 1
    with pytest.raises(ValueError, match="no such partition"):
        admin_eng.sql("ALTER TABLE admp FREEZE PARTITION '1999010100'").collect()
    # quoted partition values with dots/spaces/colons parse (DateTime- or
    # Decimal-keyed partitions, round-6 advisory): the statement reaches
    # _freeze_table's own validation instead of the generic SQL path
    with pytest.raises(ValueError, match="no such partition"):
        admin_eng.sql(
            "ALTER TABLE admp FREEZE PARTITION '2026-01-01 10:00:00'"
        ).collect()
    with pytest.raises(ValueError, match="no such partition"):
        admin_eng.sql("ALTER TABLE admp FREEZE PARTITION '3.14'").collect()


def test_modify_comment_and_show_forms(admin_eng):
    admin_eng.sql("ALTER TABLE adm MODIFY COMMENT 'fact table'")
    assert (
        admin_eng.catalog._read_meta("adm").get("comment") == "fact table"
    )
    st = admin_eng.sql("SHOW CREATE DATABASE default").collect()[0]["statement"]
    assert st.startswith("CREATE DATABASE default")
    with pytest.raises(ValueError, match="does not exist"):
        admin_eng.sql("SHOW CREATE DATABASE nope").collect()
    assert admin_eng.sql("SHOW DICTIONARIES").columns == ["name"]
    with pytest.raises(NotImplementedError, match="UNDROP"):
        admin_eng.sql("UNDROP TABLE adm").collect()


# ---------------------------------------------------------------------------
# INSERT payload forms: inline (interactive paste) and FROM INFILE


def test_insert_inline_payloads_and_infile(admin_eng, tmp_path):
    e = admin_eng
    e.sql("CREATE TABLE ins16 (id UInt64, s String) ENGINE = MergeTree() ORDER BY id")
    e.sql('INSERT INTO ins16 FORMAT JSONEachRow {"id": 1, "s": "a"}\n{"id": 2, "s": "b"}')
    e.sql("INSERT INTO ins16 FORMAT Values (3, 'c')")
    e.sql("INSERT INTO ins16 FORMAT TabSeparated\n4\td")
    e.sql("INSERT INTO ins16 FORMAT CSV\n5,e")
    f = tmp_path / "payload.csv"
    f.write_text("6,f\n7,g\n")
    e.sql(f"INSERT INTO ins16 FROM INFILE '{f}' FORMAT CSV")
    got = [tuple(r) for r in e.sql("SELECT * FROM ins16 ORDER BY id").collect()]
    assert got == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f"), (7, "g"),
    ]
    with pytest.raises(ValueError, match="does not exist"):
        e.sql("INSERT INTO ins16 FROM INFILE '/tmp/__nope__.csv' FORMAT CSV")
    # external-payload form still requires its data argument
    with pytest.raises(ValueError, match="needs the payload"):
        e.sql("INSERT INTO ins16 FORMAT CSV")


def test_inline_payload_preserves_comment_like_data(admin_eng, tmp_path):
    """The review-found corruption class: '--' and trailing ';' inside
    inline payload data must land verbatim (clickhouse-client treats
    everything after the FORMAT line as raw data)."""
    e = admin_eng
    e.sql("CREATE TABLE ins16b (id UInt64, s String) ENGINE = MergeTree() ORDER BY id")
    e.sql("INSERT INTO ins16b FORMAT CSV\n1,a--b\n2,c;")
    e.sql('INSERT INTO ins16b FORMAT JSONEachRow {"id": 3, "s": "x--y"}')
    # TSV payload whose first field of a row is empty (legal TSV)
    e.sql("CREATE TABLE ins16c (a String, b String) ENGINE = MergeTree() ORDER BY b")
    e.sql("INSERT INTO ins16c FORMAT TabSeparated\n\tv1\nk2\tv2")
    got = {r["id"]: r["s"] for r in e.sql("SELECT * FROM ins16b").collect()}
    assert got == {1: "a--b", 2: "c;", 3: "x--y"}
    pairs = sorted(
        ((r["a"] or "", r["b"]) for r in e.sql("SELECT * FROM ins16c").collect()),
    )
    assert pairs == [("", "v1"), ("k2", "v2")]


def test_star_replace_vs_scalar_replace_and_columns_apply_with_extract(admin_eng):
    """Disambiguation fixes: arithmetic times the scalar replace() is NOT
    the star transformer, and a function-internal FROM (EXTRACT/trim) is
    NOT a table source."""
    e = admin_eng
    got = e.sql(
        "SELECT length(replace(s, '-', '')) AS n FROM "
        "(SELECT '-a-b-' AS s)"
    ).collect()[0]["n"]
    assert got == 2
    # scalar replace right after '*' (multiplication) passes through
    got = e.sql(
        "SELECT 2 * length(replace(s, '-', '')) AS n FROM (SELECT '-a-' AS s)"
    ).collect()[0]["n"]
    assert got == 2
    e.sql(
        "CREATE TABLE rx16 (id UInt64, event_time DateTime) "
        "ENGINE = MergeTree() ORDER BY id"
    )
    e.sql("INSERT INTO rx16 VALUES (1, '2026-03-01 10:00:00')")
    got = e.sql(
        "SELECT COLUMNS('^id$') APPLY (max), EXTRACT(MONTH FROM event_time) AS m "
        "FROM rx16 GROUP BY m"
    ).collect()[0]
    assert got["max(id)"] == 1 and got["m"] == 3


def test_null_table_function_parameterized_types(admin_eng):
    df = admin_eng.sql("SELECT * FROM null('a Decimal(10, 2), m Map(String, UInt8)')")
    assert df.count() == 0 and df.columns == ["a", "m"]
