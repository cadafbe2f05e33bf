"""CH projections: ALTER TABLE ADD/DROP/MATERIALIZE PROJECTION with
automatic query routing (scoped to decomposable aggregates and sort-copy
column subsets — see engine._rewrite_projection_reads docstring).

Grading: every routed answer is checked for exact equality against the
same query computed on the base table with routing structurally
impossible (projection dropped), plus EXPLAIN SYNTAX pins that routing
actually happened."""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    e.sql(
        "CREATE TABLE hits (region String, site String, amount Float64, ts UInt64) "
        "ENGINE = MergeTree() ORDER BY ts"
    )
    e.sql(
        "INSERT INTO hits VALUES "
        "('eu', 'a', 1.0, 1), ('eu', 'b', 2.0, 2), ('us', 'a', 3.0, 3), "
        "('us', 'b', 4.0, 4), ('ap', 'a', 5.0, 5)"
    )
    return e


AGG_Q = (
    "SELECT region, count(*) AS n, sum(amount) AS s, avg(amount) AS a "
    "FROM hits GROUP BY region ORDER BY region"
)


def test_aggregate_projection_routes_and_matches_base(eng):
    base = [tuple(r) for r in eng.sql(AGG_Q).collect()]
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_region "
        "(SELECT region, count(*) AS cnt, sum(amount) AS sum_amount GROUP BY region)"
    )
    # non-empty base, not yet materialized -> MUST still answer from base
    assert [tuple(r) for r in eng.sql(AGG_Q).collect()] == base
    syntax = "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {AGG_Q}").collect())
    assert "__proj_" not in syntax

    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_region")
    syntax = "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {AGG_Q}").collect())
    assert "__proj_hits_by_region" in syntax  # routing engaged
    assert [tuple(r) for r in eng.sql(AGG_Q).collect()] == base

    # new inserts maintain the projection incrementally (partials re-merge)
    eng.sql("INSERT INTO hits VALUES ('eu', 'c', 10.0, 6), ('sa', 'a', 7.0, 7)")
    eng.sql("ALTER TABLE hits DROP PROJECTION by_region")
    want = [tuple(r) for r in eng.sql(AGG_Q).collect()]  # base truth, no routing
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_region "
        "(SELECT region, count(*) AS cnt, sum(amount) AS sum_amount GROUP BY region)"
    )
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_region")
    eng.sql("INSERT INTO hits VALUES ('eu', 'd', 0.5, 8)")
    got = [tuple(r) for r in eng.sql(AGG_Q).collect()]
    eng.sql("ALTER TABLE hits DROP PROJECTION by_region")
    assert got == [tuple(r) for r in eng.sql(AGG_Q).collect()]
    assert want != got  # the extra insert changed the answer (non-vacuous)


def test_projection_routing_respects_where_and_subset_keys(eng):
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_rs "
        "(SELECT region, site, count(*) AS cnt, sum(amount) AS sum_amount "
        "GROUP BY region, site)"
    )
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_rs")
    q = (
        "SELECT region, sum(amount) AS s FROM hits "
        "WHERE site = 'a' GROUP BY region ORDER BY region"
    )
    syntax = "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {q}").collect())
    assert "__proj_hits_by_rs" in syntax  # subset GROUP BY + key-only WHERE route
    got = [tuple(r) for r in eng.sql(q).collect()]
    eng.sql("ALTER TABLE hits DROP PROJECTION by_rs")
    assert got == [tuple(r) for r in eng.sql(q).collect()]


def test_projection_not_routed_outside_surface(eng):
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_region "
        "(SELECT region, count(*) AS cnt GROUP BY region)"
    )
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_region")
    for q in (
        # WHERE on a non-key column
        "SELECT region, count(*) AS n FROM hits WHERE amount > 2 GROUP BY region",
        # un-aliased aggregate
        "SELECT region, count(*) FROM hits GROUP BY region",
        # aggregate the projection doesn't store
        "SELECT region, min(amount) AS m FROM hits GROUP BY region",
    ):
        syntax = "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {q}").collect())
        assert "__proj_" not in syntax, q
        eng.sql(q).collect()  # and the base query still runs


def test_sort_projection_routes_column_subset(eng):
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_site "
        "(SELECT site, amount ORDER BY site)"
    )
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_site")
    q = "SELECT site, amount FROM hits WHERE site = 'b' ORDER BY amount"
    syntax = "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {q}").collect())
    assert "__proj_hits_by_site" in syntax
    got = [tuple(r) for r in eng.sql(q).collect()]
    eng.sql("ALTER TABLE hits DROP PROJECTION by_site")
    assert got == [tuple(r) for r in eng.sql(q).collect()]
    # a column outside the projection keeps the query on base
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_site (SELECT site, amount ORDER BY site)"
    )
    syntax = "\n".join(
        r[0] for r in eng.sql("EXPLAIN SYNTAX SELECT site, ts FROM hits").collect()
    )
    assert "__proj_" not in syntax


def test_projection_lifecycle_guards(eng):
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION p1 (SELECT region, count(*) AS cnt GROUP BY region)"
    )
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TABLE hits ADD PROJECTION p1 (SELECT region, count(*) AS cnt GROUP BY region)")
    eng.sql("ALTER TABLE hits ADD PROJECTION IF NOT EXISTS p1 (SELECT region, count(*) AS cnt GROUP BY region)")
    with pytest.raises(NotImplementedError, match="RENAME"):
        eng.sql("RENAME TABLE hits TO hits2")
    with pytest.raises(ValueError, match="no projection"):
        eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION nope")
    # DROP TABLE cascades the hidden backing table
    hidden = "__proj_hits_p1"
    assert eng.catalog.exists(hidden)
    eng.sql("DROP TABLE hits")
    assert not eng.catalog.exists(hidden)
    with pytest.raises(NotImplementedError, match="surface"):
        e2 = eng
        e2.sql("CREATE TABLE t2 (k UInt64, v Float64) ENGINE = MergeTree() ORDER BY k")
        e2.sql("ALTER TABLE t2 ADD PROJECTION bad (SELECT k, approx_count_distinct(v) AS u GROUP BY k)")


def test_mutations_invalidate_projection_routing(eng):
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_region "
        "(SELECT region, count(*) AS cnt, sum(amount) AS sum_amount GROUP BY region)"
    )
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_region")
    assert "__proj_" in "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {AGG_Q}").collect())
    eng.sql("DELETE FROM hits WHERE region = 'eu'")
    # stale projection must NOT be routed — answers come from base, correct
    syntax = "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {AGG_Q}").collect())
    assert "__proj_" not in syntax
    got = {r["region"]: r["n"] for r in eng.sql(AGG_Q).collect()}
    assert "eu" not in got and got == {"ap": 1, "us": 2}
    # MATERIALIZE re-syncs and re-enables routing, same answers
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_region")
    assert "__proj_" in "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {AGG_Q}").collect())
    assert {r["region"]: r["n"] for r in eng.sql(AGG_Q).collect()} == got


def test_projection_maintenance_survives_new_engine(spark, tmp_warehouse):
    """A second Engine over the same warehouse (a new CLI process) must keep
    maintaining projections — otherwise the persisted materialized flag
    routes queries to a silently stale backing table."""
    e1 = Engine(spark, tmp_warehouse)
    e1.sql("CREATE TABLE t2 (r String, v Float64) ENGINE = MergeTree() ORDER BY r")
    e1.sql("ALTER TABLE t2 ADD PROJECTION p (SELECT r, sum(v) AS sum_v GROUP BY r)")
    e1.sql("INSERT INTO t2 VALUES ('a', 1.0)")

    e2 = Engine(spark, tmp_warehouse)  # fresh in-memory state
    e2.sql("INSERT INTO t2 VALUES ('a', 2.0), ('b', 5.0)")
    q = "SELECT r, sum(v) AS s FROM t2 GROUP BY r ORDER BY r"
    syntax = "\n".join(x[0] for x in e2.sql(f"EXPLAIN SYNTAX {q}").collect())
    assert "__proj_t2_p" in syntax  # still routed...
    assert [tuple(r) for r in e2.sql(q).collect()] == [("a", 3.0), ("b", 5.0)]


def test_projection_tail_aggregates_not_routed(eng):
    eng.sql(
        "ALTER TABLE hits ADD PROJECTION by_region "
        "(SELECT region, count(*) AS cnt GROUP BY region)"
    )
    eng.sql("ALTER TABLE hits MATERIALIZE PROJECTION by_region")
    # raw aggregate in ORDER BY would evaluate over partial rows -> no route
    q1 = "SELECT region, count(*) AS n FROM hits GROUP BY region ORDER BY count(*) DESC"
    assert "__proj_" not in "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {q1}").collect())
    eng.sql(q1).collect()
    # ORDER BY an agg ALIAS is fine (the alias re-merges) -> routed, correct
    q2 = "SELECT region, count(*) AS n FROM hits GROUP BY region ORDER BY n DESC, region"
    assert "__proj_" in "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {q2}").collect())
    assert [tuple(r) for r in eng.sql(q2).collect()] == [("eu", 2), ("us", 2), ("ap", 1)]
    # sort projection: ORDER BY a non-projection column stays on base
    eng.sql("ALTER TABLE hits ADD PROJECTION by_site (SELECT site, amount ORDER BY site)")
    q3 = "SELECT site, amount FROM hits WHERE site = 'a' ORDER BY ts"
    assert "__proj_" not in "\n".join(r[0] for r in eng.sql(f"EXPLAIN SYNTAX {q3}").collect())
    assert len(eng.sql(q3).collect()) == 3
