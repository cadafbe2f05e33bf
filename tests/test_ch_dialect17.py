"""Dialect batch 17 (probe-driven): stacked aggregate combinators
(-ArrayIf, -IfOrNull), avg/count members of the -Map family, exact
exclusive/inclusive quantiles (R-6/R-7 plotting positions), -OrNull pick
aggregates, and loud gates for the order-dependent / statistics
stragglers."""

import re

import pytest


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    return Engine(spark, str(tmp_path_factory.mktemp("wh17")))


ROWS = (
    "(SELECT array(1, 2) AS a, true AS c, 1 AS x UNION ALL "
    "SELECT array(10, 2), false, 3)"
)


GOLDENS = [
    # -ArrayIf: the false row's array contributes nothing
    (f"SELECT sumArrayIf(a, c) AS v FROM {ROWS}", 3.0),
    (f"SELECT avgArrayIf(a, c) AS v FROM {ROWS}", 1.5),
    # no row matches: every array is the empty slice, denominator 0 — CH
    # returns nan; an unguarded division throws under ANSI (round-6
    # advisory). nan != nan, so golden-compare via isNaN
    (f"SELECT isNaN(avgArrayIf(a, x > 100)) AS v FROM {ROWS}", True),
    (f"SELECT minArrayIf(a, c) AS v FROM {ROWS}", 1),
    (f"SELECT maxArrayIf(a, c) AS v FROM {ROWS}", 2),
    (f"SELECT countArrayIf(a, c) AS v FROM {ROWS}", 2),
    (f"SELECT uniqArrayIf(a, c) AS v FROM {ROWS}", 2),
    # -IfOrNull: NULL (not 0) when nothing matches
    (f"SELECT sumIfOrNull(x, x > 100) AS v FROM {ROWS}", None),
    (f"SELECT sumIfOrNull(x, x > 0) AS v FROM {ROWS}", 4),
    (f"SELECT countIfOrNull(x, x > 100) AS v FROM {ROWS}", None),
    (f"SELECT countIfOrNull(x, x > 2) AS v FROM {ROWS}", 1),
    (f"SELECT maxIfOrNull(x, x < 0) AS v FROM {ROWS}", None),
    # -OrNull pick aggregates over the empty set
    ("SELECT anyOrNull(x) AS v FROM (SELECT 1 AS x WHERE false)", None),
    ("SELECT anyLastOrNull(x) AS v FROM (SELECT 1 AS x WHERE false)", None),
    # exact exclusive (R-6) vs inclusive (R-7) quantiles over 1..7
    (
        "SELECT quantileExactExclusive(0.25)(x) AS v FROM (SELECT explode(sequence(1, 7)) AS x)",
        2.0,
    ),
    (
        "SELECT quantileExactInclusive(0.25)(x) AS v FROM (SELECT explode(sequence(1, 7)) AS x)",
        2.5,
    ),
    # clamps at the rails
    (
        "SELECT quantileExactExclusive(0.05)(x) AS v FROM (SELECT explode(sequence(1, 4)) AS x)",
        1.0,
    ),
    (
        "SELECT quantileExactExclusive(0.95)(x) AS v FROM (SELECT explode(sequence(1, 4)) AS x)",
        4.0,
    ),
]


@pytest.mark.parametrize("sql,want", GOLDENS)
def test_batch17_goldens(eng, sql, want):
    got = eng.sql(sql).collect()[0]["v"]
    if want is None:
        assert got is None, (sql, got)
    else:
        assert got == pytest.approx(want, abs=1e-9), (sql, got)


def test_quantiles_exact_exclusive_matches_duckdb(eng):
    """DuckDB's quantile_cont is the R-7 (inclusive) position — pin the
    inclusive twin value-exact, and the plural exclusive against a hand
    R-6 computation."""
    import duckdb

    vals = list(range(1, 12))
    want_inc = duckdb.connect().execute(
        f"SELECT quantile_cont(x, 0.3) FROM (SELECT unnest({vals}) AS x)"
    ).fetchone()[0]
    got_inc = eng.sql(
        "SELECT quantileExactInclusive(0.3)(x) AS v FROM (SELECT explode(sequence(1, 11)) AS x)"
    ).collect()[0]["v"]
    assert got_inc == pytest.approx(want_inc, abs=1e-9)
    got = eng.sql(
        "SELECT quantilesExactExclusive(0.25, 0.5, 0.75)(x) AS v "
        "FROM (SELECT explode(sequence(1, 11)) AS x)"
    ).collect()[0]["v"]
    assert got == pytest.approx([3.0, 6.0, 9.0], abs=1e-9)  # h = p*12


def test_map_family_avg_count(eng):
    got = eng.sql(
        "SELECT avgMap(m) AS a, countMap(m) AS c FROM "
        "(SELECT map('a', 2.0, 'b', 1.0) AS m UNION ALL SELECT map('a', 4.0))"
    ).collect()[0]
    assert got["a"] == {"a": 3.0, "b": 1.0}
    assert got["c"] == {"a": 2, "b": 1}


@pytest.mark.parametrize(
    "sql,frag",
    [
        ("SELECT groupConcat(',')(x) AS v FROM (SELECT 1 AS x)", "arrival order"),
        # rankCorr and groupArrayInsertAt graduated to REAL rewrites in
        # batch 26 — goldens in tests/test_ch_dialect26.py
        # meanZTest graduated to a real z + p + CI in batch 23 —
        # goldens in tests/test_ch_dialect23.py
        # analysisOfVariance and sumMapFiltered graduated to REAL rewrites
        # in batch 26 — goldens in tests/test_ch_dialect26.py
        ("SELECT aggThrow(0.0) AS v FROM (SELECT 1)", "fault-injection"),
    ],
)
def test_batch17_loud_gates(eng, sql, frag):
    with pytest.raises(NotImplementedError, match=re.escape(frag)):
        eng.sql(sql).collect()
