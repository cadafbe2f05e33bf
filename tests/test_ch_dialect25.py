"""Dialect batch 25 (probe-driven, round 8): categorical-association
aggregates (Cramér's V plain/bias-corrected, Theil's U, contingency
coefficient) with hand-computable goldens, RFC 7386 JSON merge patch,
array Levenshtein, word counting, tuple-of-intervals arithmetic."""

import math

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh25")))


def one(eng, sql):
    rows = eng.sql(sql).collect()
    assert len(rows) == 1
    return rows[0]


_PERFECT = (
    "VALUES (0, 0),(0, 0),(0, 0),(0, 0),(0, 0),"
    "(1, 1),(1, 1),(1, 1),(1, 1),(1, 1) AS t(a, b)"
)
_INDEP = "VALUES (0, 0),(0, 1),(1, 0),(1, 1) AS t(a, b)"


def test_association_family_goldens(eng):
    # perfect 2x2 association: chi² = n
    r = one(
        eng,
        f"SELECT cramersV(a, b) AS v, cramersVBiasCorrected(a, b) AS vc, "
        f"theilsU(a, b) AS u, contingency(a, b) AS c FROM {_PERFECT}",
    )
    assert r["v"] == pytest.approx(1.0)
    assert r["vc"] == pytest.approx(1.0)
    # CH's theilsU divides by the NEGATIVE entropy sum: perfect = -1
    assert r["u"] == pytest.approx(-1.0)
    assert r["c"] == pytest.approx(math.sqrt(10 / 20))  # sqrt(chi2/(chi2+n))

    # exact independence: chi² = 0, conditional entropy = marginal entropy
    r = one(
        eng,
        f"SELECT cramersV(a, b) AS v, theilsU(a, b) AS u, "
        f"contingency(a, b) AS c FROM {_INDEP}",
    )
    assert r["v"] == pytest.approx(0.0)
    assert r["u"] == pytest.approx(0.0, abs=1e-12)
    assert r["c"] == pytest.approx(0.0)

    # degenerate: a single category on one side -> NaN (not a crash)
    r = one(eng, "SELECT cramersV(a, b) AS v FROM VALUES (1, 1),(1, 2) AS t(a, b)")
    assert r["v"] is None or math.isnan(r["v"])

    # NULL rows are dropped like the native aggregates drop them
    r = one(
        eng,
        f"SELECT theilsU(a, b) AS u FROM (SELECT a, b FROM {_PERFECT} "
        "UNION ALL SELECT NULL, 1 UNION ALL SELECT 1, NULL)",
    )
    assert r["u"] == pytest.approx(-1.0)

    # the public CH docs example, sign included:
    # theilsU(number % 10, number % 4) over numbers(150) = -0.301957...
    r = one(
        eng,
        "SELECT theilsU(id % 10, id % 4) AS u FROM range(150)",
    )
    assert r["u"] == pytest.approx(-0.30195720557678846, rel=1e-12)


def test_json_merge_patch(eng):
    r = one(
        eng,
        """SELECT JSONMergePatch('{"a":"b"}', '{"a":"c"}') AS a,
        JSONMergePatch('{"a":1,"b":2}', '{"b":null,"c":3}') AS b,
        JSONMergePatch('{"a":{"x":1,"y":2}}', '{"a":{"y":null,"z":9}}') AS c""",
    )
    import json

    assert json.loads(r["a"]) == {"a": "c"}
    assert json.loads(r["b"]) == {"a": 1, "c": 3}  # null DELETES b (RFC 7386)
    assert json.loads(r["c"]) == {"a": {"x": 1, "z": 9}}  # nested merge


def test_array_levenshtein_and_count_words(eng):
    r = one(
        eng,
        "SELECT arrayLevenshteinDistance(array(1, 2, 3), array(1, 3)) AS a, "
        "arrayLevenshteinDistance(array('a', 'b'), array('b', 'a')) AS b, "
        "arrayLevenshteinDistance(array(1.0, 2.0), array(1, 2)) AS mixed, "
        "countWords('Hello, world!') AS c, countWords('a1 b-c') AS d, "
        "countWords('') AS e",
    )
    assert (r["a"], r["b"]) == (1, 2)
    assert r["mixed"] == 0  # numeric coercion, not string-rendering compare
    assert (r["c"], r["d"], r["e"]) == (2, 3, 0)


def test_add_tuple_of_intervals(eng):
    # CH docs example: 2018-01-01 + (1 day, 1 month) = 2018-02-02
    r = one(
        eng,
        "SELECT addTupleOfIntervals(toDate('2018-01-01'), "
        "(toIntervalDay(1), toIntervalMonth(1))) AS a",
    )
    assert str(r["a"]).startswith("2018-02-02")
    with pytest.raises(NotImplementedError, match="tuple literal"):
        eng.sql("SELECT addTupleOfIntervals(toDate('2018-01-01'), t.iv) FROM x t")
