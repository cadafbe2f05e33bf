"""Dialect batch 21 (round 8, the r7 verdict's probe list): URLHierarchy /
URLPathHierarchy (separator-run prefix folds over path+query),
decodeHTMLComponent (full stdlib HTML5 entity table over Arrow — the
round-7 gate existed because a 5-entity subset would drift silently), and
arraySplit / arrayReverseSplit (flag-vector cuts + slice groups).
Goldens follow ClickHouse documentation examples where the docs give one,
marked [doc]; the rest pin the documented rules (consecutive separators
count as one, cut after the run, no split before first / after last)."""

import pytest


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    return Engine(spark, str(tmp_path_factory.mktemp("wh21")))


GOLDENS = [
    # --- URLHierarchy [doc example] ---
    (
        "SELECT URLHierarchy('https://example.com/browse/CONV-6788') AS v",
        ["https://example.com/", "https://example.com/browse/", "https://example.com/browse/CONV-6788"],
    ),
    # query string: '?' is a separator inside path+query
    (
        "SELECT URLHierarchy('https://example.com/a/b?x=1&y=2') AS v",
        [
            "https://example.com/",
            "https://example.com/a/",
            "https://example.com/a/b?",
            "https://example.com/a/b?x=1&y=2",
        ],
    ),
    # trailing separator run ends the list (no extra full-URL element);
    # consecutive separators count as ONE cut, made after the run
    (
        "SELECT URLHierarchy('https://example.com/a//') AS v",
        ["https://example.com/", "https://example.com/a//"],
    ),
    # fragment is never split — it rides along on the final element
    (
        "SELECT URLHierarchy('https://example.com/a/b#frag/ment') AS v",
        ["https://example.com/", "https://example.com/a/", "https://example.com/a/b#frag/ment"],
    ),
    # no path at all -> empty hierarchy
    ("SELECT URLHierarchy('https://example.com') AS v", []),
    # port + userinfo stay inside the authority prefix
    (
        "SELECT URLHierarchy('http://u:p@h.com:8123/x') AS v",
        ["http://u:p@h.com:8123/", "http://u:p@h.com:8123/x"],
    ),
    # --- URLPathHierarchy [doc example: no protocol/host, no root '/'] ---
    (
        "SELECT URLPathHierarchy('https://example.com/browse/CONV-6788') AS v",
        ["/browse/", "/browse/CONV-6788"],
    ),
    (
        "SELECT URLPathHierarchy('https://example.com/a/b?x=1') AS v",
        ["/a/", "/a/b?", "/a/b?x=1"],
    ),
    ("SELECT URLPathHierarchy('https://example.com/moscow/') AS v", ["/moscow/"]),
    ("SELECT URLPathHierarchy('https://example.com') AS v", []),
    # --- decodeHTMLComponent: named (incl. beyond the XML five), numeric
    # dec/hex, and passthrough of non-entities [doc-style cases] ---
    ("SELECT decodeHTMLComponent('&hbar; &Dscr;&eta;&psi;') AS v", "ℏ \U0001d49fηψ"),
    ("SELECT decodeHTMLComponent('&lt;p&gt;&amp;&quot;') AS v", '<p>&"'),
    ("SELECT decodeHTMLComponent('&euro; &nbsp;!') AS v", "€  !"),
    ("SELECT decodeHTMLComponent('&#65;&#x42;C') AS v", "ABC"),
    ("SELECT decodeHTMLComponent('no entities') AS v", "no entities"),
    # --- arraySplit / arrayReverseSplit [doc examples] ---
    (
        "SELECT toJSONString(arraySplit((x, y) -> y, [1, 2, 3, 4, 5], [1, 0, 0, 1, 0])) AS v",
        "[[1,2,3],[4,5]]",
    ),
    (
        "SELECT toJSONString(arrayReverseSplit((x, y) -> y, [1, 2, 3, 4, 5], [1, 0, 0, 1, 0])) AS v",
        "[[1],[2,3,4],[5]]",
    ),
    # 1-array lambda form; never splits before first / after last
    (
        "SELECT toJSONString(arraySplit(x -> x % 2 = 0, [2, 1, 2, 3])) AS v",
        "[[2,1],[2,3]]",
    ),
    (
        "SELECT toJSONString(arrayReverseSplit(x -> x % 2 = 0, [1, 2, 3, 4])) AS v",
        "[[1,2],[3,4]]",
    ),
    # flag on the first element only: arraySplit never cuts there
    (
        "SELECT toJSONString(arraySplit((x, y) -> y, [7, 8], [1, 0])) AS v",
        "[[7,8]]",
    ),
    # empty input -> empty list of groups
    (
        "SELECT size(arraySplit(x -> x > 0, slice([1], 1, 0))) AS v",
        0,
    ),
]


@pytest.mark.parametrize("sql,expected", GOLDENS, ids=[g[0][:70] for g in GOLDENS])
def test_batch21_goldens(eng, sql, expected):
    got = eng.sql(sql).collect()[0]["v"]
    if isinstance(expected, list):
        got = list(got)
    assert got == expected, f"{sql}\n got: {got!r}\n want: {expected!r}"


def test_batch21_remaining_gates(eng):
    """The forms batch 21 deliberately left loud."""
    with pytest.raises(NotImplementedError, match="arrays_zip"):
        eng.sql("SELECT arraySplit((x, y, z) -> y, [1], [1], [1]) AS v")


def test_url_hierarchy_plan_is_jvm_side(eng):
    """The hierarchy folds are pure column expressions — no Python in the
    plan (decodeHTMLComponent alone is the documented Arrow exception)."""
    plan = (
        eng.sql("SELECT URLHierarchy('https://example.com/a/b') AS v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
