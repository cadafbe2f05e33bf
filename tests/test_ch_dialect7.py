"""Dialect batch 7 (round 5): CH analytics aggregates — sequence aggregates
(windowFunnel/sequenceMatch/sequenceCount/retention) as SQL spellings,
moment statistics (skew/kurt families), map aggregates, exact topK, generic
-If combinators, weighted quantiles, and loud refusals for the
block-order-dependent family.

Verification strategy: every rewrite is checked against an INDEPENDENT
formulation — the windowFunnel SQL form against operators/funnel.py's
DataFrame fold, the map/topK/If forms against explode+groupBy Spark SQL,
the moment stats against numpy on the same values."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.engine import Engine

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark, str(tmp_path_factory.mktemp("wh7")))
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("ev7")
    return e


def one(eng, sql):
    return eng.sql(sql).first()["a"]


# -- moment statistics vs numpy ---------------------------------------------

VALS = [1.0, 2.0, 4.0, 8.0, 3.0]


def _vals_sql(alias="t"):
    rows = ", ".join(f"({v})" for v in VALS)
    return f"FROM VALUES {rows} AS {alias}(x)"


def test_skew_kurt_families_match_numpy(eng):
    a = np.asarray(VALS)
    n, mean = len(a), a.mean()
    m2 = ((a - mean) ** 2).mean()
    m3 = ((a - mean) ** 3).mean()
    m4 = ((a - mean) ** 4).mean()
    var_samp = m2 * n / (n - 1)
    want = {
        "skewPop": m3 / m2**1.5,
        "skewSamp": m3 / var_samp**1.5,
        "kurtPop": m4 / m2**2,
        "kurtSamp": m4 / var_samp**2,
    }
    for fn, w in want.items():
        got = one(eng, f"SELECT {fn}(x) AS a {_vals_sql()}")
        assert abs(got - w) < 1e-9, (fn, got, w)


def test_sum_count_and_single_value(eng):
    r = eng.sql(f"SELECT sumCount(x) AS a {_vals_sql()}").first()["a"]
    assert r["sum"] == sum(VALS) and r["count"] == len(VALS)
    assert one(eng, "SELECT singleValueOrNull(x) AS a FROM VALUES (7), (7) AS t(x)") == 7
    assert one(eng, "SELECT singleValueOrNull(x) AS a FROM VALUES (7), (8) AS t(x)") is None


def test_entropy_goldens(eng):
    # uniform over 4 distinct values -> 2 bits; two pairs -> 1 bit
    got = one(eng, "SELECT entropy(x) AS a FROM VALUES (1),(2),(3),(4) AS t(x)")
    assert abs(got - 2.0) < 1e-12
    got = one(eng, "SELECT entropy(x) AS a FROM VALUES (1),(1),(2),(2) AS t(x)")
    assert abs(got - 1.0) < 1e-12


def test_bounding_ratio_and_linreg(eng):
    # points (x=0,y=1) .. (x=4,y=9): exact line y = 2x + 1
    vals = "FROM VALUES (0.0, 1.0), (1.0, 3.0), (4.0, 9.0) AS t(x, y)"
    assert abs(one(eng, f"SELECT boundingRatio(x, y) AS a {vals}") - 2.0) < 1e-12
    r = eng.sql(f"SELECT simpleLinearRegression(x, y) AS a {vals}").first()["a"]
    assert abs(r["k"] - 2.0) < 1e-9 and abs(r["b"] - 1.0) < 1e-9


# -- map aggregates vs explode+groupBy --------------------------------------


def test_map_aggregates_match_explode_groupby(eng, spark):
    got = eng.sql("SELECT sumMap(map(event_type, value)) AS a FROM ev7").first()["a"]
    want = {
        r["event_type"]: r["s"]
        for r in spark.sql(
            "SELECT event_type, sum(value) AS s FROM ev7 GROUP BY event_type"
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k
    gmax = eng.sql("SELECT maxMap(map(event_type, value)) AS a FROM ev7").first()["a"]
    wmax = {
        r["event_type"]: r["m"]
        for r in spark.sql(
            "SELECT event_type, max(value) AS m FROM ev7 GROUP BY event_type"
        ).collect()
    }
    assert gmax == wmax
    # 2-arg array form returns CH's tuple-of-arrays shape, keys sorted
    t = eng.sql("SELECT sumMap(array(event_type), array(value)) AS a FROM ev7").first()["a"]
    assert t["keys"] == sorted(want)
    for k, v in zip(t["keys"], t["values"]):
        assert abs(v - want[k]) < 1e-6


# -- topK / uniqUpTo vs groupBy ranking -------------------------------------


def test_topk_exact_and_weighted(eng, spark):
    got = one(eng, "SELECT topK(3)(event_type) AS a FROM ev7")
    ranked = spark.sql(
        "SELECT event_type FROM ev7 GROUP BY event_type "
        "ORDER BY count(*) DESC, event_type LIMIT 3"
    ).collect()
    assert got == [r["event_type"] for r in ranked]
    gotw = one(eng, "SELECT topKWeighted(3)(event_type, value) AS a FROM ev7")
    rankedw = spark.sql(
        "SELECT event_type FROM ev7 GROUP BY event_type "
        "ORDER BY sum(value) DESC, event_type LIMIT 3"
    ).collect()
    assert gotw == [r["event_type"] for r in rankedw]


def test_uniq_up_to(eng):
    # 5 event types: capped at n+1 when over, exact when under
    assert one(eng, "SELECT uniqUpTo(3)(event_type) AS a FROM ev7") == 4
    assert one(eng, "SELECT uniqUpTo(100)(event_type) AS a FROM ev7") == 5


def test_weighted_quantiles(eng):
    got = one(
        eng,
        "SELECT quantileExactWeighted(0.5)(x, w) AS a "
        "FROM VALUES (1, 1), (10, 5) AS t(x, w)",
    )
    assert got == 10.0
    # all weighted spellings resolve (deviation: answered exactly)
    for fn in (
        "quantileInterpolatedWeighted",
        "quantileTimingWeighted",
        "quantileTDigestWeighted",
        "quantileBFloat16Weighted",
    ):
        assert (
            one(eng, f"SELECT {fn}(0.5)(x, w) AS a FROM VALUES (1, 1), (10, 5) AS t(x, w)")
            == 10.0
        )
    assert one(eng, "SELECT quantileBFloat16(0.5)(x) AS a FROM VALUES (1),(2),(3) AS t(x)") == 2.0


# -- -If combinators vs CASE spellings --------------------------------------


def test_if_combinators_match_case_forms(eng, spark):
    pairs = [
        ("uniqExactIf(user_id, value > 100)", "count(DISTINCT CASE WHEN value > 100 THEN user_id END)"),
        ("argMaxIf(event_type, value, user_id < 50)", "max_by(event_type, CASE WHEN user_id < 50 THEN value END)"),
        ("argMinIf(event_type, value, user_id < 50)", "min_by(event_type, CASE WHEN user_id < 50 THEN value END)"),
        ("size(groupArrayIf(event_type, value > 100))", "count(CASE WHEN value > 100 THEN event_type END)"),
        ("size(groupUniqArrayIf(event_type, value > 100))", "count(DISTINCT CASE WHEN value > 100 THEN event_type END)"),
    ]
    for ch, sp in pairs:
        got = one(eng, f"SELECT {ch} AS a FROM ev7")
        want = spark.sql(f"SELECT {sp} AS a FROM ev7").first()["a"]
        assert got == want, (ch, got, want)
    # anyIf must return a value satisfying the condition
    v = one(eng, "SELECT anyIf(value, value > 100) AS a FROM ev7")
    assert v > 100


# -- retention ----------------------------------------------------------------


def test_retention_golden(eng):
    got = one(
        eng,
        "SELECT retention(x = 1, x = 2, x = 9) AS a FROM VALUES (1), (2), (3) AS t(x)",
    )
    assert got == [1, 1, 0]
    # r1 false -> everything 0 regardless of later conditions
    got = one(
        eng,
        "SELECT retention(x = 9, x = 2) AS a FROM VALUES (1), (2) AS t(x)",
    )
    assert got == [0, 0]


# -- sequence aggregates ------------------------------------------------------


def test_window_funnel_sql_matches_operator(eng, spark):
    """The SQL spelling must agree with operators/funnel.py window_funnel
    for EVERY user on the events fixture — same fold, two formulations."""
    from clickhousedatamocker_spark.operators.funnel import window_funnel

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    steps = ["click", "view", "purchase"]
    want = {
        r["user_id"]: r["funnel_depth"]
        for r in window_funnel(events, steps, 3600, ts_col="ts").collect()
    }
    got = {
        r["user_id"]: r["a"]
        for r in eng.sql(
            "SELECT user_id, windowFunnel(3600)(ts, event_type = 'click', "
            "event_type = 'view', event_type = 'purchase') AS a "
            "FROM ev7 GROUP BY user_id"
        ).collect()
    }
    assert got == want


def test_sequence_match_and_count(eng):
    # planted sequence: A B A B over time
    vals = (
        "FROM VALUES (TIMESTAMP '2026-01-01 00:00:01', 'a'), "
        "(TIMESTAMP '2026-01-01 00:00:02', 'b'), "
        "(TIMESTAMP '2026-01-01 00:00:03', 'x'), "
        "(TIMESTAMP '2026-01-01 00:00:04', 'a'), "
        "(TIMESTAMP '2026-01-01 00:00:05', 'b') AS t(ts, y)"
    )
    assert one(eng, f"SELECT sequenceMatch('(?1)(?2)')(ts, y = 'a', y = 'b') AS a {vals}") == 1
    assert one(eng, f"SELECT sequenceMatch('(?2)(?1)(?2)')(ts, y = 'a', y = 'b') AS a {vals}") == 1
    assert one(eng, f"SELECT sequenceMatch('(?2)(?2)')(ts, y = 'a', y = 'b') AS a {vals}") == 0
    # the 'x' event matches no condition and is invisible (CH contract)
    assert one(eng, f"SELECT sequenceCount('(?1)(?2)')(ts, y = 'a', y = 'b') AS a {vals}") == 2
    assert one(eng, f"SELECT sequenceCount('(?1).*(?2)')(ts, y = 'a', y = 'b') AS a {vals}") == 2


def test_sequence_refusals(eng):
    with pytest.raises(NotImplementedError, match="time constraint"):
        one(eng, "SELECT sequenceMatch('(?1)(?t>10)(?2)')(ts, value > 0, value < 0) AS a FROM ev7")
    with pytest.raises(NotImplementedError, match="strict"):
        one(eng, "SELECT windowFunnel(10, 'strict_order')(ts, value > 0) AS a FROM ev7")


def test_order_dependent_family_refuses_with_window_recipe(eng):
    for fn in (
        "neighbor(value, 1)",
        "runningDifference(value)",
        "runningAccumulate(value)",
        "groupArrayMovingSum(value)",
        "groupArrayMovingAvg(value)",
        # exponentialMovingAverage graduated to a real rewrite in r9 —
        # covered by tests/test_ema.py; deltaSumTimestamp graduated in
        # r10 (it carries its own ordering column) — test_ch_dialect27.py
        "deltaSum(value)",
    ):
        with pytest.raises(NotImplementedError, match="window|OVER"):
            one(eng, f"SELECT {fn} AS a FROM ev7")


def test_sequence_spellings_in_string_literals_survive(eng):
    got = one(eng, "SELECT 'sequenceMatch(x)(y) windowFunnel(1)' AS a FROM ev7 LIMIT 1")
    assert got == "sequenceMatch(x)(y) windowFunnel(1)"
