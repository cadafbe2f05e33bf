"""Exponential time-decay vocabulary (round 9, verdict task 4): the
exponentialMovingAverage aggregate graduated from a gate to a real
dialect rewrite, and exponentialTimeDecayedSum/Count/Avg/Max gained an
exact segmented-scan operator (operators/ema.py).

Golden source: the ClickHouse docs example for exponentialMovingAverage
(a lone 1 at t=0 followed by nine 0s at unit spacing, half-life 1 →
0.0009765625 = 2^-10). Everything else is pinned by independent in-test
recomputation from the definition (O(n²) brute force) and DuckDB twins.
"""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.operators.ema import (
    ema_oracle_sql,
    etd_oracle_sql,
    exponential_moving_average,
    exponential_time_decayed,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh_ema")))


def one(eng, sql):
    rows = eng.sql(sql).collect()
    assert len(rows) == 1
    return rows[0]


# ---------------------------------------------------------------------------
# exponentialMovingAverage — dialect rewrite


def test_ema_dialect_matches_ch_docs_golden(eng):
    """CH docs: SELECT exponentialMovingAverage(1)(value, time) over
    value = (number = 0), time = number, numbers(10) → 0.0009765625."""
    got = one(
        eng,
        "SELECT exponentialMovingAverage(1)(value, time) AS ema FROM "
        "(SELECT CASE WHEN number = 0 THEN 1.0 ELSE 0.0 END AS value, "
        "number AS time FROM (SELECT id AS number FROM range(10)))",
    )["ema"]
    assert got == 2.0**-10  # exact: every weight is a power of two


def test_ema_dialect_default_param_and_null_skip(eng):
    """Param defaults to half-life 1; NULL value or time rows are skipped
    entirely (their time must not anchor T); all-NULL group yields NULL."""
    base = (
        "SELECT k, exponentialMovingAverage(2)(v, t) AS ema FROM (VALUES "
        "('a', 1.0, 0.0), ('a', 2.0, 1.0), ('a', CAST(NULL AS DOUBLE), 2.0), "
        "('b', 5.0, 10.0), ('c', CAST(NULL AS DOUBLE), 1.0)"
        ") AS x(k, v, t) GROUP BY k ORDER BY k"
    )
    rows = {r["k"]: r["ema"] for r in eng.sql(base).collect()}
    # group a: contributing rows (1,0),(2,1); T=1 (the NULL-v row's t=2
    # must NOT shift the anchor): (1-2^-.5)*(1*2^-.5 + 2)
    want_a = (1 - 2 ** -0.5) * (2 ** -0.5 + 2)
    assert abs(rows["a"] - want_a) < 1e-12
    assert abs(rows["b"] - (1 - 2 ** -0.5) * 5) < 1e-12
    assert rows["c"] is None
    # no-parameter form is INVALID ClickHouse (half-life is required) —
    # inventing a default would answer a query CH rejects (r9 ADVICE)
    import pytest

    with pytest.raises(NotImplementedError, match="exactly one parameter"):
        eng.sql(
            "SELECT exponentialMovingAverage(v, t) AS ema FROM (VALUES "
            "(1.0, 0.0), (1.0, 1.0)) AS x(v, t)"
        )


def test_ema_operator_matches_dialect_and_duckdb(spark):
    """The zero-collect two-pass operator == the collect-fold dialect
    spelling == the DuckDB twin, on the events fixture grouped by
    event_type (value decayed over epoch-second times)."""
    import duckdb

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "value", F.unix_timestamp("ts").cast("double").alias("t")
    )
    got = {
        r["event_type"]: r["ema"]
        for r in exponential_moving_average(
            ev, 3600.0, "value", "t", ["event_type"]
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events_t AS SELECT event_type, value, "
        f"CAST(floor(epoch(ts)) AS DOUBLE) AS t FROM '{SF_DIR}/events.parquet'"
    )
    want = dict(
        con.execute(
            ema_oracle_sql(3600.0, "value", "t", group_by="event_type", table="events_t")
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    # and the dialect spelling agrees on the same frame
    ev.createOrReplaceTempView("ev_ema")
    eng_rows = {
        r["event_type"]: r["ema"]
        for r in Engine(spark, "/tmp/wh-ema-x").sql(
            "SELECT event_type, exponentialMovingAverage(3600)(value, t) AS ema "
            "FROM ev_ema GROUP BY event_type"
        ).collect()
    }
    for k in got:
        assert eng_rows[k] == pytest.approx(got[k], rel=1e-12), k


def test_ema_operator_global_and_validation(spark):
    df = spark.createDataFrame([(1.0, 0.0), (1.0, 1.0)], "v double, t double")
    got = exponential_moving_average(df, 1.0, "v", "t").first()["ema"]
    assert abs(got - 0.5 * 1.5) < 1e-15
    with pytest.raises(ValueError, match="half_life"):
        exponential_moving_average(df, 0.0, "v", "t")


# ---------------------------------------------------------------------------
# exponentialTimeDecayed* — segmented-scan operator


def _brute(rows, x):
    """O(n²) reference straight from the definition (frame = t_i <= t_j)."""
    rs = sorted([r for r in rows if r[1] is not None], key=lambda r: r[1])
    out = {}
    for (vj, tj) in rs:
        s = c = cv = 0.0
        m = -math.inf
        for (vi, ti) in rs:
            if ti <= tj:
                w = math.exp((ti - tj) / x)
                c += w
                if vi is not None:
                    s += vi * w
                    cv += w
                    m = max(m, vi * w)
        out[(tj, vj)] = (s, c, s / cv if cv > 0 else None, m if m > -math.inf else None)
    return out


def test_etd_matches_brute_force_with_ties_segments_and_nulls(spark):
    """Random series per key with: a time span (5000) far beyond one
    renormalization segment (200·x = 600 at x=3), exact time ties (RANGE
    peers must share outputs), a NULL value row (anchors its own frame,
    contributes nothing), and a NULL time row (NULL outputs)."""
    rng = np.random.default_rng(7)
    data = []
    for k in ("u1", "u2"):
        t = np.sort(rng.uniform(0, 5000, 300))
        t[50] = t[49]
        t[51] = t[49]
        v = rng.normal(0, 3, 300)
        data += [
            (k, None if i == 30 else float(v[i]), float(t[i])) for i in range(300)
        ]
    data.append(("u1", 9.9, None))
    df = spark.createDataFrame(data, "k string, v double, t double")
    x = 3.0
    out = exponential_time_decayed(df, x, "v", "t", ["k"]).collect()
    assert len(out) == len(data)  # every input row comes back
    for k in ("u1", "u2"):
        ref = _brute([(r[1], r[2]) for r in data if r[0] == k], x)
        for r in (r for r in out if r["k"] == k):
            if r["t"] is None:
                for c in ("etd_sum", "etd_count", "etd_avg", "etd_max"):
                    assert r[c] is None
                continue
            want = ref[(r["t"], r["v"])]
            for i, c in enumerate(("etd_sum", "etd_count", "etd_avg", "etd_max")):
                if want[i] is None:
                    assert r[c] is None, (k, r["t"], c)
                else:
                    assert r[c] == pytest.approx(want[i], rel=1e-9, abs=1e-12), (
                        k,
                        r["t"],
                        c,
                    )


def test_etd_tie_rows_share_frame(spark):
    """CH RANGE-frame semantics: rows with equal time are peers — each
    sees the whole tie group, so their outputs are identical."""
    df = spark.createDataFrame(
        [("k", 1.0, 5.0), ("k", 10.0, 5.0), ("k", 100.0, 5.0), ("k", 2.0, 1.0)],
        "k string, v double, t double",
    )
    out = exponential_time_decayed(df, 2.0, "v", "t", ["k"]).collect()
    tied = [r for r in out if r["t"] == 5.0]
    assert len(tied) == 3
    want = 111.0 + 2.0 * math.exp(-2.0)
    for r in tied:
        assert r["etd_sum"] == pytest.approx(want, rel=1e-12)
        assert r["etd_max"] == pytest.approx(100.0, rel=1e-12)


def test_etd_matches_duckdb_twin_on_events(spark):
    """Cross-engine: per-user decayed stats over the events fixture match
    the DuckDB O(n²) self-join twin at every row."""
    import duckdb

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("user_id") <= 20)
        .select(
            "user_id", "event_id", "value",
            F.unix_timestamp("ts").cast("double").alias("t"),
        )
    )
    x = 1800.0
    out = exponential_time_decayed(ev, x, "value", "t", ["user_id"]).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events_t AS SELECT user_id, event_id, value, "
        f"CAST(floor(epoch(ts)) AS DOUBLE) AS t "
        f"FROM '{SF_DIR}/events.parquet' WHERE user_id <= 20"
    )
    want = {
        (r[0], r[2], r[3]): r[4:]
        for r in con.execute(
            etd_oracle_sql(x, "value", "t", partition_by="user_id", table="events_t")
        ).fetchall()
    }
    assert len(out) == len(want)
    for r in out:
        w = want[(r["user_id"], r["t"], r["value"])]
        for i, c in enumerate(("etd_sum", "etd_count", "etd_avg", "etd_max")):
            assert r[c] == pytest.approx(w[i], rel=1e-9), (r["user_id"], r["t"], c)


def test_etd_validation_and_gate(spark, eng):
    df = spark.createDataFrame([(1.0, 1.0)], "v double, t double")
    with pytest.raises(ValueError, match="partition_cols"):
        exponential_time_decayed(df, 1.0, "v", "t", [])
    with pytest.raises(ValueError, match="decay"):
        exponential_time_decayed(df, -1.0, "v", "t", ["v"])
    with pytest.raises(ValueError, match="outputs"):
        exponential_time_decayed(df, 1.0, "v", "t", ["v"], outputs=("sum", "median"))
    # the dialect window forms stay loudly gated, pointing at the operator
    with pytest.raises(Exception, match="operators/ema"):
        eng.sql(
            "SELECT exponentialTimeDecayedSum(10)(v, t) FROM "
            "(VALUES (1.0, 1.0)) AS x(v, t)"
        ).collect()


def test_ema_operator_plan_has_no_python_stage(spark):
    """The EMA operator is the scale path: pure window max + aggregate —
    no collect_list, no Arrow/Python eval in the plan."""
    df = spark.createDataFrame([("a", 1.0, 0.0)], "k string, v double, t double")
    plan = (
        exponential_moving_average(df, 2.0, "v", "t", ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "collect_list" not in plan


def test_etd_timestamp_column_scales_as_seconds(spark):
    """Round-9 review finding: a TIMESTAMP time column must decay in
    SECONDS (pd.to_numeric on datetime64 silently yields nanoseconds and
    maps NaT to int64-min) — the operator converts to epoch seconds and
    turns NULL timestamps into NULL-output rows."""
    df = spark.createDataFrame(
        [(1, 2.0, "2026-01-01 00:00:00"), (1, 3.0, "2026-01-01 00:00:50"),
         (1, 9.0, None)],
        "k int, v double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r["k"], str(r["ts"])): r for r in
           exponential_time_decayed(df, 50.0, "v", "ts", ["k"]).collect()}
    want = 3.0 + 2.0 * math.exp(-1.0)  # 50s gap at decay 50 = e^-1, NOT e^-1e9
    got = out[(1, "2026-01-01 00:00:50")]
    assert got["etd_sum"] == pytest.approx(want, rel=1e-12)
    null_row = out[(1, "None")]
    for c in ("etd_sum", "etd_count", "etd_avg", "etd_max"):
        assert null_row[c] is None


def test_etd_bucketed_dispatch_edges(spark):
    """The r10 key-bucketed dispatch path: NULL partition keys form their
    own group (pandas groupby dropna=False inside the bucket kernel — the
    nullable-long Arrow round-trip must hold), and forcing EVERY key into
    ONE bucket (key_buckets=1) still segments per key correctly."""
    import math

    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(1, 10.0, 1.0), (1, 20.0, 2.0), (None, 5.0, 1.0), (None, 7.0, 3.0), (2, 1.0, 1.0)],
        "k long, v double, t double",
    )
    for nb in (None, 1, 1000):
        rows = {
            (r["k"], r["t"]): r
            for r in exponential_time_decayed(
                df, 1.0, "v", "t", ["k"], key_buckets=nb
            ).collect()
        }
        assert len(rows) == 5
        # NULL-key group decays independently: 5*e^-2 + 7 at t=3
        r = rows[(None, 3.0)]
        assert r["etd_sum"] == pytest.approx(5.0 * math.exp(-2.0) + 7.0, rel=1e-12)
        # key 1 untouched by the NULL group or key 2
        r = rows[(1, 2.0)]
        assert r["etd_sum"] == pytest.approx(10.0 * math.exp(-1.0) + 20.0, rel=1e-12)
        assert rows[(2, 1.0)]["etd_sum"] == 1.0
