"""Dialect batch 15 (probe-driven): geo/bucket/decimal-format scalars,
timeSlots, UUIDv7, untuple on columns, variadic byteSize, deterministic
parametric aggregates (groupArraySorted / quantileGK / sparkbar), and the
loud gates for the bit-level / punycode / order-dependent stragglers."""

import re

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from clickhousedatamocker_spark.engine import Engine

    e = Engine(spark, str(tmp_path_factory.mktemp("wh15")))
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView("ev15")
    return e


GOLDENS = [
    # CH 24.x: geoDistance((-0.1,51.5),(2.35,48.85)) = 343388 m (WGS-84
    # ellipsoid); the spherical haversine shim lands within 0.5%
    ("SELECT round(geoDistance(-0.1, 51.5, 2.35, 48.85)) AS a", None),
    ("SELECT widthBucket(5.5, 0, 10, 5) AS a", 3),
    ("SELECT widthBucket(-1, 0, 10, 5) AS a", 0),
    ("SELECT toDecimalString(3.14159, 2) AS a", "3.14"),
    ("SELECT toDecimalString(42, 4) AS a", "42.0000"),
    ("SELECT byteSize('abc') AS a", 12),
    ("SELECT byteSize('ab', 'c') AS a", 21),
    ("SELECT byteSize('ab', 'c', '') AS a", 30),
]


@pytest.mark.parametrize("sql,want", GOLDENS)
def test_batch15_goldens(eng, sql, want):
    got = eng.sql(sql).collect()[0]["a"]
    if want is None:
        assert abs(got - 343388) / 343388 < 0.005, got  # geoDistance tolerance
    else:
        assert got == want, (sql, got)


def test_geo_distance_matches_great_circle(eng):
    r = eng.sql(
        "SELECT geoDistance(-0.1, 51.5, 2.35, 48.85) AS g, "
        "greatCircleDistance(-0.1, 51.5, 2.35, 48.85) AS gc"
    ).collect()[0]
    assert r["g"] == r["gc"]  # documented: same spherical model


def test_time_slots(eng):
    r = eng.sql(
        "SELECT timeSlots(toDateTime('2024-01-01 12:11:00'), toUInt32(3600)) AS a"
    ).collect()[0]["a"]
    assert [str(t) for t in r] == [
        "2024-01-01 12:00:00",
        "2024-01-01 12:30:00",
        "2024-01-01 13:00:00",
    ]
    r = eng.sql(
        "SELECT timeSlots(toDateTime('2024-01-01 12:11:00'), toUInt32(600), 300) AS a"
    ).collect()[0]["a"]
    assert len(r) == 3 and str(r[0]) == "2024-01-01 12:10:00"


def test_generate_uuid_v7_shape_and_ordering(eng):
    rows = eng.sql(
        "SELECT generateUUIDv7() AS a, generateUUIDv7() AS b"
    ).collect()[0]
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    assert pat.match(rows["a"]) and pat.match(rows["b"]), rows
    # time-ordered prefix: same millisecond or adjacent — the 48-bit prefix
    # of two same-query calls can differ only in the last few bits
    assert rows["a"][:8] == rows["b"][:8]


def test_untuple_star_expands_columns(eng, spark):
    got = eng.sql(
        "SELECT untuple(t) FROM (SELECT named_struct('x', 1, 'y', 'z') AS t)"
    ).collect()[0]
    assert got["x"] == 1 and got["y"] == "z"


def test_group_array_sorted(eng):
    got = eng.sql(
        "SELECT groupArraySorted(3)(x) AS a FROM VALUES (5),(1),(4),(2) AS t(x)"
    ).collect()[0]["a"]
    assert got == [1, 2, 4]


def test_quantile_gk_brackets_exact(eng):
    r = eng.sql(
        "SELECT quantileGK(500, 0.5)(value) AS gk, quantileExact(0.5)(value) AS ex "
        "FROM ev15"
    ).collect()[0]
    assert abs(r["gk"] - r["ex"]) <= 0.1 * max(abs(r["ex"]), 1e-9)


def test_sparkbar_renders_blocks(eng):
    got = eng.sql(
        "SELECT sparkbar(4)(x, y) AS a FROM VALUES "
        "(0, 1.0),(1, 2.0),(2, 4.0),(3, 8.0) AS t(x, y)"
    ).collect()[0]["a"]
    assert len(got) == 4
    assert got[-1] == "█"  # max bucket renders full block
    assert all(c in "▁▂▃▄▅▆▇█" for c in got), got
    # monotone data -> monotone ramp
    ramp = "▁▂▃▄▅▆▇█"
    assert [ramp.index(c) for c in got] == sorted(ramp.index(c) for c in got)


def test_sparkbar_explicit_range(eng):
    got = eng.sql(
        "SELECT sparkbar(2, 0, 10)(x, y) AS a FROM VALUES "
        "(1, 3.0),(9, 6.0) AS t(x, y)"
    ).collect()[0]["a"]
    assert len(got) == 2 and got[1] == "█"


@pytest.mark.parametrize(
    "sql,frag",
    [
        ("SELECT bitSlice('hello', 1, 8) AS a", "bitSlice"),
        # punycodeEncode / idnaEncode graduated to stdlib-codec Arrow UDFs
        # in batch 23 — goldens in tests/test_ch_dialect23.py
        ("SELECT groupArrayLast(2)(x) AS a FROM VALUES (1) AS t(x)", "arrival order"),
        # groupArrayInsertAt graduated to a real rewrite in batch 26 —
        # goldens in tests/test_ch_dialect26.py
        ("SELECT untuple((1, 2)) AS a", "untuple"),
        ("SELECT toDecimalString(1.0, 40) AS a", "DECIMAL(38)"),
    ],
)
def test_batch15_loud_gates(eng, sql, frag):
    with pytest.raises(NotImplementedError, match=re.escape(frag)):
        eng.sql(sql).collect()
