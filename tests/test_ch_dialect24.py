"""Dialect batch 24 (probe-driven, round 8): series analytics, all-matches
group extraction, PR-AUC, jump consistent hash, misc stragglers.

Goldens: jumpConsistentHash(256, 4) = 3 and arrayAUCPR's example value are
published in the CH docs; the jump-hash consistency INVARIANT (adding a
bucket moves keys only INTO the new bucket) is pinned directly. The Tukey
outlier quartiles use linear interpolation (numpy) — CH's percentile
estimator may differ slightly; the fence SEMANTICS (score = signed
distance beyond q ± 1.5·IQR, 0 inside) are pinned instead of a foreign
constant.
"""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh24")))


def one(eng, sql):
    rows = eng.sql(sql).collect()
    assert len(rows) == 1
    return rows[0]


def test_extract_all_groups(eng):
    r = one(
        eng,
        r"SELECT extractAllGroupsVertical('a=1, b=2, c=3', '(\\w)=(\\d)') AS v, "
        r"extractAllGroupsHorizontal('a=1, b=2, c=3', '(\\w)=(\\d)') AS h, "
        r"extractAllGroupsVertical('nothing', '(\\d)') AS e",
    )
    assert [list(m) for m in r["v"]] == [["a", "1"], ["b", "2"], ["c", "3"]]
    assert [list(g) for g in r["h"]] == [["a", "b", "c"], ["1", "2", "3"]]
    assert list(r["e"]) == []


def test_series_analytics(eng):
    r = one(
        eng,
        "SELECT seriesOutliersDetectTukey(array(-3, 2, 15, 3, 5, 6, 4.5, 5, 12, "
        "45, 12, 3.4, 3, 4, 5, 6)) AS t, "
        "seriesPeriodDetectFFT(array(1.0,4,6,1,4,6,1,4,6,1,4,6,1,4,6,1,4,6)) AS p",
    )
    t = list(r["t"])
    # 45 is the one extreme outlier; everything inside the fences is 0
    assert t[9] > 20 and t[9] == max(t)
    assert sum(1 for v in t if v != 0) <= 2  # 45 always; 15 is borderline
    assert all(v >= 0 for v in t)  # high-side outliers carry positive scores
    assert r["p"] == pytest.approx(3.0)
    # constant series: no dominant frequency -> NULL (documented; CH NaN)
    c = one(eng, "SELECT seriesPeriodDetectFFT(array(5.0, 5, 5, 5, 5, 5)) AS p")["p"]
    assert c is None


def test_array_aucpr(eng):
    r = one(
        eng,
        "SELECT arrayAUCPR(array(0.1, 0.4, 0.35, 0.8), array(0.0, 0, 1, 1)) AS a, "
        "arrayAUCPR(array(0.9, 0.8, 0.1), array(1.0, 1, 0)) AS perfect, "
        "arrayAUCPR(array(0.9, 0.8), array(0.0, 0)) AS nopos",
    )
    assert r["a"] == pytest.approx(0.8333333333, rel=1e-9)  # CH docs example
    assert r["perfect"] == pytest.approx(1.0)
    assert r["nopos"] == 0.0


def test_jump_consistent_hash(eng):
    r = one(
        eng,
        "SELECT jumpConsistentHash(256, 4) AS a, jumpConsistentHash(42, 57) AS b",
    )
    assert r["a"] == 3  # CH docs golden
    assert 0 <= r["b"] < 57
    # consistency invariant over a key range: growing 7 -> 8 buckets only
    # moves keys INTO bucket 7
    rows = eng.sql(
        "SELECT id, jumpConsistentHash(id, 7) AS h7, jumpConsistentHash(id, 8) AS h8 "
        "FROM range(200)"
    ).collect()
    moved = [r for r in rows if r["h7"] != r["h8"]]
    assert all(r["h8"] == 7 for r in moved)
    assert 0 < len(moved) < 60  # ~1/8 of 200


def test_misc_batch24(eng):
    r = one(
        eng,
        "SELECT makeDate32(2024, 2, 29) AS a, makeDate32(2024, 60) AS b, "
        "L2SquaredDistance(array(0.0, 0.0), array(3.0, 4.0)) AS c, "
        "timezoneOffset(toDateTime('2024-01-01 00:00:00')) AS d",
    )
    assert str(r["a"]) == "2024-02-29"
    assert str(r["b"]) == "2024-02-29"  # day-of-year form
    assert r["c"] == 25.0
    assert r["d"] == 0  # test sessions run UTC


def test_batch24_loud_gates(eng):
    for sql, frag in [
        # seriesDecomposeSTL graduated to a real rewrite in r10 — covered
        # by tests/test_stl.py (the gate row here became the rewrite)
        ("SELECT tupleHammingDistance((1,2), (2,2)) AS a", "zip_with"),
        ("SELECT kostikConsistentHash(42, 2) AS a", "jumpConsistentHash"),
        # sequenceNextNode graduated to a real rewrite in r9 — covered by
        # tests/test_ch_dialect26.py; an unsupported combo still refuses
        (
            "SELECT sequenceNextNode('forward', 'tail')(ts, event_type, "
            "true, event_type = 'click') AS a "
            "FROM (SELECT 1 AS ts, 'click' AS event_type)",
            "combos",
        ),
    ]:
        with pytest.raises(NotImplementedError, match=frag):
            eng.sql(sql).collect()
