"""Dialect batch 26 (round 9): sequenceNextNode — CH's experimental
funnel-family aggregate, graduated from a gate to a real rewrite (all
four documented (direction, base) combos over the sorted per-group event
array, pure JVM array logic, ANSI-safe indexing).

Golden sources: the ClickHouse docs' test_flow head example (flow
A->B->C at the head with base/event conditions page='A', page='A',
page='B' → 'C'), plus an in-test brute-force reference implementing the
documented semantics verbatim for every combo over adversarial flows
(single-event users, no-match users, chains running off either end).
"""

import pytest

from clickhousedatamocker_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("wh26")))


def one(eng, sql):
    rows = eng.sql(sql).collect()
    assert len(rows) == 1
    return rows[0]


_FLOWS = {
    1: list("ABCEF"),   # the docs' head-example shape
    2: list("BAABC"),
    3: list("AABCA"),
    4: ["B"],           # single event: every chain runs off an end
    5: ["X"],           # no condition ever matches
}


@pytest.fixture(scope="module")
def flow_view(spark):
    rows = [
        (i, s + 1, p) for i, fl in _FLOWS.items() for s, p in enumerate(fl)
    ]
    spark.createDataFrame(rows, "id int, dt int, page string").createOrReplaceTempView(
        "snn_flow"
    )


def _ref(base, bcond, conds):
    """Brute force straight from the documented semantics."""
    out = {}
    for i, evs in _FLOWS.items():
        n = len(conds)
        r = None

        def c(j, idx):
            return 0 <= idx < len(evs) and conds[j](evs[idx])

        if base == "head":
            if bcond(evs[0]) and all(c(j, j) for j in range(n)) and len(evs) > n:
                r = evs[n]
        elif base == "tail":
            last = len(evs) - 1
            if bcond(evs[-1]) and all(c(j, last - j) for j in range(n)) and len(evs) > n:
                r = evs[last - n]
        elif base == "first_match":
            bi = next((k for k in range(len(evs)) if conds[0](evs[k])), None)
            if bi is not None and bcond(evs[bi]) and all(c(j, bi + j) for j in range(n)):
                r = evs[bi + n] if bi + n < len(evs) else None
        else:  # last_match
            bi = next((k for k in range(len(evs) - 1, -1, -1) if conds[0](evs[k])), None)
            if bi is not None and bcond(evs[bi]) and all(c(j, bi - j) for j in range(n)):
                r = evs[bi - n] if bi - n >= 0 else None
        out[i] = r
    return out


def _run(eng, direction, base, bcond_sql, cond_sqls):
    q = (
        f"SELECT id, sequenceNextNode('{direction}', '{base}')(dt, page, "
        f"{bcond_sql}, " + ", ".join(cond_sqls) + ") AS nx FROM snn_flow GROUP BY id"
    )
    return {r["id"]: r["nx"] for r in eng.sql(q).collect()}


def test_snn_ch_docs_head_golden(eng, flow_view):
    """CH docs: sequenceNextNode('forward','head')(dt, page, page='A',
    page='A', page='B') over flow A->B->C->... returns 'C'."""
    got = _run(eng, "forward", "head", "page = 'A'", ["page = 'A'", "page = 'B'"])
    assert got[1] == "C"
    assert got[2] is None  # head is 'B': base_condition fails
    assert got[3] is None  # head 'A' matches but second event is 'A', not 'B'


@pytest.mark.parametrize(
    "direction,base,bcond_sql,cond_sqls,bcond,conds",
    [
        ("forward", "head", "true", ["page = 'B'"], lambda p: True, [lambda p: p == "B"]),
        (
            "backward", "tail", "true", ["page IN ('F','C','A')"],
            lambda p: True, [lambda p: p in "FCA"],
        ),
        (
            "backward", "tail", "true", ["page = 'C'", "page = 'B'"],
            lambda p: True, [lambda p: p == "C", lambda p: p == "B"],
        ),
        ("forward", "first_match", "true", ["page = 'B'"], lambda p: True, [lambda p: p == "B"]),
        (
            "forward", "first_match", "true", ["page = 'B'", "page = 'C'"],
            lambda p: True, [lambda p: p == "B", lambda p: p == "C"],
        ),
        # base_condition can veto the matched base point
        ("forward", "first_match", "page = 'B'", ["page = 'A'"], lambda p: p == "B", [lambda p: p == "A"]),
        ("backward", "last_match", "true", ["page = 'B'"], lambda p: True, [lambda p: p == "B"]),
        (
            "backward", "last_match", "true", ["page = 'B'", "page = 'A'"],
            lambda p: True, [lambda p: p == "B", lambda p: p == "A"],
        ),
    ],
)
def test_snn_matches_brute_force(eng, flow_view, direction, base, bcond_sql, cond_sqls, bcond, conds):
    assert _run(eng, direction, base, bcond_sql, cond_sqls) == _ref(base, bcond, conds)


def test_snn_null_rules_and_refusals(eng, flow_view):
    # NULL conditions read as false (CH bitset parity), NULL timestamps drop
    got = {
        r["id"]: r["nx"]
        for r in eng.sql(
            "SELECT id, sequenceNextNode('forward', 'head')("
            "CASE WHEN dt = 3 THEN NULL ELSE dt END, page, true, "
            "CASE WHEN page = 'A' THEN true END) AS nx "
            "FROM snn_flow GROUP BY id"
        ).collect()
    }
    # id 1: event at dt=3 ('C') dropped -> flow A,B,E,F; head 'A' matches -> 'B'
    assert got[1] == "B"
    assert got[2] is None  # head 'B': NULL condition = false, not a crash
    with pytest.raises(Exception, match="combos"):
        eng.sql(
            "SELECT sequenceNextNode('backward', 'head')(dt, page, true, "
            "page = 'A') FROM snn_flow"
        ).collect()
    with pytest.raises(Exception, match="direction, base"):
        eng.sql(
            "SELECT sequenceNextNode(dt, page, true, page = 'A') FROM snn_flow"
        ).collect()


# ---------------------------------------------------------------------------
# batch 26: probe-driven stragglers (the probe found five spellings falling
# through to Spark's UNRESOLVED_ROUTINE — the one failure mode this layer
# bans — plus two implementable gates)


def test_positive_modulo_and_make_datetime64(eng):
    assert one(eng, "SELECT positiveModulo(-5, 3) AS a")["a"] == 1
    assert one(eng, "SELECT positive_modulo(7, 3) AS a")["a"] == 1
    assert (
        str(one(eng, "SELECT makeDateTime64(2026, 1, 1, 12, 30, 5) AS a")["a"])
        == "2026-01-01 12:30:05"
    )
    # fraction in 10^-precision units, CH default precision 3
    assert (
        str(one(eng, "SELECT makeDateTime64(2026, 1, 1, 12, 30, 5, 250) AS a")["a"])
        == "2026-01-01 12:30:05.250000"
    )
    assert (
        str(one(eng, "SELECT makeDateTime64(2026, 1, 1, 12, 30, 5, 7, 1) AS a")["a"])
        == "2026-01-01 12:30:05.700000"
    )
    with pytest.raises(Exception, match="microseconds"):
        eng.sql("SELECT makeDateTime64(2026, 1, 1, 12, 30, 5, 1, 9)").collect()


def test_vector_normalize_family(eng):
    assert one(eng, "SELECT L2Normalize([3.0, 4.0]) AS a")["a"] == [0.6, 0.8]
    assert one(eng, "SELECT L1Normalize([1.0, -3.0]) AS a")["a"] == [0.25, -0.75]
    assert one(eng, "SELECT LinfNormalize([2.0, -4.0]) AS a")["a"] == [0.5, -1.0]


def test_generate_ulid_shape(eng):
    import re

    r = one(eng, "SELECT generateULID() AS a, generateULID(1) AS b")
    for v in (r["a"], r["b"]):
        assert re.fullmatch(r"[0-9A-HJKMNP-TV-Z]{26}", v), v
    assert r["a"] != r["b"]  # independent randomness per call
    # the 10-char prefix decodes to unix-millis near now (within a day)
    import time

    alpha = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    ms = 0
    for c in r["a"][:10]:
        ms = ms * 32 + alpha.index(c)
    assert abs(ms / 1000.0 - time.time()) < 86400


def test_anova_textbook_golden(eng):
    """Groups (1,2,3), (4,5,6), (7,8,9): SSB = 54 (df 2), SSW = 6 (df 6)
    -> F = 27.0, and the 0.1% critical value of F(2,6) is exactly 27.0
    (classic table value), so p = 0.001."""
    r = one(
        eng,
        "SELECT analysisOfVariance(v, g) AS a FROM (VALUES "
        "(1.0,0),(2.0,0),(3.0,0),(4.0,1),(5.0,1),(6.0,1),"
        "(7.0,2),(8.0,2),(9.0,2)) AS t(v, g)",
    )["a"]
    assert r["f_statistic"] == pytest.approx(27.0, rel=1e-12)
    assert r["p_value"] == pytest.approx(0.001, rel=1e-6)
    # the 'anova' alias and the degenerate single-group NULL contract
    r2 = one(
        eng,
        "SELECT anova(v, g) AS a FROM (VALUES (1.0,0),(2.0,0)) AS t(v, g)",
    )["a"]
    assert r2["f_statistic"] is None and r2["p_value"] is None


def test_sum_map_filtered(eng):
    r = one(
        eng,
        "SELECT sumMapFiltered([1, 3])([1, 2, 3], [10.0, 20.0, 30.0]) AS a",
    )["a"]
    assert list(r["keys"]) == [1, 3]
    assert list(r["values"]) == [10.0, 30.0]


def test_running_concurrency_gate(eng):
    with pytest.raises(NotImplementedError, match="range join|sweep"):
        eng.sql(
            "SELECT runningConcurrency(ts, ts) FROM (SELECT current_timestamp() AS ts)"
        ).collect()


def test_sum_map_filtered_map_form(eng):
    # the Map-column form keeps sumMap's modern Map return shape
    r = one(
        eng,
        "SELECT sumMapFiltered([1, 3])(m) AS a FROM "
        "(SELECT map(1, 10.0, 2, 20.0) AS m UNION ALL SELECT map(3, 5.0, 1, 1.0))",
    )["a"]
    assert r == {1: 11.0, 3: 5.0}


def test_json_type_and_visitparam_aliases(eng):
    r = one(
        eng,
        "SELECT JSONType('{\"a\": 1}') AS o, JSONType('{\"a\": 1}', 'a') AS i, "
        "JSONType('{\"a\": \"123\"}', 'a') AS s, JSONType('{\"a\": null}', 'a') AS n, "
        "JSONType('{\"a\": 1}', 'zz') AS miss, JSONType('not json') AS bad",
    )
    # real parse: '123'-the-string stays String (get_json_object cannot tell)
    assert (r["o"], r["i"], r["s"], r["n"]) == ("Object", "Int64", "String", "Null")
    # CH docs: a value that does not exist reads as 'Null' (same as an
    # explicit JSON null); unparseable input is SQL NULL
    assert r["miss"] == "Null" and r["bad"] is None
    v = one(
        eng,
        "SELECT visitParamExtractString('{\"k\": \"v\"}', 'k') AS a, "
        "visitParamExtractInt('{\"k\": 7}', 'k') AS b, "
        "visitParamHas('{\"k\": 7}', 'k') AS c, "
        "visitParamExtractRaw('{\"k\": {\"x\": 1}}', 'k') AS d, "
        "visitParamExtractUInt('{\"k\": -7}', 'k') AS u, "
        "visitParamExtractUInt('{\"k\": 7}', 'k') AS u2, "
        "visitParamExtractUInt('{\"k\": 7}', 'zz') AS u3",
    )
    assert (v["a"], v["b"], v["c"]) == ("v", 7, True)
    assert v["d"].replace(" ", "") == '{"x":1}'
    # UInt parses UNSIGNED: '-7' reads as 0 (CH contract); missing stays NULL
    assert (v["u"], v["u2"], v["u3"]) == (0, 7, None)


def test_ip_address_in_range(eng):
    r = one(
        eng,
        "SELECT isIPAddressInRange('127.0.0.1', '127.0.0.0/8') AS a, "
        "isIPAddressInRange('128.0.0.1', '127.0.0.0/8') AS b, "
        "isIPAddressInRange('::ffff:192.168.0.1', '::ffff:192.168.0.0/120') AS c, "
        "isIPAddressInRange('192.168.0.1', '::/0') AS d, "  # mixed families
        "isIPAddressInRange('not-an-ip', '10.0.0.0/8') AS e, "
        "isIPAddressInRange('10.0.0.1', 'garbage') AS f",
    )
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (True, False, True, False, False)
    assert r["f"] is None  # invalid CIDR: NULL, documented CH-throws deviation


def test_default_value_of_type_name(eng):
    r = one(
        eng,
        "SELECT defaultValueOfTypeName('UInt8') AS a, "
        "defaultValueOfTypeName('String') AS b, "
        "defaultValueOfTypeName('DateTime64(3)') AS c, "
        "defaultValueOfTypeName('Float64') AS d",
    )
    assert r["a"] == 0 and r["b"] == "" and r["d"] == 0.0
    assert str(r["c"]) == "1970-01-01 00:00:00"
    with pytest.raises(NotImplementedError, match="no default mapped"):
        eng.sql("SELECT defaultValueOfTypeName('AggregateFunction(sum, UInt64)')").collect()
    with pytest.raises(NotImplementedError, match="field introspection"):
        eng.sql("SELECT tupleConcat((1, 2), (3, 4))").collect()


def test_to_year_week_modes(eng):
    """Mode 0 = MySQL YEARWEEK default: 2026's first Sunday is Jan 4, so
    Jan 3 still belongs to 2025's week 52; mode 3 = ISO (2026-01-01 is a
    Thursday -> ISO week 1 of 2026, and 2027-01-01 a Friday -> ISO week
    53 of 2026)."""
    r = one(
        eng,
        "SELECT toYearWeek(toDate('2026-01-04')) AS a, "
        "toYearWeek(toDate('2026-01-03')) AS b, "
        "toYearWeek(toDate('2026-12-31')) AS c, "
        "toYearWeek(toDate('2026-01-01'), 3) AS d, "
        "toYearWeek(toDate('2027-01-01'), 3) AS e",
    )
    assert (r["a"], r["b"], r["c"]) == (202601, 202552, 202652)
    assert (r["d"], r["e"]) == (202601, 202653)
    with pytest.raises(NotImplementedError, match="edge weeks"):
        eng.sql("SELECT toYearWeek(toDate('2026-01-01'), 1)").collect()
    # normalizedQueryHash: stable per engine, sensitive to the normalized
    # shape only (the cityHash64 same-engine policy)
    h = one(
        eng,
        "SELECT normalizedQueryHash('SELECT 1 + 2') AS a, "
        "normalizedQueryHash('SELECT 3 + 4') AS b, "
        "normalizedQueryHash('SELECT a FROM t') AS c, "
        "normalizedQueryHash('SELECT b FROM t') AS d",
    )
    assert h["a"] == h["b"]  # literals normalize away
    assert h["c"] != h["d"]  # identifiers do not


def test_review_fix_arity_and_sign_refusals(eng):
    """Round-9 review findings: a non-positive EMA half-life must refuse
    (a finite wrong value would come back otherwise), and KS must reject
    a third parameter instead of letting the last method win."""
    with pytest.raises(NotImplementedError, match="half-life must be > 0"):
        eng.sql("SELECT exponentialMovingAverage(-2)(v, t) FROM (VALUES (1.0, 1.0)) AS x(v, t)").collect()
    with pytest.raises(NotImplementedError, match="half-life must be > 0"):
        eng.sql("SELECT exponentialMovingAverage(0)(v, t) FROM (VALUES (1.0, 1.0)) AS x(v, t)").collect()
    with pytest.raises(NotImplementedError, match="at most"):
        eng.sql(
            "SELECT kolmogorovSmirnovTest('two-sided', 'exact', 'asymptotic')(v, g) "
            "FROM (VALUES (1.0, 0), (2.0, 1)) AS t(v, g)"
        ).collect()


def test_map_apply_real_rewrite(eng):
    """mapApply's tuple-returning lambda graduates: parsed textually over
    map_entries (params shadow outer names, CH rule)."""
    r = one(
        eng,
        "SELECT mapApply((k, v) -> (k, v * 2), map('a', 1, 'b', 2)) AS a, "
        "mapApply((k, v) -> (concat(k, '!'), v + 1), map('x', 10)) AS b, "
        "mapApply((k, v) -> tuple(upper(k), v), map('y', 5)) AS c",
    )
    assert r["a"] == {"a": 2, "b": 4}
    assert r["b"] == {"x!": 11}
    assert r["c"] == {"Y": 5}
    # param substitution must not touch string literals in the body
    r2 = one(
        eng,
        "SELECT mapApply((k, v) -> (concat(k, 'k'), v), map('z', 1)) AS a",
    )["a"]
    assert r2 == {"zk": 1}
    with pytest.raises(NotImplementedError, match="tuple"):
        eng.sql("SELECT mapApply((k, v) -> k, map('a', 1))").collect()


def test_probe_wave4_stragglers(eng):
    r = one(
        eng,
        "SELECT formatDateTimeInJodaSyntax(toDateTime('2026-01-02 03:04:05'), 'yyyy-MM-dd HH:mm') AS j, "
        "parseDateTimeBestEffortOrNull('2026-01-02T03:04:05Z') AS p, "
        "parseDateTimeBestEffortOrNull('garbage') AS pn, "
        "parseDateTimeBestEffortOrZero('garbage') AS pz, "
        "parseDateTime32BestEffort('2026-01-02 03:04:05') AS p32, "
        "bitmapToArray(subBitmap(bitmapBuild([1,2,3,4,5]), toUInt32(1), toUInt32(3))) AS sb, "
        "toStringCutToZero(concat('ab', chr(0), 'cd')) AS z, "
        "toStringCutToZero('plain') AS z2, "
        "toNullable(7) AS tn, "
        "pointInEllipses(10.0, 10.0, 10.0, 9.5, 1.0, 1.0) AS e1, "
        "pointInEllipses(5.0, 5.0, 10.0, 9.5, 1.0, 1.0) AS e0, "
        "pointInEllipses(5.0, 5.0, 10.0, 9.5, 1.0, 1.0, 5.0, 5.0, 2.0, 2.0) AS e2",
    )
    assert r["j"] == "2026-01-02 03:04"
    assert str(r["p"]).startswith("2026-01-02") and r["pn"] is None
    assert str(r["pz"]) == "1970-01-01 00:00:00"
    assert str(r["p32"]) == "2026-01-02 03:04:05"
    assert list(r["sb"]) == [2, 3, 4]  # CH docs example shape: 0-based offset
    assert r["z"] == "ab" and r["z2"] == "plain"
    assert r["tn"] == 7
    assert (r["e1"], r["e0"], r["e2"]) == (1, 0, 1)
    with pytest.raises(NotImplementedError, match="timezone"):
        eng.sql("SELECT parseDateTimeBestEffortOrNull('x', 'UTC')").collect()


def test_probe_wave5_arity_and_variadic_gaps(eng):
    r = one(
        eng,
        "SELECT xor(1, 0) AS x1, xor(1, 1) AS x0, xor(1, 0, 1) AS x3, "
        "arraySlice([1,2,3,4], 2, 2) AS s3, arraySlice([1,2,3,4], 2) AS s2, "
        "arraySlice([1,2,3,4], -2) AS sn, "
        "arrayStringConcat(['a','b']) AS c1, arrayStringConcat(['a','b'], '-') AS c2, "
        "arrayUniq([1,1,2]) AS u1, arrayUniq([1,2,1], [3,3,3]) AS u2, "
        "date_sub(DAY, 3, toDate('2026-01-10')) AS d3, "
        "date_sub(toDate('2026-01-10'), 3) AS d2, "
        "dateSub(MONTH, 1, toDate('2026-03-15')) AS dm, "
        "toDecimal32OrNull('42.125', 2) AS dn, toDecimal32OrNull('xx', 2) AS dnn, "
        "toDecimal64OrZero('xx', 3) AS dz",
    )
    assert (r["x1"], r["x0"], r["x3"]) == (1, 0, 0)
    assert list(r["s3"]) == [2, 3] and list(r["s2"]) == [2, 3, 4] and list(r["sn"]) == [3, 4]
    assert (r["c1"], r["c2"]) == ("ab", "a-b")
    # multi-array arrayUniq counts distinct POSITION TUPLES: (1,3),(2,3),(1,3) -> 2
    assert (r["u1"], r["u2"]) == (2, 2)
    assert str(r["d3"]).startswith("2026-01-07") and str(r["d2"]) == "2026-01-07"
    assert str(r["dm"]).startswith("2026-02-15")
    # CH TRUNCATES excess fractional digits (42.125 @ 2 -> 42.12, not the
    # cast's half-up 42.13) — round-9 second-review finding
    assert str(r["dn"]) == "42.12" and r["dnn"] is None and str(r["dz"]) == "0.000"


def test_probe_wave6_combinators_and_mac(eng):
    r = one(
        eng,
        "SELECT avgForEach(arr) AS a FROM "
        "(SELECT [1.0, 2.0] AS arr UNION ALL SELECT [3.0, 6.0])",
    )["a"]
    assert list(r) == [2.0, 4.0]
    r = one(
        eng,
        # CH docs: MACNumToString(1108152157446) = '01:02:03:04:05:06';
        # letter digits are UPPERCASE hex (the second golden catches casing)
        "SELECT MACNumToString(1108152157446) AS a, "
        "MACStringToNum('01:02:03:04:05:06') AS b, "
        "MACStringToOUI('01:02:03:04:05:06') AS c, "
        "MACNumToString(281474976710655) AS d",
    )
    assert r["a"] == "01:02:03:04:05:06"
    assert r["b"] == 1108152157446
    assert r["c"] == 66051  # 0x010203
    assert r["d"] == "FF:FF:FF:FF:FF:FF"
    q = one(
        eng,
        "SELECT quantilesTimingWeighted(0.5, 0.9)(v, w) AS a FROM "
        "(VALUES (1.0, 1), (2.0, 1), (3.0, 2)) AS t(v, w)",
    )["a"]
    assert len(q) == 2 and q[0] <= q[1]
    with pytest.raises(NotImplementedError, match="SETTINGS"):
        eng.sql("SELECT getSetting('max_threads')").collect()


def test_second_review_fixes(eng):
    """Round-9 second-review findings: mapApply params named key/value must
    not corrupt each other's substitutions; nested lambdas refuse loudly;
    arraySlice accepts CH's negative-length open-slice form; decimal
    truncation is exact on plain decimal strings."""
    r = one(
        eng,
        "SELECT mapApply((value, key) -> (concat(value, '!'), key), map('a', 1)) AS a, "
        "mapApply((k, key) -> (k, key + 1), map('b', 5)) AS b",
    )
    assert r["a"] == {"a!": 1}
    assert r["b"] == {"b": 6}
    with pytest.raises(NotImplementedError, match="NESTED lambda"):
        eng.sql(
            "SELECT mapApply((k, v) -> (k, aggregate(array(v), 0, (acc, x) -> acc + x)), map('a', 1))"
        ).collect()
    s = one(
        eng,
        "SELECT arraySlice([1,2,3,4,5], 2, -1) AS a, "
        "arraySlice([1,2,3,4,5], -4, -2) AS b, "
        "arraySlice([1,2,3], 1, -5) AS c",
    )
    assert list(s["a"]) == [2, 3, 4]
    assert list(s["b"]) == [2, 3]      # start at 2nd-from... -4 -> index 2; end 5-2=3
    assert list(s["c"]) == []          # length collapses below zero -> empty
    d = one(
        eng,
        "SELECT toDecimal32OrNull('-42.129', 2) AS a, "
        "toDecimal64OrNull('7.999999', 0) AS b, "
        "toDecimal32OrNull(42.125, 2) AS c",
    )
    assert str(d["a"]) == "-42.12"  # toward zero, not half-up
    assert str(d["b"]) == "7"       # s=0: the whole fraction is discarded
    assert str(d["c"]) == "42.12"


def test_rank_corr_and_group_array_insert_at(eng):
    """Two more gate graduations: Spearman rankCorr (textbook golden:
    perfectly monotone -> 1.0, reversed -> -1.0; tied data vs the
    hand-computed midrank value) and groupArrayInsertAt (explicit
    positions, gap fill, min-collision rule)."""
    r = one(
        eng,
        "SELECT rankCorr(x, y) AS up FROM (VALUES (1.0, 10.0), (2.0, 20.0), (3.0, 25.0)) AS t(x, y)",
    )["up"]
    assert r == pytest.approx(1.0, abs=1e-12)
    r = one(
        eng,
        "SELECT rankCorr(x, y) AS dn FROM (VALUES (1.0, 9.0), (2.0, 5.0), (3.0, 1.0)) AS t(x, y)",
    )["dn"]
    assert r == pytest.approx(-1.0, abs=1e-12)
    # ties: x=(1,2,2,4), y=(1,2,3,4): x midranks (1, 2.5, 2.5, 4) vs
    # y ranks (1,2,3,4) -> rho = 0.9486832980505138 (hand-computed)
    r = one(
        eng,
        "SELECT rankCorr(x, y) AS t FROM (VALUES (1.0,1.0),(2.0,2.0),(2.0,3.0),(4.0,4.0)) AS t(x, y)",
    )["t"]
    assert r == pytest.approx(0.9486832980505138, rel=1e-12)
    # degenerate: constant side -> NULL
    r = one(
        eng,
        "SELECT rankCorr(x, y) AS c FROM (VALUES (1.0, 5.0), (2.0, 5.0)) AS t(x, y)",
    )["c"]
    assert r is None

    g = one(
        eng,
        "SELECT groupArrayInsertAt('-', 5)(v, p) AS a, "
        "groupArrayInsertAt(v, p) AS b "
        "FROM (VALUES ('x', 1), ('y', 3)) AS t(v, p)",
    )
    assert list(g["a"]) == ["-", "x", "-", "y", "-"]
    assert list(g["b"]) == [None, "x", None, "y"]  # no default: NULL gaps
    # collision keeps the MINIMUM (deterministic where CH is arbitrary)
    g2 = one(
        eng,
        "SELECT groupArrayInsertAt('z', 2)(v, p) AS a "
        "FROM (VALUES ('b', 0), ('a', 0)) AS t(v, p)",
    )["a"]
    assert list(g2) == ["a", "z"]


def test_group_array_insert_at_guards(eng):
    """r9 ADVICE guards: a negative position errors loudly (CH's UInt32
    position refuses at parse/insert time — silently vanishing rows would
    drift), and a huge derived array length hits the 1048576 sanity cap
    instead of materializing."""
    with pytest.raises(Exception, match="negative position"):
        eng.sql(
            "SELECT groupArrayInsertAt(v, p) AS a "
            "FROM (VALUES ('x', 1), ('y', -2)) AS t(v, p)"
        ).collect()
    with pytest.raises(Exception, match="sanity cap"):
        eng.sql(
            "SELECT groupArrayInsertAt(v, p) AS a "
            "FROM (VALUES ('x', 2000000)) AS t(v, p)"
        ).collect()
    # the guards must not disturb the valid path
    g = one(
        eng,
        "SELECT groupArrayInsertAt('-', 3)(v, p) AS a "
        "FROM (VALUES ('x', 0), ('y', 2)) AS t(v, p)",
    )["a"]
    assert list(g) == ["x", "-", "y"]


def test_json_type_integer_index_gate(eng):
    """r9 ADVICE: CH's integer second argument to JSONType is 1-based
    indexing — refuse loudly instead of coercing it to a string key and
    answering 'Null' for a valid index."""
    with pytest.raises(NotImplementedError, match="integer index"):
        eng.sql("SELECT JSONType('[1, \"a\"]', 2) AS t")
    with pytest.raises(NotImplementedError, match="integer index"):
        eng.sql("SELECT JSONType('[1, \"a\"]', -1) AS t")
    # string keys keep working
    r = one(eng, "SELECT JSONType('{\"a\": [1]}', 'a') AS t")["t"]
    assert r == "Array"
