"""CH geo + base58 functions as Arrow-batched pandas UDFs.

These are the few probe-surface functions a pure SQL expression can't
express cleanly (geohash bit interleaving, big-integer base conversion,
ray casting over variable-length rings). Each is a VECTORIZED pandas UDF
— Arrow batch transfer, numpy inner loops bounded by precision (<=60
iterations) or ring size, never a per-row Python callback in the plan
(these appear as ArrowEvalPython, not BatchEvalPython).

Reference surface (public ClickHouse docs, geo / encoding sections):
  geohashEncode(longitude, latitude[, precision=12]) -> String
  geohashDecode(s) -> (longitude, latitude) tuple (cell center)
  pointInPolygon((x, y), [(x1, y1), ...]) -> UInt8
  base58Encode / base58Decode (Bitcoin alphabet)

The SQL spellings are wired through functions/compat.py parametric
rewrites (pointInPolygon's tuple literals become struct-free lon/lat
array pairs; geohashEncode gets its default precision filled in).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INV = {c: i for i, c in enumerate(_BASE32)}
_BASE58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_BASE58_INV = {c: i for i, c in enumerate(_BASE58)}


def _geohash_encode(lon: pd.Series, lat: pd.Series, prec: pd.Series) -> pd.Series:
    """Vectorized geohash: the loop is over BITS (5 * precision <= 60),
    each step a numpy bisection over the whole batch."""
    n = len(lon)
    lo_lon = np.full(n, -180.0)
    hi_lon = np.full(n, 180.0)
    lo_lat = np.full(n, -90.0)
    hi_lat = np.full(n, 90.0)
    lonv = lon.to_numpy(dtype=np.float64)
    latv = lat.to_numpy(dtype=np.float64)
    # CH contract: any precision outside [1, 12] is silently converted to
    # 12 (r11 wave-28b finding — a low clamp answered geohashEncode(.., 0)
    # with a 1-char hash where CH emits 12 chars)
    rawp = prec.fillna(12).to_numpy(dtype=np.int64)
    precv = np.where((rawp < 1) | (rawp > 12), 12, rawp)
    max_bits = int(precv.max()) * 5 if n else 0
    codes = np.zeros((n, (max_bits + 4) // 5), dtype=np.int64)
    for bit in range(max_bits):
        if bit % 2 == 0:  # even bit: longitude
            mid = (lo_lon + hi_lon) / 2
            b = lonv >= mid
            lo_lon = np.where(b, mid, lo_lon)
            hi_lon = np.where(b, hi_lon, mid)
        else:
            mid = (lo_lat + hi_lat) / 2
            b = latv >= mid
            lo_lat = np.where(b, mid, lo_lat)
            hi_lat = np.where(b, hi_lat, mid)
        codes[:, bit // 5] = codes[:, bit // 5] * 2 + b
    out = [
        "".join(_BASE32[codes[i, j]] for j in range(int(precv[i])))
        for i in range(n)
    ]
    return pd.Series(out)


def _geohash_decode(s: pd.Series) -> pd.DataFrame:
    lons, lats = [], []
    for v in s:
        lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
        bit = 0
        for c in str(v):
            code = _BASE32_INV.get(c)
            if code is None:
                break
            for k in range(4, -1, -1):
                b = (code >> k) & 1
                if bit % 2 == 0:
                    mid = (lo_lon + hi_lon) / 2
                    lo_lon, hi_lon = (mid, hi_lon) if b else (lo_lon, mid)
                else:
                    mid = (lo_lat + hi_lat) / 2
                    lo_lat, hi_lat = (mid, hi_lat) if b else (lo_lat, mid)
                bit += 1
        lons.append((lo_lon + hi_lon) / 2)
        lats.append((lo_lat + hi_lat) / 2)
    return pd.DataFrame({"longitude": lons, "latitude": lats})


def _point_in_polygon(
    x: pd.Series, y: pd.Series, xs: pd.Series, ys: pd.Series
) -> pd.Series:
    """Ray casting with on-edge counted IN (CH's contract); the per-row
    work is numpy over the ring's vertices."""
    out = np.zeros(len(x), dtype=np.int64)
    for i in range(len(x)):
        px, py = float(x.iloc[i]), float(y.iloc[i])
        vx = np.asarray(xs.iloc[i], dtype=np.float64)
        vy = np.asarray(ys.iloc[i], dtype=np.float64)
        if vx.size < 3:
            continue
        x1, y1 = vx, vy
        x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
        # on-edge test: collinear AND within the segment's bbox
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        on_edge = (
            (np.abs(cross) < 1e-12)
            & (px >= np.minimum(x1, x2) - 1e-12)
            & (px <= np.maximum(x1, x2) + 1e-12)
            & (py >= np.minimum(y1, y2) - 1e-12)
            & (py <= np.maximum(y1, y2) + 1e-12)
        )
        if on_edge.any():
            out[i] = 1
            continue
        crosses = ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        )
        out[i] = int(crosses.sum() % 2)
    return pd.Series(out)


def _base58_encode(s: pd.Series) -> pd.Series:
    out = []
    for v in s:
        raw = str(v).encode("utf-8")
        num = int.from_bytes(raw, "big")
        enc = ""
        while num:
            num, rem = divmod(num, 58)
            enc = _BASE58[rem] + enc
        # leading zero bytes encode as '1' each (Bitcoin convention)
        pad = len(raw) - len(raw.lstrip(b"\0"))
        out.append("1" * pad + enc)
    return pd.Series(out)


def _base58_decode(s: pd.Series) -> pd.Series:
    out = []
    for v in s:
        text = str(v)
        num = 0
        for c in text:
            d = _BASE58_INV.get(c)
            if d is None:
                raise ValueError(f"base58Decode: invalid character {c!r}")
            num = num * 58 + d
        raw = num.to_bytes((num.bit_length() + 7) // 8, "big") if num else b""
        pad = len(text) - len(text.lstrip("1"))
        out.append((b"\0" * pad + raw).decode("utf-8", errors="replace"))
    return pd.Series(out)


def _decode_html_component(s: pd.Series) -> pd.Series:
    """decodeHTMLComponent (batch 21): the FULL HTML5 named-entity table
    plus numeric references via stdlib ``html.unescape`` — the reason the
    earlier loud gate existed was that a hand-rolled 5-entity subset would
    silently pass &euro;/&nbsp;/&hellip; through; the stdlib table (same
    WHATWG list ClickHouse ships) removes that drift class. NULL in,
    NULL out."""
    import html as _html

    return s.map(lambda x: None if x is None else _html.unescape(x))


def _normalize_utf8(form: str):
    def f(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: None if x is None else unicodedata.normalize(form, x))

    return f


def _extract_groups(s: pd.Series, pat: pd.Series) -> pd.Series:
    """extractGroups(haystack, regexp): all capture groups of the FIRST
    match, [] when no match (CH contract). Group count is a property of
    the compiled regex — unknowable to a fixed-arity SQL expression,
    hence the Arrow path. Patterns are typically one literal per query;
    a tiny per-batch compile cache keeps that case at one compile."""
    import re as _re

    cache: dict[str, "_re.Pattern[str]"] = {}

    def one(x, p):
        if x is None or p is None:
            return None
        rx = cache.get(p)
        if rx is None:
            rx = cache[p] = _re.compile(p)
        m = rx.search(x)
        return [g if g is not None else "" for g in m.groups()] if m else []

    return pd.Series([one(x, p) for x, p in zip(s, pat)])


def register_python_functions(spark: SparkSession) -> None:
    """Register the Arrow-batched UDF surface under private ch-prefixed
    names; the public CH spellings route here via compat.py so argument
    defaults / tuple literals can be normalized textually first."""
    spark.udf.register(
        "chGeohashEncode",
        pandas_udf(_geohash_encode, "string"),
    )
    spark.udf.register(
        "chGeohashDecode",
        pandas_udf(_geohash_decode, "longitude double, latitude double"),
    )
    spark.udf.register(
        "chPointInPolygon",
        pandas_udf(_point_in_polygon, "bigint"),
    )
    spark.udf.register("base58Encode", pandas_udf(_base58_encode, "string"))
    spark.udf.register("base58Decode", pandas_udf(_base58_decode, "string"))
    # unicode normalization (CH normalizeUTF8NFC/NFD/NFKC/NFKD): needs the
    # unicode character database — stdlib unicodedata over Arrow batches
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        spark.udf.register(
            f"chNormalizeUTF8{form}", pandas_udf(_normalize_utf8(form), "string")
        )
    spark.udf.register(
        "chDecodeHTMLComponent", pandas_udf(_decode_html_component, "string")
    )
    spark.udf.register(
        "chExtractGroups", pandas_udf(_extract_groups, "array<string>")
    )


# ---------------------------------------------------------------------------
# batch 23: string-distance + codec UDFs (the former loud gates — each was
# "needs a UDF"; these are those UDFs)


def _osa_distance(a: str, b: str) -> int:
    """Damerau–Levenshtein, optimal-string-alignment variant (each substring
    may be edited once — the common DP; differs from unrestricted DL only
    on pathological cases like CA→ABC, documented at the rewrite site)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return n or m
    prev2: list[int] = []
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[m]


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str) -> float:
    """Winkler boost: p=0.1 over a common prefix capped at 4 (the standard
    parameters)."""
    j = _jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def _pair_str_udf(fn, out_cast=None):
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        out = [
            None if (x is None or y is None) else fn(x, y)
            for x, y in zip(a, b)
        ]
        return pd.Series(out, dtype="object" if out_cast is None else out_cast)

    return f


def _map_str(fn):
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else fn(x))

    return f


def _b32_encode(x: str) -> str:
    import base64

    return base64.b32encode(x.encode("utf-8")).decode("ascii")


def _b32_decode(x: str):
    import base64

    try:
        return base64.b32decode(x.encode("ascii")).decode("utf-8")
    except Exception:
        return None


def _form_encode(x: str) -> str:
    from urllib.parse import quote_plus

    return quote_plus(x)


def _form_decode(x: str) -> str:
    from urllib.parse import unquote_plus

    return unquote_plus(x)


def _punycode_encode(x: str):
    try:
        return x.encode("punycode").decode("ascii")
    except Exception:
        return None


def _punycode_decode(x: str):
    try:
        return x.encode("ascii").decode("punycode")
    except Exception:
        return None


def _idna_encode(x: str):
    try:
        return x.encode("idna").decode("ascii")
    except Exception:
        return None


def _idna_decode(x: str):
    try:
        return x.encode("ascii").decode("idna")
    except Exception:
        return None


def _morton_encode(vals: pd.Series) -> pd.Series:
    """mortonEncode over an array column: bit-interleave n coordinates
    (coordinate i contributes bit b to result bit b*n + i). Values must
    fit 63/n bits — loud per-row failure otherwise (silent wrap would be a
    wrong-answer trap)."""

    def one(arr):
        if arr is None:
            return None
        n = len(arr)
        if n == 0 or any(v is None for v in arr):
            return None
        limit = 63 // n
        out = 0
        for i, v in enumerate(arr):
            v = int(v)
            if v < 0 or v >> limit:
                raise ValueError(
                    f"mortonEncode: value {v} exceeds {limit} bits for {n} coordinates"
                )
            b = 0
            while v:
                if v & 1:
                    out |= 1 << (b * n + i)
                v >>= 1
                b += 1
        return out

    return vals.map(one)


def _morton_decode(n: pd.Series, code: pd.Series) -> pd.Series:
    def one(nv, cv):
        if nv is None or cv is None:
            return None
        nv, cv = int(nv), int(cv)
        # guard BEFORE the loop: a negative code never right-shifts to 0
        # (infinite loop), and n < 1 never consumes bits
        if nv < 1 or cv < 0:
            raise ValueError(
                f"mortonDecode: needs n >= 1 and a non-negative code, got ({nv}, {cv})"
            )
        out = [0] * nv
        b = 0
        while cv:
            for i in range(nv):
                if cv & (1 << i):
                    out[i] |= 1 << b
            cv >>= nv
            b += 1
        return out

    return pd.Series([one(a, b) for a, b in zip(n, code)])


def register_batch23_functions(spark: SparkSession) -> None:
    spark.udf.register(
        "chDamerauLevenshtein", pandas_udf(_pair_str_udf(_osa_distance), "int")
    )
    spark.udf.register(
        "chJaroSimilarity", pandas_udf(_pair_str_udf(_jaro), "double")
    )
    spark.udf.register(
        "chJaroWinkler", pandas_udf(_pair_str_udf(_jaro_winkler), "double")
    )
    spark.udf.register("chBase32Encode", pandas_udf(_map_str(_b32_encode), "string"))
    spark.udf.register("chBase32Decode", pandas_udf(_map_str(_b32_decode), "string"))
    spark.udf.register("chFormURLEncode", pandas_udf(_map_str(_form_encode), "string"))
    spark.udf.register("chFormURLDecode", pandas_udf(_map_str(_form_decode), "string"))
    spark.udf.register(
        "chPunycodeEncode", pandas_udf(_map_str(_punycode_encode), "string")
    )
    spark.udf.register(
        "chPunycodeDecode", pandas_udf(_map_str(_punycode_decode), "string")
    )
    spark.udf.register("chIdnaEncode", pandas_udf(_map_str(_idna_encode), "string"))
    spark.udf.register("chIdnaDecode", pandas_udf(_map_str(_idna_decode), "string"))
    spark.udf.register("chMortonEncode", pandas_udf(_morton_encode, "bigint"))
    spark.udf.register(
        "chMortonDecode", pandas_udf(_morton_decode, "array<bigint>")
    )


# ---------------------------------------------------------------------------
# batch 24: series analytics, all-matches group extraction, PR-AUC,
# jump consistent hash


def _extract_all_groups(s: pd.Series, pat: pd.Series, horizontal: bool) -> pd.Series:
    """extractAllGroupsVertical/Horizontal: every match's capture groups.
    Vertical = one row per MATCH ([g1, g2] per match); Horizontal = one row
    per GROUP (all of g1, then all of g2). Same per-batch compile cache as
    chExtractGroups."""
    import re as _re

    cache: dict[str, "_re.Pattern[str]"] = {}

    def one(x, p):
        if x is None or p is None:
            return None
        rx = cache.get(p)
        if rx is None:
            rx = cache[p] = _re.compile(p)
        matches = [
            [g if g is not None else "" for g in m.groups()] for m in rx.finditer(x)
        ]
        if not horizontal:
            return matches
        if not matches:
            return []
        return [list(col) for col in zip(*matches)]

    return pd.Series([one(x, p) for x, p in zip(s, pat)])


def _series_decompose_stl(s: pd.Series, p: pd.Series) -> pd.Series:
    """seriesDecomposeSTL(series, period) → [seasonal, trend, residue,
    baseline] as Float32 arrays (the CH docs contract) via the faithful
    numpy Cleveland-STL port (functions/stl.py — decomposition identity
    exact, bit parity with stl-cpp NOT guaranteed, see the module
    docstring). NULL series → NULL; CH's refusals (period < 2, series
    shorter than two periods, non-finite values) surface as errors."""
    import numpy as np

    from clickhousedatamocker_spark.functions.stl import stl_decompose

    out = []
    for series, period in zip(s, p):
        if series is None or period is None:
            out.append(None)
            continue
        season, trend, resid = stl_decompose(series, int(period))
        out.append(
            [
                np.asarray(season, dtype=np.float32),
                np.asarray(trend, dtype=np.float32),
                np.asarray(resid, dtype=np.float32),
                np.asarray(season + trend, dtype=np.float32),
            ]
        )
    return pd.Series(out, dtype=object)


def _tukey_outliers(s: pd.Series) -> pd.Series:
    """seriesOutliersDetectTukey: per element, the signed distance beyond
    the 1.5*IQR Tukey fences (0 inside). Quartiles via linear
    interpolation (numpy default), matching the public CH docs example."""

    def one(arr):
        if arr is None or len(arr) < 4:
            return None
        xs = np.asarray(arr, dtype=np.float64)
        q1, q3 = np.percentile(xs, [25, 75])
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        out = np.zeros(len(xs))
        out[xs < lo] = (xs - lo)[xs < lo]
        out[xs > hi] = (xs - hi)[xs > hi]
        return [float(v) for v in out]

    return s.map(one)


def _fft_period(s: pd.Series) -> pd.Series:
    """seriesPeriodDetectFFT: dominant period = n / argmax of the FFT
    magnitude over the mean-removed series (DC bin excluded); NULL when no
    dominant frequency stands out (constant series — CH returns NaN there;
    NULL is this engine's missing-value convention)."""

    def one(arr):
        if arr is None or len(arr) < 4:
            return None
        xs = np.asarray(arr, dtype=np.float64)
        xs = xs - xs.mean()
        mags = np.abs(np.fft.rfft(xs))
        if len(mags) < 2 or mags[1:].max() <= 1e-12:
            return None
        k = 1 + int(mags[1:].argmax())
        return float(round(len(xs) / k, 6))

    return s.map(one)


def _array_aucpr(scores: pd.Series, labels: pd.Series) -> pd.Series:
    """arrayAUCPR: area under the precision-recall curve by step
    integration (average precision — sum of precision at each positive,
    weighted by the recall step), ties broken by input order after a
    stable descending sort. Matches the public CH docs example."""

    def one(sc, lb):
        if sc is None or lb is None or len(sc) != len(lb) or not len(sc):
            return None
        sc = np.asarray(sc, dtype=np.float64)
        lb = np.asarray(lb, dtype=np.float64)
        n_pos = float((lb > 0).sum())
        if n_pos == 0:
            return 0.0
        order = np.argsort(-sc, kind="mergesort")
        tp = 0.0
        ap = 0.0
        for i, idx in enumerate(order, start=1):
            if lb[idx] > 0:
                tp += 1.0
                ap += (tp / i) * (1.0 / n_pos)
        return float(ap)

    return pd.Series([one(a, b) for a, b in zip(scores, labels)])


def _jump_consistent_hash(key: pd.Series, buckets: pd.Series) -> pd.Series:
    """Lamping & Veach 2014 jump consistent hash — the shard router that
    moves only 1/n of keys when a bucket is added. Unsigned 64-bit LCG
    arithmetic emulated with masks."""
    MASK = (1 << 64) - 1

    def one(k, n):
        if k is None or n is None or int(n) < 1:
            return None
        k = int(k) & MASK
        n = int(n)
        b, j = -1, 0
        while j < n:
            b = j
            k = (k * 2862933555777941757 + 1) & MASK
            j = int((b + 1) * (float(1 << 31) / float((k >> 33) + 1)))
        return b

    return pd.Series([one(a, b) for a, b in zip(key, buckets)], dtype="object")


def register_batch24_functions(spark: SparkSession) -> None:
    spark.udf.register(
        "chExtractAllGroupsVertical",
        pandas_udf(
            lambda s, p: _extract_all_groups(s, p, horizontal=False),
            "array<array<string>>",
        ),
    )
    spark.udf.register(
        "chExtractAllGroupsHorizontal",
        pandas_udf(
            lambda s, p: _extract_all_groups(s, p, horizontal=True),
            "array<array<string>>",
        ),
    )
    spark.udf.register(
        "chSeriesOutliersTukey", pandas_udf(_tukey_outliers, "array<double>")
    )
    spark.udf.register("chSeriesPeriodFFT", pandas_udf(_fft_period, "double"))
    spark.udf.register(
        "chSeriesDecomposeSTL", pandas_udf(_series_decompose_stl, "array<array<float>>")
    )
    spark.udf.register("chArrayAUCPR", pandas_udf(_array_aucpr, "double"))
    spark.udf.register(
        "chJumpConsistentHash", pandas_udf(_jump_consistent_hash, "bigint")
    )


# ---------------------------------------------------------------------------
# vocab batch 26 (round 9): JSON type introspection + IP range membership


def _json_type(j: pd.Series, k: pd.Series) -> pd.Series:
    """CH JSONType: the JSON type name of the document (or of key k).
    Real parse (json.loads), so '123'-the-string and 123-the-number are
    distinguished — get_json_object cannot (it strips quoting). Missing
    key → 'Null' (the CH docs contract: "if the value does not exist,
    Null will be returned" — same answer as an explicit JSON null);
    unparseable/NULL input → NULL. bool checks BEFORE int: Python bools
    are ints."""
    import json as _json

    out = []
    for doc, key in zip(j, k):
        if doc is None:
            out.append(None)
            continue
        try:
            v = _json.loads(doc)
        except (ValueError, TypeError):
            out.append(None)
            continue
        if key is not None and key != "":
            if not isinstance(v, dict) or key not in v:
                out.append("Null")
                continue
            v = v[key]
        if isinstance(v, dict):
            out.append("Object")
        elif isinstance(v, list):
            out.append("Array")
        elif isinstance(v, bool):
            out.append("Bool")
        elif isinstance(v, str):
            out.append("String")
        elif isinstance(v, int):
            out.append("Int64")
        elif isinstance(v, float):
            out.append("Double")
        else:
            out.append("Null")
    return pd.Series(out, dtype=object)


def _ip_in_range(a: pd.Series, c: pd.Series) -> pd.Series:
    """CH isIPAddressInRange via the stdlib ipaddress module — correct for
    IPv4 AND IPv6 (mixed families → false). Invalid address → false (CH
    contract); invalid/NULL CIDR → NULL (CH throws — a per-row NULL keeps
    the rest of the block alive, documented deviation)."""
    import ipaddress

    out = []
    for addr, cidr in zip(a, c):
        if addr is None or cidr is None:
            out.append(None)
            continue
        try:
            net = ipaddress.ip_network(cidr, strict=False)
        except ValueError:
            out.append(None)
            continue
        try:
            ip = ipaddress.ip_address(addr)
        except ValueError:
            out.append(False)
            continue
        out.append(ip.version == net.version and ip in net)
    return pd.Series(out, dtype=object)


def register_batch26_functions(spark: SparkSession) -> None:
    spark.udf.register("chJSONType", pandas_udf(_json_type, "string"))
    spark.udf.register("chIPInRange", pandas_udf(_ip_in_range, "boolean"))


# ---------------------------------------------------------------------------
# vocab batch 27 (round 10): IPv6 conversions + time-delta parsing


def _to_ipv6(s: pd.Series) -> pd.Series:
    """CH toIPv6: canonical (compressed lowercase) IPv6 text via the
    stdlib ipaddress module; IPv4 input maps to ::ffff:a.b.c.d (the CH
    contract). Invalid input → NULL per row (CH throws — the documented
    per-row-NULL deviation the rest of the IP family carries)."""
    import ipaddress

    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        try:
            a = ipaddress.ip_address(v)
            if isinstance(a, ipaddress.IPv4Address):
                a = ipaddress.IPv6Address("::ffff:" + str(a))
            out.append(_ipv6_text(a))
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype=object)


def _ipv6_text(a) -> str:
    """Canonical text with CH's dotted-quad form for IPv4-mapped
    addresses ('::ffff:192.168.0.1', where Python prints '::ffff:c0a8:1')."""
    v4 = a.ipv4_mapped
    return f"::ffff:{v4}" if v4 is not None else str(a)


def _ipv6_cidr_to_range(s: pd.Series, b: pd.Series) -> pd.DataFrame:
    """CH IPv6CIDRToRange(addr, bits) → (lower, upper) canonical strings
    (the IPv4 sibling's struct shape; struct-returning pandas_udf wants a
    DataFrame with one column per field). Invalid addr/bits → NULL row."""
    import ipaddress

    lo, hi = [], []
    for addr, bits in zip(s, b):
        if addr is None or bits is None:
            lo.append(None)
            hi.append(None)
            continue
        try:
            net = ipaddress.IPv6Network((addr, max(0, min(128, int(bits)))), strict=False)
            lo.append(_ipv6_text(net.network_address))
            hi.append(_ipv6_text(net.broadcast_address))
        except ValueError:
            lo.append(None)
            hi.append(None)
    return pd.DataFrame({"lower": lo, "upper": hi})


def _cut_ipv6(s: pd.Series, b6: pd.Series, b4: pd.Series) -> pd.Series:
    """CH cutIPv6(addr, bytesToCutForIPv6, bytesToCutForIPv4): zero the
    low N bytes — N chosen by whether the address is IPv4-mapped — and
    return the canonical text. Invalid input → NULL row."""
    import ipaddress

    out = []
    for addr, n6, n4 in zip(s, b6, b4):
        if addr is None or n6 is None or n4 is None:
            out.append(None)
            continue
        try:
            a = ipaddress.ip_address(addr)
            if isinstance(a, ipaddress.IPv4Address):
                a = ipaddress.IPv6Address("::ffff:" + str(a))
            cut = int(n4) if a.ipv4_mapped is not None else int(n6)
            cut = max(0, min(16, cut))
            raw = bytearray(a.packed)
            for i in range(cut):
                raw[15 - i] = 0
            out.append(_ipv6_text(ipaddress.IPv6Address(bytes(raw))))
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype=object)


# CH parseTimeDelta unit table (seconds; month = 30.5 d, year = 365 d —
# the constants the CH docs examples imply: '1yr2mo' = 36806400)
_TIMEDELTA_UNITS = {
    "ns": 1e-9, "nanosecond": 1e-9, "nanoseconds": 1e-9,
    "us": 1e-6, "microsecond": 1e-6, "microseconds": 1e-6,
    "ms": 1e-3, "millisecond": 1e-3, "milliseconds": 1e-3,
    "s": 1.0, "sec": 1.0, "secs": 1.0, "second": 1.0, "seconds": 1.0,
    "m": 60.0, "min": 60.0, "mins": 60.0, "minute": 60.0, "minutes": 60.0,
    "h": 3600.0, "hr": 3600.0, "hrs": 3600.0, "hour": 3600.0, "hours": 3600.0,
    "d": 86400.0, "day": 86400.0, "days": 86400.0,
    "w": 604800.0, "week": 604800.0, "weeks": 604800.0,
    "mo": 2635200.0, "month": 2635200.0, "months": 2635200.0,
    "y": 31536000.0, "yr": 31536000.0, "year": 31536000.0, "years": 31536000.0,
}


def _parse_time_delta(s: pd.Series) -> pd.Series:
    """CH parseTimeDelta('1yr2mo', '11s+22min', ...) → Float64 seconds.
    Number+unit pairs with arbitrary separators; unknown unit or no pair
    → NULL per row (CH throws — the documented per-row-NULL deviation)."""
    import re

    pat = re.compile(r"(\d+(?:\.\d+)?)\s*([a-zA-Zμ]+)")
    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        pairs = pat.findall(str(v))
        total, ok = 0.0, bool(pairs)
        for num, unit in pairs:
            mult = _TIMEDELTA_UNITS.get(unit.lower().replace("μ", "u"))
            if mult is None:
                ok = False
                break
            total += float(num) * mult
        out.append(total if ok else None)
    return pd.Series(out, dtype="float64")


def register_batch27_functions(spark: SparkSession) -> None:
    spark.udf.register("chToIPv6", pandas_udf(_to_ipv6, "string"))
    spark.udf.register(
        "chIPv6CIDRToRange",
        pandas_udf(_ipv6_cidr_to_range, "struct<lower: string, upper: string>"),
    )
    spark.udf.register("chCutIPv6", pandas_udf(_cut_ipv6, "string"))
    spark.udf.register("chParseTimeDelta", pandas_udf(_parse_time_delta, "double"))


# ---------------------------------------------------------------------------
# vocab batch 29 (round 11, fifth probe wave): IPv6 binary codecs


def _ipv6_string_to_num(s: pd.Series) -> pd.Series:
    """CH IPv6StringToNum: text → the address's 16 bytes (CH returns
    FixedString(16); BINARY is Spark's equivalent). A valid IPv4 string
    maps to its ::ffff:a.b.c.d bytes (the CH contract). Invalid input →
    NULL per row (CH throws — the documented per-row-NULL deviation the
    rest of the IP family carries)."""
    import ipaddress

    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        try:
            a = ipaddress.ip_address(v)
            if isinstance(a, ipaddress.IPv4Address):
                a = ipaddress.IPv6Address("::ffff:" + str(a))
            out.append(a.packed)
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype=object)


def _ipv6_num_to_string(s: pd.Series) -> pd.Series:
    """CH IPv6NumToString: 16 address bytes → canonical compressed text,
    with the dotted-quad form for IPv4-mapped addresses (the chToIPv6
    convention). Wrong-length input → NULL per row."""
    import ipaddress

    out = []
    for v in s:
        if v is None or len(v) != 16:
            out.append(None)
            continue
        out.append(_ipv6_text(ipaddress.IPv6Address(bytes(v))))
    return pd.Series(out, dtype=object)


def register_batch29_functions(spark: SparkSession) -> None:
    spark.udf.register("chIPv6StringToNum", pandas_udf(_ipv6_string_to_num, "binary"))
    spark.udf.register("chIPv6NumToString", pandas_udf(_ipv6_num_to_string, "string"))
