"""Distributed Bloom-filter membership — the scale path for set probes.

Why this exists (Tier-B pipeline extension; the reference — a mock-data
ingest harness, scripts/generate_data.py — has no analogue): several
pipeline audits reduce to "is this key in a big reference set?" —
test-set decontamination (is this train gram in ANY eval doc?), URL
seen-lists across crawl snapshots, id revisit checks. The exact
broadcast-set path (operators/contamination.py) moves 8 bytes per
distinct reference key; a Bloom filter at false-positive rate p needs
only ``-ln(p)/ln(2)^2`` bits per key (~9.6 bits at 1%), probes with ZERO
shuffle, and never false-negatives — so it composes as a safe prefilter
in front of any exact check.

Build (one pass, no shuffle): each input partition folds its keys into a
local numpy bitmap inside ``mapInPandas`` and yields ONE binary row, so
the driver collects ``num_partitions`` bitmaps of m/8 bytes each —
independent of row count — and ORs them. Bit positions are computed
JVM-side by the SAME expression the probe uses (build and probe cannot
drift), using the Kirsch–Mitzenmacher double-hashing scheme
(h1 + i*h2 mod m, two xxhash64 calls for any k — Kirsch & Mitzenmacher
2006 show it preserves the Bloom FPP asymptotics). Both hashes are
reduced mod m BEFORE the affine combination so the arithmetic stays far
from int64 overflow under ANSI mode.

Probe (row-local): positions JVM-side, bit test in one Arrow-batched
pandas_udf against a broadcast numpy bitmap — vectorized gather, no
per-row Python, no join, no shuffle.

Determinism: (keys, m, k, seed) fully determine the bitmap, regardless
of partitioning or row order (OR is commutative) — pinned by the
partition-independence and merge-identity tests.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``expected_items`` keys at false-positive
    rate ``fpp``: m = -n ln p / ln(2)^2, k = (m/n) ln 2."""
    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = max(8, math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(col: Column, m_bits: int, k: int, seed: int) -> Column:
    """array<long> of the k bit positions for one key, all JVM-side.

    Kirsch–Mitzenmacher: pos_i = (h1 + i * h2) mod m with h1 = xxhash64
    (key, seed) mod m and h2 = xxhash64(key, seed+1) mod (m-1) + 1 (kept
    nonzero so the k probes never collapse to one bit). Overflow bound:
    h1 + i*h2 < m * (k + 1), which stays inside int64 for any filter that
    could fit in memory (even the 1.2 GB / ~10^10-bit sizing in
    build_bloom's docstring gives ~10^11 ≪ 2^63) — safe under ANSI
    arithmetic checks."""
    h1 = F.pmod(F.xxhash64(col, F.lit(int(seed))), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(int(seed) + 1)), F.lit(max(1, m_bits - 1))) + F.lit(1)
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])


def build_bloom(
    df: DataFrame,
    col: str = "doc_id",
    expected_items: int | None = None,
    fpp: float = 0.01,
    m_bits: int | None = None,
    k: int | None = None,
    seed: int = 0,
) -> dict:
    """Build a Bloom filter over ``df[col]`` (NULL keys are skipped — NULL
    is never a member). Returns a plain-dict model::

        {"m_bits", "k", "seed", "n_added", "bitmap": bytes}

    Sizing: pass ``m_bits``/``k`` explicitly, or ``expected_items`` (+
    ``fpp``) to size optimally; with neither, one count() pass measures
    the input first. Driver transfer: num_partitions x m/8 bytes (each
    partition contributes exactly one bitmap row, however many keys it
    holds); the model itself is m/8 bytes — size m for driver memory,
    e.g. 1e9 keys @ 1% -> ~1.2 GB, at which point shard by key range and
    use :func:`bloom_merge`.
    """
    keyed = df.select(F.col(col).alias("__key")).filter(F.col("__key").isNotNull())
    if m_bits is None or k is None:
        n = expected_items if expected_items is not None else keyed.count()
        m_bits, k = bloom_params(max(1, n), fpp)
    m_bytes = (m_bits + 7) // 8

    pos_df = keyed.select(_positions(F.col("__key"), m_bits, k, seed).alias("pos"))

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(m_bytes, dtype=np.uint8)
        n_added = 0
        for pdf in batches:
            arrs = pdf["pos"].to_numpy()
            if len(arrs):
                mat = np.vstack(arrs).astype(np.int64)  # (rows, k)
                np.bitwise_or.at(
                    bm, (mat >> 3).ravel(), (1 << (mat & 7)).astype(np.uint8).ravel()
                )
                n_added += len(arrs)
        yield pd.DataFrame({"bitmap": [bm.tobytes()], "n": [n_added]})

    parts = pos_df.mapInPandas(fold, "bitmap binary, n long").collect()
    bm = np.zeros(m_bytes, dtype=np.uint8)
    n_added = 0
    for r in parts:
        bm |= np.frombuffer(r["bitmap"], dtype=np.uint8)
        n_added += r["n"]
    return {"m_bits": m_bits, "k": k, "seed": seed, "n_added": n_added, "bitmap": bm.tobytes()}


def bloom_contains(
    df: DataFrame,
    model: dict,
    col: str = "doc_id",
    result_col: str = "maybe_member",
) -> DataFrame:
    """Add ``result_col``: True iff all k bits are set (possible member —
    false positives at the sized rate; NEVER false negatives). NULL keys
    probe False. Plan: one JVM position array + one Arrow pandas_udf over
    the broadcast bitmap — map-only, no shuffle."""
    m_bits, k, seed = model["m_bits"], model["k"], model["seed"]
    bc = df.sparkSession.sparkContext.broadcast(
        np.frombuffer(model["bitmap"], dtype=np.uint8)
    )

    @F.pandas_udf("boolean")
    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bm = bc.value
        for pos in it:
            res = np.zeros(len(pos), dtype=bool)
            mask = pos.notna().to_numpy()
            if mask.any():
                mat = np.vstack(pos[mask].to_numpy()).astype(np.int64)
                bits = (bm[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
                res[mask] = bits.all(axis=1)
            yield pd.Series(res)

    pos = F.when(
        F.col(col).isNotNull(), _positions(F.col(col), m_bits, k, seed)
    )  # NULL key -> NULL positions -> False
    return df.withColumn(result_col, probe(pos))


def bloom_merge(*models: dict) -> dict:
    """OR-union of same-shaped filters — build per corpus slab, merge into
    one (the union filter is bit-identical to building over the union,
    pinned in tests). ``n_added`` sums (an upper bound on distinct keys)."""
    if not models:
        raise ValueError("bloom_merge needs at least one model")
    first = models[0]
    bm = np.frombuffer(first["bitmap"], dtype=np.uint8).copy()
    n = first["n_added"]
    for other in models[1:]:
        if (other["m_bits"], other["k"], other["seed"]) != (
            first["m_bits"],
            first["k"],
            first["seed"],
        ):
            raise ValueError("bloom_merge requires identical (m_bits, k, seed)")
        bm |= np.frombuffer(other["bitmap"], dtype=np.uint8)
        n += other["n_added"]
    return {**first, "n_added": n, "bitmap": bm.tobytes()}


def bloom_stats(model: dict) -> dict:
    """Observability: fill ratio, estimated distinct keys
    (n ≈ -(m/k) ln(1 - fill), the standard occupancy inversion) and the
    CURRENT false-positive rate (fill^k)."""
    bm = np.frombuffer(model["bitmap"], dtype=np.uint8)
    m, k = model["m_bits"], model["k"]
    # positions are always < m, so any pad bits in the last byte stay 0 —
    # summing the whole buffer counts exactly the set positions
    set_bits = int(np.unpackbits(bm).sum())
    fill = set_bits / m
    est_items = -(m / k) * math.log(1.0 - fill) if fill < 1.0 else float("inf")
    return {
        "m_bits": m,
        "k": k,
        "set_bits": set_bits,
        "fill_ratio": fill,
        "est_fpp": fill**k,
        "est_items": est_items,
    }
