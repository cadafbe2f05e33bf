"""Skew-mitigation operators.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
explicit salting remains the tool when a single join key is so hot that even
split partitions overwhelm a task, or when AQE is unavailable (e.g. inside
some streaming plans).

``salted_join``: equi-join where the big (skewed) side's rows are scattered
across ``salt`` sub-keys and the other side is replicated ``salt`` times —
the hot key's rows then land on ``salt`` different reducers instead of one.
Semantically identical to the plain join (proved by the oracle-checked
``join_salted_skew`` query); cost: the small side shuffles salt x its size,
so pick the replicated side accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``skewed`` (big, hot-keyed side) with ``other``, scattering
    each hot key over ``salt`` reducers.

    The salt on the skewed side is a deterministic hash of the whole row's
    join-independent spread source (xxhash64 of all columns), so the result
    needs no RNG and replays identically. ``other`` is exploded once per
    salt value. Output columns = the plain join's (salt column dropped).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # unmatched OTHER-side rows exist `salt` times post-replication, so
        # right/full/anti-on-other joins would duplicate them
        raise ValueError(f"salted_join supports inner/left/left_semi, not {how!r}")
    skewed_salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)).cast("int")
    )
    other_replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = skewed_salted.join(other_replicated, on + ["__salt"], how)
    return out.drop("__salt")
