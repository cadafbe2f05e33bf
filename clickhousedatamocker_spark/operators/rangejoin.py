"""Scalable range (point-in-interval) join.

A naive ``l.point >= r.lo AND l.point < r.hi`` join has no equi-condition,
so Spark plans BroadcastNestedLoopJoin — O(|points| x |intervals|) and a
broadcast of a whole side; it dies at scale. The bucketed form restores an
equi-key: intervals explode to every fixed-width bucket they overlap,
points map to their single bucket, the join runs on the bucket id, and the
exact range predicate refines the candidates. Cost:
O(|points| + |intervals| x spanned_buckets + |matches|) with an ordinary
shuffled/broadcast hash join — pick ``bucket_days`` near the typical
interval length so spanned_buckets stays ~2.

Same composition discipline as operators/asof.py: built entirely from
existing DataFrame ops (sequence/explode + equi-join), no custom execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_days: int = 30,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row with ``lo <= point < hi``
    (timestamp/date semantics, day-granularity bucketing).

    ``how='left'`` keeps pointless-in-no-interval rows (interval columns
    null), matching a left range join.
    """
    day = 86400
    p_bucket = F.floor(F.unix_timestamp(F.col(point_col)) / (bucket_days * day))
    lo_b = F.floor(F.unix_timestamp(F.col(lo_col)) / (bucket_days * day))
    hi_b = F.floor((F.unix_timestamp(F.col(hi_col)) - 1) / (bucket_days * day))

    iv = intervals.withColumn("__b", F.explode(F.sequence(lo_b, hi_b)))
    pt = points.withColumn("__b", p_bucket)

    cond = (
        (pt["__b"] == iv["__b"])
        & (pt[point_col] >= iv[lo_col])
        & (pt[point_col] < iv[hi_col])
    )
    if how == "inner":
        return pt.join(iv, cond).drop("__b")
    if how in ("left", "left_outer"):
        return pt.join(iv, cond, "left").drop("__b")
    raise ValueError(f"range_join_points supports inner/left, not {how!r}")
