"""Scan-parallelism guard for heavy operators (optimization guide §2.5,
"input skew": one huge unsplittable file serializes every downstream map
stage — "fix at the source if you can; otherwise repartition immediately
after the read").

The fixture tables are single parquet files with one row group, so every
corpus scan starts as ONE task and a tokenize/hash/score stage that should
fan out over the cluster runs serially. At real scale the same operator
reads thousands of splits and needs no help — so the repartition is
CONDITIONAL on the plan's actual scan parallelism, not unconditional: a
well-split input passes through with zero plan change (no extra Exchange,
nothing for AQE to undo).

Only operators whose next stage is expensive per row (tokenization,
shingling, per-character rolling hashes, vector math) call this; cheap
map-only profiles keep their bare scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_scan_parallelism(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Repartition ``df`` to the session default parallelism IFF its current
    plan parallelism is below half of it (an unsplittable-input symptom).

    ``key``: hash-repartition on this column (deterministic row→partition
    mapping, safe under task retries — guide §2.5's warning about
    rand()-derived keys); without a key, round-robin (Spark's
    sort-before-repartition keeps that retry-safe too).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # physical-plan partition count only — no job runs for a file scan
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    if key is not None:
        k = F.col(key) if isinstance(key, str) else key
        return df.repartition(target, k)
    return df.repartition(target)
