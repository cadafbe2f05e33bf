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

# analyzed-plan node names a "bare scan" tree may contain: the relation
# leaf plus narrow row-local wrappers that do not change partitioning.
# Anything else (Join, Aggregate, Generate, Window, ...) means the probe
# below would force full physical planning of a DEEP tree — the exact
# between-stage driver cost the pipelines fight — so such inputs pass
# through untouched (every current call site is a bare table scan).
_NARROW_NODES = frozenset(
    {
        "Project",
        "Filter",
        "SubqueryAlias",
        "View",
        "LogicalRelation",
        "Relation",
        # a localCheckpoint'ed input is a materialized leaf: probing its
        # partition count is free (the RDD already exists), and the
        # pipelines pass exactly this shape into the MinHash stage
        "LogicalRDD",
    }
)


def _is_bare_scan(df: DataFrame) -> bool:
    """True iff ``df``'s ANALYZED plan is a single relation leaf under
    row-local narrow nodes only — checked without triggering optimization
    or physical planning (analysis has already run for any DataFrame)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        leaves = 0
        while stack:
            node = stack.pop()
            name = node.nodeName()
            ch = node.children()
            if ch.size() == 0:
                if name not in _NARROW_NODES:
                    return False
                leaves += 1
            elif name not in _NARROW_NODES:
                return False
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return leaves == 1
    except Exception:  # py4j surface drift: fail open to the old probe
        return True


def ensure_scan_parallelism(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Repartition ``df`` to the session default parallelism IFF its current
    plan parallelism is below half of it (an unsplittable-input symptom).

    ``key``: hash-repartition on this column (deterministic row→partition
    mapping, safe under task retries — guide §2.5's warning about
    rand()-derived keys); without a key, round-robin (Spark's
    sort-before-repartition keeps that retry-safe too).

    The partition-count probe (``df.rdd.getNumPartitions()``) physically
    plans ``df``'s tree, which is cheap for a bare scan but pays the full
    Catalyst cost on a deep lineage — so the probe only runs when the
    analyzed plan IS a bare scan (relation + narrow row-local nodes).
    Deeper trees return unchanged: their parallelism was already set by
    whatever shuffle or scan produced them, and silently re-planning them
    here would reintroduce the between-stage driver cost this guard's
    callers were rebuilt to avoid.
    """
    if not _is_bare_scan(df):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # physical-plan partition count only — no job runs for a file scan
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    if key is not None:
        k = F.col(key) if isinstance(key, str) else key
        return df.repartition(target, k)
    return df.repartition(target)
