"""Bucketed table layout — co-located joins with ZERO shuffle at read time.

The 100 TB playbook for a repeated fact-fact join (orders x lineitem on
orderkey, events x profiles on user_id): pay the shuffle ONCE at write
time by hash-bucketing both tables on the join key, then every subsequent
join reads co-located buckets and plans as a sort-merge join with no
Exchange on either side. This is Spark's native answer to ClickHouse's
co-located JOIN over matching sharding keys on a cluster.

Uses ``bucketBy`` + ``saveAsTable`` (bucket metadata lives in the session
catalog; plain ``.parquet(path)`` writes cannot carry it). ``sortBy`` on
the same key additionally pre-sorts each bucket so the join skips its
per-bucket sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Materialize ``df`` hash-bucketed (and bucket-sorted) on ``key``."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the plan contains NO Exchange — each task reads bucket i
    of both sides. Verified in tests/test_plan_quality.py."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
