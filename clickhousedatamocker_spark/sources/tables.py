"""Parquet fixture-table loading (TESTDATA.md tables)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as long only
# (spark.sql.legacy.parquet.nanosAsLong, set in session.py); convert to
# microsecond timestamps on load, matching DuckDB's ns->us truncation.
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Sessions we didn't build (an external driver's, a bare spark-shell) won't
    # have the nanos conf, and without it the events.parquet read throws
    # PARQUET_TYPE_ILLEGAL before the bigint fallback below can run. The conf
    # is runtime-settable, so set it here rather than relying on session.py.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # locked-down conf (e.g. Spark Connect) — fall through to the read
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            from pyspark.sql import functions as F

            # integer `div`, not `/`: ns epochs (~1.7e18) exceed double precision
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views so the SQL API can reach them."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
