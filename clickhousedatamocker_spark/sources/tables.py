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


# columns stored as parquet TIMESTAMP(NANOS). Spark's read shape for these
# has changed across versions: <=4.0 needs spark.sql.legacy.parquet.nanosAsLong
# (else PARQUET_TYPE_ILLEGAL) and yields bigint; 4.1+ reads them natively as
# timestamp_ntz (micros, ns floor-truncated). Normalize BOTH shapes to a
# UTC-instant TIMESTAMP on load, matching DuckDB's ns->us truncation, so
# every downstream query sees one stable type under any session/timezone.
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Sessions we didn't build (an external driver's, a bare spark-shell) won't
    # have the nanos conf; on Spark <=4.0 the events.parquet read throws
    # PARQUET_TYPE_ILLEGAL without it. The conf is runtime-settable, so set it
    # here rather than relying on session.py. (On 4.1+ it is a no-op.)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # locked-down conf (e.g. Spark Connect) — fall through to the read
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, []):
        dtype = dict(df.dtypes).get(col)
        from pyspark.sql import functions as F

        if dtype == "bigint":
            # integer `div`, not `/`: ns epochs (~1.7e18) exceed double precision
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dtype == "timestamp_ntz":
            # interpret the NTZ wall time as a UTC instant WITHOUT going
            # through spark.sql.session.timeZone: a plain cast (and
            # to_utc_timestamp, which implicitly casts first) shifts the
            # instant in non-UTC sessions and hits DST gaps/folds. The
            # NTZ->NTZ microsecond delta from the epoch is a pure wall-time
            # difference, so timestamp_micros() of it is the UTC instant
            # with the same wall time in any session zone.
            df = df.withColumn(
                col,
                F.expr(
                    "timestamp_micros(timestampdiff(MICROSECOND, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`))"
                ),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views so the SQL API can reach them."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
