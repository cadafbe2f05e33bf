"""TabSeparated wire-format compatibility.

The reference's only IR is TSV text piped into ``clickhouse-client``
(``scripts/generate_data.py:36`` → ``scripts/insert_data.sh:34-41``, format
``FORMAT TabSeparated`` with ``%Y-%m-%d %H:%M:%S`` timestamps). The native
path here is Parquet; TSV is kept as a declared source/sink so the exact
wire format stays expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("sep", "\t").option("timestampFormat", _TS_FMT).option("header", "false").csv(path)


def read_tsv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("timestampFormat", _TS_FMT)
        .option("header", "false")
        .csv(path)
    )
