"""ClickHouse FORMAT-clause surface: named wire formats over Spark readers.

The reference pipes exactly one format (``FORMAT TabSeparated``,
scripts/insert_data.sh:34-41); ClickHouse itself accepts dozens via
``FORMAT <name>``. This module keeps the CH naming as the API and maps each
name onto the native Spark source, so a user's ``INSERT ... FORMAT
JSONEachRow`` / ``SELECT ... FORMAT CSVWithNames`` habits translate 1:1:

- ``TabSeparated``   — headerless TSV, ``%Y-%m-%d %H:%M:%S`` timestamps
  (the reference's wire format, sources/tsv.py).
- ``CSV`` / ``CSVWithNames`` — RFC-ish CSV, without/with a header row.
- ``JSONEachRow``    — one JSON object per line (Spark's json source is
  exactly this NDJSON framing).
- ``Parquet``        — the native columnar path (CH added it for data
  interchange; here it IS the storage format).

All readers take an explicit schema: CH's formats are schema-ful on the
server side, and schema inference would both diverge from it and cost an
extra pass at 100 TB. Every source splits by file and, for the text
formats, by line — reads parallelize across executors with no driver
involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from clickhousedatamocker_spark.sources.tsv import read_tsv, write_tsv

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

FORMATS = (
    "TabSeparated", "TabSeparatedWithNames", "CSV", "CSVWithNames",
    "JSONEachRow", "Parquet",
)

# clickhouse-client's short spellings are pure aliases
_ALIASES = {"TSV": "TabSeparated", "TSVWithNames": "TabSeparatedWithNames"}


def _canon(fmt: str) -> str:
    return _ALIASES.get(fmt, fmt)


def write_format(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    fmt = _canon(fmt)
    if fmt == "TabSeparated":
        write_tsv(df, path, mode=mode)
    elif fmt == "TabSeparatedWithNames":
        (
            df.write.mode(mode)
            .option("sep", "\t")
            .option("timestampFormat", _TS_FMT)
            .option("header", "true")
            .csv(path)
        )
    elif fmt in ("CSV", "CSVWithNames"):
        (
            df.write.mode(mode)
            .option("timestampFormat", _TS_FMT)
            .option("header", str(fmt == "CSVWithNames").lower())
            .csv(path)
        )
    elif fmt == "JSONEachRow":
        df.write.mode(mode).option("timestampFormat", _TS_FMT).json(path)
    elif fmt == "Parquet":
        df.write.mode(mode).parquet(path)
    else:
        raise ValueError(f"unsupported FORMAT {fmt!r}; supported: {FORMATS}")


def read_format(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    fmt = _canon(fmt)
    if fmt == "TabSeparated":
        return read_tsv(spark, path, schema)
    if fmt == "TabSeparatedWithNames":
        return (
            spark.read.schema(schema)
            .option("sep", "\t")
            .option("timestampFormat", _TS_FMT)
            .option("header", "true")
            .csv(path)
        )
    if fmt in ("CSV", "CSVWithNames"):
        return (
            spark.read.schema(schema)
            .option("timestampFormat", _TS_FMT)
            .option("header", str(fmt == "CSVWithNames").lower())
            .csv(path)
        )
    if fmt == "JSONEachRow":
        return (
            spark.read.schema(schema).option("timestampFormat", _TS_FMT).json(path)
        )
    if fmt == "Parquet":
        return spark.read.schema(schema).parquet(path)
    raise ValueError(f"unsupported FORMAT {fmt!r}; supported: {FORMATS}")
