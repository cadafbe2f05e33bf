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
    "JSONEachRow", "Parquet", "ORC", "Arrow", "ArrowStream",
)

# clickhouse-client's short spellings are pure aliases
_ALIASES = {"TSV": "TabSeparated", "TSVWithNames": "TabSeparatedWithNames"}

# interchange formats CH names that this environment cannot serve, each
# with the reason and the recipe — a loud gate beats a silent fallback
_GATED = {
    "Avro": (
        "FORMAT Avro needs the spark-avro connector jar, absent from this "
        "Spark distribution; add org.apache.spark:spark-avro to "
        "spark.jars.packages, or use Parquet/ORC (same schema fidelity)"
    ),
    "Native": (
        "FORMAT Native is ClickHouse's internal wire format (columnar "
        "blocks over its TCP protocol) — it has no file contract to "
        "implement here; use Parquet (CH's own recommended interchange) "
        "or Arrow"
    ),
}


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
    elif fmt == "ORC":
        df.write.mode(mode).orc(path)
    elif fmt in ("Arrow", "ArrowStream"):
        _write_arrow(df, path, stream=(fmt == "ArrowStream"), mode=mode)
    elif fmt in _GATED:
        raise NotImplementedError(_GATED[fmt])
    else:
        raise ValueError(f"unsupported FORMAT {fmt!r}; supported: {FORMATS}")


def _write_arrow(df: DataFrame, path: str, stream: bool, mode: str = "overwrite") -> None:
    """CH FORMAT Arrow / ArrowStream: one Arrow IPC file (random-access
    format) or stream per Spark partition, written BY the executors via
    mapInArrow — rows never move to the driver, so the write scales with
    the cluster exactly like the parquet sink. File-per-partition layout
    mirrors every other directory sink here (and CH's own per-thread
    output chunks)."""
    import os
    import shutil
    import uuid

    if os.path.isdir(path):
        if mode != "overwrite":
            raise ValueError(f"Arrow sink {path!r} exists and mode={mode!r}")
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ext = "arrows" if stream else "arrow"

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        it = iter(batches)
        first = next(it, None)
        if first is None:
            return
        fname = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex}.{ext}")
        opener = pa.ipc.new_stream if stream else pa.ipc.new_file
        with opener(fname, first.schema) as w:
            w.write_batch(first)
            for b in it:
                w.write_batch(b)
        yield pa.RecordBatch.from_pylist(
            [{"file": fname}], schema=pa.schema([("file", pa.string())])
        )

    # the collect triggers the distributed write; the result is just the
    # (bounded: one row per non-empty partition) file manifest
    df.mapInArrow(write_partition, "file string").collect()


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
    if fmt == "ORC":
        return spark.read.schema(schema).orc(path)
    if fmt in ("Arrow", "ArrowStream"):
        return _read_arrow(spark, path, schema, stream=(fmt == "ArrowStream"))
    if fmt in _GATED:
        raise NotImplementedError(_GATED[fmt])
    raise ValueError(f"unsupported FORMAT {fmt!r}; supported: {FORMATS}")


def _read_arrow(
    spark: SparkSession, path: str, schema: T.StructType, stream: bool
) -> DataFrame:
    """Read a FORMAT Arrow / ArrowStream directory (or single file): the
    driver only LISTS the files (bounded metadata); each file is opened and
    decoded by an executor via mapInArrow over the file-path frame, so
    reads parallelize per file like every other source here. The explicit
    schema is the contract (no inference pass), matching the module rule."""
    import os

    if os.path.isdir(path):
        ext = ".arrows" if stream else ".arrow"
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(ext)
        )
    else:
        files = [path]
    if not files:
        return spark.createDataFrame([], schema)
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "__arrow_file string"
    ).repartition(len(files))
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)

    def read_files(batches):
        import pyarrow as pa

        opener = pa.ipc.open_stream if stream else pa.ipc.open_file
        for pb in batches:
            for fname in pb.column("__arrow_file").to_pylist():
                with pa.memory_map(fname, "r") as source:
                    reader = opener(source)
                    tbl = (
                        pa.Table.from_batches(list(reader), reader.schema)
                        if stream
                        else reader.read_all()
                    )
                for rb in tbl.to_batches():
                    yield rb

    return paths_df.mapInArrow(read_files, ddl)
