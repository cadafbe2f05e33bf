"""TabSeparated wire-format parity (generate_data.py:36 / insert_data.sh:41).

The reference's entire IR is TSV text with '%Y-%m-%d %H:%M:%S' timestamps;
round-tripping a generated batch through TSV must be lossless."""

import pyspark.sql.functions as F

from clickhousedatamocker_spark.schema import test_local_spec as _test_local_spec  # noqa: N813 - pytest must not collect it
from clickhousedatamocker_spark.sources.generator import BatchGenerator
from clickhousedatamocker_spark.sources.tsv import read_tsv, write_tsv


def test_tsv_roundtrip_lossless(spark, tmp_path):
    gen = BatchGenerator(spark, seed=3, base_time="2026-01-01 12:00:00")
    batch = gen.batch(2000)
    path = str(tmp_path / "wire.tsv")
    write_tsv(batch, path)

    back = read_tsv(spark, path, _test_local_spec().schema)
    assert back.count() == 2000
    # same names/types (nullability legitimately differs: csv reads nullable)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in batch.schema.fields
    ]
    # value-exact round trip (sorted by the unique id)
    a = sorted(tuple(r) for r in batch.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_tsv_format_is_tab_separated_reference_timestamps(spark, tmp_path):
    gen = BatchGenerator(spark, seed=3, base_time="2026-01-01 12:00:00")
    path = str(tmp_path / "wire2.tsv")
    write_tsv(gen.batch(10).coalesce(1), path)
    import glob

    [f] = glob.glob(f"{path}/part-*")
    line = open(f).readline().rstrip("\n")
    fields = line.split("\t")
    assert len(fields) == 10  # the 10-column test_local schema
    # created_at (field 9) carries the reference's timestamp spelling
    assert fields[8] == "2026-01-01 12:00:00"


def test_format_surface_roundtrips_lossless(spark, tmp_path):
    """Every CH FORMAT name maps onto a Spark source and round-trips a
    generated batch value-exactly (sources/formats.py)."""
    from clickhousedatamocker_spark.sources.formats import FORMATS, read_format, write_format

    gen = BatchGenerator(spark, seed=7, base_time="2026-01-01 12:00:00")
    batch = gen.batch(500)
    want = sorted(tuple(r) for r in batch.collect())
    for fmt in FORMATS:
        path = str(tmp_path / f"wire_{fmt}")
        write_format(batch, path, fmt)
        back = read_format(spark, path, fmt, _test_local_spec().schema)
        got = sorted(tuple(r) for r in back.collect())
        assert got == want, f"FORMAT {fmt} round-trip mismatch"


def test_format_short_aliases(spark, tmp_path):
    """clickhouse-client's TSV / TSVWithNames spellings are pure aliases."""
    from clickhousedatamocker_spark.sources.formats import read_format, write_format

    gen = BatchGenerator(spark, seed=7, base_time="2026-01-01 12:00:00")
    batch = gen.batch(100)
    want = sorted(tuple(r) for r in batch.collect())
    for alias, canonical in (("TSV", "TabSeparated"), ("TSVWithNames", "TabSeparatedWithNames")):
        path = str(tmp_path / f"wire_{alias}")
        write_format(batch, path, alias)
        got = sorted(
            tuple(r) for r in read_format(spark, path, canonical, _test_local_spec().schema).collect()
        )
        assert got == want, f"alias {alias} != {canonical}"


def test_format_unknown_rejected(spark, tmp_path):
    import pytest as _pytest

    from clickhousedatamocker_spark.sources.formats import write_format

    gen = BatchGenerator(spark, seed=7, base_time="2026-01-01 12:00:00")
    with _pytest.raises(ValueError, match="unsupported FORMAT"):
        write_format(gen.batch(10), str(tmp_path / "x"), "NoSuchFormat")


def test_format_gated_loudly(spark, tmp_path):
    """Avro (connector jar absent here) and Native (CH's internal wire
    protocol, no file contract) refuse with the reason and a recipe."""
    import pytest as _pytest

    from clickhousedatamocker_spark.sources.formats import write_format

    gen = BatchGenerator(spark, seed=7, base_time="2026-01-01 12:00:00")
    with _pytest.raises(NotImplementedError, match="spark-avro"):
        write_format(gen.batch(10), str(tmp_path / "a"), "Avro")
    with _pytest.raises(NotImplementedError, match="Parquet"):
        write_format(gen.batch(10), str(tmp_path / "n"), "Native")
