"""The COMPLETE reference SQL surface, verbatim through Engine.sql:
create_local.sql + create_distributed.sql + the set_flow_control.sh ALTER +
both monitoring queries + DROP — the full setup.sh lifecycle with zero
translation by the caller."""

import pyspark.sql.functions as F

from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.sources.generator import BatchGenerator

REF = "/root/reference/sql"

ALTER_VERBATIM = """
            ALTER TABLE test_local
            MODIFY SETTING
                parts_to_delay_insert = 50,
                parts_to_throw_insert = 100
"""


def test_reference_sql_lifecycle_verbatim(spark, tmp_warehouse):
    engine = Engine(spark, tmp_warehouse)

    engine.sql(open(f"{REF}/create_local.sql").read())
    engine.sql(open(f"{REF}/create_distributed.sql").read())

    local = engine.catalog.get("test_local")
    assert local.partition_column == "event_hour"
    assert local.order_columns == ["event_time", "id"]
    assert local.settings == {
        "parts_to_delay_insert": 150,
        "parts_to_throw_insert": 300,
        "partition_buckets": 24,  # derived: hourly partitioning => <=24 values/day
    }
    assert [f.name for f in local.schema.fields] == [
        "id", "event_time", "user_id", "event_type", "value",
        "status", "description", "metadata", "created_at", "updated_at",
    ]
    assert engine.catalog.get("test_distributed").alias_of == "test_local"

    engine.sql(ALTER_VERBATIM)  # set_flow_control.sh:36-40 text
    assert engine.catalog.get("test_local").settings["parts_to_delay_insert"] == 50
    assert engine.catalog.get("test_local").settings["parts_to_throw_insert"] == 100

    gen = BatchGenerator(spark, seed=5, base_time="2026-01-01 12:00:00")
    engine.insert("test_distributed", gen.batch_with_partition(5000, batch_no=0))

    parts = engine.sql(open(f"{REF}/query_parts.sql").read()).collect()
    assert len(parts) == 20  # LIMIT 20 over 24 hourly partitions
    assert all(r["parts_count"] == 1 for r in parts)
    metrics = engine.sql(open(f"{REF}/query_metrics.sql").read()).collect()
    assert [r["metric"] for r in metrics] == sorted(r["metric"] for r in metrics)
    assert len(metrics) == 10

    engine.sql("DROP TABLE IF EXISTS test_distributed")
    engine.sql("DROP TABLE IF EXISTS test_local")
    assert not engine.catalog.exists("test_local")


def test_ddl_create_idempotent_and_types(spark, tmp_warehouse):
    engine = Engine(spark, tmp_warehouse)
    engine.sql(open(f"{REF}/create_local.sql").read())
    engine.sql(open(f"{REF}/create_local.sql").read())  # IF NOT EXISTS
    schema = engine.catalog.get("test_local").schema
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types["id"] == "bigint"  # UInt64
    assert types["event_time"] == "timestamp"  # DateTime
    assert types["user_id"] == "int"  # UInt32
    assert types["value"] == "double"  # Float64
    assert types["status"] == "int"  # UInt8
