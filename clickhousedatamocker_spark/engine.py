"""Engine façade — the in-process equivalent of the reference's
client/server split.

Where the reference spawns ``clickhouse-client`` per query against a server
(setup.sh:39-48, monitor_metrics.sh:29-38), here everything is one Spark
driver: DDL is a catalog call, ingest is a partitioned Parquet append, and
the monitoring surface is two registered temp views queried via
``spark.sql`` — including the reference's .sql files verbatim.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from clickhousedatamocker_spark.functions.scalar import register_sql_functions
from clickhousedatamocker_spark.plans.catalog import Catalog, TableHandle
from clickhousedatamocker_spark.plans.flow_control import FlowController
from clickhousedatamocker_spark.plans.ingest import InsertResult, Writer
from clickhousedatamocker_spark.plans.metrics import MetricsStore
from clickhousedatamocker_spark.plans.parts import PartsInventory
from clickhousedatamocker_spark.schema import TableSpec


@dataclass
class FlowStatus:
    """Typed replacement for the reference's scraped-stdout contract
    (monitor_metrics.sh:104-110 returns the count as the last stdout line)."""

    delayed_inserts: int
    active_parts: int
    parts_to_delay_insert: int
    parts_to_throw_insert: int
    zone: str  # 'ok' | 'delay' | 'throw'


class Engine:
    def __init__(self, spark: SparkSession, warehouse_dir: str, database: str = "default"):
        self.spark = spark
        self.catalog = Catalog(warehouse_dir, database)
        self.metrics = MetricsStore()
        self.parts = PartsInventory(database)
        self.flow = FlowController(metrics=self.metrics)
        self.writer = Writer(self.parts, self.flow, metrics=self.metrics)
        self._registered_versions: dict[str, int] = {}
        register_sql_functions(spark)

    # -- connectivity probe (setup.sh:94-99) ------------------------------
    def probe(self) -> bool:
        return self.spark.sql("SELECT 1").first()[0] == 1

    # -- DDL --------------------------------------------------------------
    def create_table(self, spec: TableSpec, if_not_exists: bool = True) -> TableHandle:
        return self.catalog.create_table(spec, if_not_exists)

    def create_alias(self, name: str, of: str) -> TableHandle:
        return self.catalog.create_alias(name, of)

    def drop_table(self, name: str, if_exists: bool = True) -> None:
        self.catalog.drop_table(name, if_exists)

    def alter_setting(self, name: str, **settings) -> None:
        self.catalog.alter_setting(name, **settings)

    # -- DML --------------------------------------------------------------
    def insert(self, table: str, df: DataFrame, **kwargs) -> InsertResult:
        handle = self.catalog.get(self.catalog.resolve(table))
        return self.writer.insert(handle, df, **kwargs)

    def delete_where(self, table: str, predicate: str) -> int:
        """``ALTER TABLE … DELETE WHERE predicate`` (synchronous mutation:
        partition-pruned rewrite of affected parts, old parts retired,
        ``PartsMutations`` incremented). Returns rows deleted."""
        handle = self.catalog.get(self.catalog.resolve(table))
        return self.writer.mutate_delete(self.spark, handle, predicate)

    def update_where(self, table: str, assignments: dict[str, str], predicate: str) -> int:
        """``ALTER TABLE … UPDATE col=expr WHERE predicate`` (synchronous
        mutation; see delete_where). Returns rows updated."""
        handle = self.catalog.get(self.catalog.resolve(table))
        return self.writer.mutate_update(self.spark, handle, assignments, predicate)

    def optimize(self, table: str) -> int:
        handle = self.catalog.get(self.catalog.resolve(table))
        return self.writer.optimize(self.spark, handle)

    def read_table(self, table: str) -> DataFrame:
        handle = self.catalog.get(self.catalog.resolve(table))
        if not any(os.scandir(handle.path)) if os.path.isdir(handle.path) else True:
            return self.spark.createDataFrame([], handle.schema)
        return self.spark.read.schema(_schema_with_partition(handle)).parquet(handle.path)

    # -- introspection ----------------------------------------------------
    def refresh_system_views(self) -> None:
        """(Re)register system_metrics / system_parts temp views + data tables.

        The system views are rebuilt every call (their contents are the
        engine's live counters — tiny single-slice DataFrames). Data-table
        views re-register only when the table's part inventory changed since
        the last registration: a parquet re-read costs a file listing, and
        the reference runs this monitoring pair once per second alongside
        ingest (monitor_metrics.sh per-iteration envelope)."""
        tables = {
            name: self.catalog.table_path(name)
            for name in self.catalog.list_tables()
            if self.catalog.get(name).alias_of is None
        }
        self.parts.to_df(self.spark, tables).createOrReplaceTempView("system_parts")
        self.metrics.to_df(self.spark).createOrReplaceTempView("system_metrics")
        for name in self.catalog.list_tables():
            handle = self.catalog.get(self.catalog.resolve(name))
            version = self.parts.inventory_version(handle.name)
            if self._registered_versions.get(name) == version:
                continue
            if os.path.isdir(handle.path) and any(
                True for _ in os.scandir(handle.path) if _.name.endswith(".parquet") or "=" in _.name
            ):
                self.spark.read.schema(_schema_with_partition(handle)).parquet(handle.path).createOrReplaceTempView(
                    name
                )
                self._registered_versions[name] = version

    def system_metrics(self) -> DataFrame:
        return self.metrics.to_df(self.spark)

    def system_parts(self) -> DataFrame:
        tables = {
            name: self.catalog.table_path(name)
            for name in self.catalog.list_tables()
            if self.catalog.get(name).alias_of is None
        }
        return self.parts.to_df(self.spark, tables)

    def flow_status(self, table: str) -> FlowStatus:
        handle = self.catalog.get(self.catalog.resolve(table))
        count = self.parts.active_parts_count(handle.name, handle.path)
        delay = int(handle.settings.get("parts_to_delay_insert", 150))
        throw = int(handle.settings.get("parts_to_throw_insert", 300))
        zone = "throw" if count >= throw else ("delay" if count >= delay else "ok")
        return FlowStatus(
            delayed_inserts=self.metrics.get("DelayedInserts"),
            active_parts=count,
            parts_to_delay_insert=delay,
            parts_to_throw_insert=throw,
            zone=zone,
        )

    def sql(self, query: str) -> DataFrame:
        """Run SQL with system views refreshed; accepts ClickHouse dialect
        spellings via the compat shim, so the reference's .sql files — BOTH
        the monitoring queries AND the DDL (create_local.sql,
        create_distributed.sql, the set_flow_control.sh ALTERs) — run
        verbatim. DDL routes to catalog ops and returns an empty result set
        (what clickhouse-client prints for DDL)."""
        from clickhousedatamocker_spark.functions.compat import parse_ch_ddl, translate_ch_sql
        from clickhousedatamocker_spark.schema import TableSpec

        ddl = parse_ch_ddl(query)
        if ddl is not None:
            if ddl["op"] == "create":
                self.create_table(
                    TableSpec(
                        name=ddl["name"],
                        schema=ddl["schema"],
                        partition_column=ddl["partition_column"],
                        order_columns=ddl["order_columns"],
                        settings=ddl["settings"],
                    ),
                    if_not_exists=ddl["if_not_exists"],
                )
            elif ddl["op"] == "alias":
                self.create_alias(ddl["name"], ddl["of"])
            elif ddl["op"] == "drop":
                self.drop_table(ddl["name"], if_exists=ddl["if_exists"])
            elif ddl["op"] == "alter_setting":
                self.alter_setting(ddl["name"], **ddl["settings"])
            return self.spark.createDataFrame([], "result string")

        self.refresh_system_views()
        return self.spark.sql(translate_ch_sql(query))


def _schema_with_partition(handle: TableHandle):
    from pyspark.sql import types as T

    if not handle.partition_column or handle.partition_column in [f.name for f in handle.schema.fields]:
        return handle.schema
    return T.StructType(list(handle.schema.fields) + [T.StructField(handle.partition_column, T.IntegerType(), True)])
