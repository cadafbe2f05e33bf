"""Table catalog: lifecycle + mutable per-table settings.

Capability parity:
- CREATE TABLE IF NOT EXISTS            (sql/create_local.sql:4-22)
- CREATE TABLE ... AS other (alias)     (sql/create_distributed.sql:4-6 — the
  Distributed wrapper adds nothing on Spark, where every DataFrame is already
  partitioned across executors; we keep it as a catalog alias for API parity)
- DROP TABLE IF EXISTS                  (scripts/setup.sh:63-67)
- ALTER TABLE ... MODIFY SETTING        (scripts/set_flow_control.sh:35-40)

State is a JSON sidecar per table under the warehouse dir. On a real cluster
this would live in a metastore; the interface is the contract.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from clickhousedatamocker_spark.schema import TableSpec


class TableNotFoundError(KeyError):
    pass


@dataclass
class TableHandle:
    name: str
    path: str
    schema: T.StructType
    partition_column: str | None
    order_columns: list[str]
    settings: dict[str, Any] = field(default_factory=dict)
    alias_of: str | None = None
    ttl: str | None = None
    engine: dict | None = None
    sample_by: str | None = None
    skip_indexes: list = field(default_factory=list)
    # ENGINE = Distributed(cluster, db, table[, sharding_key]) metadata:
    # {"cluster": str, "sharding_key": str | None} — None for plain aliases
    distributed: dict[str, Any] | None = None


class Catalog:
    def __init__(self, warehouse_dir: str, database: str = "default"):
        self.warehouse_dir = warehouse_dir
        self.database = database
        os.makedirs(warehouse_dir, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _meta_path(self, name: str) -> str:
        return os.path.join(self.warehouse_dir, f"{name}.meta.json")

    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse_dir, name)

    # -- lifecycle --------------------------------------------------------
    def create_table(self, spec: TableSpec, if_not_exists: bool = True) -> TableHandle:
        if self.exists(spec.name):
            if if_not_exists:
                return self.get(spec.name)
            raise ValueError(f"table {spec.name} already exists")
        meta = {
            "name": spec.name,
            "schema": spec.schema.json(),
            "partition_column": spec.partition_column,
            "order_columns": spec.order_columns,
            "settings": dict(spec.settings),
            "alias_of": None,
            "ttl": spec.ttl,
            "engine": spec.engine,
            "sample_by": spec.sample_by,
            "skip_indexes": spec.skip_indexes,
        }
        os.makedirs(self.table_path(spec.name), exist_ok=True)
        self._write_meta(spec.name, meta)
        return self.get(spec.name)

    def create_alias(
        self,
        name: str,
        of: str,
        if_not_exists: bool = True,
        distributed: dict[str, Any] | None = None,
        engine: dict[str, Any] | None = None,
    ) -> TableHandle:
        """CREATE TABLE name AS of — schema-copying alias (create_distributed.sql).
        ``distributed`` carries the Distributed-engine metadata (cluster name +
        optional sharding key) used by Engine for multi-shard routing."""
        if self.exists(name):
            if if_not_exists:
                return self.get(name)
            raise ValueError(f"table {name} already exists")
        base = self.get(of)
        meta = {
            "name": name,
            "schema": base.schema.json(),
            "partition_column": base.partition_column,
            "order_columns": base.order_columns,
            "settings": dict(base.settings),
            "alias_of": of,
            "distributed": distributed,
            "ttl": base.ttl,
            "engine": engine or base.engine,
            "sample_by": base.sample_by,
        }
        self._write_meta(name, meta)
        return self.get(name)

    def alter_schema(self, name: str, schema, settings: dict | None = None) -> None:
        """Persist a schema change (ALTER ADD/DROP/MODIFY COLUMN): metadata
        only — existing parquet parts are never rewritten; the explicit-
        schema read path projects/fills them (CH's lazy-mutation model)."""
        import json as _json

        with open(self._meta_path(name)) as f:
            meta = _json.load(f)
        meta["schema"] = schema.json()
        if settings is not None:
            meta["settings"] = settings
        self._write_meta(name, meta)

    def rename_table(self, name: str, new_name: str) -> None:
        """RENAME TABLE name TO new_name: a metadata + directory move —
        like CH, an O(1) catalog operation, never a data copy. Aliases
        pointing AT the renamed table are not chased (CH's RENAME leaves
        Distributed wrappers dangling too)."""
        if not self.exists(name):
            raise TableNotFoundError(name)
        if self.exists(new_name):
            raise ValueError(f"table {new_name} already exists")
        meta = self._read_meta(name)
        meta["name"] = new_name
        old_path, new_path = self.table_path(name), self.table_path(new_name)
        if os.path.isdir(old_path):
            shutil.move(old_path, new_path)
        # the detached-partition area travels too — otherwise DETACHed data
        # would be orphaned under the old name, unreachable by ATTACH
        if os.path.isdir(f"{old_path}.detached"):
            shutil.move(f"{old_path}.detached", f"{new_path}.detached")
        self._write_meta(new_name, meta)
        os.remove(self._meta_path(name))

    def drop_table(self, name: str, if_exists: bool = True) -> None:
        if not self.exists(name):
            if if_exists:
                return
            raise TableNotFoundError(name)
        os.remove(self._meta_path(name))
        path = self.table_path(name)
        if os.path.isdir(path):
            shutil.rmtree(path)

    # -- settings ---------------------------------------------------------
    def alter_setting(self, name: str, **settings: Any) -> None:
        """ALTER TABLE name MODIFY SETTING k=v, ... (set_flow_control.sh:35-40).

        The flow-control module re-reads settings on every admission check,
        so changes take effect on the next insert — same observable behavior
        as ClickHouse's runtime ALTER.
        """
        meta = self._read_meta(name)
        meta["settings"].update(settings)
        self._write_meta(name, meta)

    def set_skip_indexes(self, name: str, indexes: list) -> None:
        """ALTER TABLE ... ADD/DROP INDEX — metadata-only, like the
        CREATE-level skip-index declarations (data skipping here is
        parquet min/max + predicate pushdown; the DDL is accepted so CH
        schema migrations replay, and SHOW CREATE round-trips them)."""
        meta = self._read_meta(name)
        meta["skip_indexes"] = indexes
        self._write_meta(name, meta)

    def set_ttl(self, name: str, ttl: str | None) -> None:
        """ALTER TABLE name MODIFY TTL expr / REMOVE TTL — metadata only,
        like CH (existing rows are evicted by the next TTL merge pass,
        here Engine.apply_ttl / OPTIMIZE)."""
        meta = self._read_meta(name)
        meta["ttl"] = ttl
        self._write_meta(name, meta)

    # -- resolution -------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.exists(self._meta_path(name))

    def get(self, name: str) -> TableHandle:
        meta = self._read_meta(name)
        return TableHandle(
            name=meta["name"],
            path=self.table_path(self.resolve(name)),
            schema=T.StructType.fromJson(json.loads(meta["schema"])),
            partition_column=meta["partition_column"],
            order_columns=list(meta["order_columns"]),
            settings=dict(meta["settings"]),
            alias_of=meta["alias_of"],
            distributed=meta.get("distributed"),
            ttl=meta.get("ttl"),
            engine=meta.get("engine"),
            sample_by=meta.get("sample_by"),
            skip_indexes=meta.get("skip_indexes") or [],
        )

    def resolve(self, name: str) -> str:
        """Follow alias chain to the physical table (Distributed → local)."""
        seen = set()
        while True:
            meta = self._read_meta(name)
            if not meta["alias_of"]:
                return name
            if name in seen:
                raise ValueError(f"alias cycle at {name}")
            seen.add(name)
            name = meta["alias_of"]

    def get_projections(self, name: str) -> dict:
        return self._read_meta(name).get("projections") or {}

    def set_projections(self, name: str, projections: dict) -> None:
        meta = self._read_meta(name)
        meta["projections"] = projections
        self._write_meta(name, meta)

    def list_tables(self) -> list[str]:
        return sorted(f[: -len(".meta.json")] for f in os.listdir(self.warehouse_dir) if f.endswith(".meta.json"))

    # -- io ---------------------------------------------------------------
    def _read_meta(self, name: str) -> dict:
        try:
            with open(self._meta_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise TableNotFoundError(name) from None

    def _write_meta(self, name: str, meta: dict) -> None:
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path(name))
