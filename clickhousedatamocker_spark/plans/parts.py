"""Parts inventory → the ``system_parts`` introspection table.

ClickHouse's "part" = immutable sorted file created per insert per partition
(``sql/query_parts.sql:2-9``). The Spark analogue is one Parquet file per
task per partition directory. This module maintains a manifest
(``_parts_manifest.json`` sidecar per table) recording every file the writer
commits, with ``active`` flags so a compaction ("merge") can retire parts
without losing observability — mirroring ``system.parts.active``.

Scale note: at 100 TB the manifest is a metastore/Delta-log job; the
file-listing fallback exists so the view works even on externally-written
tables. Row counts come from parquet footers (metadata-only reads).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from clickhousedatamocker_spark.schema import SYSTEM_PARTS_SCHEMA


class PartsInventory:
    def __init__(self, database: str = "default"):
        self.database = database
        # manifest: table -> list of part dicts
        self._manifest: dict[str, list[dict]] = {}
        # bumped on every commit/retire — lets readers cache derived state
        self._versions: dict[str, int] = {}

    def inventory_version(self, table: str) -> int:
        return self._versions.get(table, 0)

    def _bump(self, table: str) -> None:
        self._versions[table] = self._versions.get(table, 0) + 1

    # -- manifest maintenance --------------------------------------------
    def _manifest_path(self, table_path: str) -> str:
        return os.path.join(table_path, "_parts_manifest.json")

    def load(self, table: str, table_path: str) -> None:
        p = self._manifest_path(table_path)
        if os.path.exists(p):
            with open(p) as f:
                self._manifest[table] = json.load(f)
        else:
            self._manifest[table] = []

    def save(self, table: str, table_path: str) -> None:
        p = self._manifest_path(table_path)
        with open(p + ".tmp", "w") as f:
            json.dump(self._manifest.get(table, []), f)
        os.replace(p + ".tmp", p)

    def record_commit(self, table: str, table_path: str, before: set[str]) -> list[dict]:
        """Diff the table directory against ``before`` (file set snapshotted
        pre-write) and register every new file as an active part."""
        if table not in self._manifest:
            self.load(table, table_path)
        new_parts = []
        now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        for partition, fname, full in _walk_parquet(table_path):
            rel = os.path.join(partition or "", fname)
            if rel in before:
                continue
            num_rows = _parquet_rows(full)
            part = {
                "partition": _partition_value(partition),
                "name": rel,
                "rows": num_rows,
                "bytes_on_disk": os.path.getsize(full),
                "active": True,
                "modification_time": now,
            }
            new_parts.append(part)
        self._manifest[table].extend(new_parts)
        self._bump(table)
        self.save(table, table_path)
        return new_parts

    def snapshot_files(self, table_path: str) -> set[str]:
        return {os.path.join(partition or "", f) for partition, f, _ in _walk_parquet(table_path)}

    def retire(self, table: str, table_path: str, names: list[str]) -> None:
        """Mark parts inactive (post-compaction), keeping history like CH."""
        names_set = set(names)
        for part in self._manifest.get(table, []):
            if part["name"] in names_set:
                part["active"] = False
        self._bump(table)
        self.save(table, table_path)

    # -- introspection ----------------------------------------------------
    def active_parts_count(self, table: str, table_path: str) -> int:
        """The flow-control input: live part-file count for one table
        (monitor_metrics.sh:100)."""
        if table not in self._manifest:
            self.load(table, table_path)
        return sum(1 for p in self._manifest[table] if p["active"])

    def to_df(self, spark: SparkSession, tables: dict[str, str]) -> DataFrame:
        """``system_parts`` DataFrame over all known tables ({name: path})."""
        rows = []
        for table, path in tables.items():
            if table not in self._manifest:
                self.load(table, path)
            for p in self._manifest[table]:
                rows.append(
                    (
                        self.database,
                        table,
                        p["partition"],
                        p["name"],
                        p["rows"],
                        p["bytes_on_disk"],
                        p["active"],
                        datetime.strptime(p["modification_time"], "%Y-%m-%d %H:%M:%S"),
                    )
                )
        # metadata-sized table (one row per part file): build on ONE slice —
        # avoids a Python-worker spin-up per default slice on every query
        return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), SYSTEM_PARTS_SCHEMA)


def _walk_parquet(table_path: str):
    """Yield (partition_dirname_or_None, filename, fullpath) for data files."""
    if not os.path.isdir(table_path):
        return
    for entry in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, entry)
        if os.path.isdir(full) and "=" in entry:
            for f in sorted(os.listdir(full)):
                if f.endswith(".parquet"):
                    yield entry, f, os.path.join(full, f)
        elif entry.endswith(".parquet"):
            yield None, entry, full


def _partition_value(partition_dir: str | None) -> str:
    if not partition_dir:
        return "all"
    return partition_dir.split("=", 1)[1]


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
