"""Partitioned batched ingest — the reference's data path, Spark-first.

``scripts/insert_data.sh:27-51`` pipes TSV through clickhouse-client into a
Distributed table; the server splits each block by ``toYYYYMMDDhh(event_time)``
into up to 24 new parts per insert. Here the same contract is one parallel,
shuffle-free Parquet append:

    batch DF → withColumn(event_hour) → sortWithinPartitions(event_time, id)
      → write.partitionBy(event_hour).mode(append)

- No shuffle: partitionBy on write splits files per task without exchanging
  rows. At 100 TB the append scales linearly with executors.
- ``sortWithinPartitions`` reproduces the MergeTree ordering key
  (create_local.sql:19); Parquet row-group min/max stats then give the same
  pruning effect as the sparse primary index.
- Admission control (plans/flow_control.py) runs before the write, keyed on
  the manifest's active-part count — O(1), no data scan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhousedatamocker_spark.functions.scalar import to_yyyymmddhh
from clickhousedatamocker_spark.plans.catalog import TableHandle
from clickhousedatamocker_spark.plans.flow_control import FlowController
from clickhousedatamocker_spark.plans.parts import PartsInventory


# Engine families with plain-append semantics: no merge-time collapse, no
# required ORDER BY. Memory/Log/TinyLog/StripeLog are ClickHouse's simple
# table engines — this build persists all of them as parquet parts exactly
# like MergeTree (a superset of Memory's restart-loses-data contract,
# documented deviation).
PLAIN_APPEND_FAMILIES = {"MergeTree", "Memory", "Log", "TinyLog", "StripeLog"}


def _merge_collapse(df: DataFrame, handle: TableHandle, family: str) -> DataFrame:
    """Merge-time collapse semantics of the MergeTree engine families
    (applied per partition during OPTIMIZE, exactly where ClickHouse applies
    them):

    - ReplacingMergeTree([ver]): one row per ORDER BY key — the max-``ver``
      row (or, with no version column, a deterministic representative:
      ordered by all non-key columns descending, where CH keeps an
      arbitrary "last" row).
    - SummingMergeTree: one row per ORDER BY key with numeric non-key
      columns summed; non-numeric non-key columns keep their MIN (CH keeps
      an arbitrary value; MIN is the deterministic choice).
    """
    if family in PLAIN_APPEND_FAMILIES:
        return df
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    keys = handle.order_columns or [df.columns[0]]
    others = [c for c in df.columns if c not in keys]
    if family == "ReplacingMergeTree":
        ver = (handle.engine or {}).get("args") or []
        order = (
            [F.col(ver[0]).desc()]
            if ver
            else [F.col(c).desc() for c in others]
        )
        w = W.partitionBy(*keys).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if family == "SummingMergeTree":
        numeric = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                   T.FloatType, T.DoubleType, T.DecimalType)
        aggs = []
        for f in df.schema.fields:
            if f.name in keys:
                continue
            if isinstance(f.dataType, numeric):
                aggs.append(F.sum(f.name).cast(f.dataType).alias(f.name))
            else:
                aggs.append(F.min(f.name).alias(f.name))
        return df.groupBy(*keys).agg(*aggs).select(*df.columns)
    if family == "AggregatingMergeTree":
        # One row per ORDER BY key with each AggregateFunction(fn, T) column
        # MERGED by its own discipline (field metadata set by the DDL
        # parser): HLL sketch union for uniq, algebraic partials for
        # sum/min/max/count, component-wise struct sums for avg. Exactly
        # the -State/-Merge combinator semantics, applied at merge time —
        # CH's incremental-rollup storage engine. Plain columns keep MIN
        # (deterministic where CH is arbitrary, like SummingMergeTree).
        aggs = []
        for f in df.schema.fields:
            if f.name in keys:
                continue
            kind = (f.metadata or {}).get("ch_agg")
            if kind == "uniq":
                aggs.append(F.expr(f"hll_union_agg({f.name})").alias(f.name))
            elif kind in ("sum", "count"):
                aggs.append(F.sum(f.name).cast(f.dataType).alias(f.name))
            elif kind == "min":
                aggs.append(F.min(f.name).alias(f.name))
            elif kind == "max":
                aggs.append(F.max(f.name).alias(f.name))
            elif kind == "avg":
                aggs.append(
                    F.struct(
                        F.sum(F.col(f.name).getField("s")).alias("s"),
                        F.sum(F.col(f.name).getField("c")).alias("c"),
                    ).alias(f.name)
                )
            else:
                aggs.append(F.min(f.name).alias(f.name))
        return df.groupBy(*keys).agg(*aggs).select(*df.columns)
    if family == "VersionedCollapsingMergeTree":
        # VersionedCollapsingMergeTree(sign, version): cancellation is
        # version-scoped — a -1 cancels the +1 CARRYING THE SAME VERSION
        # (insertion order never matters, CH's whole point for this
        # family). Per (key, version) group: balanced signs vanish; among
        # the surviving unbalanced versions the key keeps its MAX-version
        # row with the balance's sign.
        args = (handle.engine or {}).get("args") or []
        if len(args) < 2:
            raise NotImplementedError(
                "VersionedCollapsingMergeTree needs (sign, version) arguments"
            )
        sign, version = args[0], args[1]
        others_nc = [c for c in df.columns if c not in keys and c not in (sign, version)]
        w = W.partitionBy(*keys, version, sign).orderBy(
            *[F.col(c).desc() for c in others_nc] or [F.lit(1)]
        )
        ranked = df.withColumn("__rn", F.row_number().over(w))
        balance = df.groupBy(*keys, version).agg(
            F.sum(F.col(sign).cast("long")).alias("__bal")
        )
        survivors = (
            ranked.join(balance, [*keys, version])
            .filter(
                (F.col("__bal") != 0)
                & (F.col("__rn") == 1)
                & (F.when(F.col("__bal") > 0, F.col(sign) > 0).otherwise(F.col(sign) < 0))
            )
            .drop("__rn", "__bal")
        )
        wv = W.partitionBy(*keys).orderBy(F.col(version).desc())
        return (
            survivors.withColumn("__rv", F.row_number().over(wv))
            .filter(F.col("__rv") == 1)
            .drop("__rv")
            .select(*df.columns)
        )
    if family == "CollapsingMergeTree":
        # CollapsingMergeTree(sign): rows with sign=+1 are "state", sign=-1
        # cancels a matching earlier state. Merge semantics for the
        # well-formed stream (what CH documents and guarantees): per ORDER
        # BY key, equal +/- counts cancel completely; a +1 excess keeps the
        # last state row; a -1 excess keeps the last cancel row (CH keeps
        # it so a late-arriving +1 can still cancel). Deterministic "last"
        # = max over non-key columns, where CH is insertion-ordered.
        args = (handle.engine or {}).get("args") or []
        if not args:
            raise NotImplementedError("CollapsingMergeTree needs a sign column argument")
        sign = args[0]
        others_nc = [c for c in df.columns if c not in keys and c != sign]
        w = W.partitionBy(*keys, sign).orderBy(*[F.col(c).desc() for c in others_nc] or [F.lit(1)])
        ranked = df.withColumn("__rn", F.row_number().over(w))
        balance = df.groupBy(*keys).agg(F.sum(F.col(sign).cast("long")).alias("__bal"))
        return (
            ranked.join(balance, list(keys))
            .filter(
                (F.col("__bal") != 0)
                & (F.col("__rn") == 1)
                & (
                    F.when(F.col("__bal") > 0, F.col(sign) > 0).otherwise(F.col(sign) < 0)
                )
            )
            .drop("__rn", "__bal")
            .select(*df.columns)
        )
    raise NotImplementedError(f"unsupported MergeTree family {family!r}")


def _mutation_schema(handle: TableHandle):
    from pyspark.sql import types as T

    if not handle.partition_column or handle.partition_column in [
        f.name for f in handle.schema.fields
    ]:
        return handle.schema
    return T.StructType(
        list(handle.schema.fields) + [T.StructField(handle.partition_column, T.IntegerType(), True)]
    )


@dataclass
class InsertResult:
    rows: int
    bytes_on_disk: int
    new_parts: int
    partitions_touched: int
    elapsed_s: float
    delay_s: float


class Writer:
    def __init__(self, parts: PartsInventory, flow: FlowController, metrics=None):
        self.parts = parts
        self.flow = flow
        self.metrics = metrics

    def insert(self, handle: TableHandle, df: DataFrame, *, enforce_partition_cap: bool = False) -> InsertResult:
        """Admission-controlled append of one batch (insert_data.sh parity,
        including the per-batch wall-clock timing at insert_data.sh:31,46-47).
        """
        t0 = time.monotonic()
        table = handle.name

        parts_count = self.parts.active_parts_count(table, handle.path)
        decision = self.flow.admit(parts_count, handle.settings)

        part_col = handle.partition_column
        if part_col and part_col not in df.columns:
            # event_hour = toYYYYMMDDhh(event_time)  (create_local.sql:18)
            df = df.withColumn(part_col, to_yyyymmddhh(F.col("event_time")))

        if enforce_partition_cap and part_col:
            n_parts = df.select(F.countDistinct(part_col).alias("n")).first()["n"]
            self.flow.check_partitions(n_parts, handle.settings, enforce=True)

        if part_col:
            # One shuffle keyed on the partition column so each insert creates
            # exactly one part (file) per touched partition — the MergeTree
            # "block split" semantics (≤24 new parts/insert, CLAUDE.md:429-432)
            # and the standard small-files defense at scale. For very large
            # batches this becomes repartition(n, part_col) via the
            # files_per_partition table setting.
            fpp = int(handle.settings.get("files_per_partition", 1))
            if fpp > 1:
                salt = F.pmod(F.xxhash64(*[F.col(c) for c in (handle.order_columns or [part_col])]), F.lit(fpp))
                df = df.repartition(fpp * 24, F.col(part_col), salt)
            else:
                # partition_buckets: expected distinct partition values per
                # batch (24 for toYYYYMMDDhh over a 1-day horizon). Sizing the
                # shuffle to the key cardinality instead of
                # spark.sql.shuffle.partitions avoids empty reducers and cuts
                # per-insert task overhead ~25% at the reference operating
                # point. Hash collisions just mean one task hosts two hours —
                # partitionBy still emits exactly one file per hour dir.
                buckets = int(handle.settings.get("partition_buckets", 0))
                if buckets > 0:
                    df = df.repartition(buckets, F.col(part_col))
                else:
                    df = df.repartition(F.col(part_col))
        if handle.order_columns:
            df = df.sortWithinPartitions(*handle.order_columns)

        # watermark taken before the write: commit discovery then walks only
        # partition dirs the write touched — O(#partitions + new files) per
        # insert, independent of accumulated part count (plans/parts.py)
        wm = time.time_ns()
        writer = df.write.mode("append").format("parquet")
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.save(handle.path)

        new_parts = self.parts.record_commit(table, handle.path, since_ns=wm)
        rows = sum(p["rows"] for p in new_parts)
        nbytes = sum(p["bytes_on_disk"] for p in new_parts)
        if self.metrics is not None:
            self.metrics.incr("InsertedRows", rows)
            self.metrics.incr("InsertedBytes", nbytes)
            self.metrics.set("PartsActive", self.parts.active_parts_count(table, handle.path))
            self.metrics.set("PartsCommitted", self.parts.active_parts_count(table, handle.path))
        return InsertResult(
            rows=rows,
            bytes_on_disk=nbytes,
            new_parts=len(new_parts),
            partitions_touched=len({p["partition"] for p in new_parts}),
            elapsed_s=time.monotonic() - t0,
            delay_s=decision.delay_s,
        )

    def mutate_delete(self, spark, handle: TableHandle, predicate: str) -> int:
        """ClickHouse ``ALTER TABLE … DELETE WHERE predicate`` semantics:
        rewrite only the parts whose partition might contain matching rows,
        retiring the old parts (CH runs this as an async mutation; here it is
        synchronous). Partition pruning on the predicate keeps the rewrite
        scoped: untouched partitions' files are never read or rewritten.
        Returns the number of rows deleted.
        """
        import os
        import shutil

        from pyspark.sql import functions as F  # noqa: F811

        table = handle.name
        self.parts.load(table, handle.path)
        part_col = handle.partition_column

        full = spark.read.schema(_mutation_schema(handle)).parquet(handle.path)
        # partitions that contain at least one matching row (pruned scan)
        if part_col:
            hit_parts = [
                r[part_col]
                for r in full.filter(F.expr(predicate)).select(part_col).distinct().collect()
            ]
        else:
            hit_parts = [None]
        if not hit_parts:
            return 0

        deleted = 0
        for pv in hit_parts:
            part_dir = (
                os.path.join(handle.path, f"{part_col}={pv}") if part_col else handle.path
            )
            old = [
                p
                for p in self.parts._manifest[table]
                if p["active"] and (str(p["partition"]) == str(pv) or part_col is None)
            ]
            sub = spark.read.schema(handle.schema).parquet(part_dir)
            if part_col:
                # partition value isn't stored in the files; materialize it
                # so predicates may reference it, drop it again pre-write
                sub = sub.withColumn(part_col, F.lit(pv).cast("int"))
            keep = sub.filter(~F.expr(predicate))
            if part_col:
                keep = keep.drop(part_col)
            n_before = sub.count()
            n_after = keep.count()
            deleted += n_before - n_after
            staging = part_dir + ".mutate.tmp"
            w = keep
            if handle.order_columns:
                w = w.sortWithinPartitions(*handle.order_columns)
            w.coalesce(max(1, len(old))).write.mode("overwrite").parquet(staging)
            for p in old:
                f = os.path.join(handle.path, p["name"])
                if os.path.exists(f):
                    os.remove(f)
            for f in os.listdir(staging):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(staging, f), os.path.join(part_dir, f))
            shutil.rmtree(staging, ignore_errors=True)
            self.parts.retire(table, handle.path, [p["name"] for p in old])
        self.parts.record_commit(table, handle.path)
        self.parts.save(table, handle.path)  # rewrite paths compact the log
        if self.metrics is not None:
            self.metrics.incr("PartsMutations")
            self.metrics.set("PartsActive", self.parts.active_parts_count(table, handle.path))
            self.metrics.set("PartsCommitted", self.parts.active_parts_count(table, handle.path))
        return deleted

    def mutate_update(
        self, spark, handle: TableHandle, assignments: dict[str, str], predicate: str
    ) -> int:
        """``ALTER TABLE … UPDATE col = expr, … WHERE predicate``: same
        partition-pruned rewrite as :meth:`mutate_delete`, but matching rows
        are rewritten with the assignment expressions instead of dropped.
        Returns the number of rows updated. The partition column itself is
        not assignable (CH shares this restriction — it would move rows
        between partitions)."""
        import os
        import shutil

        from pyspark.sql import functions as F  # noqa: F811

        part_col = handle.partition_column
        if part_col and part_col in assignments:
            raise ValueError(f"cannot UPDATE the partition column {part_col!r}")
        table = handle.name
        self.parts.load(table, handle.path)

        full = spark.read.schema(_mutation_schema(handle)).parquet(handle.path)
        if part_col:
            hit_parts = [
                r[part_col]
                for r in full.filter(F.expr(predicate)).select(part_col).distinct().collect()
            ]
        else:
            hit_parts = [None]
        if not hit_parts:
            return 0

        updated = 0
        for pv in hit_parts:
            part_dir = (
                os.path.join(handle.path, f"{part_col}={pv}") if part_col else handle.path
            )
            old = [
                p
                for p in self.parts._manifest[table]
                if p["active"] and (str(p["partition"]) == str(pv) or part_col is None)
            ]
            sub = spark.read.schema(handle.schema).parquet(part_dir)
            if part_col:
                sub = sub.withColumn(part_col, F.lit(pv).cast("int"))
            match = F.expr(predicate)
            updated += sub.filter(match).count()
            new = sub.select(
                *[
                    (
                        F.when(match, F.expr(assignments[c])).otherwise(F.col(c)).cast(
                            dict(sub.dtypes)[c]
                        )
                        if c in assignments
                        else F.col(c)
                    ).alias(c)
                    for c in sub.columns
                ]
            )
            if part_col:
                new = new.drop(part_col)
            staging = part_dir + ".mutate.tmp"
            w = new
            if handle.order_columns:
                w = w.sortWithinPartitions(*handle.order_columns)
            w.coalesce(max(1, len(old))).write.mode("overwrite").parquet(staging)
            for p in old:
                f = os.path.join(handle.path, p["name"])
                if os.path.exists(f):
                    os.remove(f)
            for f in os.listdir(staging):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(staging, f), os.path.join(part_dir, f))
            shutil.rmtree(staging, ignore_errors=True)
            self.parts.retire(table, handle.path, [p["name"] for p in old])
        self.parts.record_commit(table, handle.path)
        self.parts.save(table, handle.path)  # rewrite paths compact the log
        if self.metrics is not None:
            self.metrics.incr("PartsMutations")
            self.metrics.set("PartsActive", self.parts.active_parts_count(table, handle.path))
            self.metrics.set("PartsCommitted", self.parts.active_parts_count(table, handle.path))
        return updated

    def mutate_rename_column(self, spark, handle: TableHandle, old_name: str, new_name: str) -> int:
        """Physically rewrite every active part with the column renamed.

        ClickHouse's RENAME COLUMN is a metadata-only O(1) change; here it
        is a synchronous mutation (the same part-rewrite machinery as
        ALTER … UPDATE) because parts store the physical column name in
        their parquet footers — DOCUMENTED DEVIATION: correct semantics,
        O(table) cost. Returns rows rewritten."""
        import os
        import shutil

        from pyspark.sql import functions as F  # noqa: F811

        part_col = handle.partition_column
        table = handle.name
        self.parts.load(table, handle.path)
        if part_col:
            pvs = sorted(
                {
                    str(p["partition"])
                    for p in self.parts._manifest[table]
                    if p["active"]
                }
            )
        else:
            pvs = [None]
        rewritten = 0
        for pv in pvs:
            part_dir = (
                os.path.join(handle.path, f"{part_col}={pv}") if part_col else handle.path
            )
            if not os.path.isdir(part_dir):
                continue
            old = [
                p
                for p in self.parts._manifest[table]
                if p["active"] and (str(p["partition"]) == str(pv) or part_col is None)
            ]
            sub = spark.read.schema(handle.schema).parquet(part_dir)
            rewritten += sub.count()
            w = sub.withColumnRenamed(old_name, new_name)
            order = [new_name if c == old_name else c for c in handle.order_columns]
            if order:
                w = w.sortWithinPartitions(*order)
            staging = part_dir + ".mutate.tmp"
            w.coalesce(max(1, len(old))).write.mode("overwrite").parquet(staging)
            for p in old:
                f = os.path.join(handle.path, p["name"])
                if os.path.exists(f):
                    os.remove(f)
            for f in os.listdir(staging):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(staging, f), os.path.join(part_dir, f))
            shutil.rmtree(staging, ignore_errors=True)
            self.parts.retire(table, handle.path, [p["name"] for p in old])
        self.parts.record_commit(table, handle.path)
        self.parts.save(table, handle.path)
        if self.metrics is not None:
            self.metrics.incr("PartsMutations")
            self.metrics.set("PartsActive", self.parts.active_parts_count(table, handle.path))
            self.metrics.set("PartsCommitted", self.parts.active_parts_count(table, handle.path))
        return rewritten

    def optimize(
        self, spark, handle: TableHandle, deduplicate: bool = False, partition: str | None = None
    ) -> int:
        """Compact each partition's parts into one (≈ CH background merge /
        OPTIMIZE TABLE). Old parts are retired (active=false) in the manifest
        and their files removed. Returns number of partitions compacted.

        ``deduplicate``: CH's ``OPTIMIZE … DEDUPLICATE`` — drop fully
        identical rows during the merge rewrite (all columns compared, like
        CH's default column list). Partition-local like the merge itself:
        CH deduplicates within the merging parts, never across partitions.
        """
        import os
        import shutil

        table = handle.name
        self.parts.load(table, handle.path)
        by_partition: dict[str, list[dict]] = {}
        for p in self.parts._manifest[table]:
            if p["active"]:
                by_partition.setdefault(p["partition"], []).append(p)
        if partition is not None:
            # OPTIMIZE ... PARTITION 'p': compact ONE partition — O(its
            # parts), never a table rewrite; unknown values no-op like CH
            by_partition = {k: v for k, v in by_partition.items() if k == str(partition)}

        family = (handle.engine or {}).get("family", "MergeTree")
        compacted = 0
        for partition, plist in by_partition.items():
            # plain MergeTree: single-part partitions need no merge; the
            # collapsing families (and DEDUPLICATE) must still process them
            # (duplicates can live INSIDE one part — CH's OPTIMIZE FINAL
            # does the same)
            if len(plist) < 2 and family == "MergeTree" and not deduplicate:
                continue
            # unpartitioned tables ("all" pseudo-partition): parts live at
            # the table root, not under a key=value dir
            part_dir = (
                os.path.join(handle.path, f"{handle.partition_column}={partition}")
                if handle.partition_column
                else handle.path
            )
            staging = part_dir.rstrip("/") + ".compact.tmp"
            merged = spark.read.schema(handle.schema).parquet(part_dir)
            merged = _merge_collapse(merged, handle, family)
            if deduplicate:
                merged = merged.dropDuplicates()
            if handle.order_columns:
                merged = merged.sortWithinPartitions(*handle.order_columns)
            merged.coalesce(1).write.mode("overwrite").parquet(staging)
            old_files = [os.path.join(part_dir, os.path.basename(p["name"])) for p in plist]
            new_files = [f for f in os.listdir(staging) if f.endswith(".parquet")]
            for f in new_files:
                shutil.move(os.path.join(staging, f), os.path.join(part_dir, f))
            shutil.rmtree(staging, ignore_errors=True)
            for f in old_files:
                if os.path.exists(f):
                    os.remove(f)
            self.parts.retire(table, handle.path, [p["name"] for p in plist])
            compacted += 1
        # register the newly-written compacted files (anything on disk not yet known)
        self.parts.record_commit(table, handle.path)
        self.parts.save(table, handle.path)  # rewrite paths compact the log
        if self.metrics is not None:
            self.metrics.set("PartsActive", self.parts.active_parts_count(table, handle.path))
            self.metrics.set("PartsCommitted", self.parts.active_parts_count(table, handle.path))
        return compacted
