"""M1 acceptance + miniature harness run (SURVEY §5.2(2), §7 M1)."""

import pyspark.sql.functions as F

from clickhousedatamocker_spark.config import HarnessConfig
from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.harness import QUERY_PARTS_SQL, run_harness
from clickhousedatamocker_spark.schema import test_local_spec as make_spec
from clickhousedatamocker_spark.sources.generator import BatchGenerator


def test_m1_end_to_end_parts_query(spark, tmp_warehouse):
    """Generate a batch, append, run the reference's deepest query
    (sql/query_parts.sql:1-12) through spark.sql — correct top-k answer."""
    engine = Engine(spark, tmp_warehouse)
    engine.create_table(make_spec())
    gen = BatchGenerator(spark, seed=42, base_time="2026-01-01 12:00:00")
    res = engine.insert("test_local", gen.batch_with_partition(5000))
    assert res.rows == 5000
    assert 1 < res.partitions_touched <= 24
    assert res.new_parts >= res.partitions_touched

    out = engine.sql(QUERY_PARTS_SQL.format(database="default", table="test_local"))
    rows = out.collect()
    assert 0 < len(rows) <= 20
    assert rows[0]["parts_count"] >= rows[-1]["parts_count"]  # ORDER BY DESC
    assert sum(r["total_rows"] for r in rows) <= 5000
    assert all(r["total_size"].split(" ")[1] in {"B", "KiB", "MiB"} for r in rows)

    # readback: row fidelity through partitioned parquet
    back = engine.read_table("test_local")
    assert back.count() == 5000
    assert back.select(F.countDistinct("event_hour")).first()[0] == res.partitions_touched


def test_insert_appends_and_counts_parts(spark, tmp_warehouse):
    engine = Engine(spark, tmp_warehouse)
    engine.create_table(make_spec())
    gen = BatchGenerator(spark, seed=1, base_time="2026-01-01 12:00:00")
    r1 = engine.insert("test_local", gen.batch_with_partition(1000, batch_no=0))
    r2 = engine.insert("test_local", gen.batch_with_partition(1000, batch_no=1))
    status = engine.flow_status("test_local")
    assert status.active_parts == r1.new_parts + r2.new_parts
    assert engine.read_table("test_local").count() == 2000


def test_alias_insert_routes_to_local(spark, tmp_warehouse):
    """test_distributed AS test_local (create_distributed.sql) — writes through
    the alias land in the physical table."""
    engine = Engine(spark, tmp_warehouse)
    engine.create_table(make_spec())
    engine.create_alias("test_distributed", "test_local")
    gen = BatchGenerator(spark, seed=2, base_time="2026-01-01 12:00:00")
    engine.insert("test_distributed", gen.batch_with_partition(500))
    assert engine.read_table("test_local").count() == 500


def test_optimize_compacts_parts(spark, tmp_warehouse):
    engine = Engine(spark, tmp_warehouse)
    engine.create_table(make_spec())
    gen = BatchGenerator(spark, seed=3, base_time="2026-01-01 12:00:00")
    for b in range(3):
        engine.insert("test_local", gen.batch_with_partition(1000, batch_no=b))
    before = engine.flow_status("test_local").active_parts
    engine.optimize("test_local")
    after = engine.flow_status("test_local").active_parts
    assert after < before
    assert engine.read_table("test_local").count() == 3000  # no data loss
    # history retained like system.parts: inactive rows still visible
    parts = engine.system_parts()
    assert parts.filter(~F.col("active")).count() > 0


def test_miniature_harness_flow_control_triggers(spark, tmp_warehouse):
    """setup.sh contract: delay warning precedes throw; loop stops at throw."""
    cfg = HarnessConfig(
        batch_size=500,
        parts_to_delay_insert=5,
        parts_to_throw_insert=10,
        insert_interval_s=0.0,
        max_insert_count=60,
        base_time="2026-01-01 12:00:00",
    )
    res = run_harness(spark, tmp_warehouse, cfg)
    assert res.flow_control_triggered
    assert res.throw_triggered
    assert res.inserts_attempted < 60  # early stop, not loop exhaustion
    assert res.rows_inserted > 0
    assert res.final_active_parts >= 10


def test_mutation_delete_where(spark, tmp_warehouse):
    """ALTER DELETE semantics: predicate rows gone, untouched partitions'
    parts untouched, PartsMutations incremented, manifest consistent."""
    import pyspark.sql.functions as F

    from clickhousedatamocker_spark.engine import Engine
    from clickhousedatamocker_spark.schema import test_local_spec
    from clickhousedatamocker_spark.sources.generator import BatchGenerator

    engine = Engine(spark, tmp_warehouse)
    engine.create_table(test_local_spec())
    gen = BatchGenerator(spark, seed=11, base_time="2026-01-01 12:00:00")
    engine.insert("test_local", gen.batch_with_partition(20_000, batch_no=0))

    before = engine.read_table("test_local")
    n_before = before.count()
    n_match = before.filter("status < 64").count()
    assert 0 < n_match < n_before

    parts_before = {
        (p["partition"], p["name"])
        for p in engine.parts._manifest["test_local"]
        if p["active"]
    }

    deleted = engine.delete_where("test_local", "status < 64")
    assert deleted == n_match

    after = engine.read_table("test_local")
    assert after.count() == n_before - n_match
    assert after.filter("status < 64").count() == 0
    # every value column survives intact for kept rows
    assert after.filter(F.col("event_time").isNull()).count() == 0

    assert engine.metrics.get("PartsMutations") == 1
    # partition-scoped predicate: delete from one hour only rewrites that hour
    one_hour = after.select("event_hour").first()["event_hour"]
    parts_mid = {
        (p["partition"], p["name"])
        for p in engine.parts._manifest["test_local"]
        if p["active"]
    }
    engine.delete_where("test_local", f"event_hour = {one_hour} AND status < 128")
    parts_after = {
        (p["partition"], p["name"])
        for p in engine.parts._manifest["test_local"]
        if p["active"]
    }
    changed = {p for p in parts_mid ^ parts_after}
    assert all(str(part) == str(one_hour) for part, _ in changed), changed


def test_mutation_update_where(spark, tmp_warehouse):
    """ALTER UPDATE: assignments applied to matching rows only, row count
    unchanged, partition column guarded."""
    import pytest as _pytest

    from clickhousedatamocker_spark.engine import Engine
    from clickhousedatamocker_spark.schema import test_local_spec
    from clickhousedatamocker_spark.sources.generator import BatchGenerator

    engine = Engine(spark, tmp_warehouse)
    engine.create_table(test_local_spec())
    gen = BatchGenerator(spark, seed=13, base_time="2026-01-01 12:00:00")
    engine.insert("test_local", gen.batch_with_partition(10_000, batch_no=0))

    n = engine.read_table("test_local").count()
    n_match = engine.read_table("test_local").filter("event_type = 'click'").count()

    updated = engine.update_where(
        "test_local",
        {"status": "255", "metadata": "'{\"flagged\":true}'"},
        "event_type = 'click'",
    )
    assert updated == n_match

    after = engine.read_table("test_local")
    assert after.count() == n  # updates never change cardinality
    assert after.filter("event_type = 'click' AND status <> 255").count() == 0
    assert after.filter("event_type = 'click' AND metadata <> '{\"flagged\":true}'").count() == 0
    # non-matching rows untouched
    assert after.filter("event_type <> 'click' AND metadata <> '{}'").count() == 0

    with _pytest.raises(ValueError):
        engine.update_where("test_local", {"event_hour": "0"}, "true")


def test_harness_with_background_merges_stays_below_throw(spark, tmp_warehouse):
    """With compaction racing inserts (the real-ClickHouse steady state),
    active parts stay bounded and flow control never throws — the inverse
    of the reference's deliberately pessimal no-merge mode."""
    from clickhousedatamocker_spark.config import HarnessConfig
    from clickhousedatamocker_spark.harness import run_harness

    cfg = HarnessConfig(
        batch_size=5000,
        max_insert_count=6,
        insert_interval_s=0.0,
        parts_to_delay_insert=50,
        parts_to_throw_insert=100,
        optimize_every=2,
        base_time="2026-01-01 12:00:00",
    )
    res = run_harness(spark, tmp_warehouse, cfg)
    assert res.inserts_succeeded == 6
    assert not res.throw_triggered
    # each insert adds <=24 parts; compaction every 2 inserts caps actives
    # at ~48 + the 24 from the freshest batch
    assert res.final_active_parts <= 72


def test_commit_walk_scoped_to_touched_partitions(spark, tmp_warehouse, monkeypatch):
    """Per-insert manifest cost must not grow with accumulated part count:
    commit discovery may list only the partition dirs the write touched
    (mtime watermark), never the whole table."""
    import os

    import clickhousedatamocker_spark.plans.parts as parts_mod

    engine = Engine(spark, tmp_warehouse)
    engine.create_table(make_spec())
    gen = BatchGenerator(spark, seed=3, base_time="2026-01-01 12:00:00")
    # several 24-partition inserts accumulate parts across 24 dirs
    for batch_no in range(3):
        engine.insert("test_local", gen.batch_with_partition(2000, batch_no=batch_no))

    one_hour = gen.batch(500).withColumn(
        "event_time", F.lit("2026-01-01 12:30:00").cast("timestamp")
    )
    listed: list[str] = []
    real_listdir = parts_mod.os.listdir

    def spy_listdir(path):
        listed.append(str(path))
        return real_listdir(path)

    monkeypatch.setattr(parts_mod.os, "listdir", spy_listdir)
    res = engine.insert("test_local", one_hour)
    assert res.new_parts == 1 and res.partitions_touched == 1
    part_dirs = {p for p in listed if "=" in os.path.basename(p)}
    assert len(part_dirs) == 1, f"walked untouched partition dirs: {sorted(part_dirs)}"


def test_manifest_log_survives_reload(spark, tmp_warehouse):
    """The append-only commit log replays to the same inventory (incl.
    retired parts) in a fresh PartsInventory."""
    from clickhousedatamocker_spark.plans.parts import PartsInventory

    engine = Engine(spark, tmp_warehouse)
    engine.create_table(make_spec())
    gen = BatchGenerator(spark, seed=4, base_time="2026-01-01 12:00:00")
    engine.insert("test_local", gen.batch_with_partition(2000, batch_no=0))
    engine.insert("test_local", gen.batch_with_partition(2000, batch_no=1))
    engine.optimize("test_local")
    handle = engine.catalog.get("test_local")
    want_active = engine.parts.active_parts_count("test_local", handle.path)
    want_total = len(engine.parts._manifest["test_local"])

    fresh = PartsInventory()
    fresh.load("test_local", handle.path)
    assert fresh.active_parts_count("test_local", handle.path) == want_active == 24
    assert len(fresh._manifest["test_local"]) == want_total
