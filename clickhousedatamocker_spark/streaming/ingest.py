"""Always-on streaming ingest — the reference's insert loop as a
Structured Streaming query.

``scripts/setup.sh:125-151`` runs insert → monitor → sleep 1s, ≤60 times,
stopping early when flow control throws. Here the same contract is:

    rate source (rowsPerSecond = batch_size)
      → generator column family (same projection as the batch path)
      → foreachBatch: admission-controlled partitioned append
      → stop on TooManyPartsError

foreachBatch reuses ``Engine.insert`` verbatim, so flow control (delay
sleeps, throw rejection), the parts manifest, and the metrics store behave
identically under both drivers. At scale the rate source is a stand-in for
Kafka/files; the sink path is unchanged.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousedatamocker_spark.config import HarnessConfig
from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.plans.flow_control import TooManyPartsError
from clickhousedatamocker_spark.schema import test_local_spec
from clickhousedatamocker_spark.sources.generator import BatchGenerator

log = logging.getLogger("clickhousedatamocker_spark.streaming")


@dataclass
class StreamingHarnessResult:
    batches: int = 0
    rows_inserted: int = 0
    flow_control_triggered: bool = False
    throw_triggered: bool = False
    final_active_parts: int = 0
    per_batch_seconds: list[float] = field(default_factory=list)


def generated_stream(
    spark: SparkSession, gen: BatchGenerator, rows_per_second: int
) -> DataFrame:
    """Unbounded generated-row stream: rate source indexes feed the same
    deterministic column family as the batch generator."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return gen.from_index(rate.select(F.col("value").alias("id")))


def run_streaming_harness(
    spark: SparkSession,
    warehouse_dir: str,
    config: HarnessConfig | None = None,
    *,
    timeout_s: float = 120.0,
) -> StreamingHarnessResult:
    """Streaming variant of ``run_harness`` — same tables, same thresholds,
    same early-stop contract; the driver loop is replaced by a 1-second
    trigger. Returns once flow control throws (or ``timeout_s`` elapses).
    """
    cfg = config or HarnessConfig()
    engine = Engine(spark, warehouse_dir, cfg.database)
    assert engine.probe()

    spec = test_local_spec()
    spec.name = cfg.table
    engine.create_table(spec)
    engine.create_alias(cfg.distributed_table, cfg.table)
    engine.alter_setting(
        cfg.table,
        parts_to_delay_insert=cfg.parts_to_delay_insert,
        parts_to_throw_insert=cfg.parts_to_throw_insert,
        max_partitions_per_insert_block=cfg.max_partitions_per_insert_block,
    )

    gen = BatchGenerator(spark, seed=cfg.seed, base_time=cfg.base_time)
    result = StreamingHarnessResult()

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ins = engine.insert(cfg.distributed_table, batch_df)
        result.batches += 1
        result.rows_inserted += ins.rows
        result.per_batch_seconds.append(ins.elapsed_s)
        if ins.delay_s > 0:
            result.flow_control_triggered = True
        log.info(
            "epoch %d: %d rows, %d new parts, %.3fs (delay %.3fs)",
            epoch_id, ins.rows, ins.new_parts, ins.elapsed_s, ins.delay_s,
        )

    stream = generated_stream(spark, gen, cfg.batch_size)
    query = (
        stream.writeStream.foreachBatch(sink)
        .trigger(processingTime=f"{cfg.insert_interval_s or 1} seconds")
        .option("checkpointLocation", f"{warehouse_dir}/_streaming_checkpoint")
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    except Exception:  # StreamingQueryException wrapping TooManyPartsError
        cause = query.exception()
        if cause is not None and TooManyPartsError.__name__ in str(cause):
            result.flow_control_triggered = True
            result.throw_triggered = True
        else:
            raise
    finally:
        if query.isActive:
            query.stop()

    result.final_active_parts = engine.flow_status(cfg.table).active_parts
    # throw may also be observed between batches rather than via exception
    if result.final_active_parts >= int(cfg.parts_to_throw_insert):
        result.flow_control_triggered = True
        result.throw_triggered = True
    return result
