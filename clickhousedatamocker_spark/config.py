"""Harness configuration.

Mirrors the reference's ``config/clickhouse.conf.example:1-22`` key set
(connection keys become Spark-session knobs; flow-control / ingest keys keep
their names and defaults).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class HarnessConfig:
    """Operating point of the load harness.

    Defaults follow ``config/clickhouse.conf.example``: runtime flow-control
    thresholds 50/100 (authoritative over the DDL's 150/300 — the reference
    ALTERs immediately, ``scripts/set_flow_control.sh:35-40``), 100k-row
    batches at 1 Hz for at most 60 iterations.
    """

    database: str = "default"
    table: str = "test_local"
    distributed_table: str = "test_distributed"

    # flow control (config/clickhouse.conf.example:12-14)
    parts_to_delay_insert: int = 50
    parts_to_throw_insert: int = 100
    max_partitions_per_insert_block: int = 100
    enforce_max_partitions: bool = False  # the reference declares but never applies it

    # ingest loop (config/clickhouse.conf.example:17-19)
    batch_size: int = 100_000
    insert_interval_s: float = 1.0
    max_insert_count: int = 60

    # background-merge simulation: compact every N inserts (0 = off, the
    # reference's pessimal mode — CH merges intentionally can't keep up
    # there, CLAUDE.md:429-433). Non-zero shows the real CH steady state
    # where merges race inserts and bound the active part count.
    optimize_every: int = 0

    # generation determinism
    seed: int = 42
    base_time: str | None = None  # None → wall clock (reference behavior); fixed str for tests

    cleanup: bool = False  # CLEANUP=true → drop tables first (setup.sh:102-104)

    extra: dict[str, str] = field(default_factory=dict)
