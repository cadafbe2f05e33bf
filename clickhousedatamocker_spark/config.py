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
    # the faithful form: a MergeScheduler daemon thread (plans/merges.py)
    # racing the insert loop, CH's actual background pool shape — merges
    # the smallest parts per partition instead of full compaction
    background_merges: bool = False
    merge_min_parts: int = 8

    # generation determinism
    seed: int = 42
    base_time: str | None = None  # None → wall clock (reference behavior); fixed str for tests

    cleanup: bool = False  # CLEANUP=true → drop tables first (setup.sh:102-104)

    extra: dict[str, str] = field(default_factory=dict)

    # shell-var name (as sourced by the reference's scripts) → field here
    _CONF_KEYS = {
        "CH_DATABASE": "database",
        "PARTS_TO_DELAY_INSERT": "parts_to_delay_insert",
        "PARTS_TO_THROW_INSERT": "parts_to_throw_insert",
        "MAX_PARTITIONS_PER_INSERT_BLOCK": "max_partitions_per_insert_block",
        "BATCH_SIZE": "batch_size",
        "INSERT_INTERVAL": "insert_interval_s",
        "MAX_INSERT_COUNT": "max_insert_count",
        "CLEANUP": "cleanup",
        "SEED": "seed",
    }

    @classmethod
    def from_conf_file(cls, path: str, **overrides) -> "HarnessConfig":
        """Build a config from the reference's shell-style conf file
        (``config/clickhouse.conf.example`` — ``KEY="value"`` lines meant to
        be ``source``d, ``scripts/setup.sh:12-18``). Known keys map onto
        fields; connection/logging keys (CH_HOST, CH_PORT, CH_USER,
        CH_PASSWORD, LOG_LEVEL) have no server counterpart here and land in
        ``extra`` untouched. Keyword ``overrides`` win over file values."""
        import re

        values: dict[str, object] = {}
        extra: dict[str, str] = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)=(.*)$", line)
                if not m:
                    continue
                key, raw = m.group(1), m.group(2).strip()
                val = raw[1:-1] if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "'\"" else raw
                field_name = cls._CONF_KEYS.get(key)
                if field_name is None:
                    extra[key] = val
                    continue
                ftype = cls.__dataclass_fields__[field_name].type
                if field_name == "cleanup":
                    values[field_name] = val.lower() in ("true", "1", "yes")
                elif ftype == "int":
                    values[field_name] = int(val)
                elif ftype == "float":
                    values[field_name] = float(val)
                else:
                    values[field_name] = val
        values["extra"] = extra
        values.update(overrides)
        return cls(**values)
