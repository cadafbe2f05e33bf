"""Insert admission control — the reference's core behavior.

ClickHouse semantics (CLAUDE.md:429-438, monitor_metrics.sh:104-108):
two thresholds on the table's *active parts* count,

- ``parts_to_delay_insert``: at/above this, inserts are admitted but slowed —
  the delay grows as the count approaches the throw threshold (two-zone
  proportional backoff, not a binary check);
- ``parts_to_throw_insert``: at/above this, the insert fails with
  "Too many parts".

Plus ``max_partitions_per_insert_block`` (config/clickhouse.conf.example:14):
cap on distinct partitions one insert may touch. The reference declares it
but never applies it (set_flow_control.sh:35-40 alters only delay/throw) —
implemented here anyway, flag-gated off by default for behavior parity.

Thresholds are re-read from the table's settings on every check, so
``ALTER TABLE ... MODIFY SETTING`` takes effect on the next insert.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


class TooManyPartsError(RuntimeError):
    """Insert rejected: active parts >= parts_to_throw_insert."""


class TooManyPartitionsError(RuntimeError):
    """Insert rejected: block touches > max_partitions_per_insert_block partitions."""


@dataclass
class AdmissionDecision:
    parts_count: int
    delay_s: float  # 0.0 when below the delay threshold
    zone: str  # 'ok' | 'delay' | 'throw'


# ClickHouse's max_delay_to_insert default is 1 second.
MAX_DELAY_S = 1.0


def check_admission(
    parts_count: int,
    parts_to_delay_insert: int,
    parts_to_throw_insert: int,
) -> AdmissionDecision:
    """Pure decision function (unit-testable state machine, FIXTURES.md §5)."""
    if parts_count >= parts_to_throw_insert:
        return AdmissionDecision(parts_count, 0.0, "throw")
    if parts_count >= parts_to_delay_insert:
        # Proportional backoff across the delay zone, capped at MAX_DELAY_S —
        # mirrors CH's progressive slow-down between the two thresholds.
        span = max(parts_to_throw_insert - parts_to_delay_insert, 1)
        frac = (parts_count - parts_to_delay_insert + 1) / span
        return AdmissionDecision(parts_count, min(MAX_DELAY_S, MAX_DELAY_S * frac), "delay")
    return AdmissionDecision(parts_count, 0.0, "ok")


class FlowController:
    """Stateful wrapper used by the write path."""

    def __init__(self, metrics=None, sleep=time.sleep):
        self.metrics = metrics
        self._sleep = sleep

    def admit(self, parts_count: int, settings: dict) -> AdmissionDecision:
        decision = check_admission(
            parts_count,
            int(settings.get("parts_to_delay_insert", 150)),
            int(settings.get("parts_to_throw_insert", 300)),
        )
        if decision.zone == "throw":
            if self.metrics is not None:
                self.metrics.incr("RejectedInserts")
            raise TooManyPartsError(
                f"Too many parts ({decision.parts_count}). Merges are processing significantly slower than inserts."
            )
        if decision.zone == "delay":
            if self.metrics is not None:
                self.metrics.incr("DelayedInserts")
            self._sleep(decision.delay_s)
        return decision

    def check_partitions(self, distinct_partitions: int, settings: dict, enforce: bool) -> None:
        cap = int(settings.get("max_partitions_per_insert_block", 100))
        if enforce and distinct_partitions > cap:
            raise TooManyPartitionsError(
                f"Too many partitions for single INSERT block ({distinct_partitions} > {cap})."
            )
