"""Flow-control state machine (FIXTURES.md §5; monitor_metrics.sh:104-108)."""

import pytest

from clickhousedatamocker_spark.plans.flow_control import (
    MAX_DELAY_S,
    FlowController,
    TooManyPartitionsError,
    TooManyPartsError,
    check_admission,
)
from clickhousedatamocker_spark.plans.metrics import MetricsStore


def test_below_delay():
    d = check_admission(30, 50, 100)
    assert d.zone == "ok" and d.delay_s == 0.0


def test_delay_zone_proportional():
    d = check_admission(75, 50, 100)
    assert d.zone == "delay"
    assert 0.0 < d.delay_s <= MAX_DELAY_S
    d2 = check_admission(99, 50, 100)
    assert d2.delay_s > d.delay_s  # backoff grows toward the throw threshold


def test_throw_zone():
    assert check_admission(120, 50, 100).zone == "throw"
    assert check_admission(100, 50, 100).zone == "throw"  # boundary: >= throw


def test_delay_boundary():
    assert check_admission(50, 50, 100).zone == "delay"  # boundary: >= delay
    assert check_admission(49, 50, 100).zone == "ok"


def test_controller_counts_metrics_and_raises():
    metrics = MetricsStore()
    slept = []
    fc = FlowController(metrics=metrics, sleep=slept.append)
    fc.admit(30, {"parts_to_delay_insert": 50, "parts_to_throw_insert": 100})
    assert metrics.get("DelayedInserts") == 0 and not slept
    fc.admit(75, {"parts_to_delay_insert": 50, "parts_to_throw_insert": 100})
    assert metrics.get("DelayedInserts") == 1 and len(slept) == 1
    with pytest.raises(TooManyPartsError):
        fc.admit(120, {"parts_to_delay_insert": 50, "parts_to_throw_insert": 100})
    assert metrics.get("RejectedInserts") == 1


def test_settings_reread_each_check():
    """ALTER MODIFY SETTING takes effect on next insert (set_flow_control.sh)."""
    fc = FlowController(sleep=lambda s: None)
    settings = {"parts_to_delay_insert": 150, "parts_to_throw_insert": 300}
    fc.admit(120, settings)  # ok under DDL defaults
    settings.update(parts_to_delay_insert=50, parts_to_throw_insert=100)
    with pytest.raises(TooManyPartsError):
        fc.admit(120, settings)


def test_max_partitions_cap_flag_gated():
    fc = FlowController()
    fc.check_partitions(150, {"max_partitions_per_insert_block": 100}, enforce=False)
    with pytest.raises(TooManyPartitionsError):
        fc.check_partitions(150, {"max_partitions_per_insert_block": 100}, enforce=True)
