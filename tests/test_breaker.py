"""Circuit-breaker state machine tests (R2) with a fake clock."""

from __future__ import annotations

import pytest

from trail_condition_etl_spark.sinks.breaker import (
    CircuitBreaker,
    CircuitOpenError,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _failing():
    raise OSError("down")


def test_opens_after_fail_max_and_short_circuits():
    clock = FakeClock()
    cb = CircuitBreaker(fail_max=3, reset_timeout_s=60, clock=clock)
    for _ in range(3):
        with pytest.raises(OSError):
            cb.call(_failing)
    assert cb.state == "open"
    # open: the underlying call is NOT attempted
    calls = []
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: calls.append(1))
    assert calls == []


def test_half_open_probe_success_closes():
    clock = FakeClock()
    cb = CircuitBreaker(fail_max=2, reset_timeout_s=60, clock=clock)
    for _ in range(2):
        with pytest.raises(OSError):
            cb.call(_failing)
    clock.t = 61
    assert cb.state == "half-open"
    assert cb.call(lambda: "ok") == "ok"
    assert cb.state == "closed"
    # failure counter reset: one new failure does not re-open
    with pytest.raises(OSError):
        cb.call(_failing)
    assert cb.state == "closed"


def test_half_open_probe_failure_reopens():
    clock = FakeClock()
    cb = CircuitBreaker(fail_max=2, reset_timeout_s=60, clock=clock)
    for _ in range(2):
        with pytest.raises(OSError):
            cb.call(_failing)
    clock.t = 61
    with pytest.raises(OSError):
        cb.call(_failing)
    assert cb.state == "open"
    clock.t = 100  # still within the new cooldown window
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: "ok")


def test_success_resets_consecutive_count():
    clock = FakeClock()
    cb = CircuitBreaker(fail_max=3, reset_timeout_s=60, clock=clock)
    for _ in range(2):
        with pytest.raises(OSError):
            cb.call(_failing)
    cb.call(lambda: "ok")
    for _ in range(2):
        with pytest.raises(OSError):
            cb.call(_failing)
    assert cb.state == "closed"  # never hit 3 consecutive
