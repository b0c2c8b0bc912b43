"""R3: daily rate limiter for task admission.

The reference gates every upstream API call behind a Redis daily counter
(`RedisDailyRateLimiter`, 500 requests/UTC-day: fetch-weather/
worker_ingestion.py:127-131, src/config.py:47-48) checked BEFORE the
fetch (`fetch-weather/src/tasks.py:59-60`); an exhausted quota raises
`RateLimitExceededError` and the task is redelivered later.

Spark mapping (SURVEY.md §2.9): the admission unit is the task ROW in a
micro-batch, and the limiter lives in the DRIVER (exactly one instance
runs per streaming query, so driver-local state is the Redis counter's
analog). `acquire(n)` is the batch form of `allow_request()` — it
grants as many of the n permits as the day's remaining quota allows, so
the pipeline can admit a prefix of the batch and route the overflow to
the DLQ with `safe_to_retry=true` (the redrive path plays the role of
the reference's redelivery-after-quota-reset).
"""

from __future__ import annotations

import time
from collections.abc import Callable

MAX_DAILY_REQUESTS = 500  # fetch-weather/src/config.py:47 (OWM_MAX_DAILY_REQUESTS)
_DAY_S = 86400


class RateLimitExceededError(RuntimeError):
    """Raised by `allow_request` callers when the daily quota is spent
    (reference: fetch-weather/src/tasks.py:60)."""


class DailyRateLimiter:
    """Fixed-window daily counter: quota resets at the UTC day boundary
    of the injected clock (epoch seconds), mirroring the reference's
    per-day Redis key."""

    def __init__(
        self,
        max_requests: int = MAX_DAILY_REQUESTS,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.max_requests = max_requests
        self._clock = clock
        self._day: int | None = None
        self._used = 0

    def _roll(self) -> None:
        day = int(self._clock() // _DAY_S)
        if day != self._day:
            self._day = day
            self._used = 0

    @property
    def remaining(self) -> int:
        self._roll()
        return max(0, self.max_requests - self._used)

    def acquire(self, n: int) -> int:
        """Grant min(n, remaining) permits and consume them. Returns the
        number granted (0 when the day's quota is spent)."""
        if n < 0:
            raise ValueError(f"n must be >= 0, got {n}")
        granted = min(n, self.remaining)
        self._used += granted
        return granted

    def allow_request(self) -> bool:
        """Reference-shaped single-permit probe (one API call == one
        permit)."""
        return self.acquire(1) == 1
