"""Ingestion resilience policies (SRC-1, SURVEY.md §2.1): the reference's
HTTP-client hardening — retry-with-backoff (extract.py:47-62, urllib3 Retry
total=3, backoff_factor=1, status_forcelist 429/500/502/503/504), the daily
rate-limit counter (extract.py:64-67, raises RateLimitError at the cap), and
the politeness throttle (extract.py:248, sleep(1) between requests) — as
injectable policy objects.

Offline, the ``fmp_replay`` DataSource replays fixtures, but the policies
wrap its fetch seam unchanged: at deploy, `fetch_fn` becomes a real HTTP
call and these objects govern it per-executor (each InputPartition fetch
runs under its own partition's policy instances — a per-executor token
bucket, which is the scale-correct shape: a global limiter would serialize
the cluster on a driver round-trip).

Clock and sleep are injectable for deterministic tests (fake clock), the
same seam the reference's tests use (tests/test_extract.py:41-46).
"""

from __future__ import annotations

import time
from collections.abc import Callable


class RateLimitError(Exception):
    """Daily API budget exhausted (reference extract.py:66-67)."""


class TransientHTTPError(Exception):
    """An HTTP response in the retryable class (429/5xx)."""

    def __init__(self, status: int, msg: str | None = None):
        self.status = status
        super().__init__(msg or f"HTTP {status}")


class DailyRateLimiter:
    """Counting rate limit (reference extract.py:40-41, 64-67): every call
    increments; exceeding the budget raises RateLimitError. The counter
    resets when the (injectable) clock crosses a day boundary."""

    def __init__(self, limit: int = 250, clock: Callable[[], float] = time.time):
        self.limit = limit
        self.clock = clock
        self.calls = 0
        self._day = self._today()

    def _today(self) -> int:
        return int(self.clock() // 86400)

    def acquire(self) -> None:
        day = self._today()
        if day != self._day:
            self._day, self.calls = day, 0
        if self.calls >= self.limit:
            raise RateLimitError(f"Daily API limit of {self.limit} calls reached")
        self.calls += 1


class RetryPolicy:
    """Exponential backoff retry (reference extract.py:52-57): up to
    ``total`` retries on statuses in ``status_forcelist``; sleep
    backoff_factor * 2**(attempt-1) between attempts (urllib3 semantics:
    no sleep before the first retry when backoff_factor*2**0 applies to
    the second). Non-retryable errors propagate immediately."""

    def __init__(
        self,
        total: int = 3,
        backoff_factor: float = 1.0,
        status_forcelist: tuple[int, ...] = (429, 500, 502, 503, 504),
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.total = total
        self.backoff_factor = backoff_factor
        self.status_forcelist = status_forcelist
        self.sleep = sleep

    def call(self, fn: Callable[[], object]) -> object:
        attempt = 0
        while True:
            try:
                return fn()
            except TransientHTTPError as e:
                if e.status not in self.status_forcelist or attempt >= self.total:
                    raise
                # urllib3: {backoff factor} * (2 ** (retry count - 1))
                if attempt > 0:
                    self.sleep(self.backoff_factor * (2 ** (attempt - 1)))
                attempt += 1


class Throttle:
    """Politeness delay between consecutive requests (reference
    extract.py:248 time.sleep(1)): waits out the remainder of
    ``min_interval`` since the last call."""

    def __init__(
        self,
        min_interval: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.min_interval = min_interval
        self.clock = clock
        self.sleep = sleep
        self._last: float | None = None

    def wait(self) -> None:
        now = self.clock()
        if self._last is not None:
            remaining = self.min_interval - (now - self._last)
            if remaining > 0:
                self.sleep(remaining)
        self._last = self.clock()


def governed_fetch(
    fetch_fn: Callable[[str], object],
    limiter: DailyRateLimiter | None = None,
    retry: RetryPolicy | None = None,
    throttle: Throttle | None = None,
) -> Callable[[str], object]:
    """Compose the three policies around a fetch function, in the
    reference's order: rate-limit check first (extract.py:72), then the
    throttled, retried request."""

    def fetch(ticker: str) -> object:
        if limiter is not None:
            limiter.acquire()
        if throttle is not None:
            throttle.wait()
        if retry is not None:
            return retry.call(lambda: fetch_fn(ticker))
        return fetch_fn(ticker)

    return fetch
