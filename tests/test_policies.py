"""Unit tests for the ingestion resilience policies (SRC-1) — pure Python,
fake clocks, no Spark session (mirrors the reference's
tests/test_extract.py:41-46 rate-limit raise and retry behavior)."""

from __future__ import annotations

import pytest

from tesla_competitive_intelligence_etl_pipeline_spark.sources import policies
from tesla_competitive_intelligence_etl_pipeline_spark.sources.policies import (
    DailyRateLimiter,
    RateLimitError,
    RetryPolicy,
    Throttle,
    TransientHTTPError,
    governed_fetch,
)


class FakeClock:
    def __init__(self, t: float = 0.0):
        self.t = t
        self.sleeps: list[float] = []

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s


def test_rate_limiter_raises_at_cap():
    clock = FakeClock(t=1_000_000.0)
    lim = DailyRateLimiter(limit=3, clock=clock)
    for _ in range(3):
        lim.acquire()
    with pytest.raises(RateLimitError, match="Daily API limit of 3"):
        lim.acquire()


def test_rate_limiter_resets_on_day_boundary():
    clock = FakeClock(t=86400.0 * 10)
    lim = DailyRateLimiter(limit=1, clock=clock)
    lim.acquire()
    with pytest.raises(RateLimitError):
        lim.acquire()
    clock.t += 86400.0  # next day
    lim.acquire()  # budget refreshed


def test_retry_policy_backoff_sequence_and_exhaustion():
    clock = FakeClock()
    policy = RetryPolicy(total=3, backoff_factor=1.0, sleep=clock.sleep)
    calls = {"n": 0}

    def always_503():
        calls["n"] += 1
        raise TransientHTTPError(503)

    with pytest.raises(TransientHTTPError):
        policy.call(always_503)
    # initial attempt + 3 retries
    assert calls["n"] == 4
    # urllib3 backoff: factor * 2**(retry-1) before retries 2..n
    assert clock.sleeps == [1.0, 2.0]


def test_retry_policy_recovers_then_returns():
    clock = FakeClock()
    policy = RetryPolicy(total=3, sleep=clock.sleep)
    attempts = iter([TransientHTTPError(429), TransientHTTPError(500), "payload"])

    def flaky():
        v = next(attempts)
        if isinstance(v, Exception):
            raise v
        return v

    assert policy.call(flaky) == "payload"


def test_retry_policy_non_retryable_status_propagates():
    policy = RetryPolicy(total=3, sleep=lambda s: (_ for _ in ()).throw(AssertionError))
    calls = {"n": 0}

    def not_found():
        calls["n"] += 1
        raise TransientHTTPError(404)

    with pytest.raises(TransientHTTPError):
        policy.call(not_found)
    assert calls["n"] == 1  # no retry outside the forcelist


def test_throttle_waits_out_min_interval():
    clock = FakeClock()
    th = Throttle(min_interval=1.0, clock=clock, sleep=clock.sleep)
    th.wait()  # first call: no sleep
    assert clock.sleeps == []
    clock.t += 0.25
    th.wait()
    assert clock.sleeps == [0.75]
    clock.t += 5.0
    th.wait()  # interval already elapsed
    assert clock.sleeps == [0.75]


def test_governed_fetch_composes_limit_then_retry():
    clock = FakeClock(t=0.0)
    lim = DailyRateLimiter(limit=2, clock=clock)
    policy = RetryPolicy(total=2, sleep=clock.sleep)
    responses = iter([TransientHTTPError(502), ("rows", None)])

    def fetch(ticker):
        v = next(responses)
        if isinstance(v, Exception):
            raise v
        return v

    governed = governed_fetch(fetch, limiter=lim, retry=policy)
    assert governed("TSLA") == ("rows", None)
    assert lim.calls == 1  # one acquire per logical fetch, retries included
    governed_fetch(lambda t: ("ok", None), limiter=lim)("RIVN")
    with pytest.raises(RateLimitError):
        governed_fetch(lambda t: ("ok", None), limiter=lim)("LCID")


def test_datasource_defaults_build_governed_fetch():
    from tesla_competitive_intelligence_etl_pipeline_spark.sources.rest import (
        FmpReplayReader,
    )

    reader = FmpReplayReader(None, {"tickers": "TSLA"})
    fetch = reader._governed_fetch()
    fmp, yf = fetch("TSLA")
    assert fmp and fmp[0]["symbol"] == "TSLA" and yf is None


def test_module_exports():
    assert policies.RateLimitError is RateLimitError
