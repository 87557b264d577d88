"""Rate limiting + retry/backoff at the OCR boundary (SURVEY §7.3.4,
VERDICT r4 task 3). The reference calls Textract bare in a hot loop
(ref anarcpt/anarcptlib.py:113,121); its real ceiling is the service's
TPS quota. RateLimitedBackend adds the token bucket + bounded throttle
retries, with an injected clock so the tests run on virtual time.
"""

from __future__ import annotations

import pytest

import json

from receiptanalyzerpipeline_spark.multimodal.ocr import (
    RateLimitedBackend,
    RateLimiter,
    StubBackend,
    _default_is_throttle,
    ocr_expense,
)

pytestmark = pytest.mark.slow  # excluded from the default run (VERDICT r10 task 2)


class VirtualTime:
    """Deterministic clock whose sleep() advances time instantly."""

    def __init__(self):
        self.now = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.now

    def sleep(self, s: float) -> None:
        assert s >= 0
        self.sleeps.append(s)
        self.now += s


def test_token_bucket_never_exceeds_rate():
    vt = VirtualTime()
    lim = RateLimiter(rate_per_sec=10.0, burst=3.0, clock=vt.clock, sleeper=vt.sleep)
    grant_times = []
    for _ in range(50):
        lim.acquire()
        grant_times.append(vt.now)
    # Bucket guarantee: in ANY window [0, t] at most burst + rate*t grants.
    for i, t in enumerate(grant_times):
        n_by_t = i + 1
        assert n_by_t <= 3.0 + 10.0 * t + 1e-9, (n_by_t, t)
    # And it's not pointlessly slow: 50 grants from a 3-token bucket at
    # 10/s need exactly (50-3)/10 = 4.7 virtual seconds.
    assert abs(grant_times[-1] - 4.7) < 1e-9


def test_token_bucket_refills_while_idle_but_caps_at_burst():
    vt = VirtualTime()
    lim = RateLimiter(rate_per_sec=1.0, burst=2.0, clock=vt.clock, sleeper=vt.sleep)
    lim.acquire()
    lim.acquire()  # bucket drained
    vt.now += 100.0  # long idle: refills to burst, NOT to 100 tokens
    for _ in range(2):
        lim.acquire()
    t0 = vt.now
    lim.acquire()  # third immediate acquire must wait ~1s
    assert vt.now - t0 >= 1.0 - 1e-9


class ThrottleError(Exception):
    """botocore-shaped: carries response["Error"]["Code"]."""

    def __init__(self, code="ThrottlingException"):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class FlakyThrottlingBackend:
    """Throttles the first ``n_throttles`` calls PER image, then succeeds
    (delegating to StubBackend for the document)."""

    def __init__(self, n_throttles: int):
        self.n_throttles = n_throttles
        self.calls: dict[str, int] = {}
        self.inner = StubBackend()

    def analyze(self, content: bytes, ahash: str) -> dict:
        n = self.calls.get(ahash, 0)
        self.calls[ahash] = n + 1
        if n < self.n_throttles:
            raise ThrottleError()
        return self.inner.analyze(content, ahash)


def test_throttle_classification():
    assert _default_is_throttle(ThrottleError())
    assert _default_is_throttle(ThrottleError("ProvisionedThroughputExceededException"))

    class ThrottlingException(Exception):  # class-name fallback
        pass

    assert _default_is_throttle(ThrottlingException())
    assert not _default_is_throttle(ValueError("bad image"))


def test_retries_converge_with_zero_lost_rows():
    vt = VirtualTime()
    flaky = FlakyThrottlingBackend(n_throttles=2)
    b = RateLimitedBackend(
        flaky, rate_per_sec=5.0, max_retries=3, backoff_base_s=0.5,
        clock=vt.clock, sleeper=vt.sleep,
    )
    docs = {h: b.analyze(b"img", h) for h in ("aa", "bb", "cc")}
    assert all(d["ExpenseDocuments"] for d in docs.values())
    assert all(n == 3 for n in flaky.calls.values())  # 2 throttles + 1 success
    # Exponential backoff happened: per image sleeps include 0.5 then 1.0.
    assert vt.sleeps.count(0.5) == 3 and vt.sleeps.count(1.0) == 3


def test_exhausted_retries_reraise_and_non_throttle_is_not_retried():
    vt = VirtualTime()
    flaky = FlakyThrottlingBackend(n_throttles=10)
    b = RateLimitedBackend(
        flaky, rate_per_sec=100.0, max_retries=2, clock=vt.clock, sleeper=vt.sleep
    )
    try:
        b.analyze(b"img", "aa")
        raise AssertionError("expected ThrottleError")
    except ThrottleError:
        pass
    assert flaky.calls["aa"] == 3  # initial + 2 retries, bounded

    class Broken:
        def analyze(self, content, ahash):
            raise ValueError("corrupt image")

    b2 = RateLimitedBackend(Broken(), rate_per_sec=100.0, max_retries=5,
                            clock=vt.clock, sleeper=vt.sleep)
    calls = {"n": 0}
    orig = Broken.analyze

    def counting(self, content, ahash):
        calls["n"] += 1
        return orig(self, content, ahash)

    Broken.analyze = counting
    try:
        b2.analyze(b"img", "bb")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert calls["n"] == 1  # non-throttle: no retry


def test_throttled_batch_through_mapinpandas_quarantines_not_loses(spark):
    """The real executor path: a backend that ALWAYS throttles past the
    retry budget yields quarantine rows (ocr_error set), never dropped
    rows; a recovering backend yields all documents. Virtual clocks can't
    cross the Python-worker boundary, so rates are set high enough that
    real sleeps stay negligible."""
    rows = [(f"h{i:02d}", bytearray(b"img-%d" % i)) for i in range(8)]
    df = spark.createDataFrame(rows, "ahash string, content binary")

    # Defined INSIDE the test: Python workers can't import the test module,
    # and cloudpickle serializes function-local classes by value.
    class WorkerThrottleError(Exception):
        def __init__(self):
            super().__init__("ThrottleError")
            self.response = {"Error": {"Code": "ThrottlingException"}}

    class WorkerFlaky:
        def __init__(self, n_throttles: int):
            self.n_throttles = n_throttles
            self.calls: dict[str, int] = {}
            self.inner = StubBackend()

        def analyze(self, content: bytes, ahash: str) -> dict:
            n = self.calls.get(ahash, 0)
            self.calls[ahash] = n + 1
            if n < self.n_throttles:
                raise WorkerThrottleError()
            return self.inner.analyze(content, ahash)

    recovering = RateLimitedBackend(
        WorkerFlaky(n_throttles=1),
        rate_per_sec=1000.0, max_retries=2, backoff_base_s=0.001,
    )
    got = ocr_expense(df, recovering).collect()
    assert len(got) == 8
    assert all(r["ocr_error"] is None for r in got)
    assert all(json.loads(r["doc_json"])["ExpenseDocuments"] for r in got)

    hard_throttled = RateLimitedBackend(
        WorkerFlaky(n_throttles=99),
        rate_per_sec=1000.0, max_retries=1, backoff_base_s=0.001,
    )
    got2 = ocr_expense(df, hard_throttled).collect()
    assert len(got2) == 8  # zero lost rows
    assert all(r["doc_json"] is None for r in got2)
    assert all("WorkerThrottleError" in r["ocr_error"] for r in got2)


def test_token_bucket_property_never_exceeds_rate():
    """Hypothesis: for ANY (rate, burst, acquisition count), the grant
    count inside every window [0, t] stays within burst + rate*t."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        rate=st.floats(min_value=0.1, max_value=1000.0, allow_nan=False),
        burst=st.floats(min_value=1.0, max_value=64.0, allow_nan=False),
        n=st.integers(min_value=1, max_value=200),
    )
    def check(rate, burst, n):
        vt = VirtualTime()
        lim = RateLimiter(rate, burst, clock=vt.clock, sleeper=vt.sleep)
        grants = []
        for _ in range(n):
            lim.acquire()
            grants.append(vt.now)
        for i, t in enumerate(grants):
            assert i + 1 <= burst + rate * t + 1e-6, (rate, burst, i, t)

    check()
