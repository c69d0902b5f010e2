"""sources.rest machinery: token bucket, bounded retry, pagination."""

from __future__ import annotations

import time

import pytest

from spotify_app_etl_spark.sources import rest


def test_token_bucket_enforces_rate():
    bucket = rest.TokenBucket(rate=20.0, burst=1.0)
    t0 = time.monotonic()
    for _ in range(6):
        bucket.acquire()
    elapsed = time.monotonic() - t0
    # 6 acquires at 20/s with burst 1 → ≥ 5 waits of 50ms
    assert elapsed >= 0.2, elapsed


def test_retry_honors_retry_after_then_succeeds():
    calls = []

    def transport(url):
        calls.append(url)
        if len(calls) < 3:
            return {"status": 429, "retry_after": 0.0}
        return {"items": [1, 2], "next": None}

    out = rest.request_with_retry(transport, "/x", max_attempts=5)
    assert out["items"] == [1, 2] and len(calls) == 3


def test_retry_budget_exhausted_raises():
    def transport(url):
        return {"status": 429, "retry_after": 0.0}

    with pytest.raises(rest.RetryBudgetExceeded):
        rest.request_with_retry(transport, "/x", max_attempts=3)


def test_pagination_follows_cursor_and_caps():
    pages = {
        "/p?offset=0": {"items": [0, 1], "next": "/p?offset=2"},
        "/p?offset=2": {"items": [2, 3], "next": "/p?offset=4"},
        "/p?offset=4": {"items": [4], "next": None},
    }
    assert rest.fetch_paginated(pages.__getitem__, "/p?offset=0") == [0, 1, 2, 3, 4]
    # explicit single-page cap (A2) — not silent truncation
    assert rest.fetch_paginated(pages.__getitem__, "/p?offset=0", max_pages=1) == [0, 1]
