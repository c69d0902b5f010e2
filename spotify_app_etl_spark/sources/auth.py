"""OAuth bearer-token management for REST connectors (operator A17).

The reference exchanges a long-lived refresh token for a short-lived
bearer token once per run via spotipy
(/root/reference/spotify-etl.py:29-42; interactive bootstrap in
generate_token.py:8-15). This is the engine-side generalization,
dependency-free and transport-agnostic:

- :class:`TokenProvider` wraps any ``refresh() -> (token,
  expires_in_s)`` callable, caches the token, and refreshes
  pre-emptively ``slack_s`` before expiry. Thread-safe — a driver-side
  fetch loop and a status thread can share one provider.
- Executor pattern: the DRIVER refreshes and embeds the current token
  in the (pickled) transport closure per batch — executors never hold
  the refresh credential (least privilege). Long-running tasks that
  outlive a token instead take the provider itself; it re-refreshes
  in-process (each executor process then holds the credential —
  acceptable for trusted clusters, documented tradeoff).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

RefreshFn = Callable[[], tuple[str, float]]


class TokenProvider:
    """Caching, self-refreshing bearer-token source."""

    def __init__(
        self,
        refresh_fn: RefreshFn,
        slack_s: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._refresh_fn = refresh_fn
        self._slack_s = slack_s
        self._clock = clock
        self._lock = threading.Lock()
        self._token: str | None = None
        self._expires_at: float = 0.0
        self.refresh_count = 0

    def token(self) -> str:
        with self._lock:
            if self._token is None or self._clock() >= self._expires_at - self._slack_s:
                self._token, expires_in = self._refresh_fn()
                self._expires_at = self._clock() + float(expires_in)
                self.refresh_count += 1
            return self._token

    def auth_header(self) -> dict[str, str]:
        """Bearer header, as built at spotify-etl.py:224."""
        return {"Authorization": f"Bearer {self.token()}"}


def authenticated_transport(transport, provider: TokenProvider):
    """Wrap a transport so every request carries a fresh bearer header.

    The wrapper calls ``transport(url, headers)``; use this with real
    HTTP transports (mock transports ignore auth).
    """

    def call(url: str) -> dict:
        return transport(url, headers=provider.auth_header())

    return call
