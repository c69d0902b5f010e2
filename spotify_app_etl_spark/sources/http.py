"""Real HTTP transport for the REST source machinery.

The reference's extract stage is aiohttp GETs against the Spotify API
(/root/reference/spotify-etl.py:44-62, 227). The engine keeps transports
injectable (``(url, headers=None) -> dict``), and this module supplies
the production implementation over stdlib ``urllib`` — dependency-free
and **picklable**, so ``batched_lookup``'s ``mapInPandas`` workers can
carry one to executors.

Throttling contract: HTTP 429 responses are returned as
``{"status": 429, "retry_after": seconds}`` (Retry-After header honored)
so :func:`spotify_app_etl_spark.sources.rest.request_with_retry`
applies its bounded retry; other HTTP errors raise. Compose with
``auth.authenticated_transport`` for bearer headers.

Tested against an in-process ``http.server`` stub over real sockets
(tests/test_http_transport.py) — pagination, 429 + Retry-After, and
auth-header injection.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request


class HttpFormPostTransport:
    """Synchronous form-encoded POST transport (OAuth token endpoints).

    ``(url, data, headers=None) -> dict`` — posts
    ``application/x-www-form-urlencoded`` and decodes a JSON response.
    Same dumb-pipe contract as :class:`HttpTransport`; non-2xx raises
    (token-endpoint failures are terminal, not throttling).
    """

    def __init__(self, timeout_s: float = 30.0, user_agent: str = "spotify-app-etl-spark/1.0"):
        self.timeout_s = timeout_s
        self.user_agent = user_agent

    def __call__(
        self, url: str, data: dict[str, str], headers: dict[str, str] | None = None
    ) -> dict:
        body = urllib.parse.urlencode(data).encode("ascii")
        merged = {
            "User-Agent": self.user_agent,
            "Content-Type": "application/x-www-form-urlencoded",
            **(headers or {}),
        }
        req = urllib.request.Request(url, data=body, headers=merged, method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))


class HttpTransport:
    """Synchronous JSON-over-HTTP GET transport.

    One request per call — rate limiting and retry live in
    ``sources.rest`` (TokenBucket / request_with_retry), keeping this
    class a dumb pipe. Instances hold only plain values → picklable.
    """

    def __init__(
        self,
        timeout_s: float = 30.0,
        base_headers: dict[str, str] | None = None,
        user_agent: str = "spotify-app-etl-spark/1.0",
    ):
        self.timeout_s = timeout_s
        self.base_headers = dict(base_headers or {})
        self.user_agent = user_agent

    def __call__(self, url: str, headers: dict[str, str] | None = None) -> dict:
        merged = {"User-Agent": self.user_agent, **self.base_headers, **(headers or {})}
        req = urllib.request.Request(url, headers=merged, method="GET")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as err:
            if err.code == 429:
                retry_after = err.headers.get("Retry-After", "1")
                try:
                    wait = float(retry_after)
                except ValueError:
                    wait = 1.0
                return {"status": 429, "retry_after": wait}
            raise
