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

    def __getstate__(self):
        # The module docstring's production pattern ships the provider
        # (inside an authenticated_transport closure) to executors via
        # cloudpickle; a raw _thread.lock kills that pickle. Same
        # convention as TokenBucket/MockSpotifyTransport: drop the lock,
        # re-init on the other side — each executor then refreshes
        # independently, which is correct (tokens are per-process
        # caches, not shared state).
        #
        # A provider whose refresh grant has ROTATED may not be pickled:
        # the old refresh token is revoked server-side, so every copy
        # unpickled from this state shares one single-use credential —
        # the first executor's refresh revokes it and every other
        # process dies with invalid_grant. Rotating-grant providers must
        # stay driver-side; embed short-lived bearer tokens per batch
        # instead (see module docstring).
        #
        # The guard is best-effort by construction: it reads the
        # refresh fn's `rotation_observed` attribute, which (a) is only
        # True from the start when the caller DECLARED the server
        # rotating (refresh_grant_fn(rotating=True) — do this for any
        # public PKCE client), (b) otherwise flips on the first
        # observed rotation, so a provider pickled before its first
        # refresh slips through, and (c) is invisible through wrappers
        # (lambda/partial) that don't forward attributes. Declare
        # rotation up front when in doubt.
        if getattr(self._refresh_fn, "rotation_observed", False):
            raise TypeError(
                "TokenProvider's refresh grant has rotated; pickling it "
                "would fan a single-use refresh token out to multiple "
                "processes (first refresh revokes it for all others). "
                "Keep rotating-grant providers on the driver and embed "
                "short-lived bearer tokens per batch."
            )
        state = self.__dict__.copy()
        del state["_lock"]
        # Drop the cached token too: _expires_at is in _clock units, and
        # the default clock (time.monotonic) counts from *boot* — its
        # epoch differs per host. A carried expiry can read as "valid
        # indefinitely" on an executor whose monotonic clock is behind
        # the driver's, suppressing the first refresh and turning one
        # expired token into persistent 401s. A fresh first-use refresh
        # per process is cheap and always correct.
        state["_token"] = None
        state["_expires_at"] = 0.0
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

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


# ---------------------------------------------------------------------------
# OAuth2 authorization-code bootstrap (reference: generate_token.py:8-15,
# the one-time interactive consent flow that mints the refresh token the
# ETL then uses forever). Engine version is transport-injected and
# non-interactive: the caller opens `authorize_url` in a browser, pastes
# the redirect URL back, and `exchange_code` turns it into tokens.
# PKCE (RFC 7636) is included so public clients need no stored secret.
# ---------------------------------------------------------------------------

FormPost = Callable[..., dict]


def pkce_pair() -> tuple[str, str]:
    """(code_verifier, code_challenge) per RFC 7636 (S256)."""
    import base64
    import hashlib
    import secrets

    verifier = base64.urlsafe_b64encode(secrets.token_bytes(32)).rstrip(b"=").decode()
    digest = hashlib.sha256(verifier.encode("ascii")).digest()
    challenge = base64.urlsafe_b64encode(digest).rstrip(b"=").decode()
    return verifier, challenge


def authorize_url(
    endpoint: str,
    client_id: str,
    redirect_uri: str,
    scope: str,
    *,
    state: str | None = None,
    code_challenge: str | None = None,
) -> str:
    """The consent URL the user opens once (SpotifyOAuth's step 1)."""
    from urllib.parse import urlencode

    params = {
        "client_id": client_id,
        "response_type": "code",
        "redirect_uri": redirect_uri,
        "scope": scope,
    }
    if state is not None:
        params["state"] = state
    if code_challenge is not None:
        params["code_challenge"] = code_challenge
        params["code_challenge_method"] = "S256"
    return f"{endpoint}?{urlencode(params)}"


def parse_redirect(redirect_url: str, *, expect_state: str | None = None) -> str:
    """Extract the authorization code from the pasted redirect URL."""
    from urllib.parse import parse_qs, urlparse

    qs = parse_qs(urlparse(redirect_url).query)
    if "error" in qs:
        raise RuntimeError(f"authorization denied: {qs['error'][0]}")
    if expect_state is not None and qs.get("state", [None])[0] != expect_state:
        raise RuntimeError("state mismatch (possible CSRF)")
    try:
        return qs["code"][0]
    except KeyError:
        raise RuntimeError("redirect URL carries no ?code=") from None


def exchange_code(
    post: FormPost,
    endpoint: str,
    code: str,
    client_id: str,
    redirect_uri: str,
    *,
    client_secret: str | None = None,
    code_verifier: str | None = None,
) -> dict:
    """authorization_code grant → token response (incl. refresh_token)."""
    data = {
        "grant_type": "authorization_code",
        "code": code,
        "redirect_uri": redirect_uri,
        "client_id": client_id,
    }
    if client_secret is not None:
        data["client_secret"] = client_secret
    if code_verifier is not None:
        data["code_verifier"] = code_verifier
    return post(endpoint, data)


def refresh_grant_fn(
    post: FormPost,
    endpoint: str,
    refresh_token: str,
    client_id: str,
    *,
    client_secret: str | None = None,
    rotating: bool = False,
) -> RefreshFn:
    """A :class:`TokenProvider`-compatible refresh over the
    refresh_token grant (spotify-etl.py:29-42's per-run exchange).

    Pass ``rotating=True`` when the authorization server is KNOWN to
    rotate refresh tokens (standard for public PKCE clients): the
    pickle guard in :meth:`TokenProvider.__getstate__` then refuses to
    ship the provider to executors from the very first moment, instead
    of only after a rotation has been observed in-process — a provider
    pickled BEFORE its first refresh would otherwise fan the single-use
    bootstrap token out to N processes, where the first refresh revokes
    it for all others (invalid_grant outage). Observation still
    upgrades the flag for servers that rotate unannounced.
    """

    # RFC 6749 §6: providers MAY rotate the refresh token on every
    # refresh (standard for public PKCE clients), revoking the old one.
    # Track the CURRENT token in mutable state — reusing the bootstrap
    # token forever means the second refresh of a long run comes back
    # invalid_grant and the pipeline dies one token lifetime in.
    current = {"refresh_token": refresh_token}

    def refresh() -> tuple[str, float]:
        sent = current["refresh_token"]
        data = {
            "grant_type": "refresh_token",
            "refresh_token": sent,
            "client_id": client_id,
        }
        if client_secret is not None:
            data["client_secret"] = client_secret
        reply = post(endpoint, data)
        rotated = reply.get("refresh_token")
        if rotated and rotated != sent:
            current["refresh_token"] = rotated
            # Sticky flag read by TokenProvider.__getstate__: once the
            # server rotates, the grant is single-use and per-process
            # copies become a guaranteed outage — refuse to pickle.
            refresh.rotation_observed = True
        return reply["access_token"], float(reply.get("expires_in", 3600))

    refresh.rotation_observed = bool(rotating)
    return refresh


def bootstrap_provider(
    post: FormPost,
    token_endpoint: str,
    redirect_url: str,
    client_id: str,
    redirect_uri: str,
    *,
    client_secret: str | None = None,
    code_verifier: str | None = None,
    expect_state: str | None = None,
    slack_s: float = 60.0,
    rotating: bool | None = None,
) -> TokenProvider:
    """End-to-end: pasted redirect URL → self-refreshing TokenProvider.

    ``rotating`` defaults to the PKCE heuristic: a ``code_verifier``
    with no ``client_secret`` means a public client, and public-client
    refresh tokens are rotated as standard — the pickle guard must
    refuse to ship the provider from the FIRST moment, not only after
    an in-process rotation has been observed (a provider pickled
    before its first refresh would fan the single-use bootstrap token
    to N executor processes; the first refresh revokes it for all the
    others). Pass an explicit bool to override the heuristic.
    """
    code = parse_redirect(redirect_url, expect_state=expect_state)
    reply = exchange_code(
        post,
        token_endpoint,
        code,
        client_id,
        redirect_uri,
        client_secret=client_secret,
        code_verifier=code_verifier,
    )
    if rotating is None:
        rotating = code_verifier is not None and client_secret is None
    provider = TokenProvider(
        refresh_grant_fn(
            post,
            token_endpoint,
            reply["refresh_token"],
            client_id,
            client_secret=client_secret,
            rotating=rotating,
        ),
        slack_s=slack_s,
    )
    # Seed the cache with the freshly minted access token.
    provider._token = reply["access_token"]
    provider._expires_at = provider._clock() + float(reply.get("expires_in", 3600))
    return provider


def authenticated_transport(transport, provider: TokenProvider):
    """Wrap a transport so every request carries a fresh bearer header.

    The wrapper calls ``transport(url, headers)``; use this with real
    HTTP transports (mock transports ignore auth).
    """

    def call(url: str) -> dict:
        return transport(url, headers=provider.auth_header())

    return call
