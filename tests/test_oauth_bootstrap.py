"""OAuth2 authorization-code bootstrap (generate_token.py parity) over
real sockets: an in-process token endpoint validates the form fields and
PKCE verifier, mints a refresh token, and serves refresh_token grants —
covering consent-URL build → redirect parse → code exchange → provider
refresh end-to-end."""

from __future__ import annotations

import base64
import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from spotify_app_etl_spark.sources import auth
from spotify_app_etl_spark.sources.http import HttpFormPostTransport


class _TokenHandler(BaseHTTPRequestHandler):
    state: dict = {}

    def log_message(self, *args):
        pass

    def do_POST(self):
        st = self.state
        length = int(self.headers["Content-Length"])
        form = {k: v[0] for k, v in parse_qs(self.rfile.read(length).decode()).items()}
        st["posts"].append(form)
        grant = form.get("grant_type")
        if grant == "authorization_code":
            ok = (
                form.get("code") == st["code"]
                and form.get("redirect_uri") == st["redirect_uri"]
                and form.get("client_id") == "cid"
            )
            if st.get("verifier_required"):
                digest = hashlib.sha256(form.get("code_verifier", "").encode()).digest()
                challenge = base64.urlsafe_b64encode(digest).rstrip(b"=").decode()
                ok = ok and challenge == st["challenge"]
            if not ok:
                self.send_response(400)
                self.end_headers()
                return
            body = {
                "access_token": "at-0",
                "refresh_token": "rt-1",
                "expires_in": 3600,
            }
        elif grant == "refresh_token" and form.get("refresh_token") == "rt-1":
            st["refreshes"] += 1
            body = {"access_token": f"at-{st['refreshes']}", "expires_in": 3600}
        else:
            self.send_response(400)
            self.end_headers()
            return
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def token_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _TokenHandler)
    base = f"http://127.0.0.1:{server.server_port}"
    _TokenHandler.state = {
        "posts": [],
        "refreshes": 0,
        "code": "the-code",
        "redirect_uri": "http://localhost:3000/",
    }
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield base, _TokenHandler.state
    finally:
        server.shutdown()
        thread.join()


def test_authorize_url_and_redirect_roundtrip():
    verifier, challenge = auth.pkce_pair()
    url = auth.authorize_url(
        "https://auth.example.local/authorize",
        "cid",
        "http://localhost:3000/",
        "user-library-read user-top-read",
        state="st8",
        code_challenge=challenge,
    )
    qs = {k: v[0] for k, v in parse_qs(urlparse(url).query).items()}
    assert qs["response_type"] == "code"
    assert qs["client_id"] == "cid"
    assert qs["scope"] == "user-library-read user-top-read"
    assert qs["code_challenge_method"] == "S256"
    # S256: challenge is the base64url sha256 of the verifier
    digest = hashlib.sha256(verifier.encode()).digest()
    assert qs["code_challenge"] == base64.urlsafe_b64encode(digest).rstrip(b"=").decode()

    code = auth.parse_redirect(
        "http://localhost:3000/?code=abc&state=st8", expect_state="st8"
    )
    assert code == "abc"
    with pytest.raises(RuntimeError, match="state mismatch"):
        auth.parse_redirect("http://localhost:3000/?code=abc&state=EVIL", expect_state="st8")
    with pytest.raises(RuntimeError, match="denied"):
        auth.parse_redirect("http://localhost:3000/?error=access_denied")
    with pytest.raises(RuntimeError, match="no \\?code="):
        auth.parse_redirect("http://localhost:3000/")


def test_bootstrap_exchange_and_refresh_over_real_sockets(token_server):
    base, state = token_server
    verifier, challenge = auth.pkce_pair()
    state["verifier_required"] = True
    state["challenge"] = challenge
    post = HttpFormPostTransport(timeout_s=5.0)

    clock = [0.0]
    provider = auth.bootstrap_provider(
        post,
        f"{base}/token",
        "http://localhost:3000/?code=the-code&state=s1",
        "cid",
        "http://localhost:3000/",
        code_verifier=verifier,
        expect_state="s1",
    )
    provider._clock = lambda: clock[0]
    provider._expires_at = clock[0] + 3600.0

    # Seeded from the exchange — no refresh yet.
    assert provider.token() == "at-0"
    assert state["refreshes"] == 0
    # Clock past expiry slack → one refresh_token grant over the wire.
    clock[0] = 3595.0
    assert provider.token() == "at-1"
    assert state["refreshes"] == 1
    # Grant types seen by the server, in order.
    assert [p["grant_type"] for p in state["posts"]] == [
        "authorization_code",
        "refresh_token",
    ]


def test_exchange_rejects_bad_code(token_server):
    base, _ = token_server
    post = HttpFormPostTransport(timeout_s=5.0)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        auth.exchange_code(
            post, f"{base}/token", "WRONG", "cid", "http://localhost:3000/"
        )
