"""HttpTransport over real sockets: an in-process http.server stub
serves paginated JSON, throttles with 429 + Retry-After, and records
request headers — covering the reference's extract loop shape
(pagination + rate-limit handling) end-to-end."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from spotify_app_etl_spark.sources import rest
from spotify_app_etl_spark.sources.auth import TokenProvider, authenticated_transport
from spotify_app_etl_spark.sources.http import HttpTransport


class _StubHandler(BaseHTTPRequestHandler):
    state: dict = {}

    def log_message(self, *args):  # silence test output
        pass

    def do_GET(self):
        st = self.state
        st["headers"].append(dict(self.headers))
        # throttle the first N requests to a path marked throttled
        if self.path in st["throttle"] and st["throttle"][self.path] > 0:
            st["throttle"][self.path] -= 1
            self.send_response(429)
            self.send_header("Retry-After", "0")
            self.end_headers()
            return
        if self.path not in st["pages"]:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(st["pages"][self.path]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def stub_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    base = f"http://127.0.0.1:{server.server_port}"
    _StubHandler.state = {
        "headers": [],
        "throttle": {},
        "pages": {
            "/items?page=0": {"items": [0, 1], "next": f"{base}/items?page=1"},
            "/items?page=1": {"items": [2, 3], "next": f"{base}/items?page=2"},
            "/items?page=2": {"items": [4], "next": None},
        },
    }
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield base, _StubHandler.state
    finally:
        server.shutdown()
        thread.join()


def test_paginated_fetch_over_real_sockets(stub_server):
    base, _ = stub_server
    transport = HttpTransport(timeout_s=5.0)
    items = rest.fetch_paginated(transport, f"{base}/items?page=0")
    assert items == [0, 1, 2, 3, 4]


def test_429_retry_after_honored(stub_server):
    base, state = stub_server
    state["throttle"]["/items?page=1"] = 2  # two 429s, then success
    transport = HttpTransport(timeout_s=5.0)
    items = rest.fetch_paginated(transport, f"{base}/items?page=0")
    assert items == [0, 1, 2, 3, 4]
    # 3 pages + 2 throttled attempts
    assert len(state["headers"]) == 5


def test_429_budget_exhausts(stub_server):
    base, state = stub_server
    state["throttle"]["/items?page=0"] = 99
    transport = HttpTransport(timeout_s=5.0)
    with pytest.raises(rest.RetryBudgetExceeded):
        rest.request_with_retry(transport, f"{base}/items?page=0", max_attempts=3)


def test_http_error_raises(stub_server):
    base, _ = stub_server
    transport = HttpTransport(timeout_s=5.0)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        transport(f"{base}/nope")


def test_auth_header_reaches_the_wire(stub_server):
    base, state = stub_server
    provider = TokenProvider(lambda: ("sekrit", 3600.0))
    transport = authenticated_transport(HttpTransport(timeout_s=5.0), provider)
    rest.fetch_paginated(transport, f"{base}/items?page=0")
    assert all(h.get("Authorization") == "Bearer sekrit" for h in state["headers"])


def test_transport_is_picklable():
    import pickle

    t = HttpTransport(timeout_s=7.0, base_headers={"X-App": "etl"})
    t2 = pickle.loads(pickle.dumps(t))
    assert t2.timeout_s == 7.0 and t2.base_headers == {"X-App": "etl"}
