"""Deterministic mock of the Spotify Web API, derived from testdata.

The ETL-parity pipeline (plans/etl_parity.py) needs a REST backend
shaped like the endpoints the reference calls
(/root/reference/spotify-etl.py:66-207). This mock serves those
endpoints as pure deterministic functions of the driver testdata
parquet under a scale-factor directory — which means a DuckDB oracle
can compute the *expected pipeline output* directly from the same
tables, giving the whole connector + from_json-flatten machinery an
exact end-to-end correctness check (the JSON round-trip cancels out).

Entity derivation (all arithmetic mirrored in plans/etl_parity.py
oracle SQL — keep in sync):

- playlist  ← orders with o_orderkey % 10 == 0; tracks.total = lineitem
  count of the order.
- playlist track item ← lineitem of that order; the item's ``track`` is
  NULL when l_linenumber == 6 (exercises the null-track filter,
  spotify-etl.py:106); track id = 'tr_<l_partkey>'.
- saved track ← part with p_partkey % 3 == 0 (id 'tr_<p_partkey>' —
  overlaps playlist tracks so union+distinct at spotify-etl.py:250
  actually dedupes); added_at = 2024-01-01 + (p_partkey % 365) days.
- recent track ← latest 50 events by (ts, event_id) desc.
- followed artist ← supplier; genres = [] when s_suppkey % 5 == 0
  (exercises empty-genres → '' in concat_ws, spotify-etl.py:199).
- audio features ← pure arithmetic on the numeric track id (see
  :func:`audio_features_for_ids`); id divisible by 97 → NULL row
  (exercises the null-features drop, spotify-etl.py:167).

Throttling: every ``page_size``-th page request returns one HTTP 429
with Retry-After 0 before succeeding, so the bounded-retry path
(sources.rest.request_with_retry) is exercised on every full run.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

PAGE_SIZE = 100
RECENT_LIMIT = 50  # Spotify caps /recently-played at 50 (A2)


def _iso(ts) -> str | None:
    return None if ts is None else ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


#: Process-level entity cache keyed by sf_dir: Spark reuses Python
#: worker processes across tasks and jobs, so the duckdb bulk loads
#: (the expensive part at sf0.1+) happen once per worker process, not
#: once per task. Keyed storage lives outside the (pickled) transport.
_PROCESS_CACHE: dict[str, dict] = {}


class MockSpotifyTransport:
    """Callable ``(url) -> dict`` serving Spotify-shaped JSON pages.

    Picklable (holds only ``sf_dir`` + caches rebuilt lazily) so
    ``mapInPandas`` workers can carry it to executors.
    """

    def __init__(self, sf_dir: str, throttle_every: int | None = 7):
        import threading

        self.sf_dir = sf_dir
        self.throttle_every = throttle_every
        self._cache = _PROCESS_CACHE.setdefault(sf_dir, {})
        self._requests = 0
        # fetch_paginated_many drives one shared transport from several
        # driver threads: the request counter and lazy cache builds
        # must not race (unsynchronized += lost updates made the
        # throttle cadence nondeterministic under concurrency)
        self._lock = threading.Lock()

    def __getstate__(self):
        return {"sf_dir": self.sf_dir, "throttle_every": self.throttle_every}

    def __setstate__(self, state):
        self.__init__(**state)

    # -- duckdb helpers ----------------------------------------------------
    # Thread-safety note: each _sql call opens its own duckdb
    # connection, and the lazy _cache builders are idempotent (same
    # deterministic rows), so a first-call race between driver threads
    # at worst duplicates one scan; dict assignment is atomic in
    # CPython. The request counter is the only mutation that must not
    # race (lock in __call__).

    def _sql(self, sql: str) -> list[tuple]:
        import duckdb

        con = duckdb.connect()
        try:
            for tbl in ("orders", "lineitem", "part", "supplier", "events"):
                # SQL-escape the path (double any single quote): a
                # checkout under e.g. /home/o'brien would otherwise be
                # a parser error inside the string literal. DuckDB bans
                # parameter binding in CREATE VIEW, so quoting it is.
                path = f"{self.sf_dir}/{tbl}.parquet".replace("'", "''")
                con.execute(
                    f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')"
                )
            return con.execute(sql).fetchall()
        finally:
            con.close()

    # -- entity builders (cached per instance) -----------------------------

    def _playlists(self) -> list[dict]:
        if "playlists" not in self._cache:
            rows = self._sql(
                """
                SELECT o_orderkey, o_orderpriority, coalesce(li.cnt, 0)
                FROM orders LEFT JOIN (
                  SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1
                ) li ON l_orderkey = o_orderkey
                WHERE o_orderkey % 10 = 0
                ORDER BY o_orderkey
                """
            )
            self._cache["playlists"] = [
                {
                    "id": f"pl_{k}",
                    "href": f"https://api.example.local/playlists/pl_{k}",
                    "name": f"playlist {k}",
                    "owner": {"display_name": prio},
                    "public": k % 2 == 0,
                    "collaborative": k % 3 == 0,
                    "tracks": {"total": int(cnt)},
                }
                for k, prio, cnt in rows
            ]
        return self._cache["playlists"]

    def _playlist_tracks(self, pid: str) -> list[dict]:
        # One bulk scan per process (not per playlist): an executor task
        # serving many playlists pays the parquet read once.
        if "tracks_by_playlist" not in self._cache:
            rows = self._sql(
                """
                SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
                FROM lineitem WHERE l_orderkey % 10 = 0
                ORDER BY l_orderkey, l_linenumber
                """
            )
            grouped: dict[str, list[dict]] = {}
            for ok, pk, sk, ln in rows:
                grouped.setdefault(f"pl_{ok}", []).append(
                    {"track": None, "added_at": None, "played_at": None}
                    if ln == 6
                    else {
                        "track": _track_json(pk, artist_n=sk),
                        "added_at": None,
                        "played_at": None,
                    }
                )
            self._cache["tracks_by_playlist"] = grouped
        return self._cache["tracks_by_playlist"].get(pid, [])

    def _saved_tracks(self) -> list[dict]:
        if "saved" not in self._cache:
            rows = self._sql(
                """
                SELECT p_partkey,
                       TIMESTAMP '2024-01-01 00:00:00'
                         + (p_partkey % 365) * INTERVAL 1 DAY
                FROM part WHERE p_partkey % 3 = 0 ORDER BY p_partkey
                """
            )
            self._cache["saved"] = [
                {
                    "track": _track_json(pk, artist_n=pk % 100),
                    "added_at": _iso(ts),
                    "played_at": None,
                }
                for pk, ts in rows
            ]
        return self._cache["saved"]

    def _recent_tracks(self) -> list[dict]:
        if "recent" not in self._cache:
            rows = self._sql(
                f"""
                SELECT event_id, CAST(ts AS TIMESTAMP)
                FROM events ORDER BY ts DESC, event_id DESC LIMIT {RECENT_LIMIT}
                """
            )
            self._cache["recent"] = [
                {
                    "track": _track_json(eid % 200, artist_n=eid % 37),
                    "added_at": None,
                    "played_at": _iso(ts),
                }
                for eid, ts in rows
            ]
        return self._cache["recent"]

    def _followed_artists(self) -> list[dict]:
        if "artists" not in self._cache:
            rows = self._sql("SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey")
            self._cache["artists"] = [
                {
                    "id": f"ar_{k}",
                    "name": name,
                    "genres": []
                    if k % 5 == 0
                    else [f"genre_{k % 7}", f"genre_{k % 3}"],
                    "popularity": int(k % 100),
                    "followers": {"total": int(k * 1000 + 17)},
                }
                for k, name in rows
            ]
        return self._cache["artists"]

    # -- request handling --------------------------------------------------

    def __call__(self, url: str) -> dict:
        with self._lock:
            self._requests += 1
            throttled = (
                self.throttle_every and self._requests % self.throttle_every == 0
            )
        if throttled:
            return {"status": 429, "retry_after": 0.0}

        parsed = urlparse(url)
        path = parsed.path
        offset = int(parse_qs(parsed.query).get("offset", ["0"])[0])

        if path == "/me/playlists":
            return self._page(path, self._playlists(), offset)
        if path.startswith("/playlists/") and path.endswith("/tracks"):
            pid = path.split("/")[2]
            return self._page(path, self._playlist_tracks(pid), offset)
        if path == "/me/tracks":
            return self._page(path, self._saved_tracks(), offset)
        if path == "/me/player/recently-played":
            return {"items": self._recent_tracks(), "next": None}
        if path == "/me/following":
            return self._page(path, self._followed_artists(), offset, extra="type=artist&")
        if path == "/audio-features":
            # batch features endpoint (spotify-etl.py:151-166): ids as a
            # comma-joined query param, ≤100 per request
            ids = parse_qs(parsed.query).get("ids", [""])[0]
            return {
                "audio_features": audio_features_for_ids(
                    [i for i in ids.split(",") if i]
                )
            }
        raise KeyError(f"mock transport: unknown endpoint {url}")

    def _page(self, path: str, items: list[dict], offset: int, extra: str = "") -> dict:
        chunk = items[offset : offset + PAGE_SIZE]
        nxt = (
            f"{path}?{extra}offset={offset + PAGE_SIZE}"
            if offset + PAGE_SIZE < len(items)
            else None
        )
        return {"items": chunk, "next": nxt, "total": len(items)}


def _track_json(track_n: int, artist_n: int) -> dict:
    """Track payload; second artist present but ignored by the flatten
    (reference takes artists[0] only, spotify-etl.py:103)."""
    return {
        "id": f"tr_{track_n}",
        "name": f"track {track_n}",
        "artists": [{"name": f"artist_{artist_n}"}, {"name": "feat_ignored"}],
        "album": {"name": f"album_{track_n % 40}"},
    }


# ---------------------------------------------------------------------------
# Audio features: pure arithmetic on the numeric id — executor-safe with
# no I/O, and exactly reproducible in SQL (plans/etl_parity.py oracle).
# No rounding anywhere: both engines divide the same integers, giving
# bit-identical doubles.
# ---------------------------------------------------------------------------


def audio_features_for_ids(ids: list[str]) -> list[dict]:
    """Batch features endpoint: one dict per non-null id (ids divisible
    by 97 return NULL from the API and are dropped, mirroring the
    reference's null-row guard at spotify-etl.py:167)."""
    out = []
    for tid in ids:
        n = int(tid.removeprefix("tr_"))
        if n % 97 == 0 and n > 0:
            continue  # API returned null for this id
        out.append(
            {
                "id": tid,
                "danceability": (n * 37 % 1000) / 1000.0,
                "energy": (n * 53 % 1000) / 1000.0,
                "key": n % 12,
                "loudness": -((n % 600) / 20.0),
                "mode": n % 2,
                "speechiness": (n * 41 % 1000) / 1000.0,
                "acousticness": (n * 43 % 1000) / 1000.0,
                "instrumentalness": (n * 47 % 1000) / 1000.0,
                "liveness": (n * 59 % 1000) / 1000.0,
                "valence": (n * 61 % 1000) / 1000.0,
                "tempo": 60.0 + (n * 7 % 1400) / 10.0,
                "type": "audio_features",
                "uri": f"spotify:track:{tid}",
                "track_href": f"https://api.example.local/tracks/{tid}",
                "analysis_url": f"https://api.example.local/audio-analysis/{tid}",
                "duration_ms": 90000 + n * 91 % 180000,
                "time_signature": 3 + n % 3,
            }
        )
    return out
